"""Multimodal (image/audio/video) column plumbing — SURVEY.md extension."""
