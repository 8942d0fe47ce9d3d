"""Structured Streaming variants of the batch operators (the reference is
pure batch — SURVEY.md §2.6; these are the rebuild's scale extensions for
continuously-arriving training data)."""
