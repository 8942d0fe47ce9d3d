"""Relational query plans over the TPC-H-ish testdata — the general
query-engine surface the rebuild adds beyond the reference's single
pipeline (the reference has no SQL, no expression language, no planner —
SURVEY.md §2)."""
