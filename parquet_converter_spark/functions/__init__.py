"""Scalar function battery (SURVEY.md §2.3 casts C1–C5)."""
