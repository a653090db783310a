"""Relational operators (SURVEY.md §2 Tier A + B-2..B-7)."""
