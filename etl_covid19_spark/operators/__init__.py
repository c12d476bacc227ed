"""Relational & extension operators (SURVEY.md §2.3-2.7, §7.2 step 9)."""
