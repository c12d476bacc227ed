"""Event-time windowing & streaming surface (SURVEY.md §2.9 — absent
from the reference; required by the events capability)."""
