"""Placeholder — populated in a later milestone (see SURVEY.md §7 build plan)."""
