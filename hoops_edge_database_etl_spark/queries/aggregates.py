"""Placeholder — queries land here (see SURVEY.md §2)."""
