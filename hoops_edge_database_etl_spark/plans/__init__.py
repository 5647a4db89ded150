"""Reusable analysis plans: data-quality audits, profiling (SURVEY.md §2.4
A8/A10/A11, §5 audit harness)."""
