"""Scalar function library (SURVEY.md §2.8) — native Column expressions only.

Everything here compiles to Catalyst expressions inside whole-stage codegen;
the reference implemented the same behaviors as row-at-a-time Python
(e.g. safe_div at src/cbbd_etl/gold/_io_helpers.py:70-91).
"""
