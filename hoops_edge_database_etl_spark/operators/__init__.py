"""Composite operators the reference implemented imperatively (SURVEY.md §2.3,
§2.5): as-of joins, sessionization, dedup sketches, iterative solvers.

Each is built from declarative DataFrame ops where semantics allow;
``applyInPandas`` only where execution is inherently order-dependent.
"""
