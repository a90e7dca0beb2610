"""Reusable engine operators (SURVEY.md §2), expressed Spark-first.

Every operator is a pure DataFrame -> DataFrame transform: declarative,
shuffle-aware, and free of driver-side collects, so Catalyst/AQE choose
the physical strategy and the same code runs at 100 TB.
"""
