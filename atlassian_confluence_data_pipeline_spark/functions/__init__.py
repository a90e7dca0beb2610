"""Scalar function library: built-in column expressions (fast path) and
pandas UDFs (slow path, Arrow-batched) — SURVEY.md §2.7/§2.10."""
