"""Registry of named queries paired with DuckDB oracle SQL.

Each engine operator (SURVEY.md §2) registers at least one query here:
a ``(spark, sf_dir) -> DataFrame`` callable plus, when the semantics are
SQL-expressible, an equivalent ANSI-SQL string the driver runs in DuckDB
over the same Parquet fixtures. Column names/aliases MUST match between
the two sides (the driver sorts columns by name before value-hashing).

Float discipline: aggregate doubles are ``round(x, 2..6)`` on BOTH sides
so the order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as a named engine query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco
