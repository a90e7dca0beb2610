"""Domain-shaped fixtures (FIXTURES.md §B): tiny deterministic `pages` /
`state` frames following the reference's data model, used by unit and
property tests for CDC, hierarchy, and HTML-transform operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField(
            "space", T.StructType([T.StructField("key", T.StringType())]), True
        ),
        T.StructField(
            "version",
            T.StructType(
                [
                    T.StructField("number", T.IntegerType()),
                    T.StructField("when", T.TimestampType()),
                ]
            ),
            True,
        ),
        T.StructField(
            "body",
            T.StructType(
                [
                    T.StructField(
                        "storage",
                        T.StructType([T.StructField("value", T.StringType())]),
                    )
                ]
            ),
            True,
        ),
        T.StructField(
            "children",
            T.ArrayType(T.StructType([T.StructField("id", T.StringType())])),
            True,
        ),
        T.StructField(
            "ancestors",
            T.ArrayType(T.StructType([T.StructField("id", T.StringType())])),
            True,
        ),
    ]
)


def _page(pid, title, space, version, when, body, children=(), ancestors=()):
    return (
        pid,
        title,
        (space,),
        (version, datetime.fromisoformat(when)),
        ((body,),) if body is not None else ((None,),),
        [(c,) for c in children],
        [(a,) for a in ancestors],
    )


def make_pages(spark: SparkSession) -> DataFrame:
    """≥2 spaces (skewed), multi-level tree with a shared grandchild,
    version.when straddling the cutoff incl. boundary midnight, NULL
    bodies (guard P4)."""
    rows = [
        _page("1", "Root", "ENG", 3, "2025-07-01T00:00:00", "<p>root</p>", ["2", "3"]),
        _page("2", "Child A", "ENG", 2, "2025-07-02T10:30:00",
              "<p>a <script>x</script></p>", ["4"], ["1"]),
        _page("3", "Child B", "ENG", 1, "2025-06-20T08:00:00",
              "<![CDATA[raw]]><p>b</p>", ["4"], ["1"]),
        # shared grandchild (dedup case, confluence_client.py:315-318)
        _page("4", "Shared Grandchild", "ENG", 5, "2025-06-30T23:59:59",
              "<p>g</p>", [], ["1", "2"]),
        _page("5", "Null Body", "ENG", 1, "2025-07-03T12:00:00", None),
        _page("6", "Doc X", "OPS", 7, "2025-07-01T00:00:00", "<p>x</p>"),
        _page("7", 'Bad<>:"/\\|?*Title', "OPS", 2, "2025-06-01T00:00:00", "<p>y</p>"),
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def make_state(spark: SparkSession) -> DataFrame:
    """Ledger with version equal / lower / higher than pages rows (the
    three CDC outcomes) + an id absent from pages (J1 both ways)."""
    from atlassian_confluence_data_pipeline_spark.operators.state import STATE_SCHEMA

    rows = [
        ("1", "Root", "ENG", 3, "2025-07-01T00:00:00", {"html": "h/1"}),   # equal -> skip
        ("2", "Child A", "ENG", 1, "2025-06-10T00:00:00", {"html": "h/2"}),  # older -> updated
        ("4", "Shared Grandchild", "ENG", 9, "2025-06-01T00:00:00", {"html": "h/4"}),  # newer -> skip
        ("99", "Ghost", "ENG", 1, "2025-01-01T00:00:00", {"html": "h/99"}),  # absent from pages
    ]
    return spark.createDataFrame(rows, STATE_SCHEMA)
