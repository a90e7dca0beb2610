"""Grouped-map transforms via applyInPandas (SURVEY.md §2.10: the
reference's per-space processing loops, master_script.py:496-558, as a
per-group vectorized transform).

Prefer built-in window functions when the per-group logic is
expressible (they stay JVM-side); applyInPandas is the escape hatch for
genuinely imperative per-group logic — it receives each group as one
pandas DataFrame through Arrow."""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def zscore_per_group(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group standardization (x - mean) / std — the canonical
    grouped-map example; degenerate groups (std == 0) emit 0."""
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()
    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_fields}, {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        if not std or std != std:  # 0 or NaN
            z = 0.0
        else:
            z = (pdf[value_col] - pdf[value_col].mean()) / std
        return pdf.assign(**{out_col: z})

    return df.groupBy(*group_cols).applyInPandas(normalize, schema=out_schema)
