"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same Parquet
fixtures and compares row count, column names, and order-insensitive
values. Floats must match EXACTLY after the engine's own rounding
discipline (plans/_exact.py) — a mismatch here predicts a value-hash
mismatch in the driver's CORRECTNESS gate, so this test is intentionally
strict.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from atlassian_confluence_data_pipeline_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone = 'UTC'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s, utc=True).dt.tz_localize(None)
            df[col] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.where(~s.isna(), None)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatches (empty = parity)."""
    problems: list[str] = []
    a, b = _canon(spark_df), _canon(oracle_df)
    if sorted(a.columns) != sorted(b.columns):
        return [f"{name}: column mismatch spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"{name}: row count spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        # dtype parity after canonicalization (datetimes normalized to us)
        # — catches int-width drift like Spark INT vs DuckDB BIGINT, which
        # a strict driver-side schema compare would reject
        if len(a) and str(a[col].dtype) != str(b[col].dtype):
            problems.append(
                f"{name}.{col}: dtype spark={a[col].dtype} oracle={b[col].dtype}"
            )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x_nan = x is None or (isinstance(x, float) and math.isnan(x))
            y_nan = y is None or (isinstance(y, float) and math.isnan(y))
            if x_nan and y_nan:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y:  # exact: predicts the driver's value-hash
                    problems.append(
                        f"{name}.{col}[{i}]: spark={x!r} oracle={y!r} (float drift)"
                    )
            elif x != y:
                problems.append(f"{name}.{col}[{i}]: spark={x!r} oracle={y!r}")
            if len(problems) >= 5:
                problems.append(f"{name}: ...truncated")
                return problems
    return problems
