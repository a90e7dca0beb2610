"""The primary correctness gate, run locally: every registered query with
an oracle must match DuckDB exactly (rows, columns, values) at the test
scale factor. Mirrors the driver's CORRECTNESS_r{N}.json check."""

from __future__ import annotations

import pytest

from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from tests.oracle_compare import compare_frames, run_oracle

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, sf_dir).toPandas()
    oracle_df = run_oracle(spec.oracle, sf_dir)
    problems = compare_frames(spark_df, oracle_df, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0  # must execute without error and have a schema
    assert df.columns
