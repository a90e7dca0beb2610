from __future__ import annotations

import os

import pytest

from atlassian_confluence_data_pipeline_spark.session import get_session

#: small scale factor for fast unit/parity tests
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session("acdp-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
