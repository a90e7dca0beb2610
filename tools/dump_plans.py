#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.

    python tools/dump_plans.py before q1 q2 ...
    ACDP_PLAN_ROUND=r12 python tools/dump_plans.py after q1 q2 ...
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    import os

    out_dir = REPO / "plans" / os.environ.get("ACDP_PLAN_ROUND", "r12")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_session("acdp-plans", cpus=32)
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
