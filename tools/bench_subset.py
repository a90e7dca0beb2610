#!/usr/bin/env python
"""Time a SUBSET of registry queries with bench.py's exact methodology
(fresh session, pricing_summary warmup, per-query noop sink, min of 2)
— the inner-loop A/B harness for optimization work. Not part of the
driver bench contract.

    python tools/bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def run_query(spark, name: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:]
    spark = get_session("acdp-bench-subset", cpus=32)
    run_query(spark, "pricing_summary")  # warmup
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        out[name] = round(min(run_query(spark, name) for _ in range(2)), 4)
    print(json.dumps(out))
    print("TOTAL", round(sum(out.values()), 3))


if __name__ == "__main__":
    main()
