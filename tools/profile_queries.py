#!/usr/bin/env python
"""Profiling harness (analysis-only; not part of the bench contract).

For each named query: time fn() plan construction separately from the
noop-sink execution, run the execution twice (cold/warm within the
session), and print a per-query breakdown. Usage:

    python tools/profile_queries.py q1 q2 ...
    python tools/profile_queries.py --top N     # N slowest from BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1])
        bench = json.load(open(Path(__file__).resolve().parents[1] / "BENCH_LOCAL.json"))
        names = [k for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args
    spark = get_session("acdp-profile", cpus=32)
    # warmup
    t0 = time.perf_counter()
    QUERIES["pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"warmup {time.perf_counter()-t0:.2f}s", flush=True)
    print(f"{'query':44s} {'plan_s':>7s} {'exec1_s':>8s} {'exec2_s':>8s}")
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        # re-plan + second exec (warm)
        df2 = QUERIES[name].fn(spark, SF_DIR)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"{name:44s} {t1-t0:7.2f} {t2-t1:8.2f} {t4-t3:8.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
