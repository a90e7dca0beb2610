"""CLI for the engine: list, run, and explain registered queries.

    python -m atlassian_confluence_data_pipeline_spark list
    python -m atlassian_confluence_data_pipeline_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 --show 10
    python -m atlassian_confluence_data_pipeline_spark explain cdc_classify_orders
    python -m atlassian_confluence_data_pipeline_spark bench --sf-dir ...

A user of the reference pipeline drives it via argparse flags
(master_script.py:18-87); this is the engine's equivalent front door.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="atlassian_confluence_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    list_p = sub.add_parser("list", help="list registered queries")
    list_p.add_argument("--tag", default=None, help="filter by tag substring")

    orc_p = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc_p.add_argument("query")

    run_p = sub.add_parser("run", help="run one query")
    run_p.add_argument("query")
    run_p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run_p.add_argument("--show", type=int, default=20, help="rows to print")
    run_p.add_argument("--cpus", type=int, default=None)

    exp_p = sub.add_parser("explain", help="print a query's physical plan")
    exp_p.add_argument("query")
    exp_p.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    bench_p = sub.add_parser("bench", help="run the full corpus, print JSON timings")
    bench_p.add_argument("--sf-dir", default="/root/testdata/sf0.1")

    args = parser.parse_args(argv)

    from atlassian_confluence_data_pipeline_spark.plans import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            spec = QUERIES[name]
            if args.tag and not any(args.tag in t for t in spec.tags):
                continue
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:35s} [{kind:9s}] {', '.join(spec.tags)}")
        return 0

    if args.cmd == "oracle":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
            return 2
        spec = QUERIES[args.query]
        if spec.oracle is None:
            print("-- (rows-only query: no SQL oracle)", file=sys.stderr)
            return 1
        print(spec.oracle.strip())
        return 0

    from atlassian_confluence_data_pipeline_spark.session import get_session

    if args.cmd == "run":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
            return 2
        spark = get_session("acdp-cli", cpus=args.cpus)
        t0 = time.perf_counter()
        df = QUERIES[args.query].fn(spark, args.sf_dir)
        df.show(args.show, truncate=80)
        n = df.count()
        print(f"{n} rows in {time.perf_counter() - t0:.2f}s")
        return 0

    if args.cmd == "explain":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
            return 2
        spark = get_session("acdp-cli")
        QUERIES[args.query].fn(spark, args.sf_dir).explain("formatted")
        return 0

    if args.cmd == "bench":
        import os
        from pathlib import Path

        os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import bench  # repo-root bench harness

        bench.main()
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
