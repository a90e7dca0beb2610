#!/usr/bin/env python
"""Scaling study: replicate the sf0.1 fixtures Nx with key offsets and
measure headline-query wall time vs data volume.

    python tools/scaling_study.py [--factors 2 4 8] [--base /root/testdata/sf0.1]

Writes replicas under {repo}/.scratch/scale_x{N}/ (gitignored) and
prints a markdown table (appended to SCALING.md by the caller).

Replication semantics: fact tables (orders, lineitem, events, documents,
embeddings) replicate with disjoint key ranges; dimension tables stay
fixed — so per-key densities grow with the factor, exactly the shape a
growing corpus has (more orders per customer, more docs per language
block, more vectors per label cell).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from atlassian_confluence_data_pipeline_spark.catalog import TABLES, load_table  # noqa: E402
from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "cdc_classify_orders",
    "brand_revenue",
    "top_revenue_orders",
    "hourly_event_stats",
    "session_stats",
    "exact_dedup_docs",
    "tfidf_top_terms",
    "cosine_topk",
    "near_dup_pairs",
    "minhash_lsh_pairs",
    "order_tree_rollup",
]

#: per-table (key columns to offset, offset stride)
OFFSETS = {
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


#: skew mode: half of all events land on this one user, half of all
#: orders on this one customer — the "hot space_key / hot user" shape a
#: 100 TB corpus actually has (uniform replication never exercises it)
HOT_USER = 42
HOT_CUST = 1


def build_replica(
    spark, base: str, out: str, factor: int, skew: bool = False
) -> None:
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src = load_table(spark, base, name)
        dest = f"{out}/{name}.parquet"
        if os.path.exists(dest):
            continue
        if name not in OFFSETS:
            src.write.mode("overwrite").parquet(dest)
            continue
        copies = []
        for k in range(factor):
            c = src
            for col, stride in OFFSETS[name].items():
                c = c.withColumn(col, F.col(col) + F.lit(k * stride))
            if name == "documents":
                # perturb replica text so replicas are near- (not exact-)
                # duplicates — the realistic near-dup workload
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{k} marker"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(f" replica{k} marker")))
            copies.append(c)
        out_df = copies[0]
        for c in copies[1:]:
            out_df = out_df.unionByName(c)
        if skew and name == "events":
            out_df = out_df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 2 == 0, F.lit(HOT_USER)).otherwise(
                    F.col("user_id")
                ),
            )
        if skew and name == "orders":
            out_df = out_df.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") % 2 == 0, F.lit(HOT_CUST)).otherwise(
                    F.col("o_custkey")
                ),
            )
        out_df.write.mode("overwrite").parquet(dest)


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", type=int, nargs="+", default=[4])
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="+", default=HEADLINE)
    ap.add_argument(
        "--skew",
        action="store_true",
        help="hot-key replicas: 50%% of events on one user, 50%% of "
        "orders on one customer (dirs suffixed _skew)",
    )
    args = ap.parse_args()

    spark = get_session("scaling", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    dirs = {1: args.base}
    suffix = "_skew" if args.skew else ""
    for f in args.factors:
        out = str(REPO / ".scratch" / f"scale_x{f}{suffix}")
        print(f"building x{f}{suffix} replica ...", file=sys.stderr)
        build_replica(spark, args.base, out, f, skew=args.skew)
        dirs[f] = out

    factors = sorted(dirs)
    header = "| query | " + " | ".join(f"x{f} (s)" for f in factors) + " | x-last/x1 |"
    print(header)
    print("|" + "---|" * (len(factors) + 2))
    for name in args.queries:
        times = []
        for f in factors:
            times.append(run_query(spark, name, dirs[f]))
        ratio = times[-1] / times[0] if times[0] else float("nan")
        cells = " | ".join(f"{t:.2f}" for t in times)
        print(f"| {name} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
