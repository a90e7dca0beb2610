#!/usr/bin/env python
"""Core-count scaling probe (r11 VERDICT item 7; measurement-only).

sf0.1 cannot show parallelism — every query is 0.1-6 s and fixed
per-query costs dominate, so the driver's own 8-vs-32-core runs came
out BELOW 1x. This probe times a query list on the x{factor}
replicated fixtures (tools/scaling_study.py semantics: fact tables
replicate with disjoint key ranges, dimensions fixed) at ONE core
count per process, so two invocations give a meaningful low/high-core
ratio on multi-second queries:

    SPARK_GRAFT_CPUS=32 python tools/core_scaling_probe.py --out /tmp/c32.json
    SPARK_GRAFT_CPUS=8  python tools/core_scaling_probe.py --out /tmp/c8.json

Each query runs twice, min recorded (bench methodology). Not part of
the driver bench contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

#: the 20 slowest of the round-12 mid bench (sf0.1, 32 cores) minus
#: dedup_cluster_modularity (a one-window noise artifact, see
#: OPTIMIZATION_r12.md) — the corpus-bound band worth a scaling read
DEFAULT_QUERIES = [
    "spearman_qty_price",
    "near_dup_pairs",
    "fifo_quantity_matching",
    "frequent_brand_triples",
    "split_conformal_coverage",
    "order_tree_rollup",
    "approx_distinct_parts",
    "kmeans_iterations",
    "categorical_mutual_information",
    "semantic_dedup",
    "dawid_skene_confusion",
    "bloom_decontaminate",
    "min_cost_supplier",
    "ivf_recall_audit",
    "littles_law_audit",
    "markov_attribution_removal",
    "containment_candidates",
    "binned_quantile_estimates",
    "rfm_customer_segments",
    "market_basket_lift",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("acdp-core-scaling", cpus=cpus)

    from scaling_study import build_replica  # noqa: E402

    sf_dir = str(REPO / ".scratch" / f"scale_x{args.factor}")
    build_replica(spark, args.base, sf_dir, args.factor)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    run("pricing_summary")  # warmup
    out: dict[str, float] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(name)
        try:
            out[name] = round(min(run(name) for _ in range(2)), 3)
        except Exception as exc:  # replica-incompatible query: record, go on
            out[name] = -1.0
            print(f"SKIP {name}: {exc}", file=sys.stderr)
        print(f"{name:42s} {out[name]:8.3f}", flush=True)
    rec = {
        "cpus": cpus,
        "factor": args.factor,
        "queries": out,
        "total": round(sum(v for v in out.values() if v > 0), 2),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
