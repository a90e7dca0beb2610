#!/usr/bin/env python
"""Physical-plan shape snapshot + regression diff.

    python tools/plan_snapshot.py --write   # regenerate PLAN_SNAPSHOT.json
    python tools/plan_snapshot.py --check   # diff current plans vs snapshot

For every registered query, count the plan nodes that define its scale
posture (exchanges, join strategies, window forms, aggregates, Python
eval nodes). ``--check`` exits 1 when any query's shape changed — a
conf bump, Spark upgrade, or refactor that silently flips a
BroadcastHashJoin into a SortMergeJoin (or sneaks in a
BroadcastNestedLoopJoin) fails the gate instead of shipping. Shape
changes made ON PURPOSE are recorded by re-running ``--write`` and
committing the new snapshot — the diff then documents itself in the
PR.

The snapshot complements tools/plan_audit.py: the audit flags known
anti-patterns anywhere; the snapshot freezes the EXACT current shape,
catching regressions the audit's allow-lists would tolerate.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
from pathlib import Path

# Pin the plan shape: snapshots/audits must see the honest cold chain
# regardless of what the cross-session disk cache (plans/_cache.py)
# happens to hold — a warm parquet read would otherwise swap every
# shared-stage subtree for a scan and make the diff state-dependent.
os.environ["SPARK_GRAFT_NO_CHAIN_CACHE"] = "1"

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402

SNAPSHOT = REPO / "PLAN_SNAPSHOT.json"

#: node-name substrings that define a plan's scale posture
MARKERS = {
    "exchanges": "Exchange",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "sort_merge_joins": "SortMergeJoin",
    "shuffled_hash_joins": "ShuffledHashJoin",
    "bnl_joins": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "hash_aggregates": "HashAggregate",
    "object_hash_aggregates": "ObjectHashAggregate",
    "sort_aggregates": "SortAggregate",
    "windows": "Window ",
    "window_group_limits": "WindowGroupLimit",
    "take_ordered": "TakeOrderedAndProject",
    "global_sorts": "Sort ",
    "python_row_eval": "BatchEvalPython",
    "arrow_eval": "ArrowEvalPython",
    "pandas_grouped_map": "FlatMapGroupsInPandas",
    "map_in_pandas": "MapInPandas",
}


def shape_of(phys: str) -> dict[str, int]:
    return {
        key: phys.count(marker)
        for key, marker in MARKERS.items()
        if phys.count(marker)
    }


def collect(sf: str) -> dict[str, dict[str, int]]:
    spark = get_session("plan-snapshot", cpus=8)
    shapes: dict[str, dict[str, int]] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, sf)
            phys = df._jdf.queryExecution().executedPlan().toString()
            shapes[name] = shape_of(phys)
        except Exception as e:  # pragma: no cover - robustness
            shapes[name] = {"ERROR": 1, "msg": str(e)[:120]}  # type: ignore[dict-item]
    return shapes


def main() -> int:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--write", action="store_true")
    mode.add_argument("--check", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    shapes = collect(args.sf)
    if args.write:
        SNAPSHOT.write_text(json.dumps(shapes, indent=1, sort_keys=True) + "\n")
        print(f"wrote {SNAPSHOT.name}: {len(shapes)} query shapes")
        return 0

    if not SNAPSHOT.exists():
        print(f"{SNAPSHOT.name} missing - run --write first")
        return 1
    want = json.loads(SNAPSHOT.read_text())
    drift: list[str] = []
    for name, shape in shapes.items():
        if name not in want:
            drift.append(f"{name}: NEW query (not in snapshot)")
        elif want[name] != shape:
            drift.append(f"{name}: {want[name]} -> {shape}")
    for name in want:
        if name not in shapes:
            drift.append(f"{name}: REMOVED from registry")
    if drift:
        print(f"PLAN DRIFT ({len(drift)} queries):")
        for d in drift:
            print(" -", d)
        print("\nIf intentional: rerun with --write and commit the diff.")
        return 1
    print(f"OK: {len(shapes)} query plan shapes match the snapshot.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
