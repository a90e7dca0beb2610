#!/usr/bin/env python
"""Quick per-query parity check while iterating:

    python tools/qcheck.py name1 name2 ... [--sf DIR]

Runs just the named registry queries against their DuckDB oracles
(engine session, sf0.01 default). The full gates stay
``tools/verify_all.py``; this is the inner loop.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from atlassian_confluence_data_pipeline_spark.plans import QUERIES  # noqa: E402
from atlassian_confluence_data_pipeline_spark.session import get_session  # noqa: E402
from tests.oracle_compare import compare_frames, run_oracle  # noqa: E402


def _rotation_names(round_no: int | None, n: int) -> tuple[int, list[str]]:
    """Seeded rotation draw (round-11 VERDICT item 4): the driver's
    CORRECTNESS gate samples ~50 of the registry per round and the
    sample can repeat round-over-round (identical r9->r10), so the
    registry's long tail must be re-proven by a gate, not ad-hoc runs.
    Rule (documented in BASELINE.md): drop every query named in the
    TWO most recent CORRECTNESS_r*.json files, order the rest by
    sha256(f"{name}:r{round}") and take the first ``n`` — a
    deterministic, round-keyed draw that walks the whole registry over
    successive rounds. Round defaults to latest recorded round + 1
    (the round being built)."""
    import hashlib
    import json

    files = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(p.stem.rsplit("r", 1)[-1]),
    )
    if round_no is None:
        round_no = (
            int(files[-1].stem.rsplit("r", 1)[-1]) + 1 if files else 1
        )
    recent: set[str] = set()
    for p in files[-2:]:
        try:
            recent |= set(json.loads(p.read_text()))
        except (OSError, ValueError):
            pass
    eligible = [q for q in QUERIES if q not in recent]
    eligible.sort(
        key=lambda q: hashlib.sha256(f"{q}:r{round_no}".encode()).hexdigest()
    )
    return round_no, eligible[:n]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--rotation",
        action="store_true",
        help="seeded rotation draw over never-recently-driver-sampled"
        " queries (verify_all step 6)",
    )
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--n", type=int, default=28)
    args = ap.parse_args()
    names = list(args.names)
    if args.rotation:
        rnd, drawn = _rotation_names(args.round, args.n)
        print(f"rotation draw r{rnd}: {len(drawn)} queries")
        names += drawn
    if not names:
        print("nothing to check (no names, no --rotation)")
        return 1
    spark = get_session("qcheck", cpus=8)
    rc = 0
    for name in names:
        if name not in QUERIES:
            print(f"FAIL {name}: not in registry")
            rc = 1
            continue
        spec = QUERIES[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: EXCEPTION {e}")
            rc = 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        probs = compare_frames(sdf, run_oracle(spec.oracle, args.sf), name)
        if probs:
            print(f"FAIL {name}: {probs[:5]}")
            rc = 1
        else:
            print(f"ok   {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
