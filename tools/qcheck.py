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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_session("qcheck", cpus=8)
    rc = 0
    for name in args.names:
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
