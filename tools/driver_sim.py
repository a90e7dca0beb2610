#!/usr/bin/env python
"""Full driver simulation: run EVERY registry query + its DuckDB oracle
the way the grading driver does — `__spark_entry__.py` imported by file
path from a foreign cwd, a VANILLA SparkSession (none of the engine's
session configs), sf0.01 fixtures.

    python tools/driver_sim.py [--sf /root/testdata/sf0.01]

This is the superset of the driver's sampled CORRECTNESS gate: the
pytest parity suite runs under the engine's configured session, so
session-dependence (timezone, nanos handling, worker imports) only
shows up here. Exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    os.chdir("/tmp")  # foreign cwd, like the driver
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    qs, osql = mod.queries(), mod.oracle_sql()
    sys.path.insert(0, str(REPO))
    from tests.oracle_compare import compare_frames, run_oracle

    entry_rows = len(mod.entry(spark).collect())
    print(f"entry(): {entry_rows} rows")
    bad = []
    t0 = time.time()
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            probs = compare_frames(
                sdf, run_oracle(osql[name], args.sf), name
            )
            if probs:
                bad.append((name, probs[:3]))
        except Exception as e:  # pragma: no cover - sim robustness
            bad.append((name, [f"EXCEPTION: {e}"]))
    print(f"{len(qs)} queries in {time.time() - t0:.0f}s (vanilla session)")
    for n, p in bad:
        print("FAIL", n, p)
    print("ALL GREEN" if not bad else f"{len(bad)} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
