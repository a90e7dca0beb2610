"""Regression test for the grading driver's exact invocation shape:
import __spark_entry__ by FILE PATH from a foreign cwd with the repo
NOT on PYTHONPATH, build a vanilla SparkSession, and run a pandas-UDF
query. Catches worker-side ModuleNotFoundError (the package must ship
itself to Python workers via addPyFile — see pyfiles.py)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import importlib.util, json
spec = importlib.util.spec_from_file_location("__spark_entry__", "{entry}")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
df = mod.queries()["clean_documents_html"](spark, "/root/testdata/sf0.001")
rows = df.limit(2).collect()
assert rows and all("<script>" not in (r["html"] or "") for r in rows), rows
print("DRIVER_CONTRACT_OK", len(rows))
"""


def test_entry_module_runs_from_foreign_cwd(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # repo must NOT be importable implicitly
    }
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(entry=REPO / "__spark_entry__.py")],
        cwd=str(tmp_path),  # foreign cwd
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "DRIVER_CONTRACT_OK" in out.stdout, out.stdout + "\n" + out.stderr[-3000:]
