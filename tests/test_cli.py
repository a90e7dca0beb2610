"""CLI front door: subprocess smoke of list/run/explain from a foreign
cwd (keeps the user-facing entry from silently regressing)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def _run(args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.setdefault("SPARK_GRAFT_CPUS", "2")
    return subprocess.run(
        [sys.executable, "-m", "atlassian_confluence_data_pipeline_spark", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )


def test_cli_list(tmp_path):
    out = _run(["list"], str(tmp_path))
    assert out.returncode == 0, out.stderr[-1000:]
    assert "cdc_classify_orders" in out.stdout
    # every registered query is oracle-paired as of round 2
    assert "[oracle" in out.stdout and "[rows-only" not in out.stdout


def test_cli_run_and_unknown(tmp_path):
    out = _run(
        ["run", "point_lookup_order", "--sf-dir", "/root/testdata/sf0.001", "--show", "2"],
        str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-1000:]
    assert "1 rows in" in out.stdout
    bad = _run(["run", "definitely_not_a_query"], str(tmp_path))
    assert bad.returncode == 2
    assert "unknown query" in bad.stderr
