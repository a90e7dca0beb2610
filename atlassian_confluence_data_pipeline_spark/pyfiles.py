"""Ship this package to Spark's Python workers.

Cloudpickled UDFs reference this package by module name; the driver
process may have it on ``sys.path`` (``__spark_entry__`` inserts the
repo root), but Python *workers* are separate processes that do not
inherit that path — a pandas UDF then dies with ModuleNotFoundError
when the host application runs from another directory. The fix is the
standard one: zip the package and ``addPyFile`` it, which puts it on
every worker's search path (and on executors in cluster mode).
Idempotent per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "spark.acdp.pyfilesShipped"


def ensure_package_on_workers(spark: SparkSession | None = None) -> None:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return
    try:
        if spark.conf.get(_FLAG, "0") == "1":
            return
    except Exception:
        pass
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"acdp_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, parent))
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(_FLAG, "1")
