"""SparkSession factory tuned for this engine.

Defaults follow the public Spark tuning guidance for local mode (one
JVM, N threads): shuffle partitions ≈ cores, AQE on (runtime re-plan +
skew-join handling), Arrow enabled for the Python boundary, UTC session
timezone so results compare bit-for-bit against the DuckDB oracle.
At cluster scale the same settings hold except shuffle partitions /
maxPartitionBytes, which should track executor count and input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def _ensure_package_on_worker_path() -> str:
    """Spark's Python workers (data-source planning + UDF execution) are
    separate processes that do NOT inherit the driver's ``sys.path``
    mutations — the package root must be on PYTHONPATH before the JVM
    starts. On a real cluster, ship the package with ``--py-files`` or
    pip-install it on the executors instead."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    return pkg_root


def get_spark(app_name: str = "arrow_zarr_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    pkg_root = _ensure_package_on_worker_path()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
