"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check.
``queries()`` / ``oracle_sql()`` — the correctness suite; definitions
live in :mod:`arrow_zarr_spark.suite` (Tier-B relational shapes, the
Catalyst-delegated relational inventory, Zarr-scan semantics with
DuckDB ``range()`` oracles, and the data-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_zarr_spark import register, suite  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for key, value in [
        # right-size shuffles for the harness scale (the 200-partition
        # default costs more in task overhead than it buys)
        ("spark.sql.shuffle.partitions", str(os.cpu_count() or 32)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
    ]:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    register(spark)  # also enables python filter pushdown + ships the pkg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Zarr store scan with coordinate broadcast, joined to the
    TPC-H-ish tables — the engine's two halves in one plan."""
    _prepare(spark)
    sf_dir = "/root/testdata/sf0.001"
    suite.ensure_views(spark, sf_dir)
    from arrow_zarr_spark.fixtures import write_lat_lon_store

    path = write_lat_lon_store()
    spark.read.format("zarr").load(path).createOrReplaceTempView("zarr_f1")
    return spark.sql(
        """
        WITH zcells AS (
          SELECT CAST(data AS BIGINT) AS cell_id, lat, lon
          FROM zarr_f1 WHERE lat < 40.0
        )
        SELECT z.cell_id, z.lat, z.lon, r.r_name AS region_name,
               COUNT(*) AS n_nations
        FROM zcells z
        JOIN region r ON z.cell_id % 5 = r.r_regionkey
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY z.cell_id, z.lat, z.lon, r.r_name
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = suite.queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
