#!/usr/bin/env python3
"""Targeted per-query bench probe: times only the named bench queries
(min-of-N, same methodology as bench.py) in a fresh session.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python /tmp/probe.py q1 q2 ...
Env: PROBE_REPEAT (default 3)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from arrow_zarr_spark import register
from arrow_zarr_spark.session import get_spark


def main():
    names = sys.argv[1:]
    repeat = int(os.environ.get("PROBE_REPEAT", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count()
    spark = get_spark(app_name="azs_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    qs = bench.bench_queries(spark)
    # same warmup as bench.py
    from pyspark.sql import functions as F
    from arrow_zarr_spark import fixtures
    spark.range(1000).select(F.sum("id")).collect()
    spark.read.format("zarr").load(fixtures.write_lat_lon_store()).count()
    def _ident(it):
        for pdf in it:
            yield pdf
    spark.range(0, 10000, 1, 32).mapInPandas(_ident, "id long").count()
    spark.range(0, 1000, 1, 8).withColumn("g", F.col("id") % 8).groupBy(
        "g").applyInPandas(lambda pdf: pdf, "id long, g long").count()

    out = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        best, times = None, []
        for _ in range(repeat):
            t0 = time.perf_counter()
            qs[name]()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"min": round(best, 3), "all": times}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
