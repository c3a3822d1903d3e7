#!/usr/bin/env python3
"""Per-job + per-stage profile of named bench queries via the Spark UI REST API."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

os.environ["AZS_UI"] = "1"

import bench
from arrow_zarr_spark import register
from pyspark.sql import SparkSession


def get_spark_ui(cpus):
    os.environ.setdefault("PYTHONPATH", "/root/repo")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("azs_jobprof")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.executorEnv.PYTHONPATH", "/root/repo")
    )
    return b.getOrCreate()


def rest(path):
    url = f"http://localhost:4040/api/v1/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def ts(s):
    return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float(
        s[20:23] or 0
    ) / 1000


def main():
    names = sys.argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count()
    spark = get_spark_ui(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    qs = bench.bench_queries(spark)
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

    app_id = spark.sparkContext.applicationId
    for name in names:
        thunk = qs[name]
        thunk()  # warm
        jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        thunk()
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        stages = {s["stageId"]: s for s in rest(f"applications/{app_id}/stages")}
        print(f"=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        prev_end = None
        for j in jobs:
            t_sub, t_end = ts(j["submissionTime"]), ts(j["completionTime"])
            dur = t_end - t_sub
            gap = (t_sub - prev_end) if prev_end is not None else 0.0
            prev_end = max(prev_end or t_end, t_end)
            flag = " <<<" if dur > 0.3 or gap > 0.3 else ""
            print(
                f"  job {j['jobId']}: {dur*1000:6.0f} ms (gap {gap*1000:6.0f})"
                f" tasks={j['numTasks']:4d}{flag}"
            )
            if dur > 0.3:
                for sid in sorted(j.get("stageIds", [])):
                    s = stages.get(sid)
                    if not s or s.get("status") == "SKIPPED":
                        continue
                    sdur = (
                        ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
                        if s.get("completionTime") and s.get("firstTaskLaunchedTime")
                        else -1
                    )
                    print(
                        f"     stage {sid}: {sdur*1000:6.0f} ms tasks={s['numTasks']:4d}"
                        f" exRT={s.get('executorRunTime',0)} name={s['name'][:70]}"
                    )
                    det = rest(
                        f"applications/{app_id}/stages/{sid}"
                    )
                    try:
                        att = det[0] if isinstance(det, list) else det
                        # top RDD-scope / description
                        print(f"       details: {att.get('description','')[:100]}")
                    except Exception:
                        pass
    spark.stop()


if __name__ == "__main__":
    main()
