#!/usr/bin/env python3
"""Capture .explain("formatted") for every bench query that routes a
DataFrame through bench._force — the plan evidence for the r13
optimization round (guide §1: measure first; §7.2: read the plan).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python plans/r13/capture_plans.py <suffix> [only_query ...]

Writes plans/r13/<query>_<suffix>.txt (suffix = "before" / "after").
Writer/maintenance thunks that never call _force have no DataFrame to
explain and are skipped (listed in the summary line).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

import bench  # noqa: E402
from arrow_zarr_spark import register  # noqa: E402
from arrow_zarr_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count()
    spark = get_spark(app_name="azs_capture_plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    qs = bench.bench_queries(spark)
    out_dir = os.path.dirname(os.path.abspath(__file__))
    skipped, written = [], []
    for name, thunk in qs.items():
        if only and name not in only:
            continue
        bench._LAST_DF[0] = None
        spark.sparkContext.setJobDescription(f"capture:{name}")
        try:
            thunk()
        except Exception as exc:  # capture must not die on one query
            skipped.append(f"{name} (error: {str(exc)[:60]})")
            continue
        df = bench._LAST_DF[0]
        if df is None:
            skipped.append(name)
            continue
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        written.append(name)
    print(f"wrote {len(written)} plans ({suffix}); no-DF skipped: {skipped}")
    spark.stop()


if __name__ == "__main__":
    main()
