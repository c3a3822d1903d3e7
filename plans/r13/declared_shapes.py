#!/usr/bin/env python3
"""Plan-shape audit of EVERY declared correctness query (guide §1:
note the plan shape for every query): one TSV row per query with the
optimized plan's Exchange count, join strategies, Python-eval nodes,
and scan count. Plans only — nothing executes.

Usage: SPARK_GRAFT_CPUS=8 python plans/r13/declared_shapes.py [out.tsv]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from arrow_zarr_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "declared_shapes.tsv"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or 8
    spark = get_spark(app_name="azs_declared_shapes", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            rows.append((name, "ERROR", str(exc)[:80]))
            continue
        joins = {
            j: plan.count(j)
            for j in (
                "BroadcastHashJoin",
                "ShuffledHashJoin",
                "SortMergeJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if plan.count(j)
        }
        rows.append(
            (
                name,
                "ok",
                "exch={} py={} scans={} joins={}".format(
                    plan.count("Exchange hashpartitioning"),
                    plan.count("BatchEvalPython")
                    + plan.count("ArrowEvalPython")
                    + plan.count("MapInPandas")
                    + plan.count("FlatMapGroupsInPandas"),
                    plan.count("Scan "),
                    joins,
                ),
            )
        )
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write("\t".join(r) + "\n")
    n_err = sum(1 for r in rows if r[1] == "ERROR")
    print(f"wrote {len(rows)} rows ({n_err} errors) to {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
