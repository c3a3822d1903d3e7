"""Physical-plan audit — the repo's plan-contract discipline
(tests/test_plan_contracts.py pins no-cartesian / broadcast /
exchange-count shapes on 30+ operators) packaged as a user-facing
tool: point it at any DataFrame and get the scale-killer checklist
this project applies to its own operators, as rows.

The checks are exactly the ones that decide whether a plan survives
a 100x scale-up:

- ``cartesian_product`` / ``broadcast_nested_loop_join`` — the two
  shapes that turn O(n) into O(n^2); any non-zero count is the first
  thing to fix.
- ``python_row_udf`` — ``BatchEvalPython`` means row-at-a-time Python
  in the pipeline (10-100x slower than Arrow); ``arrow_python_eval``
  counts the acceptable vectorized form.
- ``exchange`` — every hash exchange is a full shuffle of its input;
  the count is the plan's shuffle budget.
- ``broadcast_hash_join`` / ``sort_merge_join`` — how the joins are
  actually executed (a small side that sort-merges wants a broadcast
  hint or AQE).
- ``wholestage_codegen`` — fused JVM spans. CAVEAT: under AQE (this
  project's default) codegen is applied per query stage at EXECUTION,
  so an unexecuted DataFrame's plan string carries no spans and the
  count reads 0; audit after an action (or with AQE off) to see them.
  Informational either way, never a verdict.
- ``filescan_without_pushed_filters`` — parquet scans whose own
  ``DataFilters`` list is non-empty (a filter applies to THAT scan)
  while their ``PushedFilters`` list is empty: rows decode that a
  pushdown would have skipped. Scans with no filter of their own are
  never flagged.

``audit_plan`` returns the findings as plain dicts;
``plan_report`` as a one-row-per-check DataFrame (check, value,
ok). The parse works on the executed-plan string — the same artifact
the plan-contract tests assert on — so the report is deterministic
for a fixed query and configuration.
"""

from __future__ import annotations

import re
from typing import Dict, List

from pyspark.sql import DataFrame

__all__ = ["audit_plan", "plan_report"]


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> List[Dict]:
    """Run the scale checklist over a DataFrame's physical plan.
    Returns ``[{"check", "value", "ok"}, ...]`` — ``ok`` encodes the
    project's plan-contract conventions (cartesians/NLJs/row-Python
    never ok; everything else informational, always ok)."""
    plan = set_first(_plan_string(df))
    n_cartesian = plan.count("CartesianProduct")
    n_nlj = plan.count("BroadcastNestedLoopJoin")
    n_row_py = plan.count("BatchEvalPython")
    n_arrow_py = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
    n_exchange = plan.count("Exchange hashpartitioning")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln
    ]
    # scan-LOCAL check: the FileScan line carries its own DataFilters
    # list, so "a filter exists somewhere in the plan" can't leak a
    # false verdict onto a deliberately unfiltered scan
    n_unpushed = sum(
        1
        for ln in scans
        if "PushedFilters: []" in ln
        and "DataFilters: [" in ln
        and "DataFilters: []" not in ln
    )
    rows = [
        ("cartesian_product", n_cartesian, n_cartesian == 0),
        ("broadcast_nested_loop_join", n_nlj, n_nlj == 0),
        ("python_row_udf", n_row_py, n_row_py == 0),
        ("arrow_python_eval", n_arrow_py, True),
        ("exchange", n_exchange, True),
        ("broadcast_hash_join", n_bhj, True),
        ("sort_merge_join", n_smj, True),
        ("wholestage_codegen", n_wsc, True),
        ("filescan_without_pushed_filters", n_unpushed, n_unpushed == 0),
    ]
    return [
        {"check": c, "value": int(v), "ok": bool(o)} for c, v, o in rows
    ]


def set_first(plan: str) -> str:
    """When AQE has already re-planned (the DataFrame was executed),
    the string carries 'Final Plan' and 'Initial Plan' sections — keep
    the final one. Before execution there is only the initial plan,
    which is what the counts then reflect (joins AQE would demote to
    broadcast still show as sort-merge until an action runs)."""
    marker = "+- == Initial Plan =="
    return plan.split(marker)[0] if marker in plan else plan


def plan_report(df: DataFrame) -> DataFrame:
    """The audit as a DataFrame: (check string, value long, ok bool),
    one row per check, stable order."""
    spark = df.sparkSession
    rows = [
        (r["check"], r["value"], r["ok"]) for r in audit_plan(df)
    ]
    return spark.createDataFrame(
        rows, "check string, value long, ok boolean"
    )
