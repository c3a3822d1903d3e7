"""zarr_sql automatic projection pruning (pruning.py) — the A4
mitigation promoted from a manual ``columns=`` option to an analyzed
rewrite: Catalyst's own optimized plan decides which store arrays
each query needs, and the re-registered views prove it via their
schemas. Reference behavior: DataFusion hands ``scan(projection)`` to
every query (table_provider.rs:114-117, config.rs:67-90); PySpark
4.1's DataSourceReader has no pruning hook, so this closes the gap at
the SQL entry point.

The safety invariant under test everywhere: values from the pruned
re-run are IDENTICAL to the full-width run — a column is only dropped
when no plan node references its exprId, so mis-pruning would show up
as a wrong answer or an AnalysisException here."""

import os

import numpy as np
import pytest

from arrow_zarr_spark.datasource import read_zarr
from arrow_zarr_spark.pruning import required_view_columns, zarr_sql


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    from arrow_zarr_spark.fixtures import write_store

    root = tmp_path_factory.mktemp("prune_stores")
    n = 64
    pa_ = str(root / "a")
    write_store(
        pa_,
        arrays={
            "k": np.arange(n, dtype=np.int64),
            "x": np.arange(n, dtype=np.float64) * 2,
            "y": np.arange(n, dtype=np.float64) * 3,
            "z": np.arange(n, dtype=np.float64) * 5,
        },
        chunk_shapes={c: (16,) for c in ("k", "x", "y", "z")},
    )
    pb_ = str(root / "b")
    write_store(
        pb_,
        arrays={
            "k": np.arange(n, dtype=np.int64),
            "w": np.arange(n, dtype=np.float64) * 7,
            "v": np.arange(n, dtype=np.float64) * 11,
        },
        chunk_shapes={c: (16,) for c in ("k", "w", "v")},
    )
    return {"a": pa_, "b": pb_}


def _run(spark, sql, tables):
    """(full-width truth rows, zarr_sql rows, pruned view schemas)."""
    for name, path in tables.items():
        read_zarr(spark, path).createOrReplaceTempView(name)
    truth = sorted(map(tuple, spark.sql(sql).collect()))
    got = sorted(map(tuple, zarr_sql(spark, sql, tables).collect()))
    pruned = {v: sorted(spark.table(v).columns) for v in tables}
    return truth, got, pruned


# (tag, sql, tables-used, expected pruned schema per view)
CASES = [
    ("narrow_select", "SELECT x FROM va", ("a",), {"va": ["x"]}),
    (
        "filter_col_kept",
        "SELECT x FROM va WHERE y > 50",
        ("a",),
        {"va": ["x", "y"]},
    ),
    (
        "count_star_cheapest",
        "SELECT COUNT(*) AS n FROM va",
        ("a",),
        {"va": ["k"]},  # int64 ties doubles on width, wins on name
    ),
    (
        "select_star_keeps_all",
        "SELECT * FROM va",
        ("a",),
        {"va": ["k", "x", "y", "z"]},
    ),
    (
        "join_two_stores",
        "SELECT va.x AS x, vb.w AS w FROM va JOIN vb ON va.k = vb.k",
        ("a", "b"),
        {"va": ["k", "x"], "vb": ["k", "w"]},
    ),
    (
        "self_join_unions_instances",
        "SELECT p.x AS x1, q.y AS y2 FROM va p JOIN va q ON p.k = q.k",
        ("a",),
        {"va": ["k", "x", "y"]},
    ),
    (
        "cte_reuse",
        "WITH c AS (SELECT k, x FROM va WHERE z > 10) "
        "SELECT c1.x AS x1, c2.x AS x2 FROM c c1 JOIN c c2 ON c1.k = c2.k",
        ("a",),
        {"va": ["k", "x", "z"]},
    ),
    (
        "in_subquery",
        "SELECT x FROM va WHERE k IN (SELECT k FROM vb WHERE w > 100)",
        ("a", "b"),
        {"va": ["k", "x"], "vb": ["k", "w"]},
    ),
    (
        "group_by",
        "SELECT k % 4 AS g, SUM(y) AS s FROM va GROUP BY k % 4",
        ("a",),
        {"va": ["k", "y"]},
    ),
    (
        "order_by_unselected",
        "SELECT x FROM va ORDER BY z",
        ("a",),
        {"va": ["x", "z"]},
    ),
    (
        "union_all",
        "SELECT x AS c FROM va UNION ALL SELECT w AS c FROM vb",
        ("a", "b"),
        {"va": ["x"], "vb": ["w"]},
    ),
    (
        "window_fn",
        "SELECT k, SUM(x) OVER (ORDER BY y "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM va",
        ("a",),
        {"va": ["k", "x", "y"]},
    ),
    (
        "having",
        "SELECT k % 2 AS g, COUNT(*) AS n FROM va "
        "GROUP BY k % 2 HAVING SUM(z) > 0",
        ("a",),
        {"va": ["k", "z"]},
    ),
    (
        "scalar_subquery",
        "SELECT x FROM va WHERE y > (SELECT AVG(v) FROM vb)",
        ("a", "b"),
        {"va": ["x", "y"], "vb": ["v"]},
    ),
]


@pytest.mark.parametrize(
    "tag,sql,used,expect", CASES, ids=[c[0] for c in CASES]
)
def test_shapes(spark, stores, tag, sql, used, expect):
    tables = {f"v{u}": stores[u] for u in used}
    truth, got, pruned = _run(spark, sql, tables)
    assert got == truth, f"{tag}: pruned values diverge"
    for view, cols in expect.items():
        assert pruned[view] == sorted(cols), (
            f"{tag}: view {view} pruned to {pruned[view]}, "
            f"want {sorted(cols)}"
        )


def test_same_schema_stores_overapproximate_safely(
    spark, stores, tmp_path
):
    """Two views with IDENTICAL column sets: scan instances cannot be
    told apart by name, so each view keeps the UNION of both scans'
    requirements — less pruning, never a wrong answer."""
    from arrow_zarr_spark.fixtures import write_store

    p2 = str(tmp_path / "a2")
    n = 64
    write_store(
        p2,
        arrays={
            "k": np.arange(n, dtype=np.int64),
            "x": np.zeros(n, dtype=np.float64),
            "y": np.ones(n, dtype=np.float64),
            "z": np.arange(n, dtype=np.float64),
        },
        chunk_shapes={c: (16,) for c in ("k", "x", "y", "z")},
    )
    sql = (
        "SELECT p.x AS x, q.y AS y FROM vp p JOIN vq q ON p.k = q.k"
    )
    tables = {"vp": stores["a"], "vq": p2}
    truth, got, pruned = _run(spark, sql, tables)
    assert got == truth
    # both views keep the union {k, x, y} — and still drop z
    assert pruned["vp"] == ["k", "x", "y"]
    assert pruned["vq"] == ["k", "x", "y"]


def test_required_view_columns_unmatched_is_none(spark, stores):
    """A view whose schema matches no scan in the plan comes back
    None (keep-full-width) — the safe direction."""
    read_zarr(spark, stores["a"]).createOrReplaceTempView("va")
    df = spark.sql("SELECT x FROM va")
    req = required_view_columns(df, {"phantom": ["p", "q"]})
    assert req["phantom"] is None


def test_reader_options_forwarded(spark, stores):
    df = zarr_sql(
        spark,
        "SELECT x FROM va WHERE y > 50",
        {"va": stores["a"]},
        num_partitions="2",
    )
    assert df.rdd.getNumPartitions() == 2


def test_pruned_scan_still_pushes_filters(spark, stores):
    """Pruning composes with filter pushdown: the pruned re-run keeps
    the WHERE semantics (values already pinned by test_shapes; this
    pins the row count through a selective predicate)."""
    df = zarr_sql(
        spark,
        "SELECT x FROM va WHERE k >= 48",
        {"va": stores["a"]},
    )
    rows = df.collect()
    assert len(rows) == 16
    assert sorted(r.x for r in rows) == [
        float(i * 2) for i in range(48, 64)
    ]


def test_filtered_then_unfiltered_no_plan_reuse_leak(spark, stores):
    """The Spark 4.1 planned-read-per-relation cache (pinned in
    test_datasource.py::TestPushdownPlanReuse) makes a REUSED scan
    relation serve an earlier query's pruned partitions. zarr_sql
    builds a fresh relation per registration, so a filtered call
    followed by an unfiltered call over the same store must see every
    row — this exact sequence returned 48/64 rows from a naively
    cached DataFrame during development."""
    tables = {"va": stores["a"]}
    filtered = zarr_sql(
        spark, "SELECT x FROM va WHERE y > 50", tables
    ).collect()
    assert len(filtered) == 64 - 17  # y = 3i > 50 -> i >= 17
    full = zarr_sql(spark, "SELECT * FROM va", tables).collect()
    assert len(full) == 64
    # and back: the unfiltered call must not have widened the next
    # filtered one either
    again = zarr_sql(
        spark, "SELECT x FROM va WHERE y > 50", tables
    ).collect()
    assert sorted(r.x for r in again) == sorted(r.x for r in filtered)


def test_repeated_call_uses_cached_decision(spark, stores):
    """Second identical call takes the memoized-rewrite path (no
    re-analysis) and still returns identical values through a fresh
    relation."""
    from arrow_zarr_spark import pruning

    pruning.clear_plan_cache()
    tables = {"va": stores["a"]}
    sql = "SELECT x FROM va WHERE y > 50"
    first = sorted(
        map(tuple, zarr_sql(spark, sql, tables).collect())
    )
    assert len(pruning._DECISION_CACHE) == 1
    second = sorted(
        map(tuple, zarr_sql(spark, sql, tables).collect())
    )
    assert second == first
    assert len(pruning._DECISION_CACHE) == 1  # reused, not re-added
    assert sorted(spark.table("va").columns) == ["x", "y"]


def test_mixed_zarr_and_parquet_tables(spark, stores, sf_dir):
    """A statement joining a zarr view with a NON-zarr (parquet)
    table: the parquet scan is a LogicalRelation, not a
    DataSourceV2ScanRelation, so it never matches a zarr view — the
    zarr side still prunes and values match the full-width run."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "prune_nation"
    )
    sql = (
        "SELECT va.x AS x, n.n_name AS n_name FROM va "
        "JOIN prune_nation n ON va.k = n.n_nationkey WHERE va.z > 10"
    )
    read_zarr(spark, stores["a"]).createOrReplaceTempView("va")
    truth = sorted(map(tuple, spark.sql(sql).collect()))
    got = sorted(
        map(
            tuple,
            zarr_sql(spark, sql, {"va": stores["a"]}).collect(),
        )
    )
    assert got == truth and len(got) > 0
    assert sorted(spark.table("va").columns) == ["k", "x", "z"]


def test_empty_tables_mapping_is_plain_sql(spark, stores):
    read_zarr(spark, stores["a"]).createOrReplaceTempView("va")
    df = zarr_sql(spark, "SELECT COUNT(*) AS n FROM va", {})
    assert df.collect()[0].n == 64
