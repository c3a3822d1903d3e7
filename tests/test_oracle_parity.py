"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count, column names, and an
order-insensitive value hash."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    # Type-tagged: the driver's value hash is type-sensitive, so int
    # 90000 and float 90000.0 must NOT compare equal here (a bare ==
    # masked exactly that divergence in r20 once).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


# The driver canonicalizes through pandas, so its value hash is
# sensitive to the pandas *dtype* each engine lands on — Spark LONG is
# int64 while DuckDB HUGEINT (bare SUM over ints) and DECIMAL both
# surface as float64, and Spark DECIMAL surfaces as object. A bare
# python-value comparison hides all of that (r25 and z10 passed locally
# and hash-failed at the driver twice). Compare dtype *kinds* the way
# pandas would see them.
_KIND_TAG = {"i": "int", "u": "int", "f": "float", "b": "bool",
             "M": "timestamp", "m": "timedelta", "O": "object"}


def _dtype_kinds(pdf):
    return {c: _KIND_TAG.get(pdf[c].dtype.kind, pdf[c].dtype.kind)
            for c in pdf.columns}


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    spark_cols = [f.name for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    spark_kinds = _dtype_kinds(sdf.toPandas())
    duck_kinds = _dtype_kinds(duck.execute(_ORACLES[name]).df())
    assert spark_kinds == duck_kinds, (
        f"{name}: pandas dtype kinds differ (driver hash would diverge): "
        f"spark={spark_kinds} duck={duck_kinds}"
    )

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_every_query_has_callable():
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 40


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "region_name" in df.columns
