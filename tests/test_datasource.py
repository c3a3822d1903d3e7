"""End-to-end Spark tests of the zarr DataSource, replicating the
reference's SQL-level golden tests (table_provider.rs:171-487)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.fixtures import (
    write_lat_lon_missing_store,
    write_lat_lon_store,
    write_mixed_dims_store,
    write_no_coords_store,
)


@pytest.fixture(scope="module")
def latlon(spark):
    path = write_lat_lon_store()
    df = spark.read.format("zarr").load(path)
    df.createOrReplaceTempView("zarr_table")
    return path


def test_full_scan_goldens(spark, latlon):
    """table_provider.rs:237-256 — full scan values + C-order flattening."""
    df = spark.read.format("zarr").load(latlon)
    assert [f.name for f in df.schema.fields] == ["data", "lat", "lon"]
    rows = df.orderBy("lat", "lon").collect()
    assert len(rows) == 64
    assert [r.data for r in rows] == [float(i) for i in range(64)]
    assert rows[0].lat == 35.0 and rows[0].lon == -120.0
    assert rows[63].lat == 42.0 and rows[63].lon == -113.0


def test_all_coords_cartesian(spark, latlon):
    """table_provider.rs:278-287 — SELECT lat, lon = 8x8 Cartesian."""
    rows = spark.sql("SELECT lat, lon FROM zarr_table").collect()
    assert len(rows) == 64
    assert len({(r.lat, r.lon) for r in rows}) == 64


def test_partial_coord_broadcast(spark, latlon):
    """table_provider.rs:374-399 — SELECT data, lon broadcasts lon."""
    rows = spark.sql("SELECT data, lon FROM zarr_table").collect()
    assert len(rows) == 64
    by_data = {r.data: r.lon for r in rows}
    assert by_data[0.0] == -120.0 and by_data[7.0] == -113.0
    assert by_data[8.0] == -120.0  # second row of the 8x8 grid


def test_where_exactness(spark, latlon):
    """table_provider.rs:401-438 — inexact pushdown + exact row filter."""
    rows = spark.sql(
        "SELECT lat, lon FROM zarr_table WHERE lat < 38.1 AND lon > -116.9"
    ).collect()
    assert len(rows) == 16
    assert all(r.lat < 38.1 and r.lon > -116.9 for r in rows)


def test_limit(spark, latlon):
    """table_provider.rs:300-307."""
    assert spark.sql("SELECT lat, lon FROM zarr_table LIMIT 10").count() == 10


def test_cte_self_join(spark, latlon):
    """table_provider.rs:310-347 — data2 == 2*data through a CTE self-join."""
    rows = spark.sql(
        """
        WITH d1 AS (SELECT lat, lon, data FROM zarr_table),
             d2 AS (SELECT lat, lon, data*2 AS data2 FROM zarr_table)
        SELECT d1.lat AS lat, d1.lon AS lon, d1.data AS data, d2.data2 AS data2
        FROM d1 JOIN d2 ON d1.lat = d2.lat AND d1.lon = d2.lon
        """
    ).collect()
    assert len(rows) == 64
    assert all(r.data2 == 2 * r.data for r in rows)


def test_ddl_temp_view(spark, latlon):
    """table_provider.rs:267-276 analogue. DataFusion's CREATE EXTERNAL
    TABLE registers a session-scoped table; the Spark equivalent with
    identical lifetime semantics is CREATE TEMPORARY VIEW ... USING zarr
    (persistent catalog tables don't round-trip options to Python data
    sources in Spark 4.1)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW zarr_ddl "
        f"USING zarr OPTIONS (path '{latlon}')"
    )
    assert spark.sql("SELECT count(*) AS n FROM zarr_ddl").collect()[0].n == 64
    rows = spark.sql(
        "SELECT lat, lon FROM zarr_ddl WHERE lat < 36.0"
    ).collect()
    assert len(rows) == 8
    spark.sql("DROP VIEW zarr_ddl")


def test_schema_subset_is_projection(spark, latlon):
    """table_provider.rs:264-287 — DDL column subset acts as projection."""
    df = spark.read.format("zarr").schema("lat double, lon double").load(latlon)
    assert [f.name for f in df.schema.fields] == ["lat", "lon"]
    assert df.count() == 64


def test_schema_unknown_field_error(spark, latlon):
    """table_provider.rs:440-466 error message."""
    with pytest.raises(Exception, match='Unable to get field named "latitude"'):
        spark.read.format("zarr").schema(
            "latitude double, longitude double"
        ).load(latlon).collect()


def test_schema_type_mismatch_error(spark, latlon):
    """table_provider.rs:468-486 error message."""
    with pytest.raises(
        Exception, match="Requested column lat's type does not match"
    ):
        spark.read.format("zarr").schema("lat int, lon int").load(
            latlon
        ).collect()


def test_missing_chunks_fill(spark):
    """zarr_data_stream.rs:1245-1278 — absent chunks read as fill 1234.0."""
    df = spark.read.format("zarr").load(write_lat_lon_missing_store())
    vals = {r.data for r in df.select("data").collect()}
    assert vals == {1234.0}


def test_no_coords_store(spark):
    """zarr_data_stream.rs:1129-1158."""
    df = spark.read.format("zarr").load(write_no_coords_store())
    rows = df.orderBy("data_1").collect()
    assert [r.data_1 for r in rows] == [float(i) for i in range(8)]
    assert [r.data_2 for r in rows] == [float(i) for i in range(100, 108)]


def test_mixed_dims_equals_f1(spark, latlon):
    """zarr_data_stream.rs:1205-1243 — F4 output identical to F1."""
    f1 = spark.read.format("zarr").load(latlon).orderBy("lat", "lon").collect()
    f4 = (
        spark.read.format("zarr")
        .load(write_mixed_dims_store())
        .orderBy("lat", "lon")
        .collect()
    )
    assert [tuple(r) for r in f1] == [tuple(r) for r in f4]


def test_num_partitions_option(spark, latlon):
    """scanner.rs:95-105 repartitioned semantics incl. over-partitioning."""
    df = (
        spark.read.format("zarr")
        .option("num_partitions", "2")
        .load(latlon)
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 64
    df20 = (
        spark.read.format("zarr")
        .option("num_partitions", "20")
        .load(latlon)
    )
    assert df20.count() == 64


def test_columns_option(spark, latlon):
    df = spark.read.format("zarr").option("columns", "lon,lat").load(latlon)
    assert [f.name for f in df.schema.fields] == ["lon", "lat"]
    assert df.count() == 64


def test_read_zarr_convenience(spark, latlon):
    """read_zarr forwards the projection into the scan (the A4
    narrow-query contract: Python's DS API has no prune hook, so the
    helper is how a wide-store user avoids decoding every array)."""
    from arrow_zarr_spark import read_zarr

    df = read_zarr(spark, latlon, columns=["lat", "data"])
    assert [f.name for f in df.schema.fields] == ["lat", "data"]
    assert df.count() == 64
    # scan-level projection: the plan's read schema is the subset, not
    # a Project over the full-width scan
    assert "var" not in df.schema.simpleString()
    # extra kwargs become reader options
    df2 = read_zarr(spark, latlon, num_partitions=2)
    assert df2.rdd.getNumPartitions() == 2
    with pytest.raises(Exception, match="nope"):
        read_zarr(spark, latlon, columns=["nope"]).count()


def test_union_all(spark, latlon):
    """s3_bench.rs:236-244 — UNION ALL double scan."""
    n = spark.sql(
        "SELECT * FROM zarr_table UNION ALL SELECT * FROM zarr_table"
    ).count()
    assert n == 128


def test_theta_self_join(spark, latlon):
    """s3_bench.rs:222-229 shape — theta/range self-join on the store."""
    rows = spark.sql(
        """
        SELECT t1.data AS d1, t2.data AS d2
        FROM zarr_table t1 JOIN zarr_table t2
          ON t1.data % 12 = 0 AND t1.data < t2.data + 1
         AND t1.data >= t2.data - 1
        """
    ).collect()
    # t2 > t1-1 and t2 <= t1+1 over integers => t2 in {m, m+1};
    # multiples of 12 in 0..63: {0,12,24,36,48,60} => 6 x 2 = 12 rows
    assert len(rows) == 12


def test_coord_cache_never_serves_stale_values(spark, tmp_path):
    """The worker-wide coordinate-chunk cache is scoped by a per-scan
    token: rewriting a coordinate array between two scans MUST be
    visible to the second scan even when the same worker processes
    serve both."""
    import numpy as np

    from arrow_zarr_spark.zarr.writer import write_store

    path = str(tmp_path / "s")

    def build(lat_base):
        write_store(
            path,
            arrays={
                "temp": np.arange(48.0).reshape(6, 8),
                "lat": np.linspace(lat_base, lat_base + 5, 6),
                "lon": np.linspace(100, 107, 8),
            },
            chunk_shapes={"temp": (2, 3), "lat": (2,), "lon": (3,)},
            dimension_names={
                "temp": ("lat", "lon"),
                "lat": ("lat",),
                "lon": ("lon",),
            },
        )

    build(10.0)
    first = spark.read.format("zarr").load(path).agg({"lat": "min"}).collect()
    assert first[0][0] == 10.0
    import shutil

    shutil.rmtree(path)
    build(50.0)
    second = spark.read.format("zarr").load(path).agg({"lat": "min"}).collect()
    assert second[0][0] == 50.0


class TestPushdownPlanReuse:
    """Spark 4.1 caches the planned Python-DataSource read per relation
    and filter pushdown overwrites it (see ZarrReader.pushFilters).
    Pin the three behaviors users rely on: filtered queries are always
    correct, fresh loads are always correct, and pushdown=false makes
    a single reused DataFrame correct in every order."""

    @pytest.fixture()
    def store_12(self, tmp_path):
        from arrow_zarr_spark.zarr.writer import write_store

        path = str(tmp_path / "p12")
        write_store(
            path,
            arrays={"v": np.arange(12.0)},
            chunk_shapes={"v": (3,)},
            dimension_names={"v": ("i",)},
        )
        return path

    def test_filtered_queries_always_correct(self, spark, store_12):
        df = spark.read.format("zarr").load(store_12)
        assert df.count() == 12
        assert df.filter("v >= 9").count() == 3
        assert df.filter("v >= 3").count() == 9
        assert df.filter("v >= 9").count() == 3

    def test_fresh_load_never_stale(self, spark, store_12):
        df = spark.read.format("zarr").load(store_12)
        assert df.filter("v >= 9").count() == 3
        fresh = spark.read.format("zarr").load(store_12)
        assert fresh.count() == 12

    def test_pushdown_off_makes_reuse_safe(self, spark, store_12):
        df = (
            spark.read.format("zarr")
            .option("pushdown", "false")
            .load(store_12)
        )
        assert df.filter("v >= 9").count() == 3  # exact rows, no pruning
        assert df.count() == 12  # reuse after a filtered query stays whole
        assert df.filter("v >= 3").count() == 9

    def test_temp_view_is_one_relation(self, spark, store_12):
        """The DDL story shares ONE relation per view, so the same
        caveat applies across SQL statements (r11 audit: traced the
        JVM planning exactly once for the filtered statement and
        never re-entering Python for the later unfiltered one — no
        reader-side fix can exist). pushdown 'false' in OPTIONS is
        the view-level escape; re-creating the view re-plans."""
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW pv_caveat USING zarr "
            f"OPTIONS (path '{store_12}')"
        )
        assert (
            spark.sql("SELECT COUNT(*) c FROM pv_caveat").first().c == 12
        )
        assert (
            spark.sql(
                "SELECT COUNT(*) c FROM pv_caveat WHERE v >= 9"
            ).first().c
            == 3
        )
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW pv_safe USING zarr "
            f"OPTIONS (path '{store_12}', pushdown 'false')"
        )
        assert (
            spark.sql(
                "SELECT COUNT(*) c FROM pv_safe WHERE v >= 9"
            ).first().c
            == 3
        )
        assert (
            spark.sql("SELECT COUNT(*) c FROM pv_safe").first().c == 12
        )


class TestReadZarrMany:
    def test_union_with_store_index(self, spark):
        from arrow_zarr_spark import read_zarr_many
        from arrow_zarr_spark import fixtures

        p1 = fixtures.write_lat_lon_store()
        p2 = fixtures.write_lat_lon_store_shifted()
        df = read_zarr_many(spark, [p1, p2], source_col="store_idx")
        assert df.count() == 128
        by_store = {
            r.store_idx: r.n
            for r in df.groupBy("store_idx").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert by_store == {0: 64, 1: 64}
        # shifted store's data really is +100
        vals = {
            r.store_idx: r.mn
            for r in df.groupBy("store_idx")
            .agg(F.min("data").alias("mn"))
            .collect()
        }
        assert vals == {0: 0.0, 1: 100.0}

    def test_projection_forwards_to_every_member(self, spark):
        from arrow_zarr_spark import read_zarr_many
        from arrow_zarr_spark import fixtures

        p1 = fixtures.write_lat_lon_store()
        p2 = fixtures.write_lat_lon_store_shifted()
        df = read_zarr_many(spark, [p1, p2], columns=["data"])
        assert df.columns == ["data"]
        assert df.count() == 128

    def test_schema_mismatch_names_the_store(self, spark):
        from arrow_zarr_spark import read_zarr_many
        from arrow_zarr_spark import fixtures

        p1 = fixtures.write_lat_lon_store()
        p3 = fixtures.write_string_store()
        with pytest.raises(ValueError, match="does not match"):
            read_zarr_many(spark, [p1, p3])

    def test_empty_paths_rejected(self, spark):
        from arrow_zarr_spark import read_zarr_many

        with pytest.raises(ValueError, match="at least one"):
            read_zarr_many(spark, [])
