"""r11: the span-partition scan tier (datasource.py) — past
PLAN_DRIVER_CELLS_MAX (or the plan_cells_max option) the planner never
materializes the cell list: partitions carry contiguous cell-ordinal
SPANS (O(n_partitions) driver memory however large the grid) and the
explicit tier's planning-time static pruning runs EXECUTOR-side per
task, against worker-cached bounds, with identical interval_possible
semantics. These tests force the tier with a cap of 0 and pin span ==
explicit on rows, pruning decisions, and split semantics."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

from arrow_zarr_spark.datasource import ZarrDataSource
from arrow_zarr_spark.io import write_zarr
from arrow_zarr_spark.zarr import ChunkPlan, open_store, write_store
from arrow_zarr_spark.zarr.array import infer_store_arrays


def _reader(path, filters=(), **options):
    ds = ZarrDataSource({"path": path, **options})
    reader = ds.reader(ds.schema())
    list(reader.pushFilters(list(filters)))
    return reader


def _span_surviving_cells(reader):
    """Every cell the span tier would actually read, across all its
    partitions (executor-side pruning included)."""
    out = []
    for p in reader.partitions():
        assert p.cells is None and p.spans is not None
        out.extend(reader._span_cells(p.spans))
    return out


def _explicit_surviving_cells(reader):
    out = []
    for p in reader.partitions():
        assert p.spans is None
        out.extend(p.cells)
    return out


class TestCellOfOrdinal:
    def test_roundtrip_matches_enumeration(self, spark, tmp_path):
        import numpy as np

        path = str(tmp_path / "ord")
        write_store(
            path,
            arrays={"d": np.arange(210.0).reshape(5, 6, 7)},
            chunk_shapes={"d": (2, 3, 2)},
            dimension_names={"d": ("a", "b", "c")},
        )
        plan = ChunkPlan(infer_store_arrays(open_store(path)))
        cells = plan.cells()
        for i, cell in enumerate(cells):
            assert plan.cell_of_ordinal(i) == cell
            assert plan.cell_ordinal(cell) == i


class TestSpanPruningMatchesPlanning:
    """The executor-side static prune must keep EXACTLY the cells the
    explicit tier's planning-time prune keeps — same bound sources,
    same validation, same conservatism."""

    def test_inline_stats(self, spark, tmp_path):
        path = str(tmp_path / "sp1")
        df = spark.range(0, 1000, 1, 4).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=100)
        for filters in (
            [],
            [LessThan(("k",), 250)],
            [GreaterThan(("k",), 149), LessThan(("k",), 350)],
            [EqualTo(("k",), 555)],
        ):
            want = _explicit_surviving_cells(_reader(path, filters))
            got = _span_surviving_cells(
                _reader(path, filters, plan_cells_max="0")
            )
            assert got == want, filters

    def test_sidecar_stats(self, spark, tmp_path, monkeypatch):
        import arrow_zarr_spark.io as io_mod
        from arrow_zarr_spark.zarr.stats import is_sidecar_marker

        monkeypatch.setattr(io_mod, "STATS_MAX_OBJECTS", 4)
        path = str(tmp_path / "sp2")
        df = spark.range(0, 1000, 1, 4).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=100)  # 10 objects -> sidecar
        meta = infer_store_arrays(open_store(path))[0].meta
        assert is_sidecar_marker(meta.attributes["arrow_zarr_spark:chunk_stats"])
        for filters in ([LessThan(("k",), 250)], [EqualTo(("k",), 999)]):
            want = _explicit_surviving_cells(_reader(path, filters))
            got = _span_surviving_cells(
                _reader(path, filters, plan_cells_max="0")
            )
            assert got == want and 0 < len(got) < 10, filters

    def test_coordinate_bounds_on_grid(self, spark, tmp_path):
        import numpy as np

        path = str(tmp_path / "sp3")
        write_store(
            path,
            arrays={
                "temp": np.arange(48.0).reshape(6, 8),
                "lat": np.linspace(10, 15, 6),
                "lon": np.linspace(100, 107, 8),
            },
            chunk_shapes={"temp": (2, 3), "lat": (2,), "lon": (3,)},
            dimension_names={
                "temp": ("lat", "lon"),
                "lat": ("lat",),
                "lon": ("lon",),
            },
        )
        filters = [LessThan(("lat",), 12.0), GreaterThan(("lon",), 104.5)]
        want = _explicit_surviving_cells(_reader(path, filters))
        got = _span_surviving_cells(
            _reader(path, filters, plan_cells_max="0")
        )
        assert got == want and 0 < len(got) < 12

    def test_datetime_stats(self, spark, tmp_path):
        path = str(tmp_path / "sp4")
        df = spark.range(0, 400, 1, 2).select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(mins=F.col("id"))
            ).alias("ts"),
        )
        write_zarr(df, path, chunk_rows=100)
        import datetime

        cut = datetime.datetime(2024, 1, 1, 2, 0, 0)
        filters = [LessThan(("ts",), cut)]
        want = _explicit_surviving_cells(_reader(path, filters))
        got = _span_surviving_cells(
            _reader(path, filters, plan_cells_max="0")
        )
        assert got == want and 0 < len(got) < 4

    def test_stale_stats_never_prune(self, spark, tmp_path):
        import json

        path = str(tmp_path / "sp5")
        df = spark.range(0, 600, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=100)
        store = open_store(path)
        # poison BOTH metadata locations (array doc + consolidated
        # root) with a length-mismatched list — stale stats must be
        # ignored by both tiers identically
        for key in ("k/zarr.json",):
            doc = json.loads(store.get(key))
            doc["attributes"]["arrow_zarr_spark:chunk_stats"] = [[0, 1]]
            store.set(key, json.dumps(doc).encode())
        root = json.loads(store.get("zarr.json"))
        root["consolidated_metadata"]["metadata"]["k"]["attributes"][
            "arrow_zarr_spark:chunk_stats"
        ] = [[0, 1]]
        store.set("zarr.json", json.dumps(root).encode())
        filters = [LessThan(("k",), 50)]
        want = _explicit_surviving_cells(_reader(path, filters))
        got = _span_surviving_cells(
            _reader(path, filters, plan_cells_max="0")
        )
        assert got == want == [(i,) for i in range(6)]  # kept: stale


class TestSpanSplitSemantics:
    def test_auto_spans_cover_grid_once(self, spark, tmp_path):
        path = str(tmp_path / "ss1")
        df = spark.range(0, 1000, 1, 4).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=10)  # 100 cells
        reader = _reader(path, plan_cells_max="0")
        parts = reader.partitions()
        covered = []
        for p in parts:
            for s, e in p.spans:
                covered.extend(range(s, e))
        assert covered == list(range(100))

    def test_num_partitions_ceil_split_with_empty_tails(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "ss2")
        df = spark.range(0, 100, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=10)  # 10 cells
        reader = _reader(path, plan_cells_max="0", num_partitions="4")
        parts = reader.partitions()
        assert len(parts) == 4
        sizes = [sum(e - s for s, e in p.spans) for p in parts]
        assert sizes == [3, 3, 3, 1]  # ceil(10/4)=3, short tail
        reader = _reader(path, plan_cells_max="0", num_partitions="20")
        parts = reader.partitions()
        assert len(parts) == 20
        sizes = [sum(e - s for s, e in p.spans) for p in parts]
        assert sizes == [1] * 10 + [0] * 10  # reference empty tails

    def test_partition_count_cap(self, spark, tmp_path, monkeypatch):
        import arrow_zarr_spark.datasource as ds_mod

        path = str(tmp_path / "ss3")
        df = spark.range(0, 1000, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=10)  # 100 cells
        monkeypatch.setattr(ds_mod, "SPAN_PARTITIONS_MAX", 7)
        reader = _reader(path, plan_cells_max="0")
        parts = reader.partitions()
        assert len(parts) <= 7
        covered = [o for p in parts for s, e in p.spans for o in range(s, e)]
        assert covered == list(range(100))


class TestSpanEndToEnd:
    """Through the real spark.read path: the plan_cells_max option
    reaches the planning worker, so the span tier drives the whole
    scan — rows must equal the explicit tier's, filtered and not."""

    def test_table_scan_rows_match(self, spark, tmp_path):
        path = str(tmp_path / "se1")
        df = spark.range(0, 2000, 1, 4).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
        write_zarr(df, path, chunk_rows=128)
        want = sorted(
            tuple(r)
            for r in spark.read.format("zarr").load(path).collect()
        )
        got = sorted(
            tuple(r)
            for r in spark.read.format("zarr")
            .option("plan_cells_max", "0")
            .load(path)
            .collect()
        )
        assert got == want and len(got) == 2000

    def test_filtered_scan_rows_match(self, spark, tmp_path):
        path = str(tmp_path / "se2")
        df = spark.range(0, 2000, 1, 4).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=128)
        got = (
            spark.read.format("zarr")
            .option("plan_cells_max", "0")
            .load(path)
            .filter("k >= 1900")
            .collect()
        )
        assert sorted(r.k for r in got) == list(range(1900, 2000))

    def test_grid_coordinate_filter_rows_match(self, spark, tmp_path):
        import numpy as np

        path = str(tmp_path / "se3")
        write_store(
            path,
            arrays={
                "temp": np.arange(48.0).reshape(6, 8),
                "lat": np.linspace(10, 15, 6),
                "lon": np.linspace(100, 107, 8),
            },
            chunk_shapes={"temp": (2, 3), "lat": (2,), "lon": (3,)},
            dimension_names={
                "temp": ("lat", "lon"),
                "lat": ("lat",),
                "lon": ("lon",),
            },
        )
        q = lambda extra: sorted(
            tuple(r)
            for r in extra(
                spark.read.format("zarr")
                .option("plan_cells_max", "0")
                .load(path)
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in spark.read.format("zarr")
            .load(path)
            .filter("lat < 12 AND lon > 104.5")
            .collect()
        )
        assert q(lambda d: d.filter("lat < 12 AND lon > 104.5")) == want
        assert len(want) == 6

    def test_sharded_store(self, spark, tmp_path):
        path = str(tmp_path / "se4")
        df = spark.range(0, 1000, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=50, shard_chunks=5)
        got = (
            spark.read.format("zarr")
            .option("plan_cells_max", "0")
            .load(path)
            .filter("k < 100")
            .collect()
        )
        assert sorted(r.k for r in got) == list(range(100))

    def test_v2_store(self, spark, tmp_path):
        path = str(tmp_path / "se5")
        df = spark.range(0, 500, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=100, zarr_format=2)
        got = (
            spark.read.format("zarr")
            .option("plan_cells_max", "0")
            .load(path)
            .collect()
        )
        assert sorted(r.k for r in got) == list(range(500))

    def test_num_partitions_end_to_end(self, spark, tmp_path):
        path = str(tmp_path / "se6")
        df = spark.range(0, 600, 1, 2).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=100)
        got = (
            spark.read.format("zarr")
            .option("plan_cells_max", "0")
            .option("num_partitions", "4")
            .load(path)
        )
        assert got.rdd.getNumPartitions() == 4
        assert sorted(r.k for r in got.collect()) == list(range(600))


class TestDefaultCutoverEngages:
    def test_past_cap_grid_plans_as_spans_by_default(
        self, spark, tmp_path
    ):
        """No option, real constant: a store whose chunk grid exceeds
        PLAN_DRIVER_CELLS_MAX must plan via spans — the planner never
        builds the cell list. The store is METADATA-declared (shape
        grown after a tiny write; absent chunks are fill), because
        writing 5M chunk objects just to test planning would miss the
        point."""
        import json
        import time

        from arrow_zarr_spark.datasource import (
            PLAN_DRIVER_CELLS_MAX,
            SPAN_PARTITIONS_MAX,
        )

        path = str(tmp_path / "huge")
        df = spark.range(0, 4, 1, 1).select(F.col("id").alias("k"))
        write_zarr(df, path, chunk_rows=1, stats=False)
        n_declared = PLAN_DRIVER_CELLS_MAX + 1_000_000
        store = open_store(path)
        doc = json.loads(store.get("k/zarr.json"))
        doc["shape"] = [n_declared]
        store.set("k/zarr.json", json.dumps(doc).encode())
        root = json.loads(store.get("zarr.json"))
        root["consolidated_metadata"]["metadata"]["k"]["shape"] = [
            n_declared
        ]
        store.set("zarr.json", json.dumps(root).encode())

        t0 = time.perf_counter()
        reader = _reader(path)  # no plan_cells_max option
        parts = reader.partitions()
        dt = time.perf_counter() - t0
        assert all(p.cells is None and p.spans is not None for p in parts)
        assert len(parts) <= SPAN_PARTITIONS_MAX
        assert (
            sum(e - s for p in parts for s, e in p.spans) == n_declared
        )
        # planning a 5M-cell grid must stay metadata-priced: the
        # explicit tier's 5M-tuple enumeration took seconds and
        # hundreds of MB; spans are sub-second
        assert dt < 5.0
        # the first cells still read correctly through a span task
        first = parts[0]
        sub = [(0, 4)]
        rows = []
        for batch in reader.read(
            type(first)(None, spans=sub)
        ):
            rows.extend(batch.column(0).to_pylist())
        assert rows == [0, 1, 2, 3]
