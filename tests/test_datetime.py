"""datetime64 support: v3 extension dtype + v2 <M8 strings scan as
TimestampNTZ, chunk pruning works on timestamp predicates, fills and
round-trips behave."""

import datetime
import json

import numpy as np
import pytest

from arrow_zarr_spark.zarr import (
    ZarrFormatError,
    infer_store_arrays,
    open_store,
    write_store,
)
from arrow_zarr_spark.zarr.meta import (
    numpy_to_zarr_dtype,
    parse_array_meta,
    zarr_dtype_to_numpy,
)

HOURS = np.arange(
    "2024-01-01T00", "2024-01-02T00", np.timedelta64(1, "h"), dtype="M8[ns]"
)


def _dt_store(tmp_path, unit="ns"):
    path = str(tmp_path / f"dt_{unit}")
    write_store(
        path,
        arrays={"time": HOURS.astype(f"M8[{unit}]"), "val": np.arange(24.0)},
        chunk_shapes={"time": (7,), "val": (7,)},
        dimension_names={"time": ("time",), "val": ("time",)},
    )
    return path


class TestMeta:
    def test_dtype_map_round_trip(self):
        for unit in ("s", "ms", "us", "ns"):
            name = f"numpy.datetime64[{unit}]"
            assert zarr_dtype_to_numpy(name) == np.dtype(f"<M8[{unit}]")
            assert numpy_to_zarr_dtype(np.dtype(f"M8[{unit}]")) == name

    def test_unsupported_unit_rejected(self):
        with pytest.raises(ZarrFormatError, match="unit"):
            zarr_dtype_to_numpy("numpy.datetime64[D]")
        with pytest.raises(ZarrFormatError, match="unit"):
            numpy_to_zarr_dtype(np.dtype("M8[D]"))

    def test_extension_form_parses_and_serializes(self, tmp_path):
        path = _dt_store(tmp_path)
        store = open_store(path)
        doc = json.loads(store.get("time/zarr.json"))
        assert doc["data_type"] == {
            "name": "numpy.datetime64",
            "configuration": {"unit": "ns", "scale_factor": 1},
        }
        meta = parse_array_meta("time", store.get("time/zarr.json"))
        assert meta.zarr_dtype == "numpy.datetime64[ns]"
        assert meta.dtype == np.dtype("<M8[ns]")

    def test_scale_factor_rejected(self):
        doc = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": [4],
            "data_type": {
                "name": "numpy.datetime64",
                "configuration": {"unit": "ns", "scale_factor": 10},
            },
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": [2]},
            },
            "fill_value": 0,
            "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        }
        with pytest.raises(ZarrFormatError, match="scale_factor"):
            parse_array_meta("t", json.dumps(doc).encode())


class TestScan:
    @pytest.mark.parametrize("unit", ["s", "ms", "us", "ns"])
    def test_values_all_units(self, tmp_path, unit):
        path = _dt_store(tmp_path, unit)
        arrays = {a.meta.name: a for a in infer_store_arrays(open_store(path))}
        np.testing.assert_array_equal(
            arrays["time"].read_all(), HOURS.astype(f"M8[{unit}]")
        )

    def test_spark_schema_and_values(self, spark, tmp_path):
        path = _dt_store(tmp_path)
        df = spark.read.format("zarr").load(path)
        assert dict(df.dtypes)["time"] == "timestamp_ntz"
        rows = df.orderBy("time").collect()
        assert rows[0]["time"] == datetime.datetime(2024, 1, 1, 0, 0)
        assert rows[-1]["time"] == datetime.datetime(2024, 1, 1, 23, 0)
        assert [r["val"] for r in rows] == [float(i) for i in range(24)]

    def test_timestamp_filter_and_pruning(self, spark, tmp_path):
        path = _dt_store(tmp_path)
        df = spark.read.format("zarr").load(path)
        out = df.filter("time >= timestamp'2024-01-01 21:00:00'")
        assert out.count() == 3
        # chunk pruning: rows 21..23 live in the last of four chunks
        # (7,7,7,3); the predicate must prune the other three
        from arrow_zarr_spark.filters import ChunkPredicate, chunk_survives

        pred = ChunkPredicate(
            "time", "ge", np.datetime64("2024-01-01T21:00:00")
        )
        survives = [
            chunk_survives([pred], {"time": HOURS[i : i + 7]})
            for i in range(0, 24, 7)
        ]
        assert survives == [False, False, False, True]

    def test_in_filter_with_datetime(self, spark, tmp_path):
        path = _dt_store(tmp_path)
        df = spark.read.format("zarr").load(path)
        n = df.filter(
            "time IN (timestamp'2024-01-01 03:00:00', "
            "timestamp'2024-01-01 05:00:00')"
        ).count()
        assert n == 2

    def test_missing_chunk_fills(self, spark, tmp_path):
        path = str(tmp_path / "dtmiss")
        write_store(
            path,
            arrays={"time": HOURS, "val": np.arange(24.0)},
            chunk_shapes={"time": (7,), "val": (7,)},
            dimension_names={"time": ("time",), "val": ("time",)},
            skip_data=["time"],
        )
        arrays = {a.meta.name: a for a in infer_store_arrays(open_store(path))}
        got = arrays["time"].read_all()
        # fill_value 0 = epoch in the array's unit
        assert (got == np.datetime64(0, "ns")).all()


class TestV2:
    def test_v2_datetime_scan(self, spark, tmp_path):
        path = str(tmp_path / "v2dt")
        store = open_store(path)
        times = HOURS.astype("M8[s]")
        za = {
            "zarr_format": 2,
            "shape": [24],
            "chunks": [7],
            "dtype": "<M8[s]",
            "compressor": None,
            "fill_value": None,
            "order": "C",
            "filters": None,
        }
        store.set("time/.zarray", json.dumps(za).encode())
        store.set(
            "time/.zattrs",
            json.dumps({"_ARRAY_DIMENSIONS": ["time"]}).encode(),
        )
        for c in range(4):
            block = times[c * 7 : (c + 1) * 7]
            if len(block) < 7:  # v2 edge chunks are stored full-size
                block = np.pad(
                    block.view(np.int64), (0, 7 - len(block))
                ).view("M8[s]")
            store.set(f"time/{c}", block.tobytes())
        df = spark.read.format("zarr").load(path)
        assert dict(df.dtypes)["time"] == "timestamp_ntz"
        assert df.count() == 24
        assert (
            df.filter("time >= timestamp'2024-01-01 12:00:00'").count() == 12
        )


class TestWriterRoundTrip:
    def test_write_and_scan_timestamp_ntz(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        path = str(tmp_path / "wdt")
        src = spark.sql(
            "SELECT CAST(id AS LONG) AS k, "
            "timestamp_ntz'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS t "
            "FROM range(100)"
        )
        n = write_zarr(src, path, chunk_rows=32)
        assert n == 100
        back = spark.read.format("zarr").load(path)
        assert dict(back.dtypes)["t"] == "timestamp_ntz"
        a = sorted((r.k, r.t) for r in src.collect())
        b = sorted((r.k, r.t) for r in back.collect())
        assert a == b

    def test_append_keeps_datetime(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        path = str(tmp_path / "wdta")
        mk = (
            "SELECT CAST(id AS LONG) AS k, "
            "timestamp_ntz'2024-03-01 00:00:00' + "
            "make_interval(0,0,0,0,id,0,0) AS t FROM range({a}, {b})"
        )
        write_zarr(spark.sql(mk.format(a=0, b=40)), path, chunk_rows=16)
        write_zarr(
            spark.sql(mk.format(a=40, b=60)), path, chunk_rows=16,
            mode="append",
        )
        back = spark.read.format("zarr").load(path)
        assert back.count() == 60
        import datetime as dt

        last = back.orderBy("t", ascending=False).first()
        assert last.t == dt.datetime(2024, 3, 1, 0, 0) + dt.timedelta(
            hours=59
        )

    def test_null_timestamp_rejected(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        path = str(tmp_path / "wdtnull")
        src = spark.sql(
            "SELECT CAST(id AS LONG) AS k, "
            "CASE WHEN id = 5 THEN NULL ELSE timestamp_ntz'2024-01-01' END AS t "
            "FROM range(10)"
        )
        with pytest.raises(Exception, match="NULL"):
            write_zarr(src, path, chunk_rows=8)
