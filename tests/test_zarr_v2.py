"""Zarr v2 store reads — hand-built per the public v2 spec.

The reference rejects v2 metadata outright (``config.rs:242-247``);
reading it here is deliberate extra surface, because the bulk of
real-world zarr (xarray-written) is still v2. Stores below are
assembled by hand (.zgroup/.zarray/.zattrs JSON + numcodecs-framed
chunks), not via this repo's writer, so conformance is not circular.
"""

import json
import struct
import zlib

import numpy as np
import pytest

from arrow_zarr_spark.zarr import infer_store_arrays, open_store
from arrow_zarr_spark.zarr.codecs import _blosc_compress
from arrow_zarr_spark.zarr.meta import ZarrFormatError, parse_v2_array_meta


def _zarray(shape, chunks, dtype, compressor, fill=0, separator=None):
    doc = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": fill,
        "order": "C",
        "filters": None,
    }
    if separator:
        doc["dimension_separator"] = separator
    return json.dumps(doc).encode()


def _build_v2_store(root, compressor_kind="zlib"):
    """2x4 float64 'data' with lat/x coords, xarray-style attrs."""
    store = open_store(str(root))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())

    data = np.arange(8.0).reshape(2, 4)
    lat = np.array([10.0, 20.0])
    lon = np.array([1.0, 2.0, 3.0, 4.0])

    def pack(arr):
        raw = np.ascontiguousarray(arr, dtype="<f8").tobytes()
        if compressor_kind == "zlib":
            return zlib.compress(raw, 1)
        if compressor_kind == "blosc":
            return _blosc_compress(raw, typesize=8, cname="lz4", shuffle="shuffle")
        return raw

    comp = {
        "zlib": {"id": "zlib", "level": 1},
        "blosc": {
            "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
            "blocksize": 0,
        },
        "raw": None,
    }[compressor_kind]

    store.set("data/.zarray", _zarray((2, 4), (1, 2), "<f8", comp))
    store.set(
        "data/.zattrs",
        json.dumps({"_ARRAY_DIMENSIONS": ["lat", "lon"]}).encode(),
    )
    for i in range(2):
        for j in range(2):
            block = data[i : i + 1, 2 * j : 2 * j + 2]
            store.set(f"data/{i}.{j}", pack(block))
    # coordinate chunks must match the data array's chunking per axis
    # (the reference's resolve_vector contract, kept here)
    store.set("lat/.zarray", _zarray((2,), (1,), "<f8", comp))
    store.set(
        "lat/.zattrs", json.dumps({"_ARRAY_DIMENSIONS": ["lat"]}).encode()
    )
    store.set("lat/0", pack(lat[:1]))
    store.set("lat/1", pack(lat[1:]))
    store.set("lon/.zarray", _zarray((4,), (2,), "<f8", comp))
    store.set(
        "lon/.zattrs", json.dumps({"_ARRAY_DIMENSIONS": ["lon"]}).encode()
    )
    store.set("lon/0", pack(lon[:2]))
    store.set("lon/1", pack(lon[2:]))
    return data


@pytest.mark.parametrize("kind", ["zlib", "blosc", "raw"])
def test_v2_store_reads(tmp_path, kind):
    data = _build_v2_store(tmp_path / "s", kind)
    arrays = {a.meta.name: a for a in infer_store_arrays(open_store(str(tmp_path / "s")))}
    assert set(arrays) == {"data", "lat", "lon"}
    np.testing.assert_array_equal(arrays["data"].read_all(), data)
    assert arrays["data"].meta.dimension_names == ("lat", "lon")
    assert arrays["data"].meta.key_encoding == "v2"


def test_v2_missing_chunk_fill(tmp_path):
    store = open_store(str(tmp_path / "s"))
    store.set("v/.zarray", _zarray((4,), (2,), "<i8", None, fill=7))
    store.set("v/0", np.array([1, 2], dtype="<i8").tobytes())
    # chunk "1" absent -> fill value
    arr = infer_store_arrays(store)[0]
    assert arr.read_all().tolist() == [1, 2, 7, 7]


def test_v2_big_endian_dtype(tmp_path):
    store = open_store(str(tmp_path / "s"))
    store.set("v/.zarray", _zarray((3,), (3,), ">i4", None))
    store.set("v/0", np.array([1, 2, 3], dtype=">i4").tobytes())
    arr = infer_store_arrays(store)[0]
    assert arr.read_all().tolist() == [1, 2, 3]


def test_v2_slash_separator(tmp_path):
    store = open_store(str(tmp_path / "s"))
    store.set(
        "v/.zarray", _zarray((4,), (2,), "<i8", None, separator="/")
    )
    store.set("v/0", np.array([1, 2], dtype="<i8").tobytes())
    store.set("v/1", np.array([3, 4], dtype="<i8").tobytes())
    arr = infer_store_arrays(store)[0]
    assert arr.read_all().tolist() == [1, 2, 3, 4]


def test_v2_lz4_numcodecs_frame(tmp_path):
    import pyarrow as pa

    raw = np.arange(4, dtype="<i8").tobytes()
    frame = struct.pack("<I", len(raw)) + pa.Codec("lz4_raw").compress(
        raw, asbytes=True
    )
    store = open_store(str(tmp_path / "s"))
    store.set("v/.zarray", _zarray((4,), (4,), "<i8", {"id": "lz4"}))
    store.set("v/0", frame)
    arr = infer_store_arrays(store)[0]
    assert arr.read_all().tolist() == [0, 1, 2, 3]


def _v2_doc(**over):
    doc = {
        "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
        "compressor": None, "fill_value": 0, "order": "C", "filters": None,
    }
    doc.update(over)
    return json.dumps(doc).encode()


def test_v2_fortran_order_store_decodes(tmp_path):
    """order: 'F' chunks store column-major bytes — equivalently the
    C-order bytes of the reversed-dims array, which is exactly the v3
    transpose codec; values must come back identical to a C store."""
    from arrow_zarr_spark.zarr import open_array

    store = open_store(str(tmp_path))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    data = np.arange(24.0).reshape(4, 6)
    store.set(
        "f/.zarray",
        _v2_doc(
            shape=[4, 6], chunks=[2, 3], order="F",
            compressor={"id": "zlib", "level": 1},
        ),
    )
    for i in range(2):
        for j in range(2):
            block = data[2 * i : 2 * i + 2, 3 * j : 3 * j + 3]
            store.set(
                f"f/{i}.{j}",
                zlib.compress(np.asfortranarray(block).tobytes(order="F"), 1),
            )
    arr = open_array(store, "f")
    np.testing.assert_array_equal(arr.read_all(), data)


def test_v2_delta_filter_decodes(tmp_path):
    """numcodecs Delta: stored values are successive differences;
    typical for monotonically increasing coordinates."""
    from arrow_zarr_spark.zarr import open_array

    store = open_store(str(tmp_path))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    vals = np.array([100, 103, 109, 110, 140, 141], dtype="<i8")
    store.set(
        "t/.zarray",
        _v2_doc(
            shape=[6], chunks=[3], dtype="<i8",
            filters=[{"id": "delta", "dtype": "<i8"}],
            compressor={"id": "zlib", "level": 1},
        ),
    )
    for c in range(2):
        block = vals[3 * c : 3 * c + 3]
        diffs = np.diff(block, prepend=block[:1] * 0)  # [b0, b1-b0, b2-b1]
        diffs[0] = block[0]
        store.set(f"t/{c}", zlib.compress(diffs.astype("<i8").tobytes(), 1))
    arr = open_array(store, "t")
    np.testing.assert_array_equal(arr.read_all(), vals)


def test_v2_shuffle_filter_decodes(tmp_path):
    from arrow_zarr_spark.zarr import open_array
    from arrow_zarr_spark.zarr.codecs import _byte_shuffle

    store = open_store(str(tmp_path))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    vals = np.linspace(0.0, 5.0, 8).astype("<f8")
    store.set(
        "s/.zarray",
        _v2_doc(
            shape=[8], chunks=[8],
            filters=[{"id": "shuffle", "elementsize": 8}],
            compressor={"id": "zlib", "level": 1},
        ),
    )
    store.set("s/0", zlib.compress(_byte_shuffle(vals.tobytes(), 8), 1))
    arr = open_array(store, "s")
    np.testing.assert_array_equal(arr.read_all(), vals)


def test_v2_fortran_plus_delta_combined(tmp_path):
    """F order + delta compose: delta runs over the F-order flattening
    (numcodecs Delta ravels with order='A'), then the transpose undoes
    the layout."""
    from arrow_zarr_spark.zarr import open_array

    store = open_store(str(tmp_path))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    data = np.arange(12, dtype="<i4").reshape(3, 4) * 7
    store.set(
        "fd/.zarray",
        _v2_doc(
            shape=[3, 4], chunks=[3, 4], dtype="<i4", order="F",
            filters=[{"id": "delta", "dtype": "<i4"}],
        ),
    )
    flat = data.ravel(order="F")
    diffs = np.empty_like(flat)
    diffs[0] = flat[0]
    diffs[1:] = flat[1:] - flat[:-1]
    store.set("fd/0.0", diffs.astype("<i4").tobytes())
    arr = open_array(store, "fd")
    np.testing.assert_array_equal(arr.read_all(), data)


def test_v2_unsupported_filter_rejected():
    with pytest.raises(ZarrFormatError, match="quantize"):
        parse_v2_array_meta(
            "x", _v2_doc(filters=[{"id": "quantize", "digits": 3}])
        )


def test_v2_delta_astype_mismatch_rejected():
    with pytest.raises(ZarrFormatError, match="astype"):
        parse_v2_array_meta(
            "x",
            _v2_doc(
                dtype="<i8",
                filters=[{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
            ),
        )


def test_v2_invalid_order_rejected():
    with pytest.raises(ZarrFormatError, match="order"):
        parse_v2_array_meta("x", _v2_doc(order="K"))


def test_spark_scan_v2_store(spark, tmp_path):
    """Full engine path: v2 discovery, xarray dimension names driving
    coordinate broadcast, and filter pushdown."""
    data = _build_v2_store(tmp_path / "s", "blosc")
    df = spark.read.format("zarr").load(str(tmp_path / "s"))
    rows = df.collect()
    assert len(rows) == 8
    got = {(r.lat, r.lon, r.data) for r in rows}
    expect = {
        (lat, lon, float(data[i, j]))
        for i, lat in enumerate([10.0, 20.0])
        for j, lon in enumerate([1.0, 2.0, 3.0, 4.0])
    }
    assert got == expect
    assert df.filter("lat > 15").count() == 4


def test_v2_coord_chunking_may_differ_from_data(tmp_path, spark):
    """Real xarray v2 stores write coords as ONE chunk while data is
    chunked finer — the v2 path reads such coords by range (v3 keeps
    the reference's strict chunk-match contract)."""
    store = open_store(str(tmp_path / "s"))
    store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    data = np.arange(8.0).reshape(2, 4)
    store.set("data/.zarray", _zarray((2, 4), (1, 2), "<f8", None))
    store.set(
        "data/.zattrs",
        json.dumps({"_ARRAY_DIMENSIONS": ["lat", "lon"]}).encode(),
    )
    for i in range(2):
        for j in range(2):
            store.set(
                f"data/{i}.{j}",
                np.ascontiguousarray(
                    data[i : i + 1, 2 * j : 2 * j + 2], dtype="<f8"
                ).tobytes(),
            )
    # coords: single chunk each, NOT matching data chunking
    store.set("lat/.zarray", _zarray((2,), (2,), "<f8", None))
    store.set("lat/.zattrs", json.dumps({"_ARRAY_DIMENSIONS": ["lat"]}).encode())
    store.set("lat/0", np.array([10.0, 20.0], dtype="<f8").tobytes())
    store.set("lon/.zarray", _zarray((4,), (4,), "<f8", None))
    store.set("lon/.zattrs", json.dumps({"_ARRAY_DIMENSIONS": ["lon"]}).encode())
    store.set("lon/0", np.array([1.0, 2.0, 3.0, 4.0], dtype="<f8").tobytes())

    df = spark.read.format("zarr").load(str(tmp_path / "s"))
    got = {(r.lat, r.lon, r.data) for r in df.collect()}
    expect = {
        (lat, lon, float(data[i, j]))
        for i, lat in enumerate([10.0, 20.0])
        for j, lon in enumerate([1.0, 2.0, 3.0, 4.0])
    }
    assert got == expect
