"""Zarr v3 sharding (sharding_indexed): golden decode, round-trips,
missing inner chunks, and a Spark scan over a sharded store.

The reference reads sharded stores transparently through zarrs, so a
store a reference user scans today must decode here too. The golden
shard below is hand-assembled byte-by-byte from the public sharding
spec (inner chunks + uint64 [offset, nbytes] index + crc32c), not via
this repo's own encoder.
"""

import json
import struct

import numpy as np
import pytest

from arrow_zarr_spark.zarr.codecs import (
    _crc32c,
    decode_chunk,
    encode_chunk,
)
from arrow_zarr_spark.zarr.meta import ArrayMeta, ZarrFormatError


def _meta(shape, chunk, zarr_dtype, codecs, fill_value=0):
    return ArrayMeta(
        name="x",
        shape=tuple(shape),
        chunk_shape=tuple(chunk),
        zarr_dtype=zarr_dtype,
        fill_value=fill_value,
        codecs=codecs,
    )


def _shard_codecs(inner_chunk, inner_codecs=None, index_location="end"):
    return [
        {
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": list(inner_chunk),
                "codecs": inner_codecs
                or [{"name": "bytes", "configuration": {"endian": "little"}}],
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "crc32c"},
                ],
                "index_location": index_location,
            },
        }
    ]


def test_crc32c_known_vector():
    assert _crc32c(b"123456789") == 0xE3069283


def test_golden_handmade_shard_decodes():
    """4x4 int32 shard of 2x2 inner chunks; inner chunk (1,0) missing.
    Assembled by hand: raw little-endian inner chunks, then the
    16-byte-per-chunk index (+crc32c) at the end."""
    c00 = struct.pack("<4i", 0, 1, 4, 5)      # rows 0-1, cols 0-1
    c01 = struct.pack("<4i", 2, 3, 6, 7)      # rows 0-1, cols 2-3
    c11 = struct.pack("<4i", 10, 11, 14, 15)  # rows 2-3, cols 2-3
    body = c00 + c01 + c11
    M = (1 << 64) - 1
    index = struct.pack(
        "<8Q", 0, 16, 16, 16, M, M, 32, 16
    )  # cells (0,0),(0,1),(1,0)=missing,(1,1) in C order
    shard = body + index + struct.pack("<I", _crc32c(index))

    meta = _meta((4, 4), (4, 4), "int32", _shard_codecs((2, 2)), fill_value=-1)
    out = decode_chunk(meta, shard)
    expect = np.array(
        [
            [0, 1, 2, 3],
            [4, 5, 6, 7],
            [-1, -1, 10, 11],
            [-1, -1, 14, 15],
        ],
        dtype=np.int32,
    )
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("index_location", ["start", "end"])
@pytest.mark.parametrize(
    "inner_codecs",
    [
        None,
        [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "zstd", "configuration": {"level": 3}},
        ],
        [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "blosc", "configuration": {"cname": "lz4"}},
        ],
    ],
)
def test_shard_roundtrip(index_location, inner_codecs):
    meta = _meta(
        (8, 12),
        (8, 12),
        "float64",
        _shard_codecs((4, 3), inner_codecs, index_location),
    )
    arr = np.arange(96.0).reshape(8, 12)
    np.testing.assert_array_equal(decode_chunk(meta, encode_chunk(meta, arr)), arr)


def test_shard_requires_divisible_inner_shape():
    meta = _meta((4, 4), (4, 4), "int32", _shard_codecs((3, 2)))
    with pytest.raises(ZarrFormatError, match="divisible"):
        encode_chunk(meta, np.zeros((4, 4), dtype=np.int32))


def test_corrupted_shard_index_crc_rejected():
    """A flipped bit in the shard index must fail the crc32c check
    loudly, never decode a garbage offset table (VERDICT r4 #1)."""
    c00 = struct.pack("<4i", 1, 2, 3, 4)
    index = struct.pack("<2Q", 0, 16)
    good = c00 + index + struct.pack("<I", _crc32c(index))
    meta = _meta((2, 2), (2, 2), "int32", _shard_codecs((2, 2)))
    np.testing.assert_array_equal(
        decode_chunk(meta, good), np.array([[1, 2], [3, 4]], dtype=np.int32)
    )
    bad_index = bytes([index[0] ^ 0x01]) + index[1:]
    bad = c00 + bad_index + struct.pack("<I", _crc32c(index))
    with pytest.raises(ZarrFormatError, match="index checksum mismatch"):
        decode_chunk(meta, bad)


def test_corrupted_crc32c_chunk_rejected():
    """The standalone crc32c codec must verify its trailer on decode:
    the stale 'no crc32c impl' skip silently accepted corruption."""
    codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "crc32c"},
    ]
    meta = _meta((4,), (4,), "int32", codecs)
    arr = np.array([7, 8, 9, 10], dtype=np.int32)
    blob = encode_chunk(meta, arr)
    np.testing.assert_array_equal(decode_chunk(meta, blob), arr)
    corrupted = bytes([blob[0] ^ 0x80]) + blob[1:]
    with pytest.raises(ZarrFormatError, match="checksum mismatch"):
        decode_chunk(meta, corrupted)


def test_shard_truncated_inner_range_rejected():
    meta = _meta((2, 2), (2, 2), "int32", _shard_codecs((2, 2)))
    index = struct.pack("<2Q", 0, 999)  # nbytes overruns the shard
    shard = b"\x00" * 16 + index + struct.pack("<I", _crc32c(index))
    with pytest.raises(ZarrFormatError, match="outside"):
        decode_chunk(meta, shard)


def test_trailing_compressor_after_sharding_roundtrips():
    """Spec-valid: bytes→bytes codecs may compress the whole shard
    object after sharding_indexed (self-sized codecs only)."""
    codecs = _shard_codecs((2, 2)) + [
        {"name": "zstd", "configuration": {"level": 1}}
    ]
    meta = _meta((4, 4), (4, 4), "int32", codecs)
    arr = np.arange(16, dtype=np.int32).reshape(4, 4)
    np.testing.assert_array_equal(decode_chunk(meta, encode_chunk(meta, arr)), arr)


def test_transpose_before_sharding_rejected_clearly():
    codecs = [
        {"name": "transpose", "configuration": {"order": [1, 0]}}
    ] + _shard_codecs((2, 2))
    meta = _meta((4, 4), (4, 4), "int32", codecs)
    with pytest.raises(ZarrFormatError, match="outermost"):
        decode_chunk(meta, b"\x00" * 64)


def test_big_endian_shard_index_decodes():
    """A conformant writer may store the index big-endian; the bytes
    index codec's endian configuration must be honored."""
    c0 = struct.pack("<2i", 7, 9)
    index_be = np.array([[0, 8]], dtype=">u8").tobytes()
    shard = c0 + index_be + struct.pack("<I", _crc32c(index_be))
    codecs = [
        {
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [2],
                "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "big"}},
                    {"name": "crc32c"},
                ],
                "index_location": "end",
            },
        }
    ]
    meta = _meta((2,), (2,), "int32", codecs)
    np.testing.assert_array_equal(
        decode_chunk(meta, shard), np.array([7, 9], dtype=np.int32)
    )


def test_spark_scan_sharded_store(spark, tmp_path):
    """Full engine path over a sharded store: the chunk grid is the
    SHARD grid; every shard decodes through the index."""
    from arrow_zarr_spark.zarr.meta import numpy_to_zarr_dtype
    from arrow_zarr_spark.zarr.store import open_store
    from arrow_zarr_spark.zarr.writer import (
        write_array_data,
        write_root_group,
    )

    path = str(tmp_path / "s")
    store = open_store(path)
    write_root_group(store)
    data = np.arange(240.0).reshape(12, 20)
    meta = ArrayMeta(
        name="temp",
        shape=(12, 20),
        chunk_shape=(6, 10),  # 4 shards
        zarr_dtype=numpy_to_zarr_dtype(np.dtype("float64")),
        fill_value=0,
        codecs=_shard_codecs(
            (3, 5),
            [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "zstd", "configuration": {"level": 3}},
            ],
        ),
        dimension_names=("y", "x"),
    )
    store.set(
        "temp/zarr.json", json.dumps(meta.to_json()).encode()
    )
    write_array_data(store, meta, data)

    df = spark.read.format("zarr").load(path)
    rows = df.collect()
    assert len(rows) == 240
    assert sorted(r.temp for r in rows) == sorted(data.ravel().tolist())
    # pushdown still prunes on sharded stores
    n = df.filter("temp < 50").count()
    assert n == 50


def test_write_store_sharded_roundtrip(spark, tmp_path):
    """Public writer path: shard_shapes wraps the chunk chain in
    sharding_indexed; the scan reads it back value-for-value."""
    from arrow_zarr_spark.zarr.writer import write_store

    data = np.arange(48.0).reshape(6, 8)
    write_store(
        str(tmp_path / "s"),
        arrays={
            "temp": data,
            "lat": np.linspace(10, 15, 6),
            "lon": np.linspace(100, 107, 8),
        },
        chunk_shapes={"temp": (2, 2), "lat": (2,), "lon": (2,)},
        shard_shapes={"temp": (4, 4), "lat": (4,), "lon": (4,)},
        dimension_names={
            "temp": ("lat", "lon"),
            "lat": ("lat",),
            "lon": ("lon",),
        },
        compression="blosc-lz4",
    )
    df = spark.read.format("zarr").load(str(tmp_path / "s"))
    rows = df.collect()
    assert len(rows) == 48
    assert sorted(r.temp for r in rows) == sorted(data.ravel().tolist())


def test_create_array_rejects_misaligned_shard():
    from arrow_zarr_spark.zarr.store import open_store
    from arrow_zarr_spark.zarr.writer import create_array
    import tempfile

    store = open_store(tempfile.mkdtemp())
    with pytest.raises(ZarrFormatError, match="multiple"):
        create_array(
            store, "x", shape=(8,), chunk_shape=(3,), dtype="int64",
            shard_shape=(8,),
        )


# ---------------------------------------------------------------------------
# inner-chunk pruning: partial shard reads driven by the filter row mask
# ---------------------------------------------------------------------------


class _CountingLocalStore:
    """LocalStore wrapper recording every access — the observable for
    'the pruned read never fetched the whole shard object'."""

    def __init__(self, root):
        from arrow_zarr_spark.zarr.store import LocalStore

        self._inner = LocalStore(root)
        self.full_gets = []
        self.range_reads = []  # (key, offset_or_'suffix', length)

    def get(self, key):
        self.full_gets.append(key)
        return self._inner.get(key)

    def get_range(self, key, offset, length):
        self.range_reads.append((key, offset, length))
        return self._inner.get_range(key, offset, length)

    def get_suffix(self, key, length):
        self.range_reads.append((key, "suffix", length))
        return self._inner.get_suffix(key, length)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _sharded_array(tmp_path, shape=(12, 20), shard=(12, 20), inner=(3, 5)):
    """One float64 array 'temp' stored as a single shard of inner
    chunks; returns (counting_store, meta, data)."""
    import os

    from arrow_zarr_spark.zarr.meta import numpy_to_zarr_dtype
    from arrow_zarr_spark.zarr.store import LocalStore
    from arrow_zarr_spark.zarr.writer import write_array_data, write_root_group

    root = str(tmp_path / "pstore")
    plain = LocalStore(root)
    write_root_group(plain)
    data = np.arange(float(np.prod(shape))).reshape(shape)
    meta = ArrayMeta(
        name="temp",
        shape=shape,
        chunk_shape=shard,
        zarr_dtype=numpy_to_zarr_dtype(np.dtype("float64")),
        fill_value=-1.0,
        codecs=_shard_codecs(
            inner,
            [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "zstd", "configuration": {"level": 3}},
            ],
        ),
        dimension_names=("y", "x"),
    )
    plain.set("temp/zarr.json", json.dumps(meta.to_json()).encode())
    write_array_data(plain, meta, data)
    return _CountingLocalStore(root), meta, data


class TestPartialShardReads:
    def test_masked_read_fetches_only_selected_inner_chunks(self, tmp_path):
        import os

        from arrow_zarr_spark.zarr.array import ZarrArray

        store, meta, data = _sharded_array(tmp_path)
        arr = ZarrArray(store, meta)
        # select only rows 0-2 (the first row of inner chunks: 4 of 16)
        mask = np.zeros((12, 20), dtype=bool)
        mask[:3, :] = True
        out = arr.read_chunk((0, 0), sel_mask=mask)
        # mask-True region is exact; masked-out rows are unspecified
        np.testing.assert_array_equal(out[:3, :], data[:3, :])
        # the whole shard object was never fetched
        key = "temp/c/0/0"
        assert key not in store.full_gets
        reads = [r for r in store.range_reads if r[0] == key]
        assert reads, "expected ranged reads against the shard"
        # fetched strictly less than the object (index + 4 inner chunks)
        obj_size = os.path.getsize(tmp_path / "pstore" / "temp" / "c" / "0" / "0")
        fetched = sum(r[2] for r in reads)
        assert fetched < obj_size

    def test_masked_read_matches_full_decode_on_selected_rows(self, tmp_path):
        from arrow_zarr_spark.zarr.array import ZarrArray

        store, meta, data = _sharded_array(tmp_path)
        arr = ZarrArray(store, meta)
        rng = np.random.default_rng(7)
        for _ in range(5):
            mask = rng.random((12, 20)) < 0.15
            if not mask.any():
                continue
            out = arr.read_chunk((0, 0), sel_mask=mask)
            np.testing.assert_array_equal(out[mask], data[mask])

    def test_all_true_mask_uses_whole_object_path(self, tmp_path):
        from arrow_zarr_spark.zarr.array import ZarrArray

        store, meta, data = _sharded_array(tmp_path)
        arr = ZarrArray(store, meta)
        out = arr.read_chunk((0, 0), sel_mask=np.ones((12, 20), dtype=bool))
        np.testing.assert_array_equal(out, data)
        assert "temp/c/0/0" in store.full_gets
        assert not [r for r in store.range_reads if r[0] == "temp/c/0/0"]

    def test_contiguous_selection_coalesces_to_one_body_read(self, tmp_path):
        from arrow_zarr_spark.zarr.array import ZarrArray

        store, meta, data = _sharded_array(tmp_path)
        arr = ZarrArray(store, meta)
        mask = np.zeros((12, 20), dtype=bool)
        mask[:6, :] = True  # first 8 inner chunks, written contiguously
        arr.read_chunk((0, 0), sel_mask=mask)
        key = "temp/c/0/0"
        body_reads = [
            r for r in store.range_reads if r[0] == key and r[1] != "suffix"
        ]
        assert len(body_reads) == 1, body_reads

    def test_missing_shard_object_fills(self, tmp_path):
        from arrow_zarr_spark.zarr.array import ZarrArray
        from arrow_zarr_spark.zarr.meta import numpy_to_zarr_dtype

        store, meta, _ = _sharded_array(tmp_path)
        store._inner.delete("temp/c/0/0")
        arr = ZarrArray(store, meta)
        mask = np.zeros((12, 20), dtype=bool)
        mask[0, 0] = True
        out = arr.read_chunk((0, 0), sel_mask=mask)
        assert (out == -1.0).all()

    def test_trailing_compressor_falls_back_to_whole_object(self, tmp_path):
        """A gzip over the shard object makes interior offsets opaque —
        the masked read must transparently use the full path."""
        from arrow_zarr_spark.zarr.array import ZarrArray
        from arrow_zarr_spark.zarr.meta import numpy_to_zarr_dtype
        from arrow_zarr_spark.zarr.store import LocalStore
        from arrow_zarr_spark.zarr.writer import write_array_data, write_root_group

        root = str(tmp_path / "gz")
        plain = LocalStore(root)
        write_root_group(plain)
        data = np.arange(96.0).reshape(8, 12)
        meta = ArrayMeta(
            name="temp",
            shape=(8, 12),
            chunk_shape=(8, 12),
            zarr_dtype=numpy_to_zarr_dtype(np.dtype("float64")),
            fill_value=0,
            codecs=_shard_codecs((4, 3))
            + [{"name": "gzip", "configuration": {"level": 1}}],
            dimension_names=("y", "x"),
        )
        plain.set("temp/zarr.json", json.dumps(meta.to_json()).encode())
        write_array_data(plain, meta, data)
        store = _CountingLocalStore(root)
        arr = ZarrArray(store, meta)
        mask = np.zeros((8, 12), dtype=bool)
        mask[0, 0] = True
        out = arr.read_chunk((0, 0), sel_mask=mask)
        np.testing.assert_array_equal(out, data)
        assert "temp/c/0/0" in store.full_gets

    def test_edge_shard_partial_read(self, tmp_path):
        """Shards at the array edge have inner chunks partially or fully
        outside the valid region; the masked read must slice correctly
        and skip fully-out-of-bounds inner chunks."""
        from arrow_zarr_spark.zarr.array import ZarrArray

        # array 10x14, shard 12x20 -> single edge shard, valid (10, 14)
        store, meta, data = _sharded_array(
            tmp_path, shape=(10, 14), shard=(12, 20), inner=(3, 5)
        )
        arr = ZarrArray(store, meta)
        mask = np.zeros((10, 14), dtype=bool)
        mask[8:, 10:] = True  # bottom-right corner of the valid region
        out = arr.read_chunk((0, 0), sel_mask=mask)
        assert out.shape == (10, 14)
        np.testing.assert_array_equal(out[mask], data[mask])

    def test_spark_filter_over_sharded_store_is_exact(self, spark, tmp_path):
        """End-to-end: the scan's filter mask drives inner-chunk
        pruning, and Spark's exact re-filter hides the fill-valued
        masked-out rows — results identical to an unfiltered scan plus
        a driver-side filter."""
        from arrow_zarr_spark.zarr.meta import numpy_to_zarr_dtype
        from arrow_zarr_spark.zarr.store import open_store
        from arrow_zarr_spark.zarr.writer import write_array_data, write_root_group

        path = str(tmp_path / "s")
        store = open_store(path)
        write_root_group(store)
        data = np.arange(240.0).reshape(12, 20)
        other = data * 10.0
        for name, arrdata in [("temp", data), ("press", other)]:
            meta = ArrayMeta(
                name=name,
                shape=(12, 20),
                chunk_shape=(6, 10),
                zarr_dtype=numpy_to_zarr_dtype(np.dtype("float64")),
                fill_value=0,
                codecs=_shard_codecs((3, 5)),
                dimension_names=("y", "x"),
            )
            store.set(f"{name}/zarr.json", json.dumps(meta.to_json()).encode())
            write_array_data(store, meta, arrdata)

        df = spark.read.format("zarr").load(path)
        got = {
            (r.temp, r.press)
            for r in df.filter("temp >= 37 AND temp < 41").collect()
        }
        assert got == {(v, v * 10.0) for v in (37.0, 38.0, 39.0, 40.0)}


def test_partial_read_rejects_corrupted_index(tmp_path):
    """The ranged-read path (decode_shard_selected) must verify the
    shard-index crc32c exactly like the whole-object path — a corrupted
    index would otherwise drive ranged reads off garbage offsets and
    decode wrong data silently."""
    import os

    from arrow_zarr_spark.zarr.array import ZarrArray

    store, meta, data = _sharded_array(tmp_path)
    # flip one bit inside the index region (index at end: last 4 bytes
    # are the crc; the 16 bytes before them are the final entry)
    obj = os.path.join(str(tmp_path / "pstore"), "temp", "c", "0", "0")
    blob = bytearray(open(obj, "rb").read())
    blob[-12] ^= 0x01
    open(obj, "wb").write(bytes(blob))

    mask = np.zeros((12, 20), dtype=bool)
    mask[0, 0] = True
    arr = ZarrArray(store, meta)
    with pytest.raises(ZarrFormatError, match="index checksum mismatch"):
        arr.read_chunk((0, 0), sel_mask=mask)
