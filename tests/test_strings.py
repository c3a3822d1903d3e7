"""String (vlen-utf8) arrays: codec round-trips and a Spark scan.

The reference REJECTS string arrays (``config.rs:278-281``); reading
them here is deliberate extra surface so stores written by zarr-python
(xarray string coords/vars) scan instead of erroring.
"""

import struct

import numpy as np
import pytest

from arrow_zarr_spark.zarr.codecs import decode_chunk, encode_chunk
from arrow_zarr_spark.zarr.meta import ArrayMeta, ZarrFormatError

VLEN = [{"name": "vlen-utf8", "configuration": {}}]


def _meta(shape, chunk, codecs, fill_value=""):
    return ArrayMeta(
        name="s",
        shape=tuple(shape),
        chunk_shape=tuple(chunk),
        zarr_dtype="string",
        fill_value=fill_value,
        codecs=codecs,
    )


def test_golden_handmade_vlen_chunk():
    """Hand-assembled per the numcodecs VLenUTF8 layout: item count,
    then (length, utf8 bytes) per item."""
    items = ["ab", "", "héllo"]
    raw = struct.pack("<I", 3)
    for s in items:
        b = s.encode("utf-8")
        raw += struct.pack("<I", len(b)) + b
    meta = _meta((3,), (3,), VLEN)
    out = decode_chunk(meta, raw)
    assert out.tolist() == items


@pytest.mark.parametrize(
    "codecs",
    [
        VLEN,
        VLEN + [{"name": "zstd", "configuration": {"level": 3}}],
        VLEN + [{"name": "gzip", "configuration": {"level": 5}}],
        VLEN + [{"name": "blosc", "configuration": {"cname": "lz4"}}],
    ],
)
def test_vlen_roundtrip(codecs):
    meta = _meta((2, 3), (2, 3), codecs)
    arr = np.array(
        [["a", "bb", "ccc"], ["ddd d", "", "ünïcode ✓"]], dtype=object
    )
    out = decode_chunk(meta, encode_chunk(meta, arr))
    assert out.tolist() == arr.tolist()


def test_string_without_vlen_codec_rejected():
    meta = _meta((2,), (2,), [{"name": "bytes", "configuration": {}}])
    with pytest.raises(ZarrFormatError, match="vlen-utf8"):
        decode_chunk(meta, b"\x00" * 8)


def test_truncated_vlen_chunk_rejected():
    meta = _meta((2,), (2,), VLEN)
    raw = struct.pack("<I", 2) + struct.pack("<I", 100) + b"ab"
    with pytest.raises(ZarrFormatError, match="truncated"):
        decode_chunk(meta, raw)


def test_spark_scan_string_array(spark, tmp_path):
    """End-to-end: a store with a string variable over a numeric grid
    scans into a StringType column (the reference errors on this)."""
    from arrow_zarr_spark.zarr.writer import write_store

    labels = np.array(
        ["n0", "n1", "n2", "n3", "n4", "n5"], dtype=object
    )
    write_store(
        str(tmp_path / "s"),
        arrays={
            "label": labels,
            "x": np.arange(6.0),
        },
        chunk_shapes={"label": (4,), "x": (4,)},
        dimension_names={"label": ("x",), "x": ("x",)},
    )
    df = spark.read.format("zarr").load(str(tmp_path / "s"))
    assert dict(df.dtypes)["label"] == "string"
    rows = sorted((r.x, r.label) for r in df.collect())
    assert rows == [(float(i), f"n{i}") for i in range(6)]
    assert df.filter("label = 'n3'").count() == 1


def test_bytes_kind_array_roundtrips_as_text(tmp_path):
    """'S'-dtype input must store the BYTES' text, not "b'..'" repr."""
    from arrow_zarr_spark.zarr import infer_store_arrays, open_store
    from arrow_zarr_spark.zarr.writer import write_store

    write_store(
        str(tmp_path / "s"),
        arrays={"k": np.array([b"ab", b"cd"], dtype="S2")},
        chunk_shapes={"k": (2,)},
    )
    arr = infer_store_arrays(open_store(str(tmp_path / "s")))[0]
    assert arr.read_all().tolist() == ["ab", "cd"]


def test_vlen_lz4_rejected_at_encode_time():
    """lz4 cannot be decoded without a known size, so a chain that
    would write unreadable chunks must fail at ENCODE, not at read."""
    meta = _meta((2,), (2,), VLEN + [{"name": "lz4", "configuration": {}}])
    arr = np.array(["a", "b"], dtype=object)
    with pytest.raises(ZarrFormatError, match="lz4"):
        encode_chunk(meta, arr)


def test_string_writer_rejects_unknown_compression(tmp_path):
    from arrow_zarr_spark.zarr.writer import write_store

    with pytest.raises(ZarrFormatError, match="zsdt"):
        write_store(
            str(tmp_path / "s"),
            arrays={"k": np.array(["a"], dtype=object)},
            chunk_shapes={"k": (1,)},
            compression="zsdt",
        )


def test_string_writer_blosc_roundtrips(tmp_path):
    from arrow_zarr_spark.zarr import infer_store_arrays, open_store
    from arrow_zarr_spark.zarr.writer import write_store

    write_store(
        str(tmp_path / "s"),
        arrays={"k": np.array(["xx", "yy", "zz"], dtype=object)},
        chunk_shapes={"k": (2,)},
        compression="blosc-lz4",
    )
    arr = infer_store_arrays(open_store(str(tmp_path / "s")))[0]
    assert arr.read_all().tolist() == ["xx", "yy", "zz"]
