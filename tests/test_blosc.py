"""blosc1 codec: golden-frame decode, round-trips, and a Spark scan
over a blosc-compressed store.

The reference's own fixtures and bench store are blosc-LZ4
(``/root/reference/crates/arrow-zarr/src/lib.rs:159-168``,
``benches/s3_bench.rs:59-68``) — these tests prove a store written by
that stack decodes here. The golden frame below is hand-assembled
byte-by-byte from the public c-blosc header spec and the public LZ4
block spec, independent of this repo's own blosc encoder, so decode
conformance is not a self-fulfilling round-trip.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from arrow_zarr_spark.zarr.codecs import (
    _blosc_compress,
    _blosc_decompress,
    _byte_shuffle,
    _byte_unshuffle,
    decode_chunk,
    default_codecs,
    encode_chunk,
)
from arrow_zarr_spark.zarr.meta import ArrayMeta, ZarrFormatError


def _meta(shape, chunk, zarr_dtype, codecs):
    return ArrayMeta(
        name="x",
        shape=tuple(shape),
        chunk_shape=tuple(chunk),
        zarr_dtype=zarr_dtype,
        fill_value=0,
        codecs=codecs,
    )


# ---------------------------------------------------------------------------
# hand-assembled golden frame (LZ4 inner block written from the spec)
# ---------------------------------------------------------------------------

GOLDEN_RAW = bytes(range(16)) * 20  # 320 bytes, period 16


def _handmade_lz4_block():
    """LZ4 block for GOLDEN_RAW, written from the LZ4 block format spec:
    16 literals, one 288-byte match at offset 16, 16 trailing literals
    (the spec's last-five-literals / match-offset rules hold)."""
    seq1 = (
        bytes([0xFF])  # token: literal len code 15, match len code 15
        + bytes([0x01])  # extra literal length: 15 + 1 = 16
        + GOLDEN_RAW[:16]
        + struct.pack("<H", 16)  # match offset
        + bytes([0xFF, 0x0E])  # extra match len: 4 + 15 + 255 + 14 = 288
    )
    seq2 = bytes([0xF0, 0x01]) + GOLDEN_RAW[304:320]  # final literal run
    return seq1 + seq2


def test_handmade_lz4_block_is_valid():
    block = _handmade_lz4_block()
    out = pa.Codec("lz4_raw").decompress(
        block, decompressed_size=len(GOLDEN_RAW), asbytes=True
    )
    assert out == GOLDEN_RAW


def _handmade_blosc_frame(flags_extra=0, typesize=4):
    """blosc1 frame wrapping the hand-made LZ4 block: 16-byte header,
    one block-start offset, int32 split size, then the block."""
    block = _handmade_lz4_block()
    nbytes = len(GOLDEN_RAW)
    payload = struct.pack("<i", len(block)) + block
    header_len = 16 + 4  # header + one bstart
    cbytes = header_len + len(payload)
    flags = 0x10 | (1 << 5) | flags_extra  # DONT_SPLIT | compressor=lz4
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, nbytes, cbytes
    )
    return header + struct.pack("<i", header_len) + payload


def test_golden_frame_decodes():
    assert _blosc_decompress(_handmade_blosc_frame()) == GOLDEN_RAW


def test_golden_frame_through_codec_chain():
    codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "blosc", "configuration": {"cname": "lz4"}},
    ]
    meta = _meta((80,), (80,), "int32", codecs)
    arr = decode_chunk(meta, _handmade_blosc_frame())
    assert arr.tobytes() == GOLDEN_RAW


def test_memcpy_frame_decodes():
    nbytes = len(GOLDEN_RAW)
    header = struct.pack("<BBBBiii", 2, 1, 0x02, 1, nbytes, nbytes, nbytes + 16)
    assert _blosc_decompress(header + GOLDEN_RAW) == GOLDEN_RAW


def test_split_block_frame_decodes():
    """Frame WITHOUT the DONT_SPLIT flag: typesize streams per block,
    each split stored raw (csize == split size) — exercises the split
    reassembly path older c-blosc writers produce."""
    typesize, nbytes = 4, 512  # blocksize/typesize = 128 >= MIN_BUFFERSIZE
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    neblock = nbytes // typesize
    splits = [
        raw[i * neblock : (i + 1) * neblock] for i in range(typesize)
    ]
    payload = b"".join(struct.pack("<i", neblock) + s for s in splits)
    header_len = 16 + 4
    flags = 1 << 5  # lz4, split allowed
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, nbytes, header_len + len(payload)
    )
    frame = header + struct.pack("<i", header_len) + payload
    assert _blosc_decompress(frame) == raw


def test_shuffled_split_frame_decodes():
    """Split frame with the byte-shuffle flag: block shuffled, then
    split contiguously — matches c-blosc's filter-then-split order."""
    typesize, nbytes = 2, 256
    raw = np.arange(128, dtype="<u2").tobytes()
    shuffled = _byte_shuffle(raw, typesize)
    neblock = nbytes // typesize
    splits = [shuffled[:neblock], shuffled[neblock:]]
    payload = b"".join(struct.pack("<i", neblock) + s for s in splits)
    header_len = 16 + 4
    flags = (1 << 5) | 0x01  # lz4 | DOSHUFFLE
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, nbytes, header_len + len(payload)
    )
    frame = header + struct.pack("<i", header_len) + payload
    assert _blosc_decompress(frame) == raw


# ---------------------------------------------------------------------------
# shuffle filter
# ---------------------------------------------------------------------------

def test_byte_shuffle_known_case():
    # 2 elements of typesize 3: abc def -> ad be cf
    assert _byte_shuffle(b"abcdef", 3) == b"adbecf"
    assert _byte_unshuffle(b"adbecf", 3) == b"abcdef"


def test_byte_shuffle_remainder_tail_kept():
    data = b"abcdefgh"  # typesize 3 -> 2 full elements + 2 tail bytes
    sh = _byte_shuffle(data, 3)
    assert sh.endswith(b"gh")
    assert _byte_unshuffle(sh, 3) == data


# ---------------------------------------------------------------------------
# round-trips through our own encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cname", ["lz4", "lz4hc", "zstd", "zlib", "snappy"])
@pytest.mark.parametrize("shuffle", ["noshuffle", "shuffle"])
def test_roundtrip_compressors(cname, shuffle):
    data = np.arange(5000, dtype="<f8").tobytes()
    frame = _blosc_compress(data, typesize=8, cname=cname, shuffle=shuffle)
    assert _blosc_decompress(frame) == data
    assert len(frame) < len(data)  # arange bytes compress well


def test_roundtrip_multiblock_with_leftover():
    rng = np.random.default_rng(3)
    # 10_000 bytes at 4 KiB blocks -> 2 full blocks + 1808-byte leftover
    base = np.repeat(rng.integers(0, 50, 2500), 4).astype(np.uint8).tobytes()
    frame = _blosc_compress(base, typesize=4, cname="zstd", blocksize=4096)
    assert _blosc_decompress(frame) == base


def test_incompressible_falls_back_to_memcpy():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    frame = _blosc_compress(noise, typesize=1, cname="lz4")
    assert frame[2] & 0x02  # MEMCPYED flag
    assert len(frame) == len(noise) + 16
    assert _blosc_decompress(frame) == noise


def test_roundtrip_through_chunk_codec_chain():
    codecs = default_codecs(compression="blosc-lz4")
    assert codecs[-1]["name"] == "blosc"
    meta = _meta((64, 64), (64, 64), "float64", codecs)
    arr = np.linspace(0.0, 1.0, 64 * 64).reshape(64, 64)
    assert np.array_equal(decode_chunk(meta, encode_chunk(meta, arr)), arr)


# ---------------------------------------------------------------------------
# error gates
# ---------------------------------------------------------------------------

def test_blosclz_frame_rejected_clearly():
    header = struct.pack("<BBBBiii", 2, 1, 0x10, 1, 64, 64, 24)
    with pytest.raises(ZarrFormatError, match="blosclz"):
        _blosc_decompress(header + struct.pack("<i", 20) + b"\x00" * 68)


def test_bitshuffle_frame_rejected_clearly():
    header = struct.pack("<BBBBiii", 2, 1, 0x04 | (1 << 5), 4, 64, 64, 24)
    with pytest.raises(ZarrFormatError, match="bit-shuffle"):
        _blosc_decompress(header + struct.pack("<i", 20) + b"\x00" * 68)


def test_truncated_header_rejected():
    with pytest.raises(ZarrFormatError, match="header"):
        _blosc_decompress(b"\x02\x01\x00")


def test_truncated_block_start_table_rejected():
    """A frame cut off inside the block-start index must raise
    ZarrFormatError, not a raw struct.error."""
    # header claims 1 MiB in 256 KiB blocks (4 block starts) but the
    # frame ends right after the 16-byte header
    header = struct.pack(
        "<BBBBiii", 2, 1, 1 << 5, 1, 1 << 20, 1 << 18, 16
    )
    with pytest.raises(ZarrFormatError, match="truncated"):
        _blosc_decompress(header)


def test_truncated_split_header_rejected():
    """A block start pointing past the end of the frame must raise
    ZarrFormatError when the split header read would run off the end."""
    header = struct.pack("<BBBBiii", 2, 1, 1 << 5, 1, 64, 64, 22)
    # one block; its start table says the split header begins at 20,
    # but the frame ends at byte 22 (2 bytes short of the 4-byte size)
    frame = header + struct.pack("<i", 20) + b"\x00\x00"
    with pytest.raises(ZarrFormatError, match="truncated"):
        _blosc_decompress(frame)


def test_negative_split_size_rejected():
    """A corrupt negative csize must be rejected up front instead of
    surfacing as a confusing inner-codec error."""
    header = struct.pack("<BBBBiii", 2, 1, 1 << 5, 1, 64, 64, 28)
    frame = header + struct.pack("<i", 20) + struct.pack("<i", -5) + b"\x00" * 8
    with pytest.raises(ZarrFormatError, match="compressed"):
        _blosc_decompress(frame)


def test_oversized_split_size_rejected():
    """csize larger than the remaining frame must raise ZarrFormatError
    rather than silently decoding a short slice."""
    header = struct.pack("<BBBBiii", 2, 1, 1 << 5, 1, 64, 64, 28)
    frame = header + struct.pack("<i", 20) + struct.pack("<i", 9999) + b"\x00" * 8
    with pytest.raises(ZarrFormatError, match="compressed"):
        _blosc_decompress(frame)


# ---------------------------------------------------------------------------
# end-to-end: Spark scan over a blosc-compressed store
# ---------------------------------------------------------------------------

def test_spark_scan_blosc_store(spark, tmp_path):
    from arrow_zarr_spark.zarr.writer import write_store

    data = np.arange(48.0).reshape(6, 8)
    write_store(
        str(tmp_path / "s"),
        arrays={
            "temp": data,
            "lat": np.linspace(10, 15, 6),
            "lon": np.linspace(100, 107, 8),
        },
        chunk_shapes={"temp": (2, 3), "lat": (2,), "lon": (3,)},
        dimension_names={
            "temp": ("lat", "lon"),
            "lat": ("lat",),
            "lon": ("lon",),
        },
        compression="blosc-lz4",
    )
    df = spark.read.format("zarr").load(str(tmp_path / "s"))
    rows = df.orderBy("temp").collect()
    assert len(rows) == 48
    assert [r.temp for r in rows] == sorted(data.ravel().tolist())


def test_corrupt_block_length_raises_not_corrupts():
    """A frame whose reassembled block is shorter than the header's
    bsize must error — bytearray slice assignment would otherwise
    silently RESIZE the output, shifting later blocks."""
    nbytes, blocksize = 514, 514  # not a multiple of typesize 4
    typesize = 4
    neblock = 128  # 4 splits x 128 = 512 != 514
    splits = [b"\x00" * neblock for _ in range(typesize)]
    payload = b"".join(struct.pack("<i", neblock) + s for s in splits)
    header_len = 16 + 4
    header = struct.pack(
        "<BBBBiii", 2, 1, 1 << 5, typesize, nbytes, blocksize,
        header_len + len(payload),
    )
    frame = header + struct.pack("<i", header_len) + payload
    with pytest.raises(ZarrFormatError, match="reassembled"):
        _blosc_decompress(frame)
