"""Zarr v3 codec chain: encode/decode chunks without zarr-python.

Supported codecs (public Zarr v3 spec names):

- ``bytes`` (array↔bytes, endian configuration)
- ``transpose`` (array↔array, order permutation)
- ``gzip`` (bytes↔bytes, via stdlib zlib)
- ``zstd`` (bytes↔bytes, via :mod:`pyarrow`)
- ``lz4`` (bytes↔bytes, LZ4-frame via :mod:`pyarrow`)
- ``crc32c`` (bytes↔bytes, 4-byte trailing checksum; verified on read
  with the table-driven ``_crc32c`` below and raised as
  ``ZarrFormatError`` on mismatch — a corrupted chunk must fail loudly,
  not decode to garbage)
- ``blosc`` (bytes↔bytes) — hand-rolled blosc1 frame codec, no numcodecs
  needed. The reference's own test/bench stores are blosc-LZ4
  (``/root/reference/crates/arrow-zarr/src/lib.rs:159-168``,
  ``benches/s3_bench.rs:59-68``), so this is the on-ramp for data
  written by the reference stack. Frame layout per c-blosc's public
  ``README_HEADER.rst``: 16-byte header (version, versionlz, flags,
  typesize, nbytes/blocksize/cbytes as LE int32), then — unless the
  pure-memcpy flag is set — one LE int32 start offset per block, and
  each block is 1..typesize "splits", each a LE int32 compressed size
  followed by that many bytes of inner-codec data (stored raw when
  csize == uncompressed split size). Inner codecs supported: lz4/lz4hc
  (pyarrow ``lz4_raw``), zstd, zlib, snappy; ``blosclz`` has no
  implementation in this environment and raises a clear error. The
  byte-shuffle filter is applied per block; bit-shuffle and delta are
  gated with clear errors.

The codec list in metadata is ordered array→bytes for encode; decode
applies it in reverse (Zarr v3 spec §codecs).
"""

from __future__ import annotations

import gzip as _gzip
import struct
from typing import Any, Optional, Sequence

import numpy as np

from .meta import ArrayMeta, ZarrFormatError

__all__ = ["decode_chunk", "encode_chunk", "default_codecs"]

try:  # pyarrow provides zstd/lz4 codecs; gate defensively anyway
    import pyarrow as _pa

    _HAVE_PA = True
except Exception:  # pragma: no cover
    _HAVE_PA = False


def default_codecs(compression: str = "zstd", endian: str = "little") -> list:
    """Codec metadata list for arrays written by our writer."""
    chain = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compression == "zstd":
        chain.append({"name": "zstd", "configuration": {"level": 3, "checksum": False}})
    elif compression == "gzip":
        chain.append({"name": "gzip", "configuration": {"level": 5}})
    elif compression in (None, "none", "raw"):
        pass
    elif compression.startswith("blosc"):
        # "blosc", "blosc-lz4", "blosc-zstd", ... — the reference stack's
        # native chunk encoding (lib.rs:159-168 writes blosc-LZ4)
        cname = compression.split("-", 1)[1] if "-" in compression else "lz4"
        chain.append(
            {
                "name": "blosc",
                "configuration": {
                    "cname": cname,
                    "clevel": 5,
                    "shuffle": "noshuffle",
                    "typesize": 1,
                    "blocksize": 0,
                },
            }
        )
    else:
        raise ZarrFormatError(f"Unsupported writer compression {compression!r}")
    return chain


# ---------------------------------------------------------------------------
# blosc1 frame codec (pure Python + pyarrow inner codecs)
# ---------------------------------------------------------------------------

# header flag bits (c-blosc README_HEADER.rst)
_BLOSC_DOSHUFFLE = 0x01  # byte-wise shuffle applied
_BLOSC_MEMCPYED = 0x02  # payload is a pure memcpy (no blocks)
_BLOSC_DOBITSHUFFLE = 0x04  # bit-wise shuffle applied
_BLOSC_DODELTA = 0x08  # delta filter applied
_BLOSC_DONT_SPLIT = 0x10  # blocks were NOT split into typesize streams
# bits 5-7: compressor enumeration
_BLOSC_COMPFORMAT = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_BLOSC_COMPCODE = {"blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2, "zlib": 3, "zstd": 4}
_BLOSC_MAX_SPLITS = 16  # c-blosc: blocks split only when typesize <= 16
_BLOSC_MIN_BUFFERSIZE = 128  # ... and blocksize/typesize >= 128


def _blosc_inner_decompress(fmt: str, data: bytes, out_size: int) -> bytes:
    if fmt == "lz4":
        return _pa.Codec("lz4_raw").decompress(
            data, decompressed_size=out_size, asbytes=True
        )
    if fmt == "zstd":
        return _pa.Codec("zstd").decompress(
            data, decompressed_size=out_size, asbytes=True
        )
    if fmt == "zlib":
        import zlib

        return zlib.decompress(data)
    if fmt == "snappy":
        return _pa.Codec("snappy").decompress(
            data, decompressed_size=out_size, asbytes=True
        )
    raise ZarrFormatError(
        f"blosc inner compressor {fmt!r} is not available in this "
        "environment (supported: lz4, lz4hc, zstd, zlib, snappy)"
    )


def _blosc_inner_compress(fmt: str, data: bytes, clevel: int) -> bytes:
    if fmt in ("lz4", "lz4hc"):
        return _pa.Codec("lz4_raw").compress(data, asbytes=True)
    if fmt == "zstd":
        return _pa.Codec("zstd", compression_level=clevel).compress(
            data, asbytes=True
        )
    if fmt == "zlib":
        import zlib

        return zlib.compress(data, min(clevel, 9))
    if fmt == "snappy":
        return _pa.Codec("snappy").compress(data, asbytes=True)
    raise ZarrFormatError(f"blosc writer compressor {fmt!r} unsupported")


def _byte_unshuffle(block: bytes, typesize: int) -> bytes:
    """Inverse of c-blosc's per-block byte shuffle: typesize streams of
    len(block)//typesize bytes each, trailing remainder stored as-is."""
    q = len(block) // typesize
    main = np.frombuffer(block, dtype=np.uint8, count=q * typesize)
    out = main.reshape(typesize, q).T.reshape(-1).tobytes()
    return out + block[q * typesize :]


def _byte_shuffle(block: bytes, typesize: int) -> bytes:
    q = len(block) // typesize
    main = np.frombuffer(block, dtype=np.uint8, count=q * typesize)
    out = main.reshape(q, typesize).T.reshape(-1).tobytes()
    return out + block[q * typesize :]


def _blosc_nsplits(flags: int, typesize: int, blocksize: int, leftover: bool) -> int:
    if (
        flags & _BLOSC_DONT_SPLIT
        or leftover
        or typesize <= 1
        or typesize > _BLOSC_MAX_SPLITS
        or blocksize // typesize < _BLOSC_MIN_BUFFERSIZE
    ):
        return 1
    return typesize


def _blosc_decompress(data: bytes) -> bytes:
    """Decode one blosc1 frame (header + blocked payload) to raw bytes."""
    if len(data) < 16:
        raise ZarrFormatError("blosc chunk shorter than 16-byte header")
    flags, typesize = data[2], data[3]
    try:
        nbytes, blocksize, cbytes = struct.unpack_from("<iii", data, 4)
    except struct.error as e:  # pragma: no cover - len guard above
        raise ZarrFormatError(f"blosc header unreadable: {e}") from e
    if cbytes > len(data):
        raise ZarrFormatError(
            f"blosc header claims {cbytes} compressed bytes, chunk has {len(data)}"
        )
    if flags & _BLOSC_MEMCPYED:
        if len(data) < 16 + nbytes:
            raise ZarrFormatError("blosc memcpy frame truncated")
        return data[16 : 16 + nbytes]
    if flags & _BLOSC_DOBITSHUFFLE:
        raise ZarrFormatError(
            "blosc bit-shuffle filter is not supported (byte shuffle is)"
        )
    if flags & _BLOSC_DODELTA:
        raise ZarrFormatError("blosc delta filter is not supported")
    fmt = _BLOSC_COMPFORMAT.get((flags >> 5) & 0x7)
    if fmt == "blosclz" or fmt is None:
        raise ZarrFormatError(
            f"blosc inner compressor {fmt or (flags >> 5) & 0x7!r} has no "
            "implementation in this environment (supported: lz4, lz4hc, "
            "zstd, zlib, snappy)"
        )
    if typesize == 0 or blocksize <= 0 or nbytes < 0:
        raise ZarrFormatError("blosc header has invalid sizes")
    nblocks = (nbytes + blocksize - 1) // blocksize
    if len(data) < 16 + 4 * nblocks:
        # a truncated frame must surface as a format error, not a raw
        # struct.error from the unpack below
        raise ZarrFormatError(
            f"blosc frame truncated: block-start table needs "
            f"{16 + 4 * nblocks} bytes, chunk has {len(data)}"
        )
    bstarts = struct.unpack_from(f"<{nblocks}i", data, 16)
    out = bytearray(nbytes)
    shuffled = bool(flags & _BLOSC_DOSHUFFLE)
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize != blocksize
        nsplits = _blosc_nsplits(flags, typesize, blocksize, leftover)
        neblock = bsize // nsplits
        pos = bstarts[j]
        if pos < 0:
            raise ZarrFormatError(f"blosc block {j} start {pos} is negative")
        parts = []
        for _ in range(nsplits):
            if pos + 4 > len(data):
                raise ZarrFormatError(
                    f"blosc frame truncated: split header of block {j} "
                    f"at offset {pos} is past the {len(data)}-byte chunk"
                )
            (csize,) = struct.unpack_from("<i", data, pos)
            pos += 4
            if csize < 0 or pos + csize > len(data):
                raise ZarrFormatError(
                    f"blosc block {j} split claims {csize} compressed "
                    f"bytes at offset {pos}, chunk has {len(data)}"
                )
            raw = data[pos : pos + csize]
            pos += csize
            if csize == neblock:  # stored uncompressed
                parts.append(raw)
            else:
                dec = _blosc_inner_decompress(fmt, raw, neblock)
                if len(dec) != neblock:
                    raise ZarrFormatError(
                        f"blosc split decoded to {len(dec)} bytes, expected {neblock}"
                    )
                parts.append(dec)
        block = b"".join(parts)
        if len(block) != bsize:
            # must check BEFORE the slice assignment: assigning a
            # wrong-length bytes to a bytearray slice silently RESIZES
            # the buffer, shifting every later block
            raise ZarrFormatError(
                f"blosc block {j} reassembled to {len(block)} bytes, "
                f"expected {bsize}"
            )
        if shuffled:
            block = _byte_unshuffle(block, typesize)
        out[j * blocksize : j * blocksize + bsize] = block
    return bytes(out)


def _blosc_compress(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    clevel: int = 5,
    shuffle: str = "noshuffle",
    blocksize: int = 0,
) -> bytes:
    """Encode raw bytes as a blosc1 frame any c-blosc ≥1.11 can read.

    Always writes unsplit blocks (DONT_SPLIT flag set) — simplest valid
    layout, and what the decoder here and real c-blosc both honor."""
    if cname not in _BLOSC_COMPCODE or cname == "blosclz":
        raise ZarrFormatError(f"blosc writer compressor {cname!r} unsupported")
    if shuffle == "bitshuffle":
        raise ZarrFormatError("blosc writer does not support bitshuffle")
    typesize = max(1, min(int(typesize), 255))
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = 1 << 18  # 256 KiB auto default
    blocksize = max(typesize, blocksize - blocksize % typesize)
    blocksize = min(blocksize, max(nbytes, typesize))
    flags = _BLOSC_DONT_SPLIT | (_BLOSC_COMPCODE[cname] << 5)
    do_shuffle = shuffle in ("shuffle", "byteshuffle", 1, "1", True) and typesize > 1
    if do_shuffle:
        flags |= _BLOSC_DOSHUFFLE
    nblocks = (nbytes + blocksize - 1) // blocksize if nbytes else 0
    blocks = []
    for j in range(nblocks):
        block = data[j * blocksize : j * blocksize + blocksize]
        if do_shuffle:
            block = _byte_shuffle(block, typesize)
        comp = _blosc_inner_compress(cname, block, clevel)
        if len(comp) >= len(block):  # store raw: csize == uncompressed size
            comp = block
        blocks.append(struct.pack("<i", len(comp)) + comp)
    header_len = 16 + 4 * nblocks
    offsets, pos = [], header_len
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    cbytes = pos
    if cbytes >= nbytes + 16:  # compression did not pay: pure memcpy frame
        header = struct.pack(
            "<BBBBiii", 2, 1, _BLOSC_MEMCPYED | (_BLOSC_COMPCODE[cname] << 5),
            typesize, nbytes, blocksize, nbytes + 16,
        )
        return header + data
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + struct.pack(f"<{nblocks}i", *offsets) + b"".join(blocks)


def _bb_decode(name: str, config: dict, data: bytes, decoded_size: int) -> bytes:
    if name == "gzip":
        return _gzip.decompress(data)
    if name == "zstd":
        if not _HAVE_PA:
            raise ZarrFormatError("zstd codec requires pyarrow")
        return _pa.Codec("zstd").decompress(
            data, decompressed_size=decoded_size, asbytes=True
        )
    if name == "lz4":
        if not _HAVE_PA:
            raise ZarrFormatError("lz4 codec requires pyarrow")
        return _pa.Codec("lz4").decompress(
            data, decompressed_size=decoded_size, asbytes=True
        )
    if name == "zlib":
        import zlib

        return zlib.decompress(data)
    if name == "lz4_sized":
        # numcodecs LZ4 framing (zarr v2): LE uint32 size + raw block
        if len(data) < 4:
            raise ZarrFormatError("lz4_sized chunk shorter than its header")
        (size,) = struct.unpack_from("<I", data, 0)
        return _pa.Codec("lz4_raw").decompress(
            data[4:], decompressed_size=size, asbytes=True
        )
    if name == "crc32c":
        if len(data) < 4:
            raise ZarrFormatError("crc32c codec: chunk shorter than checksum")
        (stored,) = struct.unpack_from("<I", data, len(data) - 4)
        actual = _crc32c(data[:-4])
        if stored != actual:
            raise ZarrFormatError(
                f"crc32c codec: checksum mismatch (stored {stored:#010x}, "
                f"computed {actual:#010x}) — chunk is corrupted"
            )
        return data[:-4]
    if name == "blosc":
        if not _HAVE_PA:
            raise ZarrFormatError("blosc codec requires pyarrow")
        return _blosc_decompress(data)
    if name == "v2_delta":
        # numcodecs Delta filter (zarr v2): stored values are successive
        # differences over the flat buffer; decode = cumulative sum in
        # the filter's own dtype (wraparound semantics match numcodecs)
        dt = np.dtype(config["dtype"])
        if len(data) % dt.itemsize:
            raise ZarrFormatError(
                f"v2 delta filter: {len(data)} bytes is not a multiple "
                f"of itemsize {dt.itemsize}"
            )
        return np.cumsum(np.frombuffer(data, dtype=dt), dtype=dt).tobytes()
    if name == "v2_shuffle":
        # numcodecs Shuffle filter: byte transpose with elementsize
        es = int(config.get("elementsize", 4) or 4)
        if es <= 1:
            return data
        if len(data) % es:
            raise ZarrFormatError(
                f"v2 shuffle filter: {len(data)} bytes is not a multiple "
                f"of elementsize {es}"
            )
        return _byte_unshuffle(data, es)
    raise ZarrFormatError(f"Unsupported bytes codec {name!r}")


def _bb_encode(name: str, config: dict, data: bytes) -> bytes:
    if name == "gzip":
        return _gzip.compress(data, compresslevel=int(config.get("level", 5)))
    if name == "zstd":
        if not _HAVE_PA:
            raise ZarrFormatError("zstd codec requires pyarrow")
        return _pa.Codec("zstd", compression_level=int(config.get("level", 3))).compress(
            data, asbytes=True
        )
    if name == "lz4":
        if not _HAVE_PA:
            raise ZarrFormatError("lz4 codec requires pyarrow")
        return _pa.Codec("lz4").compress(data, asbytes=True)
    if name == "zlib":
        import zlib

        return zlib.compress(data, int(config.get("level", 1)))
    if name == "lz4_sized":
        comp = _pa.Codec("lz4_raw").compress(data, asbytes=True)
        return struct.pack("<I", len(data)) + comp
    if name == "crc32c":
        # real checksum so external verifying readers accept the chunk
        # (pure-Python loop — fine for the rare explicitly-configured
        # crc32c chunk; writers in this repo do not emit it by default)
        return data + struct.pack("<I", _crc32c(data))
    if name == "blosc":
        if not _HAVE_PA:
            raise ZarrFormatError("blosc codec requires pyarrow")
        return _blosc_compress(
            data,
            typesize=int(config.get("typesize", 1) or 1),
            cname=str(config.get("cname", "lz4")),
            clevel=int(config.get("clevel", 5)),
            shuffle=config.get("shuffle", "noshuffle"),
            blocksize=int(config.get("blocksize", 0) or 0),
        )
    if name == "v2_delta":
        dt = np.dtype(config["dtype"])
        arr = np.frombuffer(data, dtype=dt)
        out = np.empty_like(arr)
        if len(arr):
            out[0] = arr[0]
            # C-style wraparound on overflow, matching decode's cumsum
            np.subtract(arr[1:], arr[:-1], out=out[1:])
        return out.tobytes()
    if name == "v2_shuffle":
        es = int(config.get("elementsize", 4) or 4)
        if es <= 1:
            return data
        if len(data) % es:
            raise ZarrFormatError(
                f"v2 shuffle filter: {len(data)} bytes is not a multiple "
                f"of elementsize {es}"
            )
        return _byte_shuffle(data, es)
    raise ZarrFormatError(f"Unsupported bytes codec {name!r}")


def _split_codecs(meta: ArrayMeta):
    """Partition the codec chain into (array→array, array→bytes, bytes→bytes)."""
    aa, ab, bb = [], None, []
    for codec in meta.codecs:
        name = codec.get("name")
        if name == "transpose":
            aa.append(codec)
        elif name == "bytes":
            ab = codec
        elif name == "sharding_indexed":
            raise ZarrFormatError(
                "sharding_indexed must be the only codec in the chain"
            )
        else:
            bb.append(codec)
    if ab is None:
        # spec default: bytes codec with native endianness
        ab = {"name": "bytes", "configuration": {"endian": "little"}}
    return aa, ab, bb


# ---------------------------------------------------------------------------
# crc32c (Castagnoli) — needed for conformant shard indexes
# ---------------------------------------------------------------------------

_CRC32C_TABLE: Optional[list] = None


def _crc32c(data: bytes) -> int:
    """Pure-Python table-driven CRC-32C (reflected poly 0x82F63B78).
    Used for shard index checksums (tens of bytes per shard) and to
    verify/emit the explicit ``crc32c`` codec's trailer. The byte loop
    runs ~10 MB/s: negligible for indexes, and acceptable on chunk
    decode because only stores explicitly configured with the crc32c
    codec pay it (this repo's writers do not emit it by default)."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
            table.append(crc)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# sharding_indexed (Zarr v3 sharding spec): one stored object = many
# inner chunks + a [offset, nbytes] uint64 index (missing sentinel =
# 2^64-1), index at the start or end per configuration. The reference
# reads sharded stores transparently through zarrs — so must we.
# ---------------------------------------------------------------------------

_SHARD_MISSING = (1 << 64) - 1


def _sharding_config(meta: ArrayMeta):
    """(config, trailing bytes→bytes codecs) for a sharded chain, else
    None. Trailing compressors over the whole shard object are allowed
    (self-sized only); array→array codecs BEFORE sharding are not —
    their shape juggling interacts with the inner-chunk layout and is
    gated with a clear error rather than half-supported."""
    names = [c.get("name") for c in meta.codecs]
    if "sharding_indexed" not in names:
        return None
    if names[0] != "sharding_indexed":
        raise ZarrFormatError(
            "codecs before sharding_indexed (e.g. transpose) are not "
            "supported; sharding must be the outermost codec"
        )
    for c in meta.codecs[1:]:
        if c.get("name") not in _SELF_SIZED_CODECS:
            raise ZarrFormatError(
                f"codec {c.get('name')!r} cannot follow sharding_indexed "
                f"(supported: {', '.join(_SELF_SIZED_CODECS)})"
            )
    return meta.codecs[0].get("configuration") or {}, meta.codecs[1:]


def _shard_geometry(meta: ArrayMeta, cfg: dict):
    from dataclasses import replace

    inner_shape = tuple(int(c) for c in cfg.get("chunk_shape") or ())
    if not inner_shape or len(inner_shape) != len(meta.chunk_shape):
        raise ZarrFormatError("sharding_indexed requires a chunk_shape")
    for s, i in zip(meta.chunk_shape, inner_shape):
        if i <= 0 or s % i:
            raise ZarrFormatError(
                f"shard shape {tuple(meta.chunk_shape)} is not divisible "
                f"by inner chunk shape {inner_shape}"
            )
    cps = tuple(s // i for s, i in zip(meta.chunk_shape, inner_shape))
    n_inner = 1
    for c in cps:
        n_inner *= c
    inner_codecs = list(
        cfg.get("codecs")
        or [{"name": "bytes", "configuration": {"endian": "little"}}]
    )
    index_codecs = list(
        cfg.get("index_codecs")
        or [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "crc32c"},
        ]
    )
    index_endian = "little"
    for c in index_codecs:
        if c.get("name") == "bytes":
            index_endian = (c.get("configuration") or {}).get(
                "endian", "little"
            )
        elif c.get("name") != "crc32c":
            raise ZarrFormatError(
                f"unsupported shard index codec {c.get('name')!r}"
            )
    has_crc = any(c.get("name") == "crc32c" for c in index_codecs)
    idx_nbytes = n_inner * 16 + (4 if has_crc else 0)
    loc = cfg.get("index_location", "end")
    if loc not in ("start", "end"):
        raise ZarrFormatError(f"invalid index_location {loc!r}")
    inner_meta = replace(
        meta, chunk_shape=inner_shape, codecs=inner_codecs
    )
    return (
        inner_shape, cps, n_inner, inner_meta, idx_nbytes, has_crc, loc,
        index_endian,
    )


def _decode_shard(meta: ArrayMeta, data: bytes, cfg: dict) -> np.ndarray:
    import itertools

    (
        inner_shape, cps, n_inner, inner_meta, idx_nbytes, has_crc, loc,
        index_endian,
    ) = _shard_geometry(meta, cfg)
    if len(data) < idx_nbytes:
        raise ZarrFormatError("shard smaller than its index")
    idx_bytes = data[-idx_nbytes:] if loc == "end" else data[:idx_nbytes]
    if has_crc:
        (stored,) = struct.unpack_from("<I", idx_bytes, len(idx_bytes) - 4)
        actual = _crc32c(idx_bytes[:-4])
        if stored != actual:
            raise ZarrFormatError(
                f"sharding_indexed: index checksum mismatch (stored "
                f"{stored:#010x}, computed {actual:#010x}) — shard index "
                f"is corrupted"
            )
        idx_bytes = idx_bytes[:-4]
    idx_dtype = "<u8" if index_endian == "little" else ">u8"
    index = np.frombuffer(idx_bytes, dtype=idx_dtype).reshape(n_inner, 2)

    fv = meta.fill_value if meta.fill_value is not None else 0
    out = np.full(tuple(meta.chunk_shape), fv, dtype=meta.dtype)
    for flat, cell in enumerate(itertools.product(*(range(c) for c in cps))):
        off, nb = int(index[flat, 0]), int(index[flat, 1])
        if off == _SHARD_MISSING and nb == _SHARD_MISSING:
            continue  # missing inner chunk keeps the fill value
        if off + nb > len(data):
            raise ZarrFormatError(
                f"shard inner chunk {cell} range [{off}, {off + nb}) is "
                f"outside the {len(data)}-byte shard"
            )
        sub = decode_chunk(inner_meta, data[off : off + nb])
        slices = tuple(
            slice(c * i, (c + 1) * i) for c, i in zip(cell, inner_shape)
        )
        out[slices] = sub
    return out


#: sentinel: decode_shard_selected could not do a partial read — the
#: caller must fall back to the whole-object path
PARTIAL_FALLBACK = object()


def shard_partial_cfg(meta: ArrayMeta):
    """The sharding configuration when byte ranges within the stored
    object map 1:1 onto inner-chunk extents — i.e. the chain is
    sharding_indexed with NO trailing whole-object codecs — else None.
    This is the precondition for partial-shard reads: a trailing gzip
    over the shard object makes interior offsets meaningless.

    The reference prunes at chunk granularity
    (``zarr_data_stream.rs:849-872``); for sharded layouts that
    granularity is the *inner* chunk, reachable through the shard
    index without reading the rest of the shard."""
    if meta.dtype == np.dtype(object):
        return None
    shard = _sharding_config(meta)
    if shard is None:
        return None
    cfg, trailing = shard
    if trailing:
        return None
    return cfg


def decode_shard_selected(
    meta: ArrayMeta,
    cfg: dict,
    store,
    key: str,
    valid_shape: tuple,
    sel_mask: np.ndarray,
):
    """Decode only the inner chunks of shard ``key`` that contain at
    least one True row of ``sel_mask`` (shaped ``valid_shape``); rows
    of skipped inner chunks keep the fill value.

    I/O: one ranged read for the shard index, then one ranged read per
    *contiguous run* of selected inner chunks (adjacent selected
    chunks coalesce, so an all-selected shard costs ~2 ranged reads,
    and a one-chunk selection costs 2 small ones — never the whole
    object). Returns the decoded array, or :data:`PARTIAL_FALLBACK`
    when a partial read isn't possible (short/absent index, range read
    came back short) and the caller should use the whole-object path.
    A missing shard object decodes to all-fill (the missing-chunk
    semantics of ``zarr_data_stream.rs:388-398``)."""
    import itertools

    (
        inner_shape, cps, n_inner, inner_meta, idx_nbytes, has_crc, loc,
        index_endian,
    ) = _shard_geometry(meta, cfg)
    idx_bytes = (
        store.get_suffix(key, idx_nbytes)
        if loc == "end"
        else store.get_range(key, 0, idx_nbytes)
    )
    fv = meta.fill_value if meta.fill_value is not None else 0
    if idx_bytes is None:
        return np.full(valid_shape, fv, dtype=meta.dtype)
    if len(idx_bytes) != idx_nbytes:
        return PARTIAL_FALLBACK
    if has_crc:
        # same verification as the whole-object path (_decode_shard):
        # a corrupted index would otherwise drive ranged reads off
        # garbage offsets and decode wrong data silently
        stored = struct.unpack("<I", idx_bytes[-4:])[0]
        actual = _crc32c(idx_bytes[:-4])
        if stored != actual:
            raise ZarrFormatError(
                f"sharding_indexed: shard index checksum mismatch "
                f"(stored {stored:#010x}, computed {actual:#010x})"
            )
        idx_bytes = idx_bytes[:-4]
    idx_dtype = "<u8" if index_endian == "little" else ">u8"
    index = np.frombuffer(idx_bytes, dtype=idx_dtype).reshape(n_inner, 2)

    out = np.full(valid_shape, fv, dtype=meta.dtype)
    selected = []
    for flat, cell in enumerate(itertools.product(*(range(c) for c in cps))):
        slices = []
        in_bounds = True
        for d, (c, i) in enumerate(zip(cell, inner_shape)):
            start = c * i
            if start >= valid_shape[d]:
                in_bounds = False  # edge shard: inner chunk fully outside
                break
            slices.append(slice(start, min(start + i, valid_shape[d])))
        if not in_bounds:
            continue
        slices = tuple(slices)
        if not sel_mask[slices].any():
            continue
        off, nb = int(index[flat, 0]), int(index[flat, 1])
        if off == _SHARD_MISSING and nb == _SHARD_MISSING:
            continue  # missing inner chunk keeps the fill value
        selected.append((slices, off, nb))

    if not selected:
        return out
    selected.sort(key=lambda t: t[1])
    runs = []  # [run_start, run_end, entries]
    for entry in selected:
        off, nb = entry[1], entry[2]
        if runs and off == runs[-1][1]:
            runs[-1][1] = off + nb
            runs[-1][2].append(entry)
        else:
            runs.append([off, off + nb, [entry]])
    for run_start, run_end, entries in runs:
        blob = store.get_range(key, run_start, run_end - run_start)
        if blob is None or len(blob) != run_end - run_start:
            return PARTIAL_FALLBACK
        for slices, off, nb in entries:
            sub = decode_chunk(inner_meta, blob[off - run_start : off - run_start + nb])
            out[slices] = sub[tuple(slice(0, s.stop - s.start) for s in slices)]
    return out


def _encode_shard(meta: ArrayMeta, arr: np.ndarray, cfg: dict) -> bytes:
    import itertools

    (
        inner_shape, cps, n_inner, inner_meta, idx_nbytes, has_crc, loc,
        index_endian,
    ) = _shard_geometry(meta, cfg)
    idx_dtype = "<u8" if index_endian == "little" else ">u8"
    index = np.full((n_inner, 2), _SHARD_MISSING, dtype=idx_dtype)
    blobs: list = []
    offset = idx_nbytes if loc == "start" else 0
    for flat, cell in enumerate(itertools.product(*(range(c) for c in cps))):
        slices = tuple(
            slice(c * i, (c + 1) * i) for c, i in zip(cell, inner_shape)
        )
        blob = encode_chunk(
            inner_meta, np.ascontiguousarray(arr[slices])
        )
        index[flat] = (offset, len(blob))
        blobs.append(blob)
        offset += len(blob)
    idx_bytes = index.tobytes()
    if has_crc:
        idx_bytes += struct.pack("<I", _crc32c(idx_bytes))
    body = b"".join(blobs)
    return idx_bytes + body if loc == "start" else body + idx_bytes


def _zstd_content_size(data: bytes) -> Optional[int]:
    """Frame-header Frame_Content_Size per the public zstd format —
    needed because pyarrow's zstd decompress requires the size and
    vlen data has no size derivable from the array shape."""
    if len(data) < 5 or data[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = data[4]
    pos = 5
    single = (fhd >> 5) & 1
    if not single:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id
    flag = fhd >> 6
    # explicit truncation checks: slicing a short buffer does NOT raise,
    # it silently yields a wrong (smaller) size
    width = (1, 2, 4, 8)[flag]
    if flag == 0 and not single:
        return None
    if pos + width > len(data):
        return None
    if flag == 0:
        return data[pos]
    raw = int.from_bytes(data[pos : pos + width], "little")
    return raw + 256 if flag == 1 else raw


#: bytes→bytes codecs that can decode WITHOUT a caller-known
#: decompressed size (frame self-describes, or size-free)
def _bb_decode_selfsized(name: str, config: dict, data: bytes) -> bytes:
    if name == "zstd":
        size = _zstd_content_size(data)
        if size is None:
            raise ZarrFormatError(
                "zstd frame lacks a content size (required when the "
                "decompressed size is not derivable from the array shape)"
            )
        return _pa.Codec("zstd").decompress(
            data, decompressed_size=size, asbytes=True
        )
    if name in ("gzip", "crc32c", "blosc"):
        return _bb_decode(name, config, data, 0)
    raise ZarrFormatError(
        f"bytes codec {name!r} requires a known decompressed size and "
        "cannot follow vlen-utf8/sharding output"
    )


#: the codecs _bb_decode_selfsized accepts — encode must enforce the
#: same set or writes succeed that can never be read back
_SELF_SIZED_CODECS = ("gzip", "zstd", "crc32c", "blosc")


def _vlen_utf8_decode(meta: ArrayMeta, data: bytes) -> np.ndarray:
    """numcodecs VLenUTF8 layout: LE uint32 item count, then per item a
    LE uint32 byte length + utf8 bytes. zarr-python v3 writes string
    arrays this way (codec name "vlen-utf8"); the reference REJECTS
    string arrays outright (config.rs:278-281) — supporting the read
    here is deliberate extra surface, not a parity requirement."""
    if len(data) < 4:
        raise ZarrFormatError("vlen-utf8 chunk shorter than its header")
    (n,) = struct.unpack_from("<I", data, 0)
    expected = int(np.prod(meta.chunk_shape))
    if n != expected:
        raise ZarrFormatError(
            f"vlen-utf8 chunk has {n} items, expected {expected}"
        )
    out = np.empty(n, dtype=object)
    pos = 4
    for i in range(n):
        if pos + 4 > len(data):
            raise ZarrFormatError("vlen-utf8 chunk truncated")
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + ln > len(data):
            raise ZarrFormatError("vlen-utf8 chunk truncated")
        out[i] = data[pos : pos + ln].decode("utf-8")
        pos += ln
    return out.reshape(tuple(meta.chunk_shape))


def _vlen_utf8_encode(meta: ArrayMeta, arr: np.ndarray) -> bytes:
    parts = [struct.pack("<I", arr.size)]
    for s in arr.ravel():
        if s is None:
            b = b""
        elif isinstance(s, bytes):
            b = s  # bytes-kind ('S') input: str() would store "b'..'"
        else:
            b = str(s).encode("utf-8")
        parts.append(struct.pack("<I", len(b)) + b)
    return b"".join(parts)


def _vlen_utf8_chain(meta: ArrayMeta):
    """Trailing bytes→bytes codecs when the chain is vlen-utf8 (+
    optional compressors); None when not a vlen chain. Both encode and
    decode use this, and it admits ONLY self-sized codecs — otherwise a
    write could succeed that no read can ever decode."""
    names = [c.get("name") for c in meta.codecs]
    if "vlen-utf8" not in names:
        return None
    if names[0] != "vlen-utf8":
        raise ZarrFormatError("vlen-utf8 must be the first codec")
    for c in meta.codecs[1:]:
        if c.get("name") not in _SELF_SIZED_CODECS:
            raise ZarrFormatError(
                f"codec {c.get('name')!r} cannot follow vlen-utf8 "
                f"(supported: {', '.join(_SELF_SIZED_CODECS)})"
            )
    return meta.codecs[1:]


def decode_chunk(meta: ArrayMeta, data: bytes) -> np.ndarray:
    """Decode one stored chunk into a full-chunk-shape ndarray (C order)."""
    if meta.dtype == np.dtype(object):
        vlen_bb = _vlen_utf8_chain(meta)
        if vlen_bb is None:
            raise ZarrFormatError(
                "string chunk decode requires the vlen-utf8 codec; "
                "this string array's chain has none"
            )
        for codec in reversed(vlen_bb):
            data = _bb_decode_selfsized(
                codec["name"], codec.get("configuration", {}) or {}, data
            )
        return _vlen_utf8_decode(meta, data)
    shard = _sharding_config(meta)
    if shard is not None:
        shard_cfg, trailing = shard
        for codec in reversed(trailing):
            data = _bb_decode_selfsized(
                codec["name"], codec.get("configuration", {}) or {}, data
            )
        return _decode_shard(meta, data, shard_cfg)
    aa, ab, bb = _split_codecs(meta)

    # decoded size of the raw array bytes — the inner target of every
    # bytes→bytes codec in the chain (crc32c adjusts below)
    raw_nbytes = int(np.prod(meta.chunk_shape)) * meta.dtype.itemsize
    for codec in reversed(bb):
        data = _bb_decode(
            codec["name"], codec.get("configuration", {}) or {}, data, raw_nbytes
        )

    endian = (ab.get("configuration") or {}).get("endian", "little")
    dtype = meta.dtype.newbyteorder("<" if endian == "little" else ">")
    arr = np.frombuffer(data, dtype=dtype)

    # chunk shape after any transpose codecs (applied encode-side in order)
    shape = tuple(meta.chunk_shape)
    for codec in aa:
        order = (codec.get("configuration") or {}).get("order")
        if order is None:
            raise ZarrFormatError("transpose codec without order")
        shape = tuple(shape[i] for i in order)
    expected = int(np.prod(shape))
    if arr.size != expected:
        raise ZarrFormatError(
            f"Chunk of array {meta.name} decoded to {arr.size} elements, "
            f"expected {expected}"
        )
    arr = arr.reshape(shape)

    for codec in reversed(aa):
        order = (codec.get("configuration") or {}).get("order")
        inv = np.argsort(order)
        arr = np.transpose(arr, inv)

    return np.ascontiguousarray(arr).astype(meta.dtype, copy=False)


def encode_chunk(meta: ArrayMeta, arr: np.ndarray) -> bytes:
    """Encode a full-chunk-shape ndarray into stored bytes."""
    if tuple(arr.shape) != tuple(meta.chunk_shape):
        raise ZarrFormatError(
            f"encode_chunk expects full chunk shape {meta.chunk_shape}, "
            f"got {arr.shape}"
        )
    if meta.dtype == np.dtype(object):
        vlen_bb = _vlen_utf8_chain(meta)
        if vlen_bb is None:
            raise ZarrFormatError(
                "string chunk encode requires the vlen-utf8 codec"
            )
        data = _vlen_utf8_encode(meta, arr)
        for codec in vlen_bb:
            data = _bb_encode(
                codec["name"], codec.get("configuration", {}) or {}, data
            )
        return data
    shard = _sharding_config(meta)
    if shard is not None:
        shard_cfg, trailing = shard
        data = _encode_shard(meta, arr, shard_cfg)
        for codec in trailing:
            data = _bb_encode(
                codec["name"], codec.get("configuration", {}) or {}, data
            )
        return data
    aa, ab, bb = _split_codecs(meta)

    for codec in aa:
        order = (codec.get("configuration") or {}).get("order")
        arr = np.transpose(arr, order)

    endian = (ab.get("configuration") or {}).get("endian", "little")
    dtype = meta.dtype.newbyteorder("<" if endian == "little" else ">")
    data = np.ascontiguousarray(arr, dtype=dtype).tobytes()

    for codec in bb:
        data = _bb_encode(codec["name"], codec.get("configuration", {}) or {}, data)
    return data
