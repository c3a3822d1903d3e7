"""Zarr v3 codec chain: encode/decode chunks without zarr-python.

Supported codecs (public Zarr v3 spec names):

- ``bytes`` (array↔bytes, endian configuration)
- ``transpose`` (array↔array, order permutation)
- ``gzip`` (bytes↔bytes, via stdlib zlib)
- ``zstd`` (bytes↔bytes, via :mod:`pyarrow`)
- ``lz4`` (bytes↔bytes, LZ4-frame via :mod:`pyarrow`)
- ``crc32c`` (bytes↔bytes, 4-byte trailing checksum; stripped on read,
  verification skipped — no crc32c implementation in this environment)
- ``blosc`` — NOT available here (the reference's test fixtures use
  blosc-LZ4, ``/root/reference/crates/arrow-zarr/src/lib.rs:159-168``);
  reading raises a clear error, and our own fixtures/writer use zstd or
  gzip instead.

The codec list in metadata is ordered array→bytes for encode; decode
applies it in reverse (Zarr v3 spec §codecs).
"""

from __future__ import annotations

import gzip as _gzip
import struct
from typing import Any, Sequence

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
    else:
        raise ZarrFormatError(f"Unsupported writer compression {compression!r}")
    return chain


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
    if name == "crc32c":
        if len(data) < 4:
            raise ZarrFormatError("crc32c codec: chunk shorter than checksum")
        return data[:-4]  # checksum not verified (no crc32c impl available)
    if name == "blosc":
        raise ZarrFormatError(
            "blosc codec is not available in this environment "
            "(no numcodecs/blosc); re-encode the store with zstd or gzip"
        )
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
    if name == "crc32c":
        # append a zero checksum placeholder — we never verify on read;
        # writers in this repo do not emit crc32c by default
        return data + struct.pack("<I", 0)
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
            raise ZarrFormatError("sharding_indexed codec is not supported")
        else:
            bb.append(codec)
    if ab is None:
        # spec default: bytes codec with native endianness
        ab = {"name": "bytes", "configuration": {"endian": "little"}}
    return aa, ab, bb


def decode_chunk(meta: ArrayMeta, data: bytes) -> np.ndarray:
    """Decode one stored chunk into a full-chunk-shape ndarray (C order)."""
    if meta.dtype == np.dtype(object):
        raise ZarrFormatError(
            "string chunk decode is not supported (no vlen codec here); "
            "string arrays are schema-mappable but not readable"
        )
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
