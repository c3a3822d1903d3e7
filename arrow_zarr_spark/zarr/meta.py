"""Zarr v3 metadata parsing and the Zarr→NumPy→Spark type map.

Re-implements (from the public Zarr v3 spec, not by translation) the
semantics of the reference's schema layer:

- type map: ``/root/reference/crates/arrow-zarr/src/table/config.rs:261-282``
  and decode dispatch ``zarr_data_stream.rs:418-434``
- v3-only acceptance: ``config.rs:242-247``
- fill values: ``zarr_data_stream.rs:388-398``

Spark has no unsigned integer types, so unsigned Zarr types widen
(uint8→short, uint16→int, uint32→long, uint64→decimal(20,0)) — a
documented divergence (SURVEY §7 "What's hard" #2).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np

__all__ = [
    "ZarrFormatError",
    "STATS_ATTR_KEY",
    "ArrayMeta",
    "ZARR_TO_NUMPY",
    "zarr_dtype_to_numpy",
    "numpy_to_zarr_dtype",
    "parse_array_meta",
    "parse_v2_array_meta",
]


class ZarrFormatError(ValueError):
    """Raised for malformed / unsupported Zarr metadata or data."""


#: array-attributes key carrying per-store-object [min, max] pairs —
#: parquet-style statistics for zarr, written by the distributed
#: writer and used by the scan to prune objects at planning time (the
#: reference stubs statistics entirely, opener.rs:171-173). One entry
#: per OUTER chunk-grid cell (shard-granular on sharded stores); an
#: entry of None / a null bound means "unknown", which never prunes.
STATS_ATTR_KEY = "arrow_zarr_spark:chunk_stats"


#: Zarr v3 core data_type name → numpy dtype (little-endian storage decided
#: by the ``bytes`` codec configuration, not the dtype itself).
ZARR_TO_NUMPY = {
    "bool": np.dtype(np.bool_),
    "int8": np.dtype(np.int8),
    "int16": np.dtype(np.int16),
    "int32": np.dtype(np.int32),
    "int64": np.dtype(np.int64),
    "uint8": np.dtype(np.uint8),
    "uint16": np.dtype(np.uint16),
    "uint32": np.dtype(np.uint32),
    "uint64": np.dtype(np.uint64),
    "float32": np.dtype(np.float32),
    "float64": np.dtype(np.float64),
    # zarr v3 extension type used by zarr-python for variable-length text
    "string": np.dtype(object),
}

_NUMPY_TO_ZARR = {
    np.dtype(np.bool_): "bool",
    np.dtype(np.int8): "int8",
    np.dtype(np.int16): "int16",
    np.dtype(np.int32): "int32",
    np.dtype(np.int64): "int64",
    np.dtype(np.uint8): "uint8",
    np.dtype(np.uint16): "uint16",
    np.dtype(np.uint32): "uint32",
    np.dtype(np.uint64): "uint64",
    np.dtype(np.float32): "float32",
    np.dtype(np.float64): "float64",
}


#: datetime64 units the engine accepts (zarr-python's v3 extension
#: dtype ``numpy.datetime64`` + the v2 ``<M8[unit]`` strings). Coarser
#: units (D, h, m) exist in the wild but don't round-trip through
#: Spark's microsecond timestamps losslessly enough to hash-verify.
DATETIME_UNITS = ("s", "ms", "us", "ns")


def zarr_dtype_to_numpy(name: str) -> np.dtype:
    if name.startswith("numpy.datetime64["):
        unit = name[len("numpy.datetime64[") : -1]
        if unit not in DATETIME_UNITS:
            raise ZarrFormatError(
                f"Unsupported datetime64 unit {unit!r} for zarr array "
                f"(supported: {', '.join(DATETIME_UNITS)})"
            )
        return np.dtype(f"<M8[{unit}]")
    try:
        return ZARR_TO_NUMPY[name]
    except KeyError:
        # mirrors the reference's "Unsupported type ..." error
        # (config.rs:278-281, zarr_data_stream.rs:431-434)
        raise ZarrFormatError(f"Unsupported type {name} for zarr array")


def numpy_to_zarr_dtype(dtype: np.dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype.kind in ("U", "O", "S", "T"):
        return "string"
    if dtype.kind == "M":
        unit = np.datetime_data(dtype)[0]
        if unit not in DATETIME_UNITS:
            raise ZarrFormatError(
                f"Unsupported datetime64 unit {unit!r} for zarr "
                f"(supported: {', '.join(DATETIME_UNITS)})"
            )
        return f"numpy.datetime64[{unit}]"
    try:
        return _NUMPY_TO_ZARR[dtype.newbyteorder("=")]
    except KeyError:
        raise ZarrFormatError(f"Unsupported numpy dtype {dtype} for zarr")


def _parse_fill_value(raw: Any, dtype: np.dtype) -> Any:
    """JSON fill_value → python scalar of the array dtype.

    Handles the v3 spec's special float encodings ("NaN", "Infinity",
    "-Infinity", hex strings) plus plain numbers / bools / strings.
    """
    if raw is None:
        return None
    if dtype == np.dtype(object):  # string
        return str(raw)
    if dtype.kind == "M":
        if isinstance(raw, str):
            return np.datetime64(raw)  # ISO string or "NaT"
        # integer count of the dtype's unit since the epoch (how both
        # zarr-python v3 and v2 .zarray serialize datetime fills)
        return np.int64(raw).view(dtype)
    if dtype.kind == "f" and isinstance(raw, str):
        if raw == "NaN":
            return math.nan
        if raw == "Infinity":
            return math.inf
        if raw == "-Infinity":
            return -math.inf
        if raw.startswith("0x"):
            nbytes = dtype.itemsize
            as_int = int(raw, 16)
            return float(
                np.frombuffer(
                    as_int.to_bytes(nbytes, "big"), dtype=dtype.newbyteorder(">")
                )[0]
            )
        raise ZarrFormatError(f"Unsupported float fill_value {raw!r}")
    if dtype.kind == "b":
        return bool(raw)
    if dtype.kind in ("i", "u"):
        return int(raw)
    return float(raw)


@dataclass
class ArrayMeta:
    """Parsed zarr.json for one array (one table column)."""

    name: str
    shape: tuple
    chunk_shape: tuple
    zarr_dtype: str
    fill_value: Any
    codecs: list = field(default_factory=list)
    dimension_names: Optional[tuple] = None
    separator: str = "/"
    key_encoding: str = "default"  # "default" (c/0/0) or "v2" (0.0)
    attributes: dict = field(default_factory=dict)

    @property
    def dtype(self) -> np.dtype:
        return zarr_dtype_to_numpy(self.zarr_dtype)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def chunk_grid_shape(self) -> tuple:
        return tuple(
            -(-s // c) for s, c in zip(self.shape, self.chunk_shape)
        )

    @property
    def n_chunks(self) -> int:
        n = 1
        for g in self.chunk_grid_shape:
            n *= g
        return n

    def is_coordinate(self) -> bool:
        """xarray-style coordinate: 1-D and named after its own single
        dimension (reference: ``zarr_data_stream.rs:109-215``)."""
        return (
            self.ndim == 1
            and self.dimension_names is not None
            and tuple(self.dimension_names) == (self.name,)
        )

    def chunk_key(self, idx: Sequence[int]) -> str:
        if self.key_encoding == "v2":
            # v2 honors dimension_separator ("." default, "/" allowed)
            sep = self.separator or "."
            return sep.join(str(i) for i in idx) if idx else "0"
        parts = ["c"] + [str(i) for i in idx]
        return self.separator.join(parts)

    def valid_chunk_shape(self, idx: Sequence[int]) -> tuple:
        """Shape of the in-bounds region of chunk ``idx`` — edge chunks
        are smaller (reference: ``zarr_data_stream.rs:335-372, 577-594``)."""
        return tuple(
            min(s - i * c, c)
            for s, c, i in zip(self.shape, self.chunk_shape, idx)
        )

    def to_json(self) -> dict:
        data_type: Any = self.zarr_dtype
        if data_type.startswith("numpy.datetime64["):
            # serialize in zarr-python's extension-object form so its
            # readers accept the store
            data_type = {
                "name": "numpy.datetime64",
                "configuration": {
                    "unit": data_type[len("numpy.datetime64[") : -1],
                    "scale_factor": 1,
                },
            }
        doc = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(self.shape),
            "data_type": data_type,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(self.chunk_shape)},
            },
            "chunk_key_encoding": {
                "name": "default" if self.key_encoding == "default" else "v2",
                "configuration": {"separator": self.separator},
            },
            "fill_value": _fill_value_to_json(self.fill_value, self.dtype),
            "codecs": self.codecs,
            "attributes": self.attributes,
        }
        if self.dimension_names is not None:
            doc["dimension_names"] = list(self.dimension_names)
        return doc


def _fill_value_to_json(value: Any, dtype: np.dtype) -> Any:
    if value is None:
        return None
    if dtype.kind == "M":
        if isinstance(value, (int, np.integer)):
            return int(value)  # already a unit count since the epoch
        return int(np.datetime64(value).astype(dtype).view(np.int64))
    if dtype.kind == "f":
        v = float(value)
        if math.isnan(v):
            return "NaN"
        if v == math.inf:
            return "Infinity"
        if v == -math.inf:
            return "-Infinity"
        return v
    if dtype.kind == "b":
        return bool(value)
    if dtype.kind in ("U", "S", "T") or dtype == np.dtype(object):
        # any string representation (object, fixed U/S, numpy-2
        # StringDType) serializes its fill as a JSON string
        return str(value)
    return int(value)


def parse_array_meta(name: str, raw: bytes) -> ArrayMeta:
    """Parse one ``zarr.json`` document into :class:`ArrayMeta`.

    Only Zarr **v3** array metadata is accepted, mirroring the
    reference (``config.rs:242-247``).
    """
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ZarrFormatError(f"Invalid zarr.json for array {name}: {e}")

    if doc.get("zarr_format") != 3:
        raise ZarrFormatError(
            f"Only zarr v3 metadata is supported (array {name})"
        )
    if doc.get("node_type") != "array":
        raise ZarrFormatError(f"zarr.json for {name} is not an array node")

    grid = doc.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ZarrFormatError(
            f"Only regular chunk grids are supported (array {name})"
        )
    chunk_shape = tuple(grid["configuration"]["chunk_shape"])

    cke = doc.get(
        "chunk_key_encoding", {"name": "default", "configuration": {}}
    )
    key_encoding = "v2" if cke.get("name") == "v2" else "default"
    separator = cke.get("configuration", {}).get(
        "separator", "." if key_encoding == "v2" else "/"
    )

    zarr_dtype = doc["data_type"]
    if isinstance(zarr_dtype, dict):  # extension object form
        ext_name = zarr_dtype.get("name", str(zarr_dtype))
        cfg = zarr_dtype.get("configuration", {}) or {}
        if ext_name == "numpy.datetime64":
            # zarr-python's v3 datetime extension: unit + scale_factor
            if cfg.get("scale_factor", 1) != 1:
                raise ZarrFormatError(
                    f"Unsupported datetime64 scale_factor "
                    f"{cfg.get('scale_factor')} for array {name} "
                    f"(only 1 is supported)"
                )
            zarr_dtype = f"numpy.datetime64[{cfg.get('unit', 'ns')}]"
        else:
            zarr_dtype = ext_name
    np_dtype = zarr_dtype_to_numpy(zarr_dtype)  # validates

    dim_names = doc.get("dimension_names")
    if dim_names is not None:
        dim_names = tuple(dim_names)

    return ArrayMeta(
        name=name,
        shape=tuple(doc["shape"]),
        chunk_shape=chunk_shape,
        zarr_dtype=zarr_dtype,
        fill_value=_parse_fill_value(doc.get("fill_value"), np_dtype),
        codecs=list(doc.get("codecs", [])),
        dimension_names=dim_names,
        separator=separator,
        key_encoding=key_encoding,
        attributes=doc.get("attributes", {}) or {},
    )


def _v2_filters_to_codecs(name: str, filters, np_dtype) -> list:
    """Map numcodecs *filter* documents (applied between array bytes
    and the compressor) to bytes→bytes codecs. Supported: ``delta``
    (when it stores in the array's own dtype — an ``astype`` that
    differs would change the raw buffer's type under the ``bytes``
    codec's feet) and ``shuffle``. Anything else gets a clear error
    naming the filter."""
    out = []
    for f in filters or []:
        fid = (f or {}).get("id")
        if fid == "delta":
            dt = np.dtype(f.get("dtype", np_dtype.str))
            astype = f.get("astype")
            if astype is not None and np.dtype(astype) != dt:
                raise ZarrFormatError(
                    f"zarr v2 delta filter with astype={astype!r} != "
                    f"dtype={f.get('dtype')!r} is not supported "
                    f"(array {name})"
                )
            if dt != np_dtype:
                raise ZarrFormatError(
                    f"zarr v2 delta filter dtype {dt.str!r} differs from "
                    f"array dtype {np_dtype.str!r} (array {name})"
                )
            out.append(
                {"name": "v2_delta", "configuration": {"dtype": dt.str}}
            )
        elif fid == "shuffle":
            out.append(
                {
                    "name": "v2_shuffle",
                    "configuration": {
                        "elementsize": f.get(
                            "elementsize", np_dtype.itemsize
                        )
                    },
                }
            )
        else:
            raise ZarrFormatError(
                f"Unsupported zarr v2 filter {fid!r} for array {name}"
            )
    return out


def _v2_compressor_to_codecs(name: str, comp, endian: str) -> list:
    """Map a numcodecs compressor document to this engine's codec chain."""
    chain = [{"name": "bytes", "configuration": {"endian": endian}}]
    if comp is None:
        return chain
    cid = comp.get("id")
    if cid == "blosc":
        shuffle = {0: "noshuffle", 1: "shuffle", 2: "bitshuffle"}.get(
            comp.get("shuffle", 1), "shuffle"
        )
        chain.append(
            {
                "name": "blosc",
                "configuration": {
                    "cname": comp.get("cname", "lz4"),
                    "clevel": comp.get("clevel", 5),
                    "shuffle": shuffle,
                    "blocksize": comp.get("blocksize", 0),
                },
            }
        )
    elif cid == "zlib":
        chain.append(
            {"name": "zlib", "configuration": {"level": comp.get("level", 1)}}
        )
    elif cid == "gzip":
        chain.append(
            {"name": "gzip", "configuration": {"level": comp.get("level", 1)}}
        )
    elif cid == "zstd":
        chain.append(
            {"name": "zstd", "configuration": {"level": comp.get("level", 1)}}
        )
    elif cid == "lz4":
        # numcodecs LZ4: LE uint32 original size + raw lz4 block
        chain.append({"name": "lz4_sized", "configuration": {}})
    else:
        raise ZarrFormatError(
            f"Unsupported zarr v2 compressor {cid!r} for array {name}"
        )
    return chain


def parse_v2_array_meta(
    name: str, zarray_raw: bytes, zattrs_raw: Optional[bytes] = None
) -> ArrayMeta:
    """Parse a Zarr **v2** ``.zarray`` (+ optional ``.zattrs``).

    The reference rejects v2 outright (``config.rs:242-247``); reading
    it here is deliberate extra surface — the bulk of real-world zarr
    (xarray-written) is still v2. Dimension names come from xarray's
    ``_ARRAY_DIMENSIONS`` attribute when present. Fortran order maps
    onto the v3 transpose codec (F-order bytes ARE the C-order bytes
    of the reversed-dims array); delta/shuffle filters map onto typed
    bytes→bytes codecs; other filters get a clear error."""
    try:
        doc = json.loads(zarray_raw)
    except json.JSONDecodeError as e:
        raise ZarrFormatError(f"Invalid .zarray for array {name}: {e}")
    if doc.get("zarr_format") != 2:
        raise ZarrFormatError(f".zarray for {name} is not zarr v2")
    order = doc.get("order", "C")
    if order not in ("C", "F"):
        raise ZarrFormatError(
            f"zarr v2 array {name} has invalid order {order!r}"
        )
    np_dtype = np.dtype(doc["dtype"])
    if np_dtype.kind not in ("b", "i", "u", "f", "M"):
        raise ZarrFormatError(
            f"Unsupported zarr v2 dtype {doc['dtype']!r} for array {name}"
        )
    endian = "big" if np_dtype.byteorder == ">" else "little"
    zarr_dtype = numpy_to_zarr_dtype(np_dtype.newbyteorder("="))

    dim_names = None
    if zattrs_raw:
        try:
            attrs = json.loads(zattrs_raw)
            dims = attrs.get("_ARRAY_DIMENSIONS")
            if dims:
                dim_names = tuple(dims)
        except json.JSONDecodeError:
            attrs = {}
    else:
        attrs = {}

    # chain layout (encode order): [transpose?] bytes [filters] [compressor]
    # — compressor outermost, filters between serialization and it,
    # exactly numcodecs' pipeline
    comp_chain = _v2_compressor_to_codecs(name, doc.get("compressor"), endian)
    codecs = (
        comp_chain[:1]
        + _v2_filters_to_codecs(name, doc.get("filters"), np_dtype)
        + comp_chain[1:]
    )
    ndim = len(doc["shape"])
    if order == "F" and ndim > 1:
        codecs = [
            {
                "name": "transpose",
                "configuration": {"order": list(range(ndim - 1, -1, -1))},
            }
        ] + codecs

    fill = doc.get("fill_value")
    return ArrayMeta(
        name=name,
        shape=tuple(doc["shape"]),
        chunk_shape=tuple(doc["chunks"]),
        zarr_dtype=zarr_dtype,
        fill_value=_parse_fill_value(fill, np.dtype(zarr_dtype_to_numpy(zarr_dtype)))
        if fill is not None
        else 0,
        codecs=codecs,
        dimension_names=dim_names,
        separator=doc.get("dimension_separator", "."),
        key_encoding="v2",
        attributes=attrs if isinstance(attrs, dict) else {},
    )
