"""Write numpy arrays as a Zarr v3 store.

The reference has no writer; its test fixtures write with raw
``zarrs::ArrayBuilder`` (``/root/reference/crates/arrow-zarr/src/lib.rs:170-240``).
This module is the equivalent fixture writer for our tests plus the
low-level half of the Spark sink (``arrow_zarr_spark.io.write_zarr``).
"""

from __future__ import annotations

import itertools
import json
from typing import Any, Optional, Sequence

import numpy as np

from .codecs import default_codecs, encode_chunk
from .meta import ArrayMeta, ZarrFormatError, numpy_to_zarr_dtype
from .store import LocalStore, Store, open_store

__all__ = [
    "write_root_group",
    "build_array_meta",
    "create_array",
    "write_chunk",
    "write_store",
    "consolidate_metadata",
    "v2_array_docs",
    "create_array_v2",
    "write_v2_metadata",
]


def write_root_group(
    store: Store,
    attributes: Optional[dict] = None,
    consolidated: Optional[dict] = None,
) -> None:
    """Write the root group document. ``consolidated`` maps array name
    → its full zarr.json dict; when given, the root doc carries the
    ``consolidated_metadata`` block (zarr-python's v3 convention), so
    readers plan the whole store from ONE metadata GET — no listing,
    no per-array GETs (see array.load_consolidated_arrays)."""
    doc = {"zarr_format": 3, "node_type": "group", "attributes": attributes or {}}
    if consolidated:
        doc["consolidated_metadata"] = {
            "kind": "inline",
            "must_understand": False,
            "metadata": dict(sorted(consolidated.items())),
        }
    store.set("zarr.json", json.dumps(doc).encode())


def consolidate_metadata(store: Store) -> int:
    """Post-hoc consolidation for a store written without it (the
    zarr-python ``zarr.consolidate_metadata()`` equivalent): gather
    every immediate array's zarr.json into the root group document.
    Returns the number of arrays consolidated.

    One listing walk at WRITE time buys every subsequent reader a
    single-GET planning pass — the right trade everywhere, and
    essential on object stores."""
    metadata = {}
    for name in store.list_array_names():
        raw = store.get(f"{name}/zarr.json")
        if raw is None:
            continue  # v2 array (.zarray) — consolidation is v3-only here
        metadata[name] = json.loads(raw)
    root_raw = store.get("zarr.json")
    attributes = {}
    if root_raw is not None:
        try:
            attributes = json.loads(root_raw).get("attributes", {}) or {}
        except json.JSONDecodeError:
            pass
    write_root_group(store, attributes=attributes, consolidated=metadata)
    return len(metadata)


def build_array_meta(
    name: str,
    *,
    shape: Sequence[int],
    chunk_shape: Sequence[int],
    dtype: Any,
    fill_value: Any = 0,
    dimension_names: Optional[Sequence[str]] = None,
    compression: str = "zstd",
    shard_shape: Optional[Sequence[int]] = None,
    attributes: Optional[dict] = None,
) -> ArrayMeta:
    """Compute a new array's :class:`ArrayMeta` WITHOUT writing it —
    :func:`create_array` minus the ``store.set`` — for writers that
    must publish metadata only after data lands (grid appends).

    ``shard_shape`` wraps the chunk chain in a ``sharding_indexed``
    codec: the store object grid becomes the SHARD grid and
    ``chunk_shape`` becomes the inner chunk shape — each dimension of
    shard_shape must be a multiple of the chunk dimension. Sharding is
    the object-count lever at scale (a 100-TB store at 64 MB chunks is
    ~1.6M objects unsharded)."""
    np_dtype = np.dtype(dtype)
    if np_dtype.kind in ("U", "O", "S", "T"):
        # string arrays: vlen-utf8 chain (zarr-python's layout); the
        # sharding/bytes machinery below doesn't apply to vlen data
        if shard_shape is not None:
            raise ZarrFormatError("string arrays cannot be sharded here")
        codecs = [{"name": "vlen-utf8", "configuration": {}}]
        if compression == "zstd":
            codecs.append(
                {"name": "zstd", "configuration": {"level": 3, "checksum": False}}
            )
        elif compression == "gzip":
            codecs.append({"name": "gzip", "configuration": {"level": 5}})
        elif isinstance(compression, str) and compression.startswith("blosc"):
            cname = (
                compression.split("-", 1)[1] if "-" in compression else "lz4"
            )
            codecs.append(
                {"name": "blosc", "configuration": {"cname": cname}}
            )
        elif compression not in (None, "none", "raw"):
            # same validation contract as the numeric path — a typo'd
            # compression must not silently write uncompressed data
            raise ZarrFormatError(
                f"Unsupported writer compression {compression!r} for "
                "string arrays"
            )
        return ArrayMeta(
            name=name,
            shape=tuple(int(s) for s in shape),
            chunk_shape=tuple(int(c) for c in chunk_shape),
            zarr_dtype="string",
            fill_value=fill_value if isinstance(fill_value, str) else "",
            codecs=codecs,
            dimension_names=tuple(dimension_names) if dimension_names else None,
            attributes=attributes or {},
        )
    inner = tuple(int(c) for c in chunk_shape)
    if shard_shape is not None:
        outer = tuple(int(s) for s in shard_shape)
        if len(outer) != len(inner) or any(
            o <= 0 or o % i for o, i in zip(outer, inner)
        ):
            raise ZarrFormatError(
                f"shard_shape {outer} must be a per-dimension multiple "
                f"of chunk_shape {inner}"
            )
        codecs = [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(inner),
                    "codecs": default_codecs(compression),
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }
        ]
        grid = outer
    else:
        codecs = default_codecs(compression)
        grid = inner
    return ArrayMeta(
        name=name,
        shape=tuple(int(s) for s in shape),
        chunk_shape=grid,
        zarr_dtype=numpy_to_zarr_dtype(np_dtype),
        fill_value=fill_value,
        codecs=codecs,
        dimension_names=tuple(dimension_names) if dimension_names else None,
        attributes=attributes or {},
    )


def create_array(store: Store, name: str, **kwargs) -> ArrayMeta:
    """Write the zarr.json for a new array and return its meta (see
    :func:`build_array_meta` for the keyword surface)."""
    meta = build_array_meta(name, **kwargs)
    store.set(f"{name}/zarr.json", json.dumps(meta.to_json()).encode())
    return meta


def write_chunk(
    store: Store, meta: ArrayMeta, chunk_idx: Sequence[int], data: np.ndarray
) -> None:
    """Write one chunk; edge chunks are padded to full chunk shape with fill."""
    full_shape = tuple(meta.chunk_shape)
    data = np.asarray(data, dtype=meta.dtype)
    if tuple(data.shape) != full_shape:
        fv = meta.fill_value if meta.fill_value is not None else 0
        padded = np.full(full_shape, fv, dtype=meta.dtype)
        padded[tuple(slice(0, s) for s in data.shape)] = data
        data = padded
    key = "/".join([meta.name, meta.chunk_key(chunk_idx)])
    store.set(key, encode_chunk(meta, data))


def write_array_data(store: Store, meta: ArrayMeta, data: np.ndarray) -> None:
    """Chunk and write a full ndarray."""
    data = np.asarray(data, dtype=meta.dtype)
    assert tuple(data.shape) == tuple(meta.shape), (data.shape, meta.shape)
    for idx in itertools.product(*(range(g) for g in meta.chunk_grid_shape)):
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, meta.chunk_shape, meta.shape)
        )
        write_chunk(store, meta, idx, data[slices])


def write_store(
    path: str,
    arrays: dict,
    *,
    chunk_shapes: dict,
    dimension_names: Optional[dict] = None,
    fill_values: Optional[dict] = None,
    compression: str = "zstd",
    shard_shapes: Optional[dict] = None,
    skip_data: Sequence[str] = (),
    consolidate: bool = False,
) -> Store:
    """Convenience: write a whole store from {name: ndarray}.

    ``skip_data`` lists arrays whose metadata is written but whose chunk
    objects are omitted — reproduces the reference's missing-chunk
    fixture (F2, ``lib.rs:318-332`` with ``write_data=false``).
    ``shard_shapes`` (per-array, optional) writes those arrays sharded
    (see :func:`create_array`). ``consolidate`` additionally embeds
    every array's metadata in the root document (off by default so
    fixtures keep exercising the listing-walk inference path; the
    Spark sink consolidates unconditionally).
    """
    store = open_store(path)
    write_root_group(store)
    dimension_names = dimension_names or {}
    fill_values = fill_values or {}
    shard_shapes = shard_shapes or {}
    for name in sorted(arrays):
        data = np.asarray(arrays[name])
        meta = create_array(
            store,
            name,
            shape=data.shape,
            chunk_shape=chunk_shapes[name],
            dtype=data.dtype,
            fill_value=fill_values.get(name, 0),
            dimension_names=dimension_names.get(name),
            compression=compression,
            shard_shape=shard_shapes.get(name),
        )
        if name not in skip_data:
            write_array_data(store, meta, data)
    if consolidate:
        consolidate_metadata(store)
    return store


# ---------------------------------------------------------------------------
# Zarr v2 output (the xarray-ecosystem interchange format)
# ---------------------------------------------------------------------------

_V2_COMPRESSORS = {
    "zstd": {"id": "zstd", "level": 3},
    "gzip": {"id": "gzip", "level": 5},
    "zlib": {"id": "zlib", "level": 6},
    "blosc": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    "blosc-lz4": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    "blosc-zstd": {"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 1},
}


def v2_array_docs(
    name: str,
    *,
    shape: Sequence[int],
    chunk_shape: Sequence[int],
    dtype: Any,
    fill_value: Any = 0,
    dimension_names: Optional[Sequence[str]] = None,
    compression: str = "zstd",
    attributes: Optional[dict] = None,
) -> tuple:
    """Build the Zarr **v2** ``(.zarray, .zattrs)`` documents for an
    array. The write-side source of truth is the READ-side parser:
    callers get their :class:`ArrayMeta` by feeding these docs to
    :func:`~arrow_zarr_spark.zarr.meta.parse_v2_array_meta`, so a
    store this module writes is by construction one the scan decodes.

    v2 has no sharding and this engine's v2 surface has no string
    (vlen) support — both raise here with the v3 writer named as the
    path that does."""
    np_dtype = np.dtype(dtype)
    if np_dtype.kind not in ("b", "i", "u", "f", "M"):
        raise ZarrFormatError(
            f"zarr v2 writer supports numeric/bool/datetime columns "
            f"only (array {name!r} is {np_dtype.str!r}); use "
            f"zarr_format=3 for strings"
        )
    if compression in (None, "none", "raw"):
        compressor = None
    else:
        compressor = _V2_COMPRESSORS.get(compression)
        if compressor is None:
            raise ZarrFormatError(
                f"Unsupported zarr v2 writer compression {compression!r} "
                f"(supported: {sorted(_V2_COMPRESSORS)}, none)"
            )
    fv = fill_value
    if isinstance(fv, float) and fv != fv:  # NaN: v2 JSON spells it
        fv = "NaN"
    elif isinstance(fv, np.generic):
        fv = fv.item()
    zarray = {
        "zarr_format": 2,
        "shape": [int(s) for s in shape],
        "chunks": [int(c) for c in chunk_shape],
        "dtype": np_dtype.newbyteorder("<").str,
        "compressor": compressor,
        "fill_value": fv,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    zattrs = dict(attributes or {})
    if dimension_names:
        zattrs["_ARRAY_DIMENSIONS"] = list(dimension_names)
    return zarray, zattrs


def create_array_v2(
    store: Store,
    name: str,
    *,
    shape: Sequence[int],
    chunk_shape: Sequence[int],
    dtype: Any,
    fill_value: Any = 0,
    dimension_names: Optional[Sequence[str]] = None,
    compression: str = "zstd",
    attributes: Optional[dict] = None,
) -> ArrayMeta:
    """Write ``.zarray``/``.zattrs`` for a new v2 array and return its
    meta — compiled by the v2 READER's parser, so the codec chain used
    to encode is exactly the one any reader of the docs derives."""
    from .meta import parse_v2_array_meta

    zarray, zattrs = v2_array_docs(
        name,
        shape=shape,
        chunk_shape=chunk_shape,
        dtype=dtype,
        fill_value=fill_value,
        dimension_names=dimension_names,
        compression=compression,
        attributes=attributes,
    )
    store.set(f"{name}/.zarray", json.dumps(zarray).encode())
    if zattrs:
        store.set(f"{name}/.zattrs", json.dumps(zattrs).encode())
    return parse_v2_array_meta(
        name,
        json.dumps(zarray).encode(),
        json.dumps(zattrs).encode() if zattrs else None,
    )


def write_v2_metadata(
    store: Store,
    docs: dict,
    group_attributes: Optional[dict] = None,
) -> None:
    """Publish a v2 store's metadata: ``.zgroup``, each array's
    ``.zarray``/``.zattrs``, and the consolidated ``.zmetadata``
    (zarr-python's ``zarr_consolidated_format`` 1) so readers plan the
    whole store from ONE GET — the v2 twin of the v3 root-document
    consolidation. ``docs`` maps array name → (zarray_doc, zattrs_doc)."""
    zgroup = {"zarr_format": 2}
    store.set(".zgroup", json.dumps(zgroup).encode())
    if group_attributes:
        store.set(".zattrs", json.dumps(group_attributes).encode())
    consolidated = {".zgroup": zgroup}
    for name in sorted(docs):
        zarray, zattrs = docs[name]
        store.set(f"{name}/.zarray", json.dumps(zarray).encode())
        consolidated[f"{name}/.zarray"] = zarray
        if zattrs:
            store.set(f"{name}/.zattrs", json.dumps(zattrs).encode())
            consolidated[f"{name}/.zattrs"] = zattrs
    store.set(
        ".zmetadata",
        json.dumps(
            {"zarr_consolidated_format": 1, "metadata": consolidated}
        ).encode(),
    )
