"""Pure-Python Zarr v3 format layer (no zarr-python dependency).

Submodules: :mod:`meta` (zarr.json + type map), :mod:`codecs`,
:mod:`store`, :mod:`array` (chunk reads), :mod:`table` (chunk-grid
planning + coordinate broadcast), :mod:`writer`.
"""

from .array import (
    ZarrArray,
    infer_store_arrays,
    infer_store_arrays_authoritative,
    load_consolidated_arrays,
    open_array,
)
from .meta import ArrayMeta, ZarrFormatError, parse_array_meta
from .store import LocalStore, Store, open_store
from .table import ChunkPlan
from .versions import (
    VersionConflictError,
    chunk_stat_view,
    refresh_chunk_stat_view,
    VersionStoreView,
    commit_version,
    delete_tag,
    export_version,
    latest_version,
    list_tags,
    open_version,
    resolve_as_of,
    resolve_tag,
    repair_zarr,
    rollback_zarr,
    scrub_zarr,
    sync_zarr,
    tag_version,
    vacuum_versions,
    version_log,
)
from .writer import (
    consolidate_metadata,
    create_array,
    write_array_data,
    write_chunk,
    write_root_group,
    write_store,
)

__all__ = [
    "ArrayMeta",
    "ChunkPlan",
    "LocalStore",
    "Store",
    "VersionConflictError",
    "VersionStoreView",
    "ZarrArray",
    "ZarrFormatError",
    "chunk_stat_view",
    "commit_version",
    "delete_tag",
    "export_version",
    "latest_version",
    "list_tags",
    "consolidate_metadata",
    "create_array",
    "open_version",
    "resolve_as_of",
    "refresh_chunk_stat_view",
    "repair_zarr",
    "resolve_tag",
    "rollback_zarr",
    "scrub_zarr",
    "sync_zarr",
    "tag_version",
    "vacuum_versions",
    "version_log",
    "infer_store_arrays",
    "infer_store_arrays_authoritative",
    "load_consolidated_arrays",
    "open_array",
    "open_store",
    "parse_array_meta",
    "write_array_data",
    "write_chunk",
    "write_root_group",
    "write_store",
]
