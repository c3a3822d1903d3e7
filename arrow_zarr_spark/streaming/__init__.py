"""Structured Streaming operators and sources.

The reference is strictly batch (``Boundedness::Bounded``,
``/root/reference/crates/arrow-zarr/src/table/scanner.rs:50-55``) —
streaming is part of this engine's beyond-the-reference surface:
event-time windowed aggregation with watermarks, sessionization,
custom stateful processing, and a streaming Zarr source that tails a
growing store.
"""

from .event_ops import (
    sessionize_batch,
    sessionize_stream,
    stateful_user_counts,
    windowed_event_stats,
)
from .zarr_sink import (
    stream_regions_to_zarr,
    stream_to_zarr,
    stream_upsert_to_zarr,
)
from .zarr_stream import ZarrStreamDataSource

__all__ = [
    "ZarrStreamDataSource",
    "stream_to_zarr",
    "stream_regions_to_zarr",
    "stream_upsert_to_zarr",
    "sessionize_batch",
    "sessionize_stream",
    "stateful_user_counts",
    "windowed_event_stats",
]
