"""Streaming Zarr sink: writeStream → a growing Zarr store.

Each microbatch appends through :func:`arrow_zarr_spark.io.write_zarr`
in append mode — the boundary chunk merges in place, chunks land before
the enlarged metadata publishes, so a concurrent ``zarr-stream`` reader
(or any batch scan) always sees a consistent store. Exactly-once under
retries comes from Structured Streaming's batch-id contract: a replayed
``foreachBatch`` invocation with an already-applied batch id is skipped
via a high-water-mark key stored alongside the data.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..io import write_zarr
from ..zarr.store import open_store

__all__ = [
    "stream_to_zarr",
    "stream_regions_to_zarr",
    "stream_upsert_to_zarr",
]

_MARKER_KEY = "__stream_sink_state__"
_REGION_MARKER_KEY = "__stream_region_sink_state__"
_UPSERT_MARKER_KEY = "__stream_upsert_sink_state__"
#: LIVE exactly-once state — vacuum_zarr must never collect these
SINK_MARKER_KEYS = frozenset(
    {_MARKER_KEY, _REGION_MARKER_KEY, _UPSERT_MARKER_KEY}
)


def _once_per_batch(store, marker: str, batch_id: int, apply) -> None:
    """Shared exactly-once guard of both sinks: skip a replayed batch
    id whole (recovery re-runs foreachBatch with the same id), apply,
    then advance the store-side high-water mark."""
    raw = store.get(marker)
    state = json.loads(raw) if raw else {"last_batch": -1}
    if batch_id <= state["last_batch"]:
        return
    apply()
    store.set(marker, json.dumps({"last_batch": batch_id}).encode())


def stream_to_zarr(
    stream_df: DataFrame,
    path: str,
    chunk_rows: int = 65536,
    compression: str = "zstd",
    commit_every: int = 0,
    **start_kwargs,
):
    """Start a streaming query appending microbatches to a Zarr store.

    Returns the StreamingQuery. Example::

        q = stream_to_zarr(events_stream, "/data/events_zarr",
                           chunk_rows=65536,
                           checkpointLocation="/data/ckpt")

    ``commit_every=N`` (0 = off) snapshots a store VERSION
    (zarr/versions.py) after every N applied batches — reproducible
    training-data releases while ingestion keeps running: a consumer
    pins ``read_zarr(path, version=...)`` and never sees later
    appends. The commit runs inside the exactly-once apply (before
    the batch marker advances), so a replayed batch never commits
    twice; a crash in the window between a landed write and its
    marker can at worst re-run the same write+commit on recovery
    (at-least-once on the version BOUNDARY — the duplicate version is
    content-deduped, byte-identical, and vacuumable)."""
    checkpoint = start_kwargs.pop("checkpointLocation", None)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        store = open_store(path)

        def apply():
            mode = "append" if store.exists("zarr.json") else "error"
            write_zarr(
                batch_df,
                path,
                chunk_rows=chunk_rows,
                compression=compression,
                mode=mode,
            )
            if commit_every > 0 and (batch_id + 1) % commit_every == 0:
                from ..zarr.versions import commit_version

                commit_version(
                    batch_df.sparkSession,
                    path,
                    f"stream batch {batch_id}",
                )

        _once_per_batch(store, _MARKER_KEY, batch_id, apply)

    writer = stream_df.writeStream.foreachBatch(apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in start_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()


def stream_regions_to_zarr(
    stream_df: DataFrame,
    path: str,
    dims,
    stats: bool = True,
    **start_kwargs,
):
    """Start a streaming query applying each micro-batch as an
    in-place REGION update on an existing grid store — live
    corrections/measurements landing on a sensor/feature grid (the
    streaming face of :func:`arrow_zarr_spark.io.write_zarr_region`;
    :func:`stream_to_zarr` is the append face for 1-D table stores).

    The target store must already exist with ``dims`` as coordinate
    axes; every batch row must address an existing grid point (region
    semantics — the grid never grows here). Exactly-once across
    recovery replays via the same store-side batch marker protocol as
    the append sink: a replayed batch id is skipped whole, so a batch
    is never half-reapplied over later data. Within a batch the
    region write's own invalidate-first stats protocol keeps pruning
    sound even if the job dies mid-update."""
    checkpoint = start_kwargs.pop("checkpointLocation", None)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..io import write_zarr_region

        store = open_store(path)

        def apply():
            if not batch_df.isEmpty():
                write_zarr_region(
                    batch_df, path, dims=list(dims), stats=stats
                )

        _once_per_batch(store, _REGION_MARKER_KEY, batch_id, apply)

    writer = stream_df.writeStream.foreachBatch(apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in start_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()


def stream_upsert_to_zarr(
    stream_df: DataFrame,
    path: str,
    key_col: str,
    dedupe_col=None,
    drop_dedupe_col: bool = True,
    on_missing: str = "insert",
    stats: bool = True,
    chunk_rows: int = 65536,
    compression: str = "zstd",
    shard_chunks=None,
    **start_kwargs,
):
    """Start a streaming query MERGE-ing each micro-batch by key into
    a live table store — the CDC-ingestion face of
    :func:`arrow_zarr_spark.io.upsert_zarr` (append face:
    :func:`stream_to_zarr`; grid face: :func:`stream_regions_to_zarr`).
    A changelog stream keyed on ``key_col`` keeps the store current:
    existing keys update in place (delta-proportional via key-stats
    pruning), unseen keys append (``on_missing="insert"``, the
    default here — a changelog mixes both).

    ``dedupe_col``: a micro-batch may legitimately carry SEVERAL
    changes for one key (upsert_zarr rejects duplicate keys — the
    merge would be nondeterministic). Name a sequence/timestamp
    column and the sink keeps only each key's row with the greatest
    value before merging (ties lose deterministically only if the
    column is unique per key — use a monotonic CDC sequence number).
    Without it, batches must already be key-unique. A changelog's
    sequence column usually isn't a store column, so it is dropped
    after the dedup by default; pass ``drop_dedupe_col=False`` when
    ordering by a column the store carries (e.g. ``updated_at``).

    Exactly-once across recovery replays via the same store-side
    batch-marker protocol as the other sinks; a replayed batch id is
    skipped whole. ``chunk_rows``/``compression``/``shard_chunks``
    forward to the insert-append and must match the store's layout
    (the append validates and names any mismatch)."""
    checkpoint = start_kwargs.pop("checkpointLocation", None)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ..io import upsert_zarr

        store = open_store(path)

        def apply():
            df = batch_df
            if df.isEmpty():
                return
            if dedupe_col is not None:
                w = Window.partitionBy(key_col).orderBy(
                    F.col(dedupe_col).desc()
                )
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .drop("__rn")
                )
                if drop_dedupe_col:
                    df = df.drop(dedupe_col)
            upsert_zarr(
                df,
                path,
                key_col=key_col,
                on_missing=on_missing,
                stats=stats,
                chunk_rows=chunk_rows,
                compression=compression,
                shard_chunks=shard_chunks,
            )

        _once_per_batch(store, _UPSERT_MARKER_KEY, batch_id, apply)

    writer = stream_df.writeStream.foreachBatch(apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in start_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()
