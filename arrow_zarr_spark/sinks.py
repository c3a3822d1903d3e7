"""``df.write.format("zarr")`` — the DataSource writer half.

Zarr's regular chunk grid needs global row positions, which executor
tasks can't know while writing independently. Two sinks exist:

- :func:`arrow_zarr_spark.io.write_zarr` — order-preserving, two Spark
  jobs (count pass then chunk-colocated writes). Use when row order
  matters (it reproduces the DataFrame's partition order).
- this module — single-pass `df.write.format("zarr")`: each task
  streams its Arrow batches into full ``chunk_rows``-sized chunks
  written immediately under staged names, plus one small leftover
  buffer; ``commit()`` assigns global chunk positions (renames staged
  full chunks — metadata-only on object stores that support it, a
  byte move locally), packs all leftovers into tail chunks, and writes
  the final metadata. Rows land whole, but ROW ORDER ACROSS TASKS IS
  NOT PRESERVED (like most distributed sinks). Data volume moved at
  commit ≤ tasks × chunk_rows — bounded, not data-scale.
"""

from __future__ import annotations

import io as _io
import json
import uuid
from dataclasses import dataclass
from typing import Dict, Iterator, List

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    WriterCommitMessage,
)

from .io import SPARK_TO_ZARR, _zarr_dtype_for
from .zarr.codecs import encode_chunk
from .zarr.meta import ArrayMeta, ZarrFormatError
from .zarr.store import open_store
from .zarr.writer import create_array, write_chunk, write_root_group

__all__ = ["ZarrWriter", "ZarrCommitMessage"]

_NP = {
    "bool": np.bool_, "int8": np.int8, "int16": np.int16,
    "int32": np.int32, "int64": np.int64,
    "float32": np.float32, "float64": np.float64,
}


@dataclass
class ZarrCommitMessage(WriterCommitMessage):
    task_id: str
    n_full_chunks: int
    leftover_rows: int


def _stage_prefix(task_id: str) -> str:
    return f"__stage__/{task_id}"


class ZarrWriter(DataSourceArrowWriter):
    """write() runs per task on executors; commit()/abort() on the
    driver with every task's commit message."""

    def __init__(
        self, path: str, schema, options: Dict[str, str], overwrite: bool
    ):
        self.path = path
        self.schema = schema
        self.chunk_rows = int(options.get("chunk_rows", 65536) or 65536)
        if self.chunk_rows <= 0:
            raise ZarrFormatError("chunk_rows must be positive")
        self.overwrite = overwrite
        self.fill_value = float(options.get("fill_value", 0) or 0)
        self.compression = options.get("compression", "zstd")
        self.fields = list(schema.fields)
        self.zarr_dtypes = {f.name: _zarr_dtype_for(f) for f in self.fields}
        if not overwrite:
            # Spark only offers Append/Overwrite for Python data sources.
            # Append extends an existing aligned store (or creates a new
            # one); validate alignment at plan time, not at commit.
            _existing_layout(
                open_store(path), [f.name for f in self.fields], self.chunk_rows
            )

    def commit(self, messages) -> None:
        commit_write(
            self.path,
            messages,
            self.schema,
            self.chunk_rows,
            self.compression,
            self.fill_value,
            self.overwrite,
        )

    def abort(self, messages) -> None:
        abort_write(self.path, [m for m in messages if m is not None])

    def _chunk_meta(self, name: str) -> ArrayMeta:
        """Meta used only for encoding staged chunks (shape unknown yet —
        finalized at commit)."""
        from .zarr.codecs import default_codecs
        from .zarr.meta import ArrayMeta

        return ArrayMeta(
            name=name,
            shape=(self.chunk_rows,),
            chunk_shape=(self.chunk_rows,),
            zarr_dtype=self.zarr_dtypes[name],
            fill_value=self.fill_value,
            codecs=default_codecs(self.compression),
        )

    def write(self, iterator: Iterator[pa.RecordBatch]) -> ZarrCommitMessage:
        task_id = uuid.uuid4().hex
        store = open_store(self.path)
        names = [f.name for f in self.fields]
        metas = {n: self._chunk_meta(n) for n in names}
        buffers: Dict[str, List[np.ndarray]] = {n: [] for n in names}
        buffered = 0
        n_full = 0

        def flush_full():
            nonlocal buffered, n_full
            while buffered >= self.chunk_rows:
                for n in names:
                    joined = np.concatenate(buffers[n])
                    head, rest = (
                        joined[: self.chunk_rows],
                        joined[self.chunk_rows :],
                    )
                    buffers[n] = [rest]
                    store.set(
                        f"{_stage_prefix(task_id)}/{n_full}/{n}",
                        encode_chunk(
                            metas[n],
                            np.ascontiguousarray(
                                head, dtype=metas[n].dtype
                            ),
                        ),
                    )
                buffered -= self.chunk_rows
                n_full += 1

        for batch in iterator:
            cols = {
                name: batch.column(i).to_numpy(zero_copy_only=False)
                for i, name in enumerate(batch.schema.names)
            }
            n_rows = batch.num_rows
            for n in names:
                buffers[n].append(
                    np.asarray(cols[n], dtype=metas[n].dtype)
                )
            buffered += n_rows
            flush_full()

        leftover = 0
        if buffered:
            out = _io.BytesIO()
            np.savez(
                out,
                **{n: np.concatenate(buffers[n]) for n in names},
            )
            store.set(
                f"{_stage_prefix(task_id)}/leftover", out.getvalue()
            )
            leftover = buffered
        return ZarrCommitMessage(task_id, n_full, leftover)


def _existing_layout(store, names, chunk_rows):
    """For append mode: (existing_rows, existing_chunks) of an aligned
    existing store, or (0, 0) for a fresh path. Misaligned stores (chunk
    size mismatch, partial last chunk, column mismatch) error."""
    if not store.exists("zarr.json"):
        return 0, 0
    from .zarr.array import infer_store_arrays

    arrays = infer_store_arrays(store)
    by_name = {a.meta.name: a for a in arrays}
    if sorted(by_name) != sorted(names):
        raise ZarrFormatError(
            "Append schema mismatch: store has "
            f"{sorted(by_name)}, writing {sorted(names)}"
        )
    rows = by_name[names[0]].meta.shape[0]
    for a in arrays:
        if a.meta.ndim != 1 or a.meta.shape[0] != rows:
            raise ZarrFormatError("Append target must be a 1-D table store")
        if a.meta.chunk_shape[0] != chunk_rows:
            raise ZarrFormatError(
                f"Append chunk_rows {chunk_rows} != store chunk size "
                f"{a.meta.chunk_shape[0]}"
            )
    if rows % chunk_rows != 0:
        raise ZarrFormatError(
            "Append target's row count is not a chunk multiple "
            f"({rows} % {chunk_rows} != 0); rewrite with mode('overwrite')"
        )
    return rows, rows // chunk_rows


def commit_write(
    path: str,
    messages,
    schema,
    chunk_rows: int,
    compression: str,
    fill_value,
    overwrite: bool,
) -> None:
    """Driver-side: assign global chunk positions, pack leftovers, write
    final metadata, clear staging."""
    store = open_store(path)
    msgs = [m for m in messages if m is not None]
    names = [f.name for f in schema.fields]
    dtypes = {f.name: _NP[_zarr_dtype_for(f)] for f in schema.fields}

    base_rows, base_chunks = (
        (0, 0) if overwrite else _existing_layout(store, names, chunk_rows)
    )
    total_full = sum(m.n_full_chunks for m in msgs)
    total_leftover = sum(m.leftover_rows for m in msgs)
    new_rows = total_full * chunk_rows + total_leftover
    total_rows = base_rows + new_rows
    # appends must keep the existing chunk size; fresh writes may shrink
    # the chunk to the data size
    eff_chunk = (
        chunk_rows
        if base_rows
        else min(chunk_rows, max(total_rows, 1))
    )

    if overwrite:
        import os as _os

        for key in list(store.walk_keys()):
            if not key.startswith("__stage__"):
                try:
                    _os.remove(store._path(key))
                except (AttributeError, OSError):
                    break

    write_root_group(store)
    metas: Dict[str, ArrayMeta] = {}
    for f in schema.fields:
        metas[f.name] = create_array(
            store,
            f.name,
            shape=(total_rows,),
            chunk_shape=(eff_chunk,),
            dtype=dtypes[f.name],
            fill_value=fill_value,
            compression=compression,
        )

    # 1) staged full chunks -> global positions (byte move; on stores
    #    with server-side copy this is a metadata rename)
    next_chunk = base_chunks
    for m in msgs:
        for i in range(m.n_full_chunks):
            for n in names:
                data = store.get(f"{_stage_prefix(m.task_id)}/{i}/{n}")
                if data is None:
                    raise ZarrFormatError(
                        f"Missing staged chunk {m.task_id}/{i}/{n}"
                    )
                store.set(f"{n}/{metas[n].chunk_key((next_chunk,))}", data)
            next_chunk += 1

    # 2) leftovers (each < chunk_rows) -> packed tail chunks
    tails: Dict[str, List[np.ndarray]] = {n: [] for n in names}
    for m in msgs:
        if not m.leftover_rows:
            continue
        raw = store.get(f"{_stage_prefix(m.task_id)}/leftover")
        if raw is None:
            raise ZarrFormatError(f"Missing staged leftover {m.task_id}")
        npz = np.load(_io.BytesIO(raw))
        for n in names:
            tails[n].append(npz[n])
    if total_leftover:
        packed = {n: np.concatenate(tails[n]) for n in names}
        pos = 0
        while pos < total_leftover:
            take = min(eff_chunk, total_leftover - pos)
            for n in names:
                write_chunk(
                    store,
                    metas[n],
                    (next_chunk,),
                    packed[n][pos : pos + take],
                )
            next_chunk += 1
            pos += take

    abort_write(path, msgs)  # clear staging


def abort_write(path: str, messages) -> None:
    import os as _os
    import shutil as _shutil

    store = open_store(path)
    stage_dir = getattr(store, "_path", lambda k: None)("__stage__")
    if stage_dir and _os.path.isdir(stage_dir):
        _shutil.rmtree(stage_dir, ignore_errors=True)
        return
    for key in list(store.walk_keys()):  # non-local stores: per-key
        if key.startswith("__stage__"):
            try:
                _os.remove(store._path(key))
            except (AttributeError, OSError):
                break
