"""Streaming Zarr source: tail a growing 1-D store as a stream.

A Zarr store "grows" by rewriting each array's zarr.json with a larger
shape and adding chunk objects (the append pattern of zarr writers).
Appenders must write chunk objects BEFORE the enlarged metadata —
the stream polls continuously and trusts the advertised shape, so
metadata-first appends expose a window where new rows read as fill
values.
This source polls the store's current length and emits the new row
range each microbatch — offset = row position, exactly-once replay via
readBetweenOffsets.

Uses the SimpleDataSourceStreamReader API (driver-side reads — right
for control-rate streams like sensor appends; a partition-parallel
DataSourceStreamReader is the scale path and shares all the chunk
logic below)."""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..datasource import _infer_struct
from ..zarr.array import infer_store_arrays
from ..zarr.meta import ZarrFormatError
from ..zarr.store import open_store

__all__ = ["ZarrStreamDataSource"]


class ZarrStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str):
        self.path = path

    def _arrays(self):
        arrays = infer_store_arrays(open_store(self.path))
        for a in arrays:
            if a.meta.ndim != 1:
                raise ZarrFormatError(
                    "zarr streaming source supports 1-D stores (the "
                    "writer's layout); got "
                    f"{a.meta.ndim}-D array {a.meta.name!r}"
                )
        return arrays

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _read_range(self, start: int, end: int):
        arrays = self._arrays()
        names = [a.meta.name for a in arrays]
        cols = []
        for a in arrays:
            chunk = a.meta.chunk_shape[0]
            vals = []
            c0, c1 = start // chunk, (end - 1) // chunk if end > start else -1
            for ci in range(c0, c1 + 1):
                block = a.read_chunk((ci,))
                lo = max(start - ci * chunk, 0)
                hi = min(end - ci * chunk, len(block))
                vals.extend(block[lo:hi].tolist())
            cols.append(vals)
        # a list_iterator, not a generator: the prefetch wrapper both
        # calls next() on it and pickles it for replay caching, and
        # generators don't pickle
        return iter([tuple(row) for row in zip(*cols)] if cols else [])

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        arrays = self._arrays()
        current = min(a.meta.shape[0] for a in arrays)
        lo = int(start.get("row", 0))
        if current <= lo:
            return iter([]), {"row": lo}
        return self._read_range(lo, current), {"row": current}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[Tuple]:
        return self._read_range(int(start["row"]), int(end["row"]))


class ZarrStreamDataSource(DataSource):
    """``spark.readStream.format("zarr-stream").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "zarr-stream"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ZarrFormatError("zarr-stream requires a path")
        return _infer_struct(infer_store_arrays(open_store(path)))

    def simpleStreamReader(self, schema: StructType) -> ZarrStreamReader:
        return ZarrStreamReader(self.options["path"])
