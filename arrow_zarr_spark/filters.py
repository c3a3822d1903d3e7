"""Spark pushed-filter → NumPy chunk-pruning predicates.

Re-implements the reference's chunk-granular filter pruning
(``/root/reference/crates/arrow-zarr/src/table/datafusion_filters.rs:95-157``
and ``filter.rs:61-83``): a chunk is *kept* iff at least one row
satisfies every supported conjunct; all filters are reported back to
Spark as unhandled so exact row-level filtering happens upstream —
the reference's ``Inexact`` contract (``table_provider.rs:91-96``).

Predicates are small picklable dataclasses (the reader, with its
compiled predicates, ships to executors).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Set, Tuple

import numpy as np

from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

__all__ = [
    "ChunkPredicate",
    "compile_chunk_filters",
    "conjunction_mask",
    "interval_possible",
    "prefix_successor",
]


def prefix_successor(s: str):
    """Smallest string greater than EVERY string with prefix ``s``:
    the last character increments (carrying past U+10FFFF), so
    ``s <= x < prefix_successor(s)`` iff ``x`` starts with ``s`` or
    sorts inside that range. None when no successor exists (all
    U+10FFFF). Used for startswith interval tests and for truncated
    string upper bounds (a truncated max must round UP to stay an
    upper bound — parquet's convention)."""
    t = list(s)
    while t:
        c = ord(t[-1])
        if c < 0x10FFFF:
            t[-1] = chr(c + 1)
            return "".join(t)
        t.pop()
    return None


@dataclass(frozen=True)
class ChunkPredicate:
    """One supported conjunct: op(column, value) evaluable on a decoded
    chunk column vector."""

    column: str
    op: str  # eq, lt, le, gt, ge, isin, notnull, isnull, neq
    value: Any = None

    def mask(self, cols: Dict[str, np.ndarray]) -> np.ndarray:
        v = cols[self.column]
        if self.op == "eq":
            return v == self.value
        if self.op == "neq":
            return v != self.value
        if self.op == "lt":
            return v < self.value
        if self.op == "le":
            return v <= self.value
        if self.op == "gt":
            return v > self.value
        if self.op == "ge":
            return v >= self.value
        if self.op == "isin":
            return np.isin(v, np.asarray(list(self.value)))
        if self.op == "notnull":
            # decoded zarr chunks never contain nulls (missing chunks
            # materialize as fill values, zarr_data_stream.rs:388-398)
            return np.ones(v.shape, dtype=bool)
        if self.op == "isnull":
            return np.zeros(v.shape, dtype=bool)
        if self.op in ("startswith", "endswith", "contains"):
            # vlen-utf8 chunks decode to object arrays of str —
            # pandas' vectorized str ops beat a Python loop here
            import pandas as pd

            s = pd.Series(v)
            if self.op == "startswith":
                m = s.str.startswith(self.value)
            elif self.op == "endswith":
                m = s.str.endswith(self.value)
            else:
                m = s.str.contains(self.value, regex=False)
            return m.fillna(False).to_numpy(dtype=bool)
        raise ValueError(f"unknown op {self.op}")


_SIMPLE = {
    EqualTo: "eq",
    EqualNullSafe: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
}

_NEGATED = {"eq": "neq", "neq": "eq", "lt": "ge", "ge": "lt", "gt": "le",
            "le": "gt", "isnull": "notnull", "notnull": "isnull"}


def _attr_name(f: Filter) -> str | None:
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested paths never occur: zarr schemas are flat
    return attr[0]


def _norm_value(v: Any) -> Any:
    """Normalize a pushed literal for NumPy comparison: Spark hands
    timestamp/date literals over as datetime.datetime / datetime.date,
    which NumPy refuses to compare against M8 chunk arrays — convert
    to np.datetime64 (timezone-naive wall clock, matching the NTZ
    column semantics)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return np.datetime64(v.replace(tzinfo=None))
    if isinstance(v, _dt.date):
        return np.datetime64(v)
    return v


def _compile_one(f: Filter, columns: Set[str]) -> ChunkPredicate | None:
    if isinstance(f, Not):
        child = _compile_one(f.child, columns)
        if child is None or child.op not in _NEGATED:
            return None
        return ChunkPredicate(child.column, _NEGATED[child.op], child.value)
    name = _attr_name(f)
    if name is None or name not in columns:
        return None
    t = type(f)
    if t in _SIMPLE:
        if f.value is None:
            return None
        return ChunkPredicate(name, _SIMPLE[t], _norm_value(f.value))
    if t is In:
        vals = [_norm_value(v) for v in f.value if v is not None]
        if not vals:
            return None
        return ChunkPredicate(name, "isin", tuple(vals))
    if t is IsNotNull:
        return ChunkPredicate(name, "notnull")
    if t is IsNull:
        return ChunkPredicate(name, "isnull")
    # string ops prune too — vlen-utf8 chunks decode to str arrays
    # (the "strings aren't decodable" era ended with the round-3 codec)
    if t is StringStartsWith:
        return ChunkPredicate(name, "startswith", str(f.value))
    if t is StringEndsWith:
        return ChunkPredicate(name, "endswith", str(f.value))
    if t is StringContains:
        return ChunkPredicate(name, "contains", str(f.value))
    return None


def compile_chunk_filters(
    filters: Sequence[Filter], columns: Sequence[str]
) -> Tuple[List[ChunkPredicate], List[str]]:
    """Compile the prunable subset of Spark's conjuncts.

    Returns (predicates, referenced column names). Unsupported conjuncts
    are simply not used for pruning — correct because pruning semantics
    are conservative (keep chunk unless provably row-free under the
    supported conjuncts).
    """
    colset = set(columns)
    preds = []
    for f in filters:
        p = _compile_one(f, colset)
        if p is not None:
            preds.append(p)
    ref_cols = sorted({p.column for p in preds})
    return preds, ref_cols


def conjunction_mask(
    preds: Sequence[ChunkPredicate], cols: Dict[str, np.ndarray]
):
    """AND-combined row mask of the supported conjuncts over a decoded
    cell, or None when there are no predicates. A False row provably
    fails one of Spark's pushed filters, so (under the Inexact
    contract, where Spark re-applies every filter above the scan) it
    is safe to emit garbage/fill values for that row's other columns —
    which is what lets shard decoding skip inner chunks whose rows are
    all-False."""
    if not preds:
        return None
    mask = None
    for p in preds:
        m = p.mask(cols)
        mask = m if mask is None else (mask & m)
        if not mask.any():
            return mask
    return mask


def interval_possible(pred: ChunkPredicate, lo, hi) -> bool:
    """Can ANY value in ``[lo, hi]`` satisfy ``pred``? The static
    (metadata-only) form of :meth:`ChunkPredicate.mask`, used to prune
    store objects from per-object min/max statistics before a single
    chunk byte is read — zarr's analogue of parquet row-group stats.

    Conservative by construction: returns False only when emptiness is
    PROVABLE via a positive comparison. NaN bounds (a float object
    containing NaN propagates through the writer's min/max) fail every
    comparison below, so NaN-contaminated objects are never pruned —
    which also keeps ``neq`` sound: min == max == value proves all
    rows equal ``value`` only when no NaN row hides outside the bounds.
    ``lo``/``hi`` of None (unknown stats) never prune."""
    if lo is None or hi is None:
        return True
    op, v = pred.op, pred.value
    if op == "notnull":
        return True
    if op == "isnull":
        # decoded zarr chunks never contain nulls (missing chunks
        # materialize as fill values) — provably empty
        return False
    if v is None:
        return True
    try:
        if op == "eq":
            return not (v < lo or v > hi)
        if op == "neq":
            return not (lo == hi == v)
        if op == "lt":  # some row < v  <=>  lo < v
            return not (lo >= v)
        if op == "le":
            return not (lo > v)
        if op == "gt":  # some row > v  <=>  hi > v
            return not (hi <= v)
        if op == "ge":
            return not (hi < v)
        if op == "isin":
            return any(not (x < lo or x > hi) for x in v)
        if op == "startswith":
            # strings with prefix v all sort in [v, successor(v))
            if hi < v:
                return False
            succ = prefix_successor(v)
            return succ is None or not (lo >= succ)
        # endswith/contains admit no interval reasoning
    except TypeError:
        # incomparable literal/stat types: stats can't prove anything
        return True
    return True  # unknown op: never prune


def chunk_survives(
    preds: Sequence[ChunkPredicate], cols: Dict[str, np.ndarray]
) -> bool:
    """True iff some row satisfies ALL predicates (``filter.rs:61-83``:
    AND-combined masks, chunk skipped only when no row matches)."""
    mask = conjunction_mask(preds, cols)
    return True if mask is None else bool(mask.any())
