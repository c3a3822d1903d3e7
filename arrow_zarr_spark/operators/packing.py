"""Sequence packing: group documents into training sequences under a
token budget — the curation step between dedup/scoring and tokenized
training shards.

Greedy first-fit packing is inherently sequential, so it runs per
*group* (default: the ``source`` column) inside ``applyInPandas``:
each group's documents are packed independently and in deterministic
(id-sorted) order. Groups shard across executors — at 100 TB the unit
of parallelism is the corpus shard, exactly how packing runs in real
pipelines (global packing would serialize and buys almost nothing in
fill rate).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: Optional[str] = "source",
    oversize: str = "own_pack",
) -> DataFrame:
    """Assign each document to a pack such that every pack's whitespace
    token total is ≤ ``max_tokens`` (greedy first-fit in id order within
    each group).

    Returns (group, pack_id, doc_id, n_tokens, pack_tokens, pack_docs).
    ``pack_id`` is unique within a group; documents longer than the
    budget get a pack of their own (``oversize="own_pack"``) or raise
    (``oversize="error"``)."""
    group_col = group_col or "__all__"
    base = df.select(
        (
            F.col(group_col)
            if group_col in df.columns
            else F.lit("all").alias(group_col)
        ),
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    out_schema = (
        f"{group_col} string, pack_id long, {id_col} long, "
        "n_tokens long, pack_tokens long, pack_docs long"
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        toks = pdf["n_tokens"].to_numpy()
        pack_ids = np.empty(len(pdf), dtype=np.int64)
        pack = 0
        filled = 0
        for i, t in enumerate(toks):
            if t > max_tokens and oversize == "error":
                raise ValueError(
                    f"document {pdf[id_col].iloc[i]} has {t} tokens "
                    f"> max_tokens={max_tokens}"
                )
            if filled and filled + t > max_tokens:
                pack += 1
                filled = 0
            pack_ids[i] = pack
            filled += t
            if filled >= max_tokens:
                pack += 1
                filled = 0
        pdf = pdf.assign(pack_id=pack_ids)
        agg = pdf.groupby("pack_id")["n_tokens"].agg(["sum", "count"])
        pdf["pack_tokens"] = agg["sum"].reindex(pdf["pack_id"]).to_numpy()
        pdf["pack_docs"] = agg["count"].reindex(pdf["pack_id"]).to_numpy()
        return pdf[
            [group_col, "pack_id", id_col, "n_tokens", "pack_tokens", "pack_docs"]
        ]

    return base.groupBy(group_col).applyInPandas(pack_group, schema=out_schema)


def shard_assign(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic training-shard assignment: shard = multiplicative
    hash of the document id (Knuth constant, mod 1000003 — the repo's
    engine-independent convention, text.py), mod ``n_shards``. Returns
    the input keyed with (shard, n_tokens).

    The multiplicative mix decorrelates shard from any id-range
    ordering (sequential ids round-robin-ish across shards), so shards
    stay balanced even when upstream ids cluster. Row-local arithmetic
    — no shuffle; writers repartition("shard") downstream, one shuffle
    total for the whole emit.
    """
    from .text import words_col

    shard = (
        (F.col(id_col) * F.lit(2654435761)) % F.lit(1000003) % F.lit(n_shards)
    ).cast("int")
    return df.select(
        F.col(id_col),
        shard.alias("shard"),
        F.size(words_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest for a sharded training-data emit: document
    count, token sum, id range per shard — the bookkeeping a loader
    needs to plan epochs without scanning the shards.

    One groupBy over the row-local shard assignment (map-side combine;
    the shuffle carries n_shards rows per mapper)."""
    assigned = shard_assign(df, n_shards, id_col, text_col)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tok_sum"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def shard_manifest_sql(
    n_shards: int = 16,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`shard_manifest` (same hash arithmetic)."""
    return (
        f"SELECT CAST(({id_col} * 2654435761) % 1000003 % {n_shards} "
        f"AS INT) AS shard, "
        f"COUNT(*) AS n_docs, "
        # CAST: DuckDB's SUM(BIGINT) is HUGEINT, Spark's is LONG — the
        # driver's canonicalizer type-tags them differently (the r25
        # lesson, suite.py)
        f"CAST(SUM(len(string_split({text_col}, ' '))) AS BIGINT) "
        f"AS tok_sum, "
        f"MIN({id_col}) AS min_id, MAX({id_col}) AS max_id "
        f"FROM {table} GROUP BY 1"
    )
