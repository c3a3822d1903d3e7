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
