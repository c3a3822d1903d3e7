"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k: JVM higher-order
  functions (zip_with/aggregate) for the dot product, window row_number
  for the per-query top-k. The baseline and the verifier.
- :func:`hyperplane_lsh_ann` — the scale path: random-hyperplane LSH
  signatures bucket the corpus; candidates are scored only within
  matching buckets (equi-join, never a cross product). Multi-probe via
  several independent tables. At 1000 executors the bucket join
  shuffles each side once on (table, signature) — data-linear.
- :func:`ivf_ann` — IVF-style variant: k coarse centroids picked
  deterministically from the corpus, vectors assigned to nearest
  centroid (broadcast of k centroids), queries probe nprobe cells.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_expr", "cosine_topk", "hyperplane_lsh_ann", "ivf_ann"]


def cosine_expr(a: str, b: str):
    """Cosine similarity of two array<float> columns as a JVM-side
    expression (zip_with product, aggregate sum, double accumulation)."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(F.col(b), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    Deterministic: ranked by (rounded cosine DESC, neighbor id) so ties
    can't reorder across engines. Queries are broadcast when small —
    the common "probe set vs corpus" shape."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.standard_normal((n_planes, dim))


def _signature_col(vec_col: str, planes: np.ndarray):
    """Bit-pack sign(plane · v) into a long, all JVM-side: each plane's
    dot product is a zip_with/aggregate against a literal array."""
    bits = []
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def hyperplane_lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each of ``n_tables`` independent tables buckets vectors by an
    ``n_planes``-bit sign signature; query and corpus meet in an
    equi-join on (table, signature); candidates are exact-cosine scored
    and top-k'd. Recall grows with tables, cost with bucket occupancy —
    both data-linear, no cross product."""
    query_id_col = query_id_col or id_col
    dim = len(corpus.select(vec_col).first()[0])

    def sig_table(df, ident, idc):
        parts = []
        for t in range(n_tables):
            planes = _planes(dim, n_planes, t, seed)
            parts.append(
                df.select(
                    F.col(idc).alias(ident),
                    F.col(vec_col).alias(f"{ident}_v"),
                    F.lit(t).alias("tbl"),
                    _signature_col(vec_col, planes).alias("sig"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    csig = sig_table(corpus, "neighbor_id", id_col)
    qsig = sig_table(queries, "query_id", query_id_col)

    cand = (
        qsig.join(csig, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr("query_id_v", "neighbor_id_v"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids (every (n/n_cells)-th
    corpus vector by id), assignment by max cosine (broadcast centroids),
    queries probe their ``nprobe`` nearest cells."""
    query_id_col = query_id_col or id_col
    # Deterministic centroid pick WITHOUT a global window (a row_number
    # over an unpartitioned order collapses everything to one partition
    # — fatal at scale): stride the id space off a single max() agg.
    max_id = corpus.agg(F.max(id_col)).first()[0]
    stride = max(1, (int(max_id) + 1) // n_cells)
    cents = (
        corpus.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) / stride < n_cells)
        )
        .select(
            (F.col(id_col) / stride).cast("int").alias("cell"),
            F.col(vec_col).alias("centroid"),
        )
    )

    def assign(df, ident, idc, probes):
        scored = df.select(
            F.col(idc).alias(ident), F.col(vec_col).alias(f"{ident}_v")
        ).crossJoin(F.broadcast(cents)).select(
            ident,
            f"{ident}_v",
            "cell",
            cosine_expr(f"{ident}_v", "centroid").alias("cc"),
        )
        w = Window.partitionBy(ident).orderBy(F.col("cc").desc(), F.col("cell"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= probes)
            .drop("cc", "crank")
        )

    cassign = assign(corpus, "neighbor_id", id_col, 1)
    qassign = assign(queries, "query_id", query_id_col, nprobe)

    scored = (
        qassign.join(cassign, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("query_id_v", "neighbor_id_v"), 6).alias(
                "cosine"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
