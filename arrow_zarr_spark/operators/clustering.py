"""Embedding clustering and cluster-gated (semantic) dedup.

- :func:`kmeans` — Lloyd's k-means over an ``array<float>`` embedding
  column, expressed as DataFrame ops: centroids live on the driver
  (k x d doubles — metadata-scale, like MLlib's own implementation),
  each iteration is one broadcast-join assignment pass plus one
  posexplode/groupBy centroid update. No global windows, no vector
  shuffles: the assignment shuffle carries (id, cluster, dist)
  scalars and partial aggregation collapses the k candidate rows per
  vector before they leave the mapper.
- :func:`semantic_neardup_pairs` — SemDeDup-style near-duplicate
  detection (Abbas et al. 2023, arXiv:2303.09540): cluster first,
  then compare pairs only *within* a cluster. The candidate volume
  drops from n^2 to sum(cluster_size^2) — the practical way to run
  embedding dedup over a 100 TB corpus where all-pairs (d06's exact
  verifier) is unthinkable and even LSH tables get expensive at low
  thresholds.

Every arithmetic step is engine-independent so DuckDB can replay it:
deterministic strided init (the IVF convention, similarity.py),
squared-L2 distances rounded to 6, centroid means rounded to 6
between iterations (rounding re-synchronizes both engines each pass,
so float error cannot accumulate across iterations), ties broken by
cluster id. The reference has no clustering surface (SURVEY.md:
"Absent from the reference"); this is north-star scope
(BASELINE.json pipeline operators).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans",
    "kmeans_sql",
    "semantic_neardup_pairs",
    "semantic_neardup_sql",
]


def _sq_l2(vec_col, cent_col):
    """Squared L2 distance between an array<float> vector and an
    array<double> centroid, accumulated left-to-right in double —
    DuckDB's list_sum(list_transform(...)) evaluates the same way and
    ROUND(.,6) absorbs the last-ulp difference of partial-sum order."""
    return F.round(
        F.aggregate(
            F.zip_with(vec_col, cent_col, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _strided_init(df: DataFrame, n_clusters: int, id_col: str, vec_col: str):
    """Deterministic seed centroids: every ((max_id+1)//k)-th vector by
    id — one max() aggregate, no global window (similarity.py:364)."""
    max_id = df.agg(F.max(id_col)).first()[0]
    if max_id is None:
        raise ValueError("kmeans: input has no rows")
    stride = max(1, (int(max_id) + 1) // n_clusters)
    cents = (
        df.filter(
            (F.col(id_col) % stride == 0)
            & (F.col(id_col) / stride < n_clusters)
        )
        .select(
            (F.col(id_col) / stride).cast("int").alias("cluster"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )
    return cents, stride


def _assign(df: DataFrame, cents: DataFrame, id_col: str, vec_col: str):
    """One assignment pass: broadcast the k centroids, score k
    candidates per vector, keep the argmin via min(struct(dist,
    cluster)) — a groupBy whose map-side combine collapses the k rows
    per vector before the shuffle (cheaper than a window at scale)."""
    scored = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "cluster",
            _sq_l2(F.col(vec_col), F.col("centroid")).alias("dist"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("dist", "cluster")).alias("best")
    )
    return best.select(id_col, F.col("best.cluster").alias("cluster"))


def kmeans(
    df: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means; returns (id, cluster).

    ``n_iters`` assignment passes run in total; centroids are
    recomputed (per-dimension mean, rounded to 6) after each pass but
    the last, so the output is the assignment against the
    (n_iters-1)-times-updated centroids. Clusters that lose every
    member simply drop out (both engines agree on this).

    Scale: per iteration, one broadcast join (k centroids — bytes) and
    one posexplode shuffle of n*d (cluster, dim, partial-sum) rows
    with map-side combine down to k*d per mapper. Driver holds k*d
    doubles. No step is quadratic in n.
    """
    if n_iters < 1:
        raise ValueError(f"kmeans: n_iters must be >= 1, got {n_iters}")
    df = df.where(F.col(vec_col).isNotNull())
    cents, _ = _strided_init(df, n_clusters, id_col, vec_col)
    for it in range(n_iters):
        assign = _assign(df, cents, id_col, vec_col)
        if it == n_iters - 1:
            return assign
        # centroid update: per-(cluster, dim) mean over members
        member_vecs = df.select(id_col, vec_col).join(assign, id_col)
        dims = member_vecs.select(
            "cluster", F.posexplode(vec_col).alias("pos", "val")
        )
        new_rows = (
            dims.groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "cv"))
                    ),
                    lambda s: s.getField("cv"),
                ).alias("centroid")
            )
            .collect()  # k rows of d doubles — metadata-scale
        )
        spark = df.sparkSession
        cents = spark.createDataFrame(
            [(int(r["cluster"]), [float(x) for x in r["centroid"]]) for r in new_rows],
            "cluster int, centroid array<double>",
        )
    raise AssertionError("unreachable")


def _sq_l2_sql(v: str, c: str) -> str:
    return (
        f"ROUND(list_sum(list_transform(range(1, len({v}) + 1), "
        f"i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i]))), 6)"
    )


def kmeans_sql(
    n_clusters: int,
    n_iters: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`kmeans` — the same strided init,
    rounded distances, rounded per-dimension means, and cluster-id
    tiebreaks, with each iteration unrolled into a CTE pair."""
    d = _sq_l2_sql("e.v", "c.centroid")
    parts = [
        f"WITH e AS (SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) "
        f"AS v FROM {table} WHERE {vec_col} IS NOT NULL), "
        f"st AS (SELECT GREATEST(1, (MAX(id) + 1) // {n_clusters}) AS s "
        f"FROM e), "
        f"c0 AS (SELECT CAST(id // s AS INT) AS cluster, v AS centroid "
        f"FROM e, st WHERE id % s = 0 AND id // s < {n_clusters})"
    ]
    for it in range(n_iters):
        prev = f"c{it}"
        parts.append(
            f"a{it} AS (SELECT id, cluster FROM ("
            f"SELECT e.id, c.cluster, ROW_NUMBER() OVER (PARTITION BY e.id "
            f"ORDER BY {d}, c.cluster) AS rn "
            f"FROM e, {prev} c) WHERE rn = 1)"
        )
        if it < n_iters - 1:
            parts.append(
                f"c{it + 1} AS ("
                f"SELECT cluster, list(cv ORDER BY pos) AS centroid FROM ("
                f"  SELECT cluster, pos, ROUND(AVG(val), 6) AS cv FROM ("
                f"    SELECT a.cluster, "
                f"    UNNEST(range(1, len(e.v) + 1)) AS pos, "
                f"    UNNEST(e.v) AS val "
                f"    FROM a{it} a JOIN e ON a.id = e.id"
                f"  ) GROUP BY cluster, pos"
                f") GROUP BY cluster)"
            )
    body = ", ".join(parts)
    return (
        f"{body} SELECT id AS {id_col}, cluster FROM a{n_iters - 1}"
    )


def semantic_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 8,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-gated embedding near-dup pairs (SemDeDup shape).

    Vectors are k-means-assigned (``n_iters`` passes), then pairs are
    generated ONLY within a cluster (equi-join on cluster id) and
    exact-cosine filtered at ``threshold``. Cross-cluster near-dups
    are missed by construction — that is the accepted recall trade
    of the method (measured against d06's exact pairs in tests); in
    exchange the candidate volume is sum(size_c^2) instead of n^2.

    Output: (id_a, id_b, cluster, cosine), id_a < id_b.
    """
    from .similarity import cosine_udf

    assign = kmeans(df, n_clusters, n_iters, id_col, vec_col)
    tagged = df.select(id_col, vec_col).join(assign, id_col)
    a = tagged.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        "cluster",
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        "cluster",
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "cluster",
            # Arrow kernel, bit-identical to cosine_expr on the
            # non-null nonzero vectors this path sees (similarity.py
            # docstring) — pair volume is sum(cell^2), so vectorized
            # scoring is the difference at scale
            F.round(cosine_udf("va", "vb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs


def semantic_neardup_sql(
    threshold: float,
    n_clusters: int,
    n_iters: int = 1,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`semantic_neardup_pairs`: replays the
    same clustering (kmeans_sql CTEs) and the same within-cluster
    exact-cosine pair filter."""
    inner = kmeans_sql(n_clusters, n_iters, table, id_col, vec_col)
    return (
        f"WITH asg AS ({inner}) "
        f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, "
        f"ca.cluster AS cluster, "
        f"ROUND(list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[])), 6) AS cosine "
        f"FROM {table} a JOIN asg ca ON a.{id_col} = ca.{id_col} "
        f"JOIN asg cb ON ca.cluster = cb.cluster "
        f"JOIN {table} b ON b.{id_col} = cb.{id_col} "
        f"WHERE a.{id_col} < b.{id_col} "
        f"AND ROUND(list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[])), 6) >= {threshold}"
    )
