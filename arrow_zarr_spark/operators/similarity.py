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
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "binary_ann",
    "cosine_expr",
    "cosine_udf",
    "cosine_topk",
    "hyperplane_lsh_ann",
    "ivf_ann",
    "ivf_pq_ann",
    "pq_ann",
    "sq8_ann",
    "sq8_refine_topk",
    "train_pq_codebooks",
]


def cosine_udf(a: str, b: str):
    """Arrow-vectorized cosine of two array<float> columns.

    Bit-identical to :func:`cosine_expr` on non-null, nonzero vectors
    by construction: products and squares are computed in float32
    (what ``zip_with``'s multiply on array<float> elements yields),
    then accumulated into a float64 in strict left-to-right dimension
    order (what ``aggregate`` does) — NOT numpy's pairwise ``sum``,
    which changes the last ulp and can flip a ROUND boundary. ~3-5x
    faster than the interpreted higher-order functions on
    candidate-pair scoring; use it where the pair volume is large,
    keep ``cosine_expr`` where a plain JVM expression suffices.

    Degenerate inputs: a NULL vector yields NULL (matching the
    expression form); a zero-norm vector yields NULL here, where the
    expression form raises DIVIDE_BY_ZERO under ANSI mode; a vector
    containing a NaN component also yields NULL here (the NaN cosine
    crosses the Arrow boundary as NULL) where the expression form
    yields NaN. Both divergences are intentional and one-directional —
    a gate should skip degenerate vectors, not abort or propagate
    NaN-poisoned scores."""

    @F.pandas_udf("double")
    def _kernel(va: pd.Series, vb: pd.Series) -> pd.Series:
        valid = va.notna() & vb.notna()
        out = np.full(len(va), np.nan, dtype=np.float64)
        if valid.any():
            A = np.array(list(va[valid]), dtype=np.float32)
            B = np.array(list(vb[valid]), dtype=np.float32)
            prod = A * B
            sq_a = A * A
            sq_b = B * B
            n, d = prod.shape
            dot = np.zeros(n, dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            nb = np.zeros(n, dtype=np.float64)
            for j in range(d):  # dimension loop keeps accumulation order
                dot += prod[:, j]
                na += sq_a[:, j]
                nb += sq_b[:, j]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[np.asarray(valid)] = np.where(
                    denom > 0, dot / np.where(denom > 0, denom, 1.0), np.nan
                )
        # NaN -> NULL at the Arrow boundary
        return pd.Series(out).where(lambda s: s.notna(), None)

    return _kernel(F.col(a), F.col(b))


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


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
) -> DataFrame:
    """Exact top-k, Arrow-vectorized: the query matrix is broadcast to
    every partition, each partition computes a NumPy/BLAS matmul against
    its corpus slab and keeps a partition-local top-k, and a final
    window merges the per-partition candidates.

    Same output contract as :func:`cosine_topk` (rounded cosine,
    deterministic tiebreaks). This is the throughput kernel: one matmul
    per (partition × query set) instead of per-pair expression
    evaluation, and the shuffle carries only n_partitions*k rows per
    query — the scalable exact-ANN shape.

    The query side is collected to the driver (that's what makes the
    broadcast-matmul shape work), so it must be a PROBE SET, not a
    second corpus: ``max_query_rows`` caps the collect and raises
    before the driver can be flooded. For query sides beyond the cap
    use :func:`cosine_topk` (join-based, both sides distributed)."""
    import pandas as pd

    query_id_col = query_id_col or id_col
    qrows = (
        queries.select(query_id_col, vec_col)
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"cosine_topk_vectorized collects the query side to the "
            f"driver; got more than max_query_rows={max_query_rows} "
            f"rows. Pass a bounded probe set, raise max_query_rows "
            f"explicitly, or use cosine_topk for corpus-x-corpus."
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0
    spark = corpus.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def local_topk(batches):
        q_ids_l, q_mat_l, q_norm_l = b_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = 1.0
            cos = (q_mat_l @ c_mat.T) / np.outer(q_norm_l, c_norm)
            cos = np.round(cos, 6)
            for qi, qid in enumerate(q_ids_l):
                row = cos[qi]
                mask = c_ids != qid
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                take = min(k, len(cand_idx))
                # lexsort: primary cosine desc, tiebreak neighbor id asc
                order = cand_idx[
                    np.lexsort((c_ids[cand_idx], -row[cand_idx]))
                ][:take]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qid, dtype=np.int64),
                        "neighbor_id": c_ids[order],
                        "cosine": row[order],
                    }
                )

    local = corpus.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.standard_normal((n_planes, dim))


def hyperplane_lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    seed: int = 42,
    multiprobe: int = 2,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with multi-probe.

    Each of ``n_tables`` independent tables buckets vectors by an
    ``n_planes``-bit sign signature; query and corpus meet in an
    equi-join on (table, signature); candidates are exact-cosine scored
    and top-k'd. Recall grows with tables, cost with bucket occupancy —
    both data-linear, no cross product.

    ``multiprobe`` (0-2) additionally probes every signature within
    hamming distance ``multiprobe`` of the query's — on the QUERY side
    only, so the corpus is never re-hashed or expanded (queries are
    the small side by contract). This is the Lv-et-al multi-probe
    lever, and on this repo's synthetic embeddings it is the
    difference between a decorative gate and a working one: measured
    recall@5 vs exact on the sf0.1 corpus is 0.016 for the round-7
    defaults (12 planes, 4 tables, no probing) vs 0.85 for the
    round-8 defaults (10 planes, 8 tables, probe 2) — the bench's
    recall keys track this per round. Probing multiplies query-side
    signature rows by 1 + C(p,1) + C(p,2) (56 at the defaults), a
    per-query planning cost that is invisible next to the corpus
    scan; the corpus-side cost lever remains n_tables.

    Precondition (r14 ADVICE): ``queries`` must be a BOUNDED probe
    set — its probe-expanded signatures (n_queries x n_tables x ~56
    rows, vectors inline) are force-broadcast as the join's build
    side, because the optimizer otherwise misestimates the corpus
    branch as the smaller side and broadcasts the corpus (fatal at
    scale). A query set too large to broadcast needs
    :func:`cosine_topk_vectorized`'s batching or a shuffle join —
    not this operator."""
    import pandas as pd

    if not (0 <= int(multiprobe) <= 2):
        raise ValueError(
            f"hyperplane_lsh_ann: multiprobe must be 0..2, got "
            f"{multiprobe}"
        )
    query_id_col = query_id_col or id_col
    first = corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError(
            f"hyperplane_lsh_ann: corpus has no non-null '{vec_col}' "
            f"row to infer the vector dimension from"
        )
    dim = len(first[0])
    # all tables' planes stacked: (n_tables*n_planes, dim)
    planes_all = np.vstack(
        [_planes(dim, n_planes, t, seed) for t in range(n_tables)]
    )
    spark = corpus.sparkSession
    b_planes = spark.sparkContext.broadcast(planes_all)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    # probe masks: the identity, then every 1-bit flip, then every
    # 2-bit flip of the signature (query side only)
    masks = [0]
    if int(multiprobe) >= 1:
        masks += [1 << i for i in range(n_planes)]
    if int(multiprobe) >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    masks_arr = np.array(masks, dtype=np.int64)

    def sig_table(df, ident, idc, probe):
        """(id, vec, tbl, sig) — one NumPy matmul per batch computes
        every table's bit signature at once (Arrow in/out, no
        shuffle). ``probe=True`` expands each signature to its probe
        set (query side).

        Each vector crosses the Python boundary ONCE (the kernel
        emits the per-table signature ARRAY per row); the n_tables
        fan-out is a JVM ``posexplode`` and the probe fan-out a JVM
        ``transform`` over literal XOR masks — identical (tbl, sig)
        rows, but the Arrow transfer no longer replicates the vector
        n_tables×(1+probes) times (the query-side kernel was a 1.4 s
        single task on the broadcast critical path at 448 copies per
        vector — profiled r13; the corpus side saves 8× vector bytes
        per scan at any scale, guide §4.3)."""
        schema = f"{ident} long, {ident}_v array<float>, sigs array<long>"

        def kernel(batches):
            pl = b_planes.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                bits = (mat @ pl.T) >= 0  # (n, n_tables*n_planes)
                n = len(pdf)
                sigs = (
                    bits.reshape(n, n_tables, n_planes) @ weights
                ).astype(np.int64)  # (n, n_tables)
                yield pd.DataFrame(
                    {
                        ident: pdf[idc].to_numpy(),
                        f"{ident}_v": list(pdf[vec_col]),
                        "sigs": list(sigs),
                    }
                )

        out = df.mapInPandas(kernel, schema=schema)
        out = out.select(
            ident,
            f"{ident}_v",
            F.posexplode("sigs").alias("tbl", "sig"),
        )
        if probe and len(masks_arr) > 1:
            masks_sql = "array(" + ", ".join(
                f"{int(m)}L" for m in masks_arr
            ) + ")"
            out = out.select(
                ident,
                f"{ident}_v",
                "tbl",
                F.explode(
                    F.expr(f"transform({masks_sql}, m -> m ^ sig)")
                ).alias("sig"),
            )
        return out

    csig = sig_table(corpus, "neighbor_id", id_col, probe=False)
    # (the broadcast query side keeps its vector inline: an A/B of
    # scalar signatures + a vector re-attach join measured ~0.3 s
    # SLOWER — the per-candidate join costs more than the fatter
    # broadcast at any queries-are-small scale)
    qsig = sig_table(queries, "query_id", query_id_col, probe=True)

    # The broadcast hint pins the QUERY side as the build side: after
    # the JVM-side fan-out restructure the optimizer's size estimate
    # for the corpus branch shrank below the query branch's and it
    # broadcast the CORPUS — fatal at scale (queries are the bounded
    # side by contract; r13 plan audit).
    cand = (
        F.broadcast(qsig).join(csig, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
    )
    # Score BEFORE deduplicating: a pair found in several tables scores
    # identically (deterministic kernel), so distinct on the scored
    # 3-scalar-column output yields the same rows — but the dedup
    # shuffle then carries (long, long, double) instead of two full
    # vectors per row. Re-scoring duplicates costs at most n_tables×
    # vectorized kernel work, far cheaper than shuffling vectors
    # (r2's distinct-on-vectors was a measured ~55% regression).
    scored = cand.select(
        "query_id",
        "neighbor_id",
        # Arrow kernel, bit-identical to cosine_expr — candidate volume
        # scales with bucket occupancy, so vectorized scoring matters
        F.round(cosine_udf("query_id_v", "neighbor_id_v"), 6).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Lloyd-trained COARSE centroids for :func:`ivf_ann` /
    :func:`ivf_pq_ann`'s ``centroids=`` — :func:`train_pq_codebooks`
    with one sub-space spanning the full dimension, so it inherits
    that trainer's scale shape (one distributed pass per iteration,
    metadata-scale driver reduce, deterministic strided init, no
    RNG). Returns ``(n_cells, dim)`` float64 in the same 1/32768
    quantized space the IVF assignment scores in.

    Trained centroids are float means (NOT grid-exact), so a
    trained-centroid run is for recall, not bit-replayable SQL
    oracles — the suite's s03/s05 rows keep the strided default
    (the same convention as trained PQ codebooks)."""
    return train_pq_codebooks(
        corpus,
        m=1,
        ksub=n_cells,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
    )[0]


def _centroid_frame(spark, centroids) -> DataFrame:
    """(n_cells, dim) ndarray -> broadcastable (cell, centroid) frame
    in codebook row order (row index IS the cell id)."""
    cmat = np.asarray(centroids, dtype=np.float64)
    if cmat.ndim != 2:
        raise ValueError(
            f"centroids must be a (n_cells, dim) matrix; got shape "
            f"{cmat.shape}"
        )
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cmat)],
        "cell int, centroid array<double>",
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
    centroids: Optional["np.ndarray"] = None,
    max_query_rows: int = 65536,
) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids (every (n/n_cells)-th
    corpus vector by id), assignment by max cosine (broadcast centroids),
    queries probe their ``nprobe`` nearest cells.

    Plan shape (r14, the s05 ivf_pq_ann convention): the query side is
    driver-collected (``max_query_rows``-capped — raise it explicitly
    for a bigger probe set) and broadcast; ONE ``mapInPandas`` pass
    assigns the corpus and scores every candidate dot as slab matmuls;
    the only exchange left is the final top-k window. The corpus is
    never joined, never gains a cell column, never shuffles.

    Recall rides nprobe/n_cells (the bench's recall keys track it
    per round: 0.286 at the 2-of-16 defaults on the near-random
    sf0.1 embeddings — a HARD distribution for coarse quantization;
    clustered production embeddings concentrate true neighbors into
    probed cells and land much higher at the same nprobe). Scoring
    within probed cells is exact, so nprobe = n_cells is recall 1.0.

    All cosines (assignment AND scoring) are computed over embeddings
    quantized to a 1/32768 grid: dot products and squared norms become
    exact integer sums (order-independent, no float summation drift),
    and the cosine is then three correctly-rounded IEEE double ops —
    so the ENTIRE pipeline is engine-replayable arithmetic and the
    DuckDB oracle hash-proves it (the embedding-space analogue of the
    word-code signature convention). The quantization error is ≤1e-4
    relative — noise at ANN recall scales — and the output ``cosine``
    is explicitly the quantized-cosine, rounded to 6.

    ``centroids``: pass :func:`train_ivf_centroids` output to route
    with Lloyd-FITTED coarse centroids instead of the strided pick —
    the recall path (oracle-exempt, float means; the suite's s03 row
    keeps the strided default)."""
    query_id_col = query_id_col or id_col

    def qvec(c):
        # float32 -> double is exact; round(x*2^15) gives integers
        # whose products/sums stay exact in double (dims * 2^30 << 2^53)
        return F.transform(c, lambda x: F.round(x * F.lit(32768.0), 0))

    spark = corpus.sparkSession
    if centroids is not None:
        cmat = np.asarray(centroids, dtype=np.float64)
        if cmat.ndim != 2:
            raise ValueError(
                f"ivf_ann: centroids must be a (n_cells, dim) matrix; "
                f"got shape {cmat.shape}"
            )
        if cmat.shape[0] != n_cells:
            raise ValueError(
                f"ivf_ann: centroids carry "
                f"{cmat.shape[0]} cells but "
                f"n_cells={n_cells} — the nprobe/n_cells coverage "
                "contract would silently change"
            )
        cent_cells = np.arange(cmat.shape[0], dtype=np.int64)
    else:
        # Deterministic centroid pick WITHOUT a global window (a
        # row_number over an unpartitioned order collapses everything
        # to one partition — fatal at scale): stride the id space off
        # a single max() agg, then collect the <= n_cells rows ONCE
        # (metadata-scale; grid values are exact ints in doubles, so
        # the driver round-trip loses nothing)
        max_id = corpus.agg(F.max(id_col)).first()[0]
        if max_id is None:
            raise ValueError("ivf_ann: empty corpus")
        stride = max(1, (int(max_id) + 1) // n_cells)
        cent_rows = sorted(
            corpus.filter(
                (F.col(id_col) % stride == 0)
                & (F.col(id_col) / stride < n_cells)
            )
            .select(
                (F.col(id_col) / stride).cast("int").alias("cell"),
                qvec(F.col(vec_col)).alias("centroid"),
            )
            .collect(),
            key=lambda r: r["cell"],
        )
        if not cent_rows:
            raise ValueError("ivf_ann: empty corpus")
        cent_cells = np.array(
            [r["cell"] for r in cent_rows], dtype=np.int64
        )
        cmat = np.array(
            [r["centroid"] for r in cent_rows], dtype=np.float64
        )

    # ---- query side: driver-resident (r14, the s05 ivf_pq_ann
    # convention; guide §4 — the probe set is bounded by contract).
    # The old shape was a broadcast crossJoin x n_cells + per-query
    # window in Spark, then a cell equi-join whose per-pair dot was an
    # interpreted HOF fold (~dim JVM ops per candidate). Collecting
    # the capped query set lets the corpus kernel below compute every
    # candidate dot as one slab matmul — the join and both windows'
    # query-side exchange disappear from the plan.
    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            qvec(F.col(vec_col)).alias("qv"),
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"ivf_ann collects the query side to the driver; got more "
            f"than max_query_rows={max_query_rows} rows. Pass a "
            f"bounded probe set or raise max_query_rows explicitly."
        )
    q_ids = [r["qid"] for r in qrows]
    q_mat = (
        np.array([r["qv"] for r in qrows], dtype=np.float64)
        if qrows
        else np.zeros((0, cmat.shape[1]))
    )
    nq = len(q_ids)
    # exact-integer sums of squares -> sqrt: bit-identical to the old
    # JVM fold-then-sqrt per query row (order-independent < 2^53)
    q_na = np.sqrt(np.einsum("qd,qd->q", q_mat, q_mat))
    n_cell_vals = int(cent_cells.max()) + 1 if len(cent_cells) else 1
    probed = np.zeros((nq, n_cell_vals), dtype=bool)
    if nq:
        c_n = np.sqrt(np.einsum("cd,cd->c", cmat, cmat))
        with np.errstate(invalid="ignore", divide="ignore"):
            qcc = (q_mat @ cmat.T) / (q_na[:, None] * c_n[None, :])
        for qi in range(nq):
            # the old per-query window ordered (cc DESC, cell ASC);
            # Spark's DESC places NaN first (the all-zero-norm edge,
            # where every cc is NaN) — map NaN to +inf before negating
            # so lexsort reproduces that order exactly
            key = np.where(np.isnan(qcc[qi]), np.inf, qcc[qi])
            order = np.lexsort((cent_cells, -key))[:nprobe]
            probed[qi, cent_cells[order]] = True

    # Corpus-side assignment AND candidate scoring run INSIDE one
    # Arrow kernel (the s05 ivf_pq_ann shape): broadcast NumPy
    # centroids + the collected query set, one matmul per slab
    # assigns cells (argmax's first-max tiebreak = the window's
    # (cc DESC, cell ASC)), one matmul per probed cell computes the
    # candidate dots — so the corpus is never exploded x n_cells,
    # never window-shuffled per id, and never joined. Exact-integer
    # dots (< 2^53) make the matmuls order-independent, so
    # assignments and dots are bit-identical to the old
    # crossJoin+window+join form (and the s03 oracle is unchanged);
    # with FITTED float centroids (oracle-exempt recall path)
    # near-tie assignments may differ from fold-order JVM sums in
    # the last bit, as with every float kernel in this module.
    cent_nsq = np.einsum("cd,cd->c", cmat, cmat)
    bc = spark.sparkContext.broadcast(
        (cmat, cent_nsq, cent_cells, q_ids, q_mat, q_na, probed)
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    cschema = (
        f"query_id {qid_type}, neighbor_id {id_type}, "
        "dot double, q_na double, neighbor_nb double"
    )

    def pair_kernel(batches):
        # r14 (VERDICT r13 item 5): candidate scoring joins the
        # assignment INSIDE the kernel. Per slab: one matmul assigns
        # cells (argmax first-max = the window's (cc DESC, cell ASC)
        # tiebreak), one matmul per probed cell computes every
        # candidate dot — the old plan's cell equi-join and its
        # per-pair interpreted HOF fold (~dim JVM ops per candidate)
        # are gone. Bit-identity: dots and squared norms are
        # exact-integer sums (< 2^53, order-independent in float64),
        # sqrt is correctly rounded, and the divide+round stays in the
        # JVM below — the same IEEE expression the join used to
        # evaluate. Zero-norm rows take the safe-denominator
        # convention; a zero-norm CENTROID (impossible unless a
        # strided corpus vector is all-zero) is the one input where
        # argmax would diverge from the window's NaN-sorts-first
        # ordering.
        (cmat_l, cnsq_l, cells_l, q_ids_l, q_mat_l, q_na_l,
         probed_l) = bc.value
        if not len(q_ids_l):
            return
        cn = np.sqrt(cnsq_l)
        cn_safe = np.where(cn > 0, cn, 1.0)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            X = np.array(list(pdf["neighbor_id_v"]), dtype=np.float64)
            xn = np.sqrt(np.einsum("nd,nd->n", X, X))
            den = np.where(xn > 0, xn, 1.0)[:, None] * cn_safe[None, :]
            cell = cells_l[np.argmax((X @ cmat_l.T) / den, axis=1)]
            out_qi, out_ri = [], []
            out_dot = []
            for c in np.unique(cell):
                qidx = np.nonzero(probed_l[:, c])[0]
                if not len(qidx):
                    continue
                ridx = np.nonzero(cell == c)[0]
                dots = q_mat_l[qidx] @ X[ridx].T  # exact-int sums
                for j, qi in enumerate(qidx):
                    keep = ids[ridx] != q_ids_l[qi]
                    kidx = ridx[keep]
                    if not len(kidx):
                        continue
                    out_qi.append(np.full(len(kidx), qi, np.int64))
                    out_ri.append(kidx)
                    out_dot.append(dots[j][keep])
            if not out_qi:
                continue
            qi_all = np.concatenate(out_qi)
            ri_all = np.concatenate(out_ri)
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(q_ids_l, dtype=object)[
                        qi_all
                    ],
                    "neighbor_id": ids[ri_all],
                    "dot": np.concatenate(out_dot),
                    "q_na": q_na_l[qi_all],
                    "neighbor_nb": xn[ri_all],
                }
            )

    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            qvec(F.col(vec_col)).alias("neighbor_id_v"),
        )
        .mapInPandas(pair_kernel, schema=cschema)
        .select(
            "query_id",
            "neighbor_id",
            # identical IEEE expression to the old post-join qcos:
            # exact-int dot / (na * nb), one correctly-rounded divide,
            # rounded to 6 — the s03 oracle and tests pin it
            F.round(
                F.col("dot") / (F.col("q_na") * F.col("neighbor_nb")), 6
            ).alias("cosine"),
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


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Lloyd's k-means per PQ sub-space, all ``m`` sub-spaces trained
    in the SAME corpus pass — returns codebooks shaped
    ``(m, ksub_eff, dsub)`` for :func:`pq_ann`'s ``codebooks=``.

    The strided default codebook (every (n/ksub)-th corpus row) is a
    sample, not a fit — on hard distributions it costs recall
    (recall@5 ~0.5 on uniform-random vectors) and reconstruction
    error (12x the trained MSE on clustered vectors). Training starts
    FROM that strided init (deterministic — no RNG) and runs
    ``iters`` Lloyd rounds, so the result is reproducible
    run-to-run. Note the metric trained codebooks optimize is
    reconstruction MSE; when many corpus vectors are near-duplicates
    of each other a better fit can collapse them onto identical
    codes, so top-k among near-ties stays tie-broken by id — ADC
    recall gains show on spread-out corpora, not on piles of clones.

    Scale shape: each iteration is ONE distributed pass —
    ``mapInPandas`` assigns every row's ``m`` sub-vectors to their
    nearest centroids and emits per-partition partial sums, so the
    driver collects only ``n_partitions * m * ksub`` small rows
    (metadata-scale, independent of corpus size) and reduces them in
    NumPy. No corpus collect, no per-row Python. Empty cells keep
    their previous centroid (cells never die between rounds).

    Vectors are quantized to the same 1/32768 grid :func:`pq_ann`
    encodes on, so training optimizes exactly the space the encoder
    sees. Trained centroids are float means (NOT grid-exact), so a
    learned-codebook ``pq_ann`` run is for recall, not for
    bit-replayable SQL oracles — the suite's s04 row keeps the
    deterministic strided default."""
    import pandas as pd

    spark = corpus.sparkSession
    cbs = _pq_strided_codebooks(corpus, m, ksub, id_col, vec_col)
    n_codes, dsub = cbs.shape[1], cbs.shape[2]
    corpus_v = corpus.select(_pq_qvec(F.col(vec_col)).alias("cv"))
    if iters > 1:
        corpus_v = corpus_v.persist()  # scanned once per Lloyd round

    for _ in range(max(iters, 0)):
        cb_nsq = np.einsum("jcd,jcd->jc", cbs, cbs)
        b = spark.sparkContext.broadcast((cbs, cb_nsq))

        def kernel(batches, _m=m, _dsub=dsub, _n_codes=n_codes):
            cbs_l, cb_nsq_l = b.value
            sums = np.zeros((_m, _n_codes, _dsub), dtype=np.float64)
            counts = np.zeros((_m, _n_codes), dtype=np.int64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = np.array(list(pdf["cv"]), dtype=np.float64)
                for j in range(_m):
                    Xj = X[:, j * _dsub : (j + 1) * _dsub]
                    d2 = (
                        np.einsum("nd,nd->n", Xj, Xj)[:, None]
                        - 2.0 * (Xj @ cbs_l[j].T)
                        + cb_nsq_l[j][None, :]
                    )
                    codes = np.argmin(d2, axis=1)
                    np.add.at(sums[j], codes, Xj)
                    np.add.at(counts[j], codes, 1)
            if not seen:
                return
            j_idx, c_idx = np.nonzero(counts)
            yield pd.DataFrame(
                {
                    "j": j_idx.astype(np.int32),
                    "code": c_idx.astype(np.int32),
                    "vsum": list(sums[j_idx, c_idx]),
                    "cnt": counts[j_idx, c_idx],
                }
            )

        partials = corpus_v.mapInPandas(
            kernel, schema="j int, code int, vsum array<double>, cnt long"
        ).collect()  # <= n_partitions * m * ksub rows — metadata-scale
        b.unpersist()  # per-iteration broadcast: don't pin them all
        sums = np.zeros((m, n_codes, dsub), dtype=np.float64)
        counts = np.zeros((m, n_codes), dtype=np.int64)
        for r in partials:  # exact-int partial sums: order-independent
            sums[r["j"], r["code"]] += np.asarray(r["vsum"], dtype=np.float64)
            counts[r["j"], r["code"]] += r["cnt"]
        nonempty = counts > 0
        cbs = cbs.copy()
        cbs[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    if iters > 1:
        corpus_v.unpersist()
    return cbs


def _pq_qvec(c):
    """The 1/32768 quantization grid every PQ quantity lives on."""
    return F.transform(c, lambda x: F.round(x * F.lit(32768.0), 0))


def _pq_strided_codebooks(
    corpus: DataFrame, m: int, ksub: int, id_col: str, vec_col: str
) -> "np.ndarray":
    """The deterministic strided codebook: every (n/ksub)-th corpus
    vector by id, sliced into ``m`` sub-vectors. Shape
    ``(m, n_codes, dsub)``; row order IS code order."""
    max_id = corpus.agg(F.max(id_col)).first()[0]
    if max_id is None:
        raise ValueError("PQ codebooks: empty corpus (no codebook rows)")
    stride = max(1, (int(max_id) + 1) // ksub)
    cb_rows = (
        corpus.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) / stride < ksub)
        )
        .select(
            (F.col(id_col) / stride).cast("int").alias("code"),
            _pq_qvec(F.col(vec_col)).alias("v"),
        )
        .collect()
    )
    if not cb_rows:
        raise ValueError("PQ codebooks: empty corpus (no codebook rows)")
    cb_rows.sort(key=lambda r: r["code"])
    cb_full = np.array([r["v"] for r in cb_rows], dtype=np.float64)
    dim = cb_full.shape[1]
    if dim % m:
        raise ValueError(
            f"PQ codebooks: embedding dim {dim} not divisible by m={m}"
        )
    dsub = dim // m
    return np.stack(
        [cb_full[:, j * dsub : (j + 1) * dsub] for j in range(m)]
    )


def pq_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
    codebooks: Optional["np.ndarray"] = None,
    refine: Optional[int] = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) — the
    memory-bounded similarity path: each vector is encoded as ``m``
    sub-space codebook indices (here ``m`` small ints instead of
    ``dim`` floats — at 100 TB of embeddings the codes fit cluster
    memory when the raw vectors never could), and queries score
    candidates with asymmetric distance computation (ADC): one
    ``m x ksub`` lookup table per query, an O(m) table-gather per
    corpus vector instead of an O(dim) dot product.

    Recall levers (the bench's recall keys track them per round:
    0.428 at m=16/ksub=64 strided on the near-random sf0.1
    embeddings): more sub-spaces ``m``, bigger ``ksub``, trained
    codebooks (below), or a rerank tail — compose with
    :func:`sq8_refine_topk`'s retrieve-then-rerank shape when
    compressed-domain ranking alone is not enough.

    ``codebooks``: pass :func:`train_pq_codebooks`'s output to score
    with k-means-FITTED codebooks instead of the strided default —
    12x lower reconstruction MSE on clustered vectors and +0.05
    recall@5 even on worst-case uniform-random ones (both pinned in
    tests/test_operators.py::TestPQTrainedCodebooks). Trained
    centroids are float means, so only the default strided path is
    bit-replayable by a SQL oracle (the suite's s04 row uses the
    default).

    ``refine``: retrieve that many ADC candidates per query, then
    exact-cosine rerank them against the RAW vectors through the
    shared broadcast-shortlist tail (s07's contract — the corpus
    never shuffles in the rerank). This is the standard PQ recall
    fix (FAISS's IndexRefine): recall@k becomes the shortlist's ADC
    recall@refine, at the cost of ``n_queries x refine`` exact
    cosines. The rerank IS exact cosine, so a refined run's output
    is the exact top-k whenever the shortlist covers it.

    Determinism/oracle story (same convention as :func:`ivf_ann`):
    codebooks are picked deterministically (every (n/ksub)-th corpus
    vector by id, sliced into ``m`` sub-vectors), all vectors are
    quantized to a 1/32768 grid IN SPARK SQL (``ROUND(x*32768)``, the
    engine-consistent rounding), and every encode/score quantity is an
    exact integer sum in float64 (dims * 2^30 << 2^53) — the kernel
    never rounds. The approximate cosine is
    ``dot_adc / (sqrt(|q|^2) * sqrt(|reconstruction|^2))`` — three
    correctly-rounded IEEE ops over exact integers, so a SQL oracle
    replays the ranking bit-for-bit.

    Scale shape: codebooks (``ksub`` rows) and the query probe set are
    driver-collected (metadata-scale; ``max_query_rows`` caps the
    collect) and broadcast; the corpus streams through one
    ``mapInPandas`` pass that encodes each partition slab and keeps a
    per-partition top-k per query, so the shuffle carries only
    ``n_partitions * n_queries * k`` rows into the final merge window.
    No corpus-sized join, no driver-side corpus collection."""
    query_id_col = query_id_col or id_col
    if refine is not None and refine < k:
        raise ValueError(
            f"pq_ann: refine ({refine}) must be >= k ({k})"
        )
    retrieve = int(refine) if refine else k
    spark = corpus.sparkSession
    qvec = _pq_qvec

    if codebooks is None:
        # (m, n_codes, dsub) — row order IS code order, so np.argmin's
        # first-minimum tiebreak = lowest code id (mirrored in the
        # oracle)
        cbs = _pq_strided_codebooks(corpus, m, ksub, id_col, vec_col)
    else:
        cbs = np.asarray(codebooks, dtype=np.float64)
        if cbs.ndim != 3 or cbs.shape[0] != m:
            raise ValueError(
                f"pq_ann: codebooks must be (m={m}, n_codes, dsub); "
                f"got shape {cbs.shape}"
            )
    dsub = cbs.shape[2]
    dim = m * dsub
    cb_nsq = np.einsum("jcd,jcd->jc", cbs, cbs)  # exact ints (strided)

    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"), qvec(F.col(vec_col)).alias("qv")
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"pq_ann collects the query side to the driver; got more "
            f"than max_query_rows={max_query_rows} rows. Pass a bounded "
            f"probe set or raise max_query_rows explicitly."
        )
    q_ids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    if len(q_mat) and q_mat.shape[1] != dim:
        raise ValueError(
            f"pq_ann: query dim {q_mat.shape[1]} != corpus dim {dim}"
        )
    # ADC lookup tables: lut[j, q, c] = <q_sub_j, codebook_j[c]>
    lut = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ cbs[j].T for j in range(m)]
    ) if len(q_mat) else np.zeros((m, 0, cbs.shape[1]))
    q_nsq = np.einsum("qd,qd->q", q_mat, q_mat) if len(q_mat) else q_mat
    b = spark.sparkContext.broadcast((q_ids, lut, q_nsq, cb_nsq, cbs))

    corpus_q = corpus.select(
        F.col(id_col).alias("neighbor_id"), qvec(F.col(vec_col)).alias("cv")
    )
    out_schema = (
        "query_id long, neighbor_id long, dot double, "
        "nr_sq double, nq_sq double"
    )

    def kernel(batches):
        q_ids_l, lut_l, q_nsq_l, cb_nsq_l, cbs_l = b.value
        nq = len(q_ids_l)
        if not nq:
            return
        # running per-partition top-k per query: (cos, id, dot, nr_sq)
        acc = [None] * nq
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            X = np.array(list(pdf["cv"]), dtype=np.float64)
            if X.shape[1] != dim:
                raise ValueError(
                    f"pq_ann: corpus dim {X.shape[1]} != codebook dim "
                    f"{dim} — slicing would silently truncate"
                )
            n = len(ids)
            codes = np.empty((m, n), dtype=np.int64)
            for j in range(m):
                Xj = X[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    np.einsum("nd,nd->n", Xj, Xj)[:, None]
                    - 2.0 * (Xj @ cbs_l[j].T)
                    + cb_nsq_l[j][None, :]
                )
                codes[j] = np.argmin(d2, axis=1)  # first min = lowest code
            nr_sq = np.zeros(n, dtype=np.float64)
            for j in range(m):
                nr_sq += cb_nsq_l[j][codes[j]]
            nr = np.sqrt(nr_sq)
            nr_safe = np.where(nr > 0, nr, 1.0)
            for qi in range(nq):
                dots = np.zeros(n, dtype=np.float64)
                for j in range(m):
                    dots += lut_l[j, qi][codes[j]]
                qn = np.sqrt(q_nsq_l[qi])
                cos = dots / ((qn if qn > 0 else 1.0) * nr_safe)
                mask = ids != q_ids_l[qi]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                cand = (cos[idx], ids[idx], dots[idx], nr_sq[idx])
                if acc[qi] is not None:
                    cand = tuple(
                        np.concatenate([a, c])
                        for a, c in zip(acc[qi], cand)
                    )
                order = np.lexsort((cand[1], -cand[0]))[:retrieve]
                acc[qi] = tuple(c[order] for c in cand)
        for qi in range(nq):
            if acc[qi] is None:
                continue
            cos_a, ids_a, dot_a, nr_a = acc[qi]
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_a), q_ids_l[qi], np.int64),
                    "neighbor_id": ids_a,
                    "dot": dot_a,
                    "nr_sq": nr_a,
                    "nq_sq": np.full(len(ids_a), q_nsq_l[qi], np.float64),
                }
            )

    local = corpus_q.mapInPandas(kernel, schema=out_schema)
    # raw-cosine ordering for rank (bit-identical across engines since
    # the inputs are exact integers); rounded cosine only for display.
    # Zero-norm guard mirrors the kernel (and the oracle): a zero
    # reconstruction/query has dot 0, so the safe denominator yields
    # cosine 0 instead of an ANSI DIVIDE_BY_ZERO (or a NaN that
    # Spark's NaN-sorts-highest would rank FIRST, breaking the
    # partitioning invariant)
    nr_safe = F.when(F.col("nr_sq") > 0, F.col("nr_sq")).otherwise(
        F.lit(1.0)
    )
    nq_safe = F.when(F.col("nq_sq") > 0, F.col("nq_sq")).otherwise(
        F.lit(1.0)
    )
    cos_raw = F.col("dot") / (F.sqrt(nq_safe) * F.sqrt(nr_safe))
    w = Window.partitionBy("query_id").orderBy(
        cos_raw.desc(), F.col("neighbor_id")
    )
    ranked = local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= retrieve
    )
    if refine:
        short = ranked.select("query_id", "neighbor_id")
        return _exact_rerank(
            short, corpus, queries, k, id_col, vec_col, query_id_col
        )
    return ranked.select(
        "query_id",
        "neighbor_id",
        F.round(cos_raw, 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def ivf_pq_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
    codebooks: Optional["np.ndarray"] = None,
    centroids: Optional["np.ndarray"] = None,
    refine: Optional[int] = None,
) -> DataFrame:
    """IVF-PQ ANN — the two quantizers composed the way a 100-TB
    vector index actually runs (FAISS's IVFPQ; Jégou et al. 2011
    §V): a coarse quantizer routes every vector to one of ``n_cells``
    inverted lists, queries probe their ``nprobe`` nearest cells, and
    candidates inside probed cells are scored with PQ asymmetric
    distance — so query cost is (probed fraction of corpus) x O(m)
    table-gathers instead of n x O(dim) dot products.

    Recall compounds BOTH quantizers' losses (bench recall keys:
    0.214 at 2-of-16 cells x m=16/ksub=64 on the near-random sf0.1
    embeddings ≈ ivf's cell-coverage miss x pq's ranking miss —
    worst-case data for both; the levers are nprobe, m/ksub/trained
    codebooks, and a rerank tail, same as the components').

    Plan shape — BETTER than running :func:`ivf_ann` then
    :func:`pq_ann`: the coarse assignment happens INSIDE the same
    ``mapInPandas`` pass that PQ-encodes (centroids are broadcast
    NumPy, each slab assigns its rows with one matmul), so the corpus
    is never joined against centroids, never gains a cell column,
    and never shuffles; the only exchange is the final top-k merge
    window carrying ``n_partitions * n_queries * k`` rows — identical
    to s04's single-exchange contract, with ~(nprobe/n_cells) of the
    scoring work. Queries and both codebooks are driver-collected
    (metadata-scale, ``max_query_rows``-capped) and broadcast.

    Determinism/oracle story: the same 1/32768 grid as
    :func:`ivf_ann`/:func:`pq_ann` — every dot/norm is an exact
    integer sum, every cosine three correctly-rounded IEEE ops, so
    assignment (max cosine, ties to the LOWEST cell: np.argmax's
    first-max = the oracle's ``ORDER BY cos DESC, cell``), probe
    ranking, PQ encoding (first-min = lowest code) and ADC ranking
    replay bit-for-bit in DuckDB SQL. ``codebooks`` accepts
    :func:`train_pq_codebooks` output (recall path, oracle-exempt),
    like :func:`pq_ann`; ``centroids`` accepts
    :func:`train_ivf_centroids` output the same way; ``refine``
    exact-reranks that many ADC candidates per query through the
    shared broadcast-shortlist tail (see :func:`pq_ann`)."""
    import pandas as pd

    query_id_col = query_id_col or id_col
    if refine is not None and refine < k:
        raise ValueError(
            f"ivf_pq_ann: refine ({refine}) must be >= k ({k})"
        )
    retrieve = int(refine) if refine else k
    spark = corpus.sparkSession
    qvec = _pq_qvec

    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.ndim != 2:
            raise ValueError(
                f"ivf_pq_ann: centroids must be (n_cells, dim); got "
                f"shape {cents.shape}"
            )
        if cents.shape[0] != n_cells:
            raise ValueError(
                f"ivf_pq_ann: centroids carry {cents.shape[0]} cells "
                f"but n_cells={n_cells} — the nprobe/n_cells coverage "
                "contract would silently change"
            )
    else:
        # coarse centroids: deterministic strided pick (ivf_ann
        # convention)
        max_id = corpus.agg(F.max(id_col)).first()[0]
        if max_id is None:
            raise ValueError("ivf_pq_ann: empty corpus")
        cstride = max(1, (int(max_id) + 1) // n_cells)
        cent_rows = (
            corpus.filter(
                (F.col(id_col) % cstride == 0)
                & (F.col(id_col) / cstride < n_cells)
            )
            .select(
                (F.col(id_col) / cstride).cast("int").alias("cell"),
                qvec(F.col(vec_col)).alias("v"),
            )
            .collect()
        )
        if not cent_rows:
            raise ValueError("ivf_pq_ann: empty corpus")
        cent_rows.sort(key=lambda r: r["cell"])
        cents = np.array([r["v"] for r in cent_rows], dtype=np.float64)
    cent_nsq = np.einsum("cd,cd->c", cents, cents)

    if codebooks is None:
        cbs = _pq_strided_codebooks(corpus, m, ksub, id_col, vec_col)
    else:
        cbs = np.asarray(codebooks, dtype=np.float64)
        if cbs.ndim != 3 or cbs.shape[0] != m:
            raise ValueError(
                f"ivf_pq_ann: codebooks must be (m={m}, n_codes, dsub); "
                f"got shape {cbs.shape}"
            )
    dsub = cbs.shape[2]
    dim = m * dsub
    if cents.shape[1] != dim:
        raise ValueError(
            f"ivf_pq_ann: embedding dim {cents.shape[1]} != m*dsub {dim}"
        )
    cb_nsq = np.einsum("jcd,jcd->jc", cbs, cbs)

    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"), qvec(F.col(vec_col)).alias("qv")
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"ivf_pq_ann collects the query side to the driver; got more "
            f"than max_query_rows={max_query_rows} rows. Pass a bounded "
            f"probe set or raise max_query_rows explicitly."
        )
    q_ids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    if len(q_mat) and q_mat.shape[1] != dim:
        raise ValueError(
            f"ivf_pq_ann: query dim {q_mat.shape[1]} != corpus dim {dim}"
        )
    nq = len(q_ids)
    n_c = len(cents)
    # per-query probed cells: cosine over exact ints, ties to lowest
    # cell (lexsort minor key) — replayed by the oracle's window
    probed = np.zeros((nq, n_c), dtype=bool)
    if nq:
        qn = np.sqrt(np.einsum("qd,qd->q", q_mat, q_mat))
        cn = np.sqrt(cent_nsq)
        denom = np.where(qn > 0, qn, 1.0)[:, None] * np.where(
            cn > 0, cn, 1.0
        )[None, :]
        qcos = (q_mat @ cents.T) / denom
        for qi in range(nq):
            order = np.lexsort((np.arange(n_c), -qcos[qi]))[:nprobe]
            probed[qi, order] = True
    lut = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ cbs[j].T for j in range(m)]
    ) if nq else np.zeros((m, 0, cbs.shape[1]))
    q_nsq = np.einsum("qd,qd->q", q_mat, q_mat) if nq else q_mat
    b = spark.sparkContext.broadcast(
        (q_ids, lut, q_nsq, probed, cents, cent_nsq, cb_nsq, cbs)
    )

    corpus_q = corpus.select(
        F.col(id_col).alias("neighbor_id"), qvec(F.col(vec_col)).alias("cv")
    )
    out_schema = (
        "query_id long, neighbor_id long, dot double, "
        "nr_sq double, nq_sq double"
    )

    def kernel(batches):
        (q_ids_l, lut_l, q_nsq_l, probed_l, cents_l, cent_nsq_l,
         cb_nsq_l, cbs_l) = b.value
        nq_l = len(q_ids_l)
        if not nq_l:
            return
        acc = [None] * nq_l
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            X = np.array(list(pdf["cv"]), dtype=np.float64)
            n = len(ids)
            # coarse assignment: one matmul per slab; argmax's
            # first-max tiebreak = lowest cell id
            xn = np.sqrt(np.einsum("nd,nd->n", X, X))
            cn_l = np.sqrt(cent_nsq_l)
            den = np.where(xn > 0, xn, 1.0)[:, None] * np.where(
                cn_l > 0, cn_l, 1.0
            )[None, :]
            cell = np.argmax((X @ cents_l.T) / den, axis=1)
            # rows in cells NO query probes can never be candidates —
            # drop them BEFORE the encode loop (the m argmin-L2
            # matmuls are the dominant kernel cost; this is where the
            # ~nprobe/n_cells saving actually lands)
            keep = probed_l.any(axis=0)[cell]
            if not keep.any():
                continue
            ids, X, cell = ids[keep], X[keep], cell[keep]
            n = len(ids)
            codes = np.empty((m, n), dtype=np.int64)
            for j in range(m):
                Xj = X[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    np.einsum("nd,nd->n", Xj, Xj)[:, None]
                    - 2.0 * (Xj @ cbs_l[j].T)
                    + cb_nsq_l[j][None, :]
                )
                codes[j] = np.argmin(d2, axis=1)
            nr_sq = np.zeros(n, dtype=np.float64)
            for j in range(m):
                nr_sq += cb_nsq_l[j][codes[j]]
            nr = np.sqrt(nr_sq)
            nr_safe = np.where(nr > 0, nr, 1.0)
            for qi in range(nq_l):
                # the IVF gate: only rows in this query's probed cells
                mask = probed_l[qi][cell] & (ids != q_ids_l[qi])
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                dots = np.zeros(len(idx), dtype=np.float64)
                for j in range(m):
                    dots += lut_l[j, qi][codes[j][idx]]
                qn_l = np.sqrt(q_nsq_l[qi])
                cos = dots / ((qn_l if qn_l > 0 else 1.0) * nr_safe[idx])
                cand = (cos, ids[idx], dots, nr_sq[idx])
                if acc[qi] is not None:
                    cand = tuple(
                        np.concatenate([a, c])
                        for a, c in zip(acc[qi], cand)
                    )
                order = np.lexsort((cand[1], -cand[0]))[:retrieve]
                acc[qi] = tuple(c[order] for c in cand)
        for qi in range(nq_l):
            if acc[qi] is None:
                continue
            cos_a, ids_a, dot_a, nr_a = acc[qi]
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_a), q_ids_l[qi], np.int64),
                    "neighbor_id": ids_a,
                    "dot": dot_a,
                    "nr_sq": nr_a,
                    "nq_sq": np.full(len(ids_a), q_nsq_l[qi], np.float64),
                }
            )

    local = corpus_q.mapInPandas(kernel, schema=out_schema)
    nr_safe = F.when(F.col("nr_sq") > 0, F.col("nr_sq")).otherwise(
        F.lit(1.0)
    )
    nq_safe = F.when(F.col("nq_sq") > 0, F.col("nq_sq")).otherwise(
        F.lit(1.0)
    )
    cos_raw = F.col("dot") / (F.sqrt(nq_safe) * F.sqrt(nr_safe))
    w = Window.partitionBy("query_id").orderBy(
        cos_raw.desc(), F.col("neighbor_id")
    )
    ranked = local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= retrieve
    )
    if refine:
        short = ranked.select("query_id", "neighbor_id")
        return _exact_rerank(
            short, corpus, queries, k, id_col, vec_col, query_id_col
        )
    return ranked.select(
        "query_id",
        "neighbor_id",
        F.round(cos_raw, 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def _sq8_scales(
    corpus: DataFrame,
    vec_col: str,
    dim: Optional[int] = None,
    who: str = "sq8",
) -> "np.ndarray":
    """Per-dimension SQ8 scales over the grid-quantized corpus:
    ``s_d = max(1, ceil(max|n_d| / 127))`` — integers, so the encode
    stays in exact integer arithmetic. One partial-aggregated reduce
    (no explode, no shuffle of data rows: ``dim`` max-abs columns
    combine map-side).

    Pass ``dim`` when the caller already knows it (e.g. from the
    collected query matrix): the dimension-discovery ``first()`` then
    folds into the maxes aggregate — ONE Spark action instead of two
    (each extra Python-session action costs a ~0.2 s floor, profiled
    r13). The folded aggregate carries min/max ``SIZE(v)`` and uses
    ``TRY_ELEMENT_AT`` (never out-of-bounds under ANSI), so a
    corpus/dim mismatch still fails with a named error and the scale
    VALUES are identical either way."""
    gv = _pq_qvec(F.col(vec_col))
    # one F.expr per dimension (SQL string, 0-based subscript ==
    # element_at(d+1)) instead of 4 Column-API calls each — plan
    # construction cost, not semantics (r13 optimization)
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError(f"{who}: empty corpus")
        dim = int(first["d"])
        row = corpus.select(gv.alias("v")).agg(
            *[
                F.expr(f"MAX(ABS(v[{d}]))").alias(f"m{d}")
                for d in range(dim)
            ]
        ).first()
    else:
        row = corpus.select(gv.alias("v")).agg(
            F.expr("MIN(SIZE(v))").alias("dmin"),
            F.expr("MAX(SIZE(v))").alias("dmax"),
            *[
                F.expr(f"MAX(ABS(TRY_ELEMENT_AT(v, {d + 1})))").alias(
                    f"m{d}"
                )
                for d in range(dim)
            ],
        ).first()
        if row["dmin"] is None:
            raise ValueError(f"{who}: empty corpus")
        if int(row["dmin"]) != dim or int(row["dmax"]) != dim:
            got = (
                str(int(row["dmin"]))
                if row["dmin"] == row["dmax"]
                else f"{int(row['dmin'])}..{int(row['dmax'])}"
            )
            # named after the CALLER (r14 ADVICE: the helper is shared
            # with build_ivf_sq8_index — a hardcoded "sq8_ann:" would
            # misattribute a dim-passing caller's error)
            raise ValueError(
                f"{who}: query dim {dim} != corpus dim {got}"
            )
    ma = np.array([int(row[f"m{d}"]) for d in range(dim)], dtype=np.int64)
    return np.maximum(1, (ma + 126) // 127)


def sq8_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
) -> DataFrame:
    """Scalar-quantized (SQ8) ANN — the third quantizer family next to
    LSH (s02), IVF (s03) and PQ (s04/s05): each corpus dimension is
    linearly requantized to an 8-bit code (FAISS's ScalarQuantizer
    QT_8bit; Guo et al. 2020 ScaNN calls it the reordering baseline),
    queries stay full precision and score against the dequantized
    codes (asymmetric). 4x less candidate memory than float32 corpora
    with far higher recall than PQ at the same speed — the usual first
    rung of a 100-TB vector index before PQ's 32x compression is
    needed. Reference context: the reference has no similarity layer
    at all (SURVEY §2) — this extends the repo's ANN family.

    Determinism/oracle story (the s04 convention, taken further —
    there is NO float rounding anywhere in the encode): vectors live
    on the 1/32768 grid (exact integers), per-dim scales are the
    integers ``max(1, ceil(max|n_d|/127))``, and the code is
    half-away-from-zero integer rounding computed purely in integer
    arithmetic: ``sign(n) * ((2|n| + s) // (2s))`` — replayed verbatim
    by DuckDB's BIGINT ``//``. Dequantized values ``code*s``, dots and
    norms are exact integer sums (< 2^53 in float64), the cosine three
    correctly-rounded IEEE ops — bit-identical ranking across engines.
    |code| <= 127 by construction (|n| <= max|n| <= 127s), so the
    codes are genuinely int8-representable; the kernel enforces it.

    Scale shape: one metadata-sized reduce for the scales (dim
    integers, broadcast), queries driver-collected
    (``max_query_rows``-capped) and broadcast; the corpus streams
    through one ``mapInPandas`` encode+score pass keeping a
    per-partition top-k per query — the only exchange is the final
    merge window over ``n_partitions * n_queries * k`` rows, s04's
    single-exchange contract."""
    query_id_col = query_id_col or id_col
    spark = corpus.sparkSession
    qvec = _pq_qvec

    # queries collect FIRST: their dimension seeds _sq8_scales' folded
    # single-action form (r13 — one corpus action instead of two)
    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"), qvec(F.col(vec_col)).alias("qv")
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"sq8_ann collects the query side to the driver; got more "
            f"than max_query_rows={max_query_rows} rows. Pass a bounded "
            f"probe set or raise max_query_rows explicitly."
        )
    q_ids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in qrows], dtype=np.float64)

    scales = _sq8_scales(
        corpus,
        vec_col,
        dim=q_mat.shape[1] if len(q_mat) else None,
        who="sq8_ann",
    )
    dim = len(scales)
    if len(q_mat) and q_mat.shape[1] != dim:
        raise ValueError(
            f"sq8_ann: query dim {q_mat.shape[1]} != corpus dim {dim}"
        )
    q_nsq = np.einsum("qd,qd->q", q_mat, q_mat) if len(q_mat) else q_mat
    b = spark.sparkContext.broadcast((q_ids, q_mat, q_nsq, scales))

    corpus_q = corpus.select(
        F.col(id_col).alias("neighbor_id"), qvec(F.col(vec_col)).alias("cv")
    )
    out_schema = (
        "query_id long, neighbor_id long, dot double, "
        "nr_sq double, nq_sq double"
    )

    def kernel(batches):
        q_ids_l, q_mat_l, q_nsq_l, s_l = b.value
        nq = len(q_ids_l)
        if not nq:
            return
        acc = [None] * nq
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            X = np.array(list(pdf["cv"]), dtype=np.float64)
            if X.shape[1] != dim:
                raise ValueError(
                    f"sq8_ann: corpus dim {X.shape[1]} != scales dim {dim}"
                )
            n_int = X.astype(np.int64)  # grid values are exact ints
            # half-away-from-zero in pure integer arithmetic — the
            # exact expression the oracle replays with BIGINT //
            codes = np.sign(n_int) * (
                (2 * np.abs(n_int) + s_l) // (2 * s_l)
            )
            if len(codes) and np.abs(codes).max() > 127:
                raise ValueError(
                    "sq8_ann: corpus value outside the scale bound — "
                    "the corpus changed between the scales pass and "
                    "the scan"
                )
            R = (codes * s_l).astype(np.float64)
            nr_sq = np.einsum("nd,nd->n", R, R)
            nr = np.sqrt(nr_sq)
            nr_safe = np.where(nr > 0, nr, 1.0)
            dots_all = q_mat_l @ R.T  # exact integer sums in float64
            for qi in range(nq):
                mask = ids != q_ids_l[qi]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                qn = np.sqrt(q_nsq_l[qi])
                cos = dots_all[qi][idx] / (
                    (qn if qn > 0 else 1.0) * nr_safe[idx]
                )
                cand = (cos, ids[idx], dots_all[qi][idx], nr_sq[idx])
                if acc[qi] is not None:
                    cand = tuple(
                        np.concatenate([a, c])
                        for a, c in zip(acc[qi], cand)
                    )
                order = np.lexsort((cand[1], -cand[0]))[:k]
                acc[qi] = tuple(c[order] for c in cand)
        for qi in range(nq):
            if acc[qi] is None:
                continue
            cos_a, ids_a, dot_a, nr_a = acc[qi]
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_a), q_ids_l[qi], np.int64),
                    "neighbor_id": ids_a,
                    "dot": dot_a,
                    "nr_sq": nr_a,
                    "nq_sq": np.full(len(ids_a), q_nsq_l[qi], np.float64),
                }
            )

    local = corpus_q.mapInPandas(kernel, schema=out_schema)
    nr_safe = F.when(F.col("nr_sq") > 0, F.col("nr_sq")).otherwise(
        F.lit(1.0)
    )
    nq_safe = F.when(F.col("nq_sq") > 0, F.col("nq_sq")).otherwise(
        F.lit(1.0)
    )
    cos_raw = F.col("dot") / (F.sqrt(nq_safe) * F.sqrt(nr_safe))
    w = Window.partitionBy("query_id").orderBy(
        cos_raw.desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos_raw, 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sq8_refine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
) -> DataFrame:
    """Two-stage retrieve-then-rerank — the production ANN shape
    (FAISS's ``IndexRefine``; ScaNN's reordering stage): stage 1 runs
    the SQ8 kernel to a per-query ``shortlist`` of candidates (cheap,
    compressed-domain), stage 2 rescores ONLY the shortlist with the
    exact cosine and emits the exact-scored top-k. Errors of the
    quantizer affect RECALL (a true neighbor can miss the shortlist)
    but never the reported scores or their order — reported cosines
    are bit-identical to :func:`cosine_topk`'s on the same pairs.

    Scale shape: stage 1 is s06's single-exchange kernel; the
    shortlist (``n_queries * shortlist`` rows — probe-set-scale by
    construction) is BROADCAST back against the corpus for the exact
    rescore, so the corpus is never shuffled in either stage: one
    corpus pass for candidates, one corpus-side broadcast-join probe
    for the rescore, two window merges over candidate-sized inputs.

    Determinism/oracle story: stage 1's ranking is the s06
    exact-integer contract; stage 2's exact cosine runs on the same
    1/32768 grid as s01 (integer dot/norms, three IEEE ops), so a SQL
    oracle replays shortlist membership AND the rescored ranking
    bit-for-bit."""
    query_id_col = query_id_col or id_col
    cand = sq8_ann(
        corpus,
        queries,
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        max_query_rows=max_query_rows,
    ).select("query_id", "neighbor_id")

    qvec = _pq_qvec
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        qvec(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), qvec(F.col(vec_col)).alias("cv")
    )
    # the shortlist is probe-set-sized: broadcast it so the corpus-side
    # join stays shuffle-free (the rescore probes the corpus in place)
    pairs = (
        F.broadcast(cand)
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def nsq(col):
        return F.aggregate(
            F.transform(F.col(col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    nq_safe = F.when(nsq("qv") > 0, nsq("qv")).otherwise(F.lit(1.0))
    nc_safe = F.when(nsq("cv") > 0, nsq("cv")).otherwise(F.lit(1.0))
    cos_raw = dot / (F.sqrt(nq_safe) * F.sqrt(nc_safe))
    scored = pairs.select(
        "query_id", "neighbor_id", cos_raw.alias("cos_exact")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_exact").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_exact"), 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _sign_words(vec_col: str, dim: int, prefix: str):
    """32-bit sign-word expressions for a float-vector column: word w
    bit b is set iff vec[32w + b] >= 0. Pure JVM expressions (no
    Python worker anywhere), non-negative longs by construction —
    the same two-halves discipline as the 64-bit pHash, so Spark and
    the DuckDB oracle replay every bit identically.

    Each word is ONE ``F.expr`` built from a SQL string rather than
    ~6 Column-API calls per bit: the old form cost hundreds of py4j
    round trips per plan construction (~2.5 s per binary_ann call at
    the bench, profiled r13) for the identical expression —
    ``IF(v[i] >= 0, 2^b, 0)`` sums, null condition = false, same as
    WHEN/otherwise."""
    n_words = -(-dim // 32)
    words = []
    for w in range(n_words):
        terms = " + ".join(
            f"IF(`{vec_col}`[{32 * w + b}] >= 0, {1 << b}L, 0L)"
            for b in range(min(32, dim - 32 * w))
        )
        words.append(F.expr(terms).alias(f"{prefix}w{w}"))
    return words, n_words


def binary_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Binary-quantization ANN (s08) — 1-bit-per-dimension sign codes,
    hamming shortlist, exact cosine rerank. The ONLY ANN variant in
    the family with no Python worker anywhere: encode, hamming
    scoring, shortlist, and rerank are all JVM expressions inside
    whole-stage codegen (the 32x memory compression of BQ indexes:
    8 bytes/vector at dim 64 vs 256 for float32).

    Plan shape (the retrieve-then-rerank contract, s07): the query
    side's sign words broadcast against the corpus encode pass (a
    bounded PROBE SET by contract — the join is a broadcast of
    n_queries rows, never corpus x corpus); the shortlist window
    shuffles only (query_id, neighbor_id, hamming) triples — no
    vectors; the rerank broadcasts the shortlist and the query
    vectors back against the corpus, so the corpus never shuffles in
    either stage.

    Recall rides the ``shortlist`` lever (measured recall@5 vs exact
    on the sf0.1 corpus: 0.42 at 32, 0.55 at 64, 0.73 at 128
    [default], 0.86 at 256) — the standard BQ trade; the rerank is
    exact, so precision within the shortlist is exact. Deterministic:
    hamming ties break on neighbor_id, rerank ties on (rounded
    cosine, neighbor_id). Returns (query_id, neighbor_id, cosine,
    rank)."""
    if shortlist < k:
        raise ValueError(
            f"binary_ann: shortlist ({shortlist}) must be >= k ({k})"
        )
    query_id_col = query_id_col or id_col
    first = corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError(
            f"binary_ann: corpus has no non-null '{vec_col}' row to "
            f"infer the vector dimension from"
        )
    dim = len(first[0])
    c_words, n_words = _sign_words(vec_col, dim, "c")
    q_words, _ = _sign_words(vec_col, dim, "q")

    # null-embedding corpus rows must not enter the shortlist:
    # _sign_words encodes a null vector as all-zero words (every WHEN
    # is null), so unfiltered they displace real candidates within the
    # fixed shortlist budget and surface as null-cosine rerank rows
    cenc = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), *c_words
    )
    qenc = queries.select(
        F.col(query_id_col).alias("query_id"), *q_words
    )
    return _hamming_shortlist_rerank(
        cenc, qenc, n_words, corpus, queries, k, shortlist,
        id_col, vec_col, query_id_col,
    )


def _hamming_shortlist_rerank(
    cenc: DataFrame,
    qenc: DataFrame,
    n_words: int,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The shared BQ tail (one definition so binary_ann and the
    persisted-index query path CANNOT drift — their bit-identical
    output is what lets one SQL oracle verify both): per-word
    xor/bit_count hamming over (cenc: neighbor_id + cw*, qenc
    broadcast: query_id + qw*), shortlist window over id/hamming
    triples only, exact cosine rerank with the shortlist and query
    vectors broadcast — the corpus never shuffles (s07's contract).
    Deterministic ties: (hamming, neighbor_id) then (rounded cosine
    DESC, neighbor_id)."""
    ham = None
    for w in range(n_words):
        term = F.bit_count(
            F.col(f"qw{w}").bitwiseXOR(F.col(f"cw{w}"))
        )
        ham = term if ham is None else ham + term
    scored = (
        cenc.crossJoin(F.broadcast(qenc))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.cast("long").alias("hamming"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id")
    )
    short = (
        scored.withColumn("hrank", F.row_number().over(w_short))
        .filter(F.col("hrank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )


def _exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The shared retrieve-then-rerank TAIL (s07's contract): given a
    bounded candidate shortlist of (query_id, neighbor_id) pairs —
    n_queries x shortlist rows, metadata-scale — broadcast it and the
    query vectors against the corpus and score the exact cosine, so
    the corpus NEVER shuffles in the rerank. Deterministic ties:
    (rounded cosine DESC, neighbor_id). Used by binary_ann /
    query_binary_index and by pq_ann / ivf_pq_ann's ``refine=``."""
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    qvec = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    )
    rescored = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
