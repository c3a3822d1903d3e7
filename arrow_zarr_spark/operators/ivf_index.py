"""Persisted IVF+SQ8 vector index — the third persisted index after
the binary codes (x05) and the phash64 store (m09), and the first
whose LAYOUT turns index routing into the engine's own chunk
pruning.

:func:`similarity.ivf_ann` re-quantizes and re-assigns the whole
corpus on every query run; :func:`similarity.sq8_ann` re-encodes it.
Both costs are build-time artifacts: centroids, per-dim scales, cell
assignments and SQ8 codes are all pure functions of the corpus, so
:func:`build_ivf_sq8_index` computes them ONCE and persists the codes
as a zarr table SORTED BY (cell, vec_id). That ordering is the point:
the writer's per-object [min, max] statistics on the ``cell`` column
make every chunk's cell range tight, so a query's ``cell IN
(probed...)`` filter prunes non-probed cells' chunks AT PLANNING —
IVF probing becomes the engine's own statistics pruning, and the
scan reads ~nprobe/n_cells of the code store (dim+9 bytes/vector of
codes, never the float corpus).

Determinism/oracle story (the s03+s06 conventions composed, nothing
new): strided centroids off MAX(id), quantized-cosine assignment
with cell-id tiebreak, integer SQ8 scales/codes, exact-integer ADC
dots — every stage is engine-replayable arithmetic, so the s09
oracle replays the ENTIRE indexed pipeline in DuckDB and the driver
hash-proves it. Indexed == the same pipeline computed inline is
additionally pytest-pinned (tests/test_ivf_index.py).

Reference context: none — the reference has no similarity layer;
this is the production shape (FAISS IVF+SQ on disk) re-expressed on
the engine's own storage and statistics machinery.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import _sq8_scales

__all__ = ["build_ivf_sq8_index", "query_ivf_sq8_index"]


def _qvec(c):
    # the repo's 1/32768 grid (similarity.ivf_ann convention):
    # float32 -> double exact, round half-up to integers whose
    # products/sums stay exact in double
    return F.transform(c, lambda x: F.round(x * F.lit(32768.0), 0))


def build_ivf_sq8_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 65536,
    mode: str = "overwrite",
) -> dict:
    """One batch job over the corpus: strided coarse centroids
    (ivf_ann's deterministic default — every (max_id+1)//n_cells-th
    vector), quantized-cosine cell assignment, global integer SQ8
    scales, per-dim SQ8 codes — persisted as THREE zarr stores under
    ``path``:

    - ``<path>/codes``  — (cell int, id, q0..q{dim-1} int8), sorted
      by (cell, id): the scan target, with tight per-chunk ``cell``
      statistics (size the pruning granularity with ``chunk_rows``);
    - ``<path>/centroids`` — (cell, g0..g{dim-1} long) centroid grid
      integers (metadata-scale);
    - ``<path>/scales`` — (d, s) the dim integer scales.

    Assignment + encode run in ONE Arrow-batched MapInPandas pass
    over exact grid integers (no joins, no per-id window, no corpus
    explode — see the kernel comment below); every sum is an exact
    integer in double, so rebuilds are byte-identical.
    Returns ``{"path", "n_vectors", "dim", "n_cells", "chunk_rows"}``.
    """
    import pandas as pd

    first = (
        corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    )
    if first is None:
        raise ValueError(
            f"build_ivf_sq8_index: corpus has no non-null '{vec_col}'"
        )
    dim = len(first[0])
    from ..io import write_zarr

    spark = corpus.sparkSession
    max_id = corpus.agg(F.max(id_col)).first()[0]
    stride = max(1, (int(max_id) + 1) // n_cells)
    # the n_cells centroid rows are metadata-scale: collect them ONCE
    # (one filtered corpus pass) and reuse the rows for both the
    # persisted centroid store and the assignment kernel's broadcast
    # — the grid values are exact integers in doubles, so the
    # driver round-trip loses nothing
    cent_rows = sorted(
        corpus.filter(
            (F.col(id_col) % stride == 0)
            & (F.col(id_col) / stride < n_cells)
        )
        .select(
            (F.col(id_col) / stride).cast("int").alias("cell"),
            _qvec(F.col(vec_col)).alias("centroid"),
        )
        .collect(),
        key=lambda r: r["cell"],
    )
    if not cent_rows:
        raise ValueError("build_ivf_sq8_index: empty corpus")
    cent_mat = np.array(
        [r["centroid"] for r in cent_rows], dtype=np.float64
    )
    # centroid/scale stores are metadata-scale (n_cells / dim rows)
    # and the rows are ALREADY on the driver: write them driver-side
    # (io._write_zarr_driver_rows — byte-identical store to write_zarr
    # on a single-partition frame, property-tested) instead of paying
    # a ~1 s persist + count job + shuffle + applyInPandas round trip
    # per store (profiled r13; even the single-slice parallelize form
    # of that round trip cost ~0.7 s/store).
    from ..io import _write_zarr_driver_rows

    _write_zarr_driver_rows(
        T.StructType(
            [T.StructField("cell", T.IntegerType())]
            + [T.StructField(f"g{d}", T.LongType()) for d in range(dim)]
        ),
        [
            (int(r["cell"]), *[int(x) for x in r["centroid"]])
            for r in cent_rows
        ],
        path + "/centroids",
        chunk_rows=max(n_cells, 1),
        mode=mode,
    )

    scales = _sq8_scales(corpus, vec_col, who="build_ivf_sq8_index")
    _write_zarr_driver_rows(
        T.StructType(
            [
                T.StructField("d", T.IntegerType()),
                T.StructField("s", T.LongType()),
            ]
        ),
        [(int(d), int(s)) for d, s in enumerate(scales)],
        path + "/scales",
        chunk_rows=max(dim, 1),
        mode=mode,
    )

    # Cell assignment + SQ8 encode in ONE MapInPandas pass (the s05
    # kernel shape, similarity.ivf_pq_ann): centroids are broadcast
    # NumPy, each Arrow slab assigns its rows with one matmul
    # (np.argmax's first-max tiebreak = the oracle's ORDER BY cc
    # DESC, cell) and encodes with exact int64 arithmetic — the
    # corpus is never joined, never exploded x n_cells, and never
    # shuffled per-id; the only exchange left in the build is the
    # final (cell, id) orderBy the layout requires. All dots/norms
    # are exact-integer sums (< 2^53), so the matmul is
    # order-independent and rebuilds stay byte-identical to the
    # pre-r13 window build. Zero-norm guards follow the repo
    # convention (safe denominator 1.0); a zero-norm CENTROID —
    # impossible unless a strided corpus vector is all-zero — would
    # be the one input where this differs from the oracle's
    # unguarded NaN ordering.
    cent_nsq = np.einsum("cd,cd->c", cent_mat, cent_mat)
    b = spark.sparkContext.broadcast(
        (cent_mat, cent_nsq, np.asarray(scales, dtype=np.int64))
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"cell int, {id_col} {id_type}, " + ", ".join(
        f"q{d} byte" for d in range(dim)
    )
    qcols = [f"q{d}" for d in range(dim)]

    def kernel(batches):
        cents_l, cent_nsq_l, s_l = b.value
        cn = np.sqrt(cent_nsq_l)
        cn_safe = np.where(cn > 0, cn, 1.0)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_azs_id"]
            X = np.array(list(pdf["v"]), dtype=np.float64)
            xn = np.sqrt(np.einsum("nd,nd->n", X, X))
            den = np.where(xn > 0, xn, 1.0)[:, None] * cn_safe[None, :]
            cell = np.argmax((X @ cents_l.T) / den, axis=1)
            # half-away-from-zero SQ8 in exact int64 (the sq8_ann
            # expression): |n| <= 32768, s <= 259
            n_int = X.astype(np.int64)
            mag = (2 * np.abs(n_int) + s_l[None, :]) // (2 * s_l[None, :])
            codes = np.where(n_int >= 0, mag, -mag).astype(np.int8)
            out = {"cell": cell.astype(np.int32), id_col: ids}
            for d, c in enumerate(qcols):
                out[c] = codes[:, d]
            yield pd.DataFrame(out)

    codes = (
        corpus.select(
            F.col(id_col).alias("_azs_id"),
            _qvec(F.col(vec_col)).alias("v"),
        )
        .mapInPandas(kernel, schema=out_schema)
        .orderBy("cell", id_col)
    )
    n = write_zarr(codes, path + "/codes", chunk_rows=chunk_rows, mode=mode)
    return {
        "path": path,
        "n_vectors": int(n),
        "dim": int(dim),
        "n_cells": int(n_cells),
        "chunk_rows": int(chunk_rows),
    }


def query_ivf_sq8_index(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    max_query_rows: int = 65536,
) -> DataFrame:
    """ANN top-k against the persisted IVF+SQ8 index:
    ``(query_id, neighbor_id, cosine, rank)`` — the IVF routing and
    SQ8 ADC of ``ivf_ann``/``sq8_ann`` composed, but the corpus-wide
    stage reads the CODE STORE pruned to the probed cells by the
    writer's own ``cell`` statistics (the scan plans only ~nprobe/
    n_cells of the chunks; zero corpus text/float I/O).

    Probe routing runs driver-side over the bounded query set
    (``max_query_rows``-capped, the sq8_ann convention): quantized
    cosine vs the stored centroids, ties to the lower cell — exactly
    the oracle's ROW_NUMBER (cc DESC, cell) order. Self-pairs are
    excluded; cosine is the ADC cosine rounded to 6; rank ties break
    by neighbor_id."""
    if nprobe < 1:
        raise ValueError("query_ivf_sq8_index: nprobe must be >= 1")
    query_id_col = query_id_col or id_col
    import pandas as pd

    # the routing artifacts are metadata-scale (dim scales, n_cells
    # centroids): read them driver-side through the engine's own
    # array layer — a Spark job here would pay the whole scan fixed
    # cost twice for a few hundred integers
    from ..zarr.array import infer_store_arrays
    from ..zarr.store import open_store

    sarrs = {
        a.meta.name: a
        for a in infer_store_arrays(open_store(index_path + "/scales"))
    }
    d_vals = np.asarray(sarrs["d"].read_all(), dtype=np.int64)
    s_vals = np.asarray(sarrs["s"].read_all(), dtype=np.int64)
    scales = np.zeros(len(d_vals), dtype=np.int64)
    scales[d_vals] = s_vals
    dim = len(scales)
    carrs = {
        a.meta.name: a
        for a in infer_store_arrays(
            open_store(index_path + "/centroids")
        )
    }
    cent_cells = np.asarray(carrs["cell"].read_all(), dtype=np.int64)
    if not len(cent_cells):
        raise ValueError(
            f"query_ivf_sq8_index: {index_path!r}/centroids is empty"
        )
    cent_mat = np.stack(
        [
            np.asarray(carrs[f"g{d}"].read_all(), dtype=np.float64)
            for d in range(dim)
        ],
        axis=1,
    )

    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            _qvec(F.col(vec_col)).alias("qv"),
        )
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            "query_ivf_sq8_index collects the query side; got more "
            f"than max_query_rows={max_query_rows} rows"
        )
    q_ids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    if len(set(q_ids.tolist())) != len(q_ids):
        # probe_map is keyed by query id: duplicates would silently
        # collapse to one probe set while their candidate rows merge
        # under one query_id in the rank window — refuse loudly (the
        # function's other input guards' convention)
        raise ValueError(
            "query_ivf_sq8_index: duplicate ids in the query set "
            f"('{query_id_col}' must be unique per query row)"
        )
    q_mat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    if len(q_mat) and q_mat.shape[1] != dim:
        raise ValueError(
            f"query_ivf_sq8_index: query dim {q_mat.shape[1]} != "
            f"index dim {dim}"
        )
    q_nsq = (
        np.einsum("qd,qd->q", q_mat, q_mat) if len(q_mat) else q_mat
    )
    # probe routing (driver, bounded): cos DESC, cell ASC — identical
    # to the assignment window's ordering
    cn = np.sqrt(np.einsum("cd,cd->c", cent_mat, cent_mat))
    # zero-norm guard (the repo's safe-denominator convention, same
    # as the assignment kernel and the final rank window): without
    # it a zero-norm query yields all-NaN cosines and lexsort picks
    # an arbitrary probe set
    cn_safe = np.where(cn > 0, cn, 1.0)
    probe_cells = []
    for qi in range(len(q_ids)):
        qn = np.sqrt(q_nsq[qi])
        cos = (q_mat[qi] @ cent_mat.T) / (
            (qn if qn > 0 else 1.0) * cn_safe
        )
        order = np.lexsort((cent_cells, -cos))[:nprobe]
        probe_cells.append(cent_cells[order])
    probed = sorted({int(c) for pc in probe_cells for c in pc})
    probe_map = {
        int(q_ids[qi]): set(int(c) for c in probe_cells[qi])
        for qi in range(len(q_ids))
    }

    b = spark.sparkContext.broadcast(
        (q_ids, q_mat, q_nsq, scales, probe_map)
    )
    codes = (
        spark.read.format("zarr")
        .load(index_path + "/codes")
        .filter(F.col("cell").isin(probed))
    )
    qcols = [f"q{d}" for d in range(dim)]
    missing = [c for c in qcols if c not in codes.columns]
    if missing or id_col not in codes.columns:
        raise ValueError(
            f"query_ivf_sq8_index: {index_path!r}/codes is not an "
            f"ivf-sq8 code store for dim {dim}"
        )
    out_schema = (
        "query_id long, neighbor_id long, dot double, "
        "nr_sq double, nq_sq double"
    )

    def kernel(batches):
        q_ids_l, q_mat_l, q_nsq_l, s_l, pm = b.value
        nq = len(q_ids_l)
        if not nq:
            return
        acc = [None] * nq
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            cells = pdf["cell"].to_numpy(np.int64)
            C = np.stack(
                [pdf[c].to_numpy(np.int64) for c in qcols], axis=1
            )
            R = (C * s_l).astype(np.float64)
            nr_sq = np.einsum("nd,nd->n", R, R)
            nr = np.sqrt(nr_sq)
            nr_safe = np.where(nr > 0, nr, 1.0)
            dots_all = q_mat_l @ R.T
            for qi in range(nq):
                want = pm[int(q_ids_l[qi])]
                mask = (ids != q_ids_l[qi]) & np.isin(
                    cells, list(want)
                )
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                qn = np.sqrt(q_nsq_l[qi])
                cos = dots_all[qi][idx] / (
                    (qn if qn > 0 else 1.0) * nr_safe[idx]
                )
                cand = (
                    cos, ids[idx], dots_all[qi][idx], nr_sq[idx]
                )
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
                    "query_id": np.full(
                        len(ids_a), q_ids_l[qi], np.int64
                    ),
                    "neighbor_id": ids_a,
                    "dot": dot_a,
                    "nr_sq": nr_a,
                    "nq_sq": np.full(
                        len(ids_a), q_nsq_l[qi], np.float64
                    ),
                }
            )

    local = codes.mapInPandas(kernel, schema=out_schema)
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
