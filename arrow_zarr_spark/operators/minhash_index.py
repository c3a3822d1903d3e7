"""Persisted MinHash signature index in the engine's own storage
format — the incremental-dedup counterpart of
:mod:`vector_index` (x05) and the phash64 index (m09).

:func:`dedup.dedup_against_corpus` and
:func:`dedup.minhash_lsh_pairs_cross` re-shingle and re-hash the
ENTIRE corpus text on every ingest batch. At 100 TB that repeated
corpus pass is the waste: signatures are a pure function of the
text, so computing them is a BUILD job that runs once (and extends
at delta cost on append), while the per-batch QUERY should read
signatures, never corpus text, until the final exact verify:

- the index stores one row per corpus doc — ``(doc_id,
  mh_0..mh_{n-1})``, 8·n bytes (512 B at the default n=64) instead
  of the document text (KBs): a ~10-100x I/O reduction on the only
  corpus-wide stage, through the engine's own zarr scan;
- the band-bucket join stays the LSH shape: the new batch's banded
  signatures (batch_size x bands rows) BROADCAST against the
  band rows assembled JVM-side from the stored signature columns —
  the corpus never shuffles and is never re-hashed;
- only exact-verify candidates (dup-group-bounded) touch corpus
  text, via a broadcast semi-join;
- the index is a queryable table like any other store: audit_zarr,
  describe_zarr, replicate_zarr, commit_version all apply — an
  index snapshot ships with a data release, and the id-sorted
  layout's per-object [min, max] statistics make delta upserts
  prunable.

Signatures come from the PRODUCTION crc32 kernel
(:func:`dedup.minhash_signatures`), so a rebuilt index is
byte-identical and — since the r12 crc32 replay — the whole query
path (signatures, bands, bucket join, exact verify) replays in a
DuckDB oracle bit-for-bit (suite entry d20).

Reference context: none — the reference has no dedup surface; this
is north-star scope shaped like production ingest pipelines (index
build / signature scan / exact verify).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _band_structs_sql,
    _banded_signatures,
    minhash_signatures,
    ngram_jaccard_pairs,
)

__all__ = [
    "build_minhash_index",
    "extend_minhash_index",
    "query_minhash_index",
]


def build_minhash_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
    chunk_rows: int = 65536,
    mode: str = "overwrite",
) -> dict:
    """Shingle+hash ``corpus`` ONCE with the production MinHash kernel
    and persist the signatures as a zarr table store at ``path``:
    columns ``(id_col, mh_0..mh_{n_hashes-1})``, sorted by id.
    Docs with fewer than ``shingle_k`` words have no shingles and are
    (correctly) absent, matching every query-side kernel.

    ``shingle_k`` and ``seed`` are baked into the signatures — pass
    the same values to :func:`query_minhash_index` (it has no way to
    detect a mismatch; treat them as part of the index's identity,
    like a tokenizer version). Returns ``{"path", "n_docs",
    "n_hashes", "shingle_k", "seed"}``."""
    sig = minhash_signatures(
        corpus, id_col, text_col, n_hashes, shingle_k, seed
    )
    from ..io import write_zarr

    n = write_zarr(
        sig.orderBy(id_col), path, chunk_rows=chunk_rows, mode=mode
    )
    return {
        "path": path,
        "n_docs": int(n),
        "n_hashes": int(n_hashes),
        "shingle_k": int(shingle_k),
        "seed": int(seed),
    }


def extend_minhash_index(
    corpus_delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    seed: int = 42,
    chunk_rows: Optional[int] = None,
) -> dict:
    """Extend an existing index with an ingest delta at DELTA cost —
    the module's whole pitch made a verb: only ``corpus_delta`` is
    shingled+hashed (the production kernel, same ``shingle_k``/
    ``seed`` identity as the build), and :func:`io.write_zarr`'s
    ``mode="append"`` boundary-chunk merge rewrites ONE partial tail
    object plus the new chunks — never the corpus signatures.

    Delta ids must sit strictly ABOVE the stored max id (the
    append-only ingest convention): that preserves the id-sorted
    layout the per-object [min, max] statistics prune on, and makes
    the extended store BYTE-IDENTICAL to a from-scratch rebuild over
    corpus+delta (pinned in tests/test_minhash_index.py). The max-id
    check reads the writer's own statistics — metadata-scale, no
    corpus scan. ``n_hashes`` comes from the store schema. Returns
    ``{"path", "n_new", "n_hashes", "shingle_k", "seed"}``."""
    from ..zarr.array import infer_store_arrays
    from ..zarr.meta import STATS_ATTR_KEY
    from ..zarr.stats import resolve_stats
    from ..zarr.store import open_store

    store = open_store(path)
    arrays = {a.meta.name: a for a in infer_store_arrays(store)}
    mh_names = sorted(
        (n for n in arrays if n.startswith("mh_") and n[3:].isdigit()),
        key=lambda n: int(n[3:]),
    )
    if not mh_names or id_col not in arrays:
        raise ValueError(
            f"extend_minhash_index: {path!r} is not a minhash index "
            f"store (want arrays ({id_col}, mh_0..mh_N), got "
            f"{sorted(arrays)})"
        )
    n_hashes = len(mh_names)
    id_meta = arrays[id_col].meta
    if chunk_rows is None:
        # the append validator requires the store's own object size —
        # derive it rather than asking the caller to remember it
        chunk_rows = int(id_meta.chunk_shape[0])
    stored_max = None
    entries = resolve_stats(
        store, id_col, id_meta.attributes.get(STATS_ATTR_KEY)
    )
    if entries and all(e is not None for e in entries):
        stored_max = max(e[1] for e in entries)
    if stored_max is None:
        # stats-less store (stats=False build): one id-column scan
        spark = corpus_delta.sparkSession
        stored_max = (
            spark.read.format("zarr")
            .load(path)
            .agg(F.max(id_col))
            .first()[0]
        )
    delta_min = corpus_delta.agg(F.min(id_col)).first()[0]
    if delta_min is None:
        return {
            "path": path,
            "n_new": 0,
            "n_hashes": int(n_hashes),
            "shingle_k": int(shingle_k),
            "seed": int(seed),
        }
    if stored_max is not None and delta_min <= stored_max:
        raise ValueError(
            f"extend_minhash_index: delta min id {delta_min} is not "
            f"above the stored max id {stored_max} — interleaved ids "
            "would break the id-sorted layout (rebuild instead)"
        )
    sig = minhash_signatures(
        corpus_delta, id_col, text_col, n_hashes, shingle_k, seed
    )
    from ..io import write_zarr

    n = write_zarr(
        sig.orderBy(id_col), path, chunk_rows=chunk_rows, mode="append"
    )
    return {
        "path": path,
        "n_new": int(n),
        "n_hashes": int(n_hashes),
        "shingle_k": int(shingle_k),
        "seed": int(seed),
    }


def query_minhash_index(
    spark,
    index_path: str,
    new_batch: DataFrame,
    corpus: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    jaccard_threshold: Optional[float] = None,
) -> DataFrame:
    """Near-duplicate pairs of ``new_batch`` against the indexed
    corpus: ``(id_new, id_corpus)`` LSH candidates, or — with
    ``corpus`` and ``jaccard_threshold`` — ``(id_new, id_corpus,
    jaccard)`` exact-verified pairs. Results are IDENTICAL to
    :func:`dedup.minhash_lsh_pairs_cross` (+ candidate-mode exact
    verify) with the same parameters: the index stores exactly what
    that inline path computes (pinned in tests/test_minhash_index.py),
    which is what makes the d20 oracle's full crc32 replay this
    query's oracle too.

    Scale shape: ONE narrow scan of the signature store (8·n_hashes
    bytes/doc, no corpus text, no Python worker), band rows assembled
    JVM-side, batch bands broadcast — the corpus never shuffles; the
    exact verify touches corpus text only for candidate docs via a
    broadcast semi-join. Id spaces of batch and corpus must be
    disjoint when verifying (the union-side convention shared with
    minhash_lsh_pairs_cross)."""
    codes = spark.read.format("zarr").load(index_path)
    mh_cols = sorted(
        (
            c
            for c in codes.columns
            if c.startswith("mh_") and c[3:].isdigit()
        ),
        key=lambda c: int(c[3:]),
    )
    if not mh_cols or id_col not in codes.columns:
        raise ValueError(
            f"query_minhash_index: {index_path!r} is not a minhash "
            f"index store (want columns ({id_col}, mh_0..mh_N), got "
            f"{codes.columns})"
        )
    n_hashes = len(mh_cols)
    if n_hashes % bands:
        raise ValueError(
            f"query_minhash_index: index carries {n_hashes} hashes, "
            f"not divisible into {bands} bands"
        )
    rows_per_band = n_hashes // bands
    band_structs = F.expr(_band_structs_sql(bands, rows_per_band))
    cb = codes.select(
        F.col(id_col).alias("cid"), F.explode(band_structs).alias("bs")
    ).select("cid", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    bn = _banded_signatures(
        new_batch, id_col, text_col, n_hashes, bands, shingle_k, seed
    )
    cand = (
        cb.join(F.broadcast(bn), ["band", "sig"])
        .select(
            F.col("bid").alias("id_new"), F.col("cid").alias("id_corpus")
        )
        .distinct()
    )
    if jaccard_threshold is None or corpus is None:
        return cand

    # exact verify, the dup-group-bounded tail: candidates feed the
    # union twice (pair list + the semi-join inside candidate mode),
    # so materialize them once — eager localCheckpoint is
    # ContextCleaner-reclaimed, never cache-pinned (the
    # minhash_lsh_pairs convention)
    cand = cand.localCheckpoint(eager=True)
    pairs = cand.select(
        F.least("id_new", "id_corpus").alias("id_a"),
        F.greatest("id_new", "id_corpus").alias("id_b"),
    )
    union = corpus.select(
        F.col(id_col), F.col(text_col)
    ).unionByName(new_batch.select(F.col(id_col), F.col(text_col)))
    jac = ngram_jaccard_pairs(
        union,
        id_col=id_col,
        text_col=text_col,
        k=shingle_k,
        threshold=0.0,
        candidate_pairs=pairs,
    )
    return (
        cand.join(
            jac,
            (F.least("id_new", "id_corpus") == F.col("id_a"))
            & (F.greatest("id_new", "id_corpus") == F.col("id_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_new", "id_corpus", "jaccard")
    )
