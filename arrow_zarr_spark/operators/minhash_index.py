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
    _banded_signatures,
    minhash_signatures,
    ngram_jaccard_pairs,
)

__all__ = ["build_minhash_index", "query_minhash_index"]


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
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{bi * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("sig"),
            )
            for bi in range(bands)
        ]
    )
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
