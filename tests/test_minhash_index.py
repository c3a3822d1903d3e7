"""r12: the persisted MinHash signature index (operators/
minhash_index.py) — the m09/x05 persisted-index pattern applied to
incremental corpus dedup. The pinned claim: a signature store
written once and scanned back through the engine's own zarr reader
(JVM band assembly included) yields EXACTLY what the inline
fresh-kernel path (minhash_lsh_pairs_cross + candidate-mode exact
verify) computes."""

import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.operators.dedup import (
    minhash_lsh_pairs_cross,
    ngram_jaccard_pairs,
)
from arrow_zarr_spark.operators.minhash_index import (
    build_minhash_index,
    query_minhash_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def splits(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return batch, corpus


@pytest.fixture(scope="module")
def index_path(spark, splits, tmp_path_factory):
    _, corpus = splits
    path = str(tmp_path_factory.mktemp("mhidx") / "idx")
    meta = build_minhash_index(corpus, path)
    assert meta["n_hashes"] == 64 and meta["n_docs"] > 0
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestIndexedEqualsInline:
    def test_candidates_match_cross_kernel(
        self, spark, splits, index_path
    ):
        batch, corpus = splits
        got = _rows(query_minhash_index(spark, index_path, batch))
        want = _rows(minhash_lsh_pairs_cross(batch, corpus))
        assert got == want and len(got) > 0

    def test_verified_pairs_match_inline_verify(
        self, spark, splits, index_path
    ):
        batch, corpus = splits
        got = _rows(
            query_minhash_index(
                spark, index_path, batch, corpus=corpus,
                jaccard_threshold=0.05,
            )
        )
        cand = minhash_lsh_pairs_cross(batch, corpus)
        pairs = cand.select(
            F.least("id_new", "id_corpus").alias("id_a"),
            F.greatest("id_new", "id_corpus").alias("id_b"),
        )
        union = corpus.unionByName(batch)
        jac = ngram_jaccard_pairs(
            union, threshold=0.0, candidate_pairs=pairs
        )
        want = _rows(
            cand.join(
                jac,
                (F.least("id_new", "id_corpus") == F.col("id_a"))
                & (F.greatest("id_new", "id_corpus") == F.col("id_b")),
            )
            .filter(F.col("jaccard") >= 0.05)
            .select("id_new", "id_corpus", "jaccard")
        )
        assert got == want and len(got) > 0

    def test_rebuild_is_deterministic(
        self, spark, splits, index_path, tmp_path
    ):
        """Signatures are a pure function of the text: a rebuilt
        index answers identically (the ship-an-index-snapshot
        claim)."""
        batch, corpus = splits
        path2 = str(tmp_path / "idx2")
        build_minhash_index(corpus, path2)
        a = _rows(query_minhash_index(spark, index_path, batch))
        b = _rows(query_minhash_index(spark, path2, batch))
        assert a == b


class TestIndexStoreSurface:
    def test_index_is_a_first_class_store(self, spark, index_path):
        """The index is a normal zarr table: describable and
        scannable like any data store."""
        from arrow_zarr_spark.io import describe_zarr

        d = describe_zarr(index_path)
        assert d["n_rows"] > 0
        assert "mh_0" in d["columns"] and "mh_63" in d["columns"]
        # id-sorted layout carries prunable doc_id stats
        assert d["columns"]["doc_id"]["stats_kind"] == "inline"

    def test_not_an_index_store_raises(self, spark, splits, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        batch, _ = splits
        path = str(tmp_path / "plain")
        write_zarr(
            batch.select("doc_id"), path, chunk_rows=64
        )
        with pytest.raises(ValueError, match="not a minhash index"):
            query_minhash_index(spark, path, batch)

    def test_band_mismatch_raises(self, spark, splits, index_path):
        batch, _ = splits
        with pytest.raises(ValueError, match="not divisible"):
            query_minhash_index(spark, index_path, batch, bands=13)


class TestExtendIndex:
    """r13 (verdict item 4): the index's incremental pitch as a
    verb — extend_minhash_index appends an ingest delta's signatures
    at DELTA cost (boundary-chunk merge), and the extended store is
    BYTE-IDENTICAL to a from-scratch rebuild over corpus+delta."""

    def _store_bytes(self, path):
        from arrow_zarr_spark.zarr.store import open_store

        store = open_store(path)
        return {k: store.get(k) for k in store.walk_keys()}

    def test_extend_equals_rebuild_bytes(
        self, spark, splits, tmp_path
    ):
        from arrow_zarr_spark.operators.minhash_index import (
            extend_minhash_index,
        )

        _, corpus = splits
        cut = 400
        base = corpus.filter(F.col("doc_id") < cut)
        delta = corpus.filter(F.col("doc_id") >= cut)
        # chunk_rows NOT aligned to the split: the boundary object
        # holds base tail rows and must merge with delta head rows
        ext = str(tmp_path / "ext")
        build_minhash_index(base, ext, chunk_rows=96)
        meta = extend_minhash_index(delta, ext, chunk_rows=96)
        assert meta["n_new"] > 0 and meta["n_hashes"] == 64
        full = str(tmp_path / "full")
        build_minhash_index(corpus, full, chunk_rows=96)
        want = self._store_bytes(full)
        got = self._store_bytes(ext)
        assert got == {
            k.replace(full, ext): v for k, v in want.items()
        }

    def test_extended_index_answers_queries(
        self, spark, splits, tmp_path
    ):
        from arrow_zarr_spark.operators.minhash_index import (
            extend_minhash_index,
        )

        batch, corpus = splits
        cut = 400
        ext = str(tmp_path / "q")
        build_minhash_index(
            corpus.filter(F.col("doc_id") < cut), ext, chunk_rows=96
        )
        extend_minhash_index(
            corpus.filter(F.col("doc_id") >= cut), ext, chunk_rows=96
        )
        got = _rows(query_minhash_index(spark, ext, batch))
        want = _rows(minhash_lsh_pairs_cross(batch, corpus))
        assert got == want and len(got) > 0

    def test_interleaved_ids_refused(self, spark, splits, tmp_path):
        from arrow_zarr_spark.operators.minhash_index import (
            extend_minhash_index,
        )

        _, corpus = splits
        path = str(tmp_path / "ref")
        build_minhash_index(corpus, path)
        with pytest.raises(ValueError, match="not .*above.*max id"):
            extend_minhash_index(
                corpus.filter(F.col("doc_id") < 10), path
            )

    def test_not_an_index_refused(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr
        from arrow_zarr_spark.operators.minhash_index import (
            extend_minhash_index,
        )

        path = str(tmp_path / "plain")
        write_zarr(
            spark.range(8).select(F.col("id").alias("doc_id")), path
        )
        with pytest.raises(ValueError, match="not a minhash index"):
            extend_minhash_index(
                spark.range(9, 12)
                .select(
                    F.col("id").alias("doc_id"),
                    F.lit("x y z w").alias("text"),
                ),
                path,
            )
