"""Behavioral tests for the clustering operators (c01/c02) plus the
chunking (t10) and shard-manifest (p05) additions: convergence and
determinism properties the SQL oracle can't express, and the SemDeDup
recall trade measured against the exact all-pairs verifier."""

import os

import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.operators import clustering, packing, text

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


class TestKMeans:
    def test_every_vector_assigned_once(self, spark, embs):
        n = embs.count()
        out = clustering.kmeans(embs, n_clusters=8, n_iters=2)
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n

    def test_clusters_in_range(self, spark, embs):
        out = clustering.kmeans(embs, n_clusters=8, n_iters=2)
        stats = out.agg(
            F.min("cluster").alias("lo"), F.max("cluster").alias("hi")
        ).first()
        assert 0 <= stats.lo and stats.hi < 8

    def test_deterministic(self, spark, embs):
        a = sorted(
            (r.vec_id, r.cluster)
            for r in clustering.kmeans(embs, 8, 2).collect()
        )
        b = sorted(
            (r.vec_id, r.cluster)
            for r in clustering.kmeans(embs, 8, 2).collect()
        )
        assert a == b

    def test_iterations_reduce_distortion(self, spark, embs):
        """Lloyd's invariant: mean squared distance to the assigned
        centroid is non-increasing across iterations (measured against
        each pass's own centroids)."""

        def distortion(n_iters):
            assign = clustering.kmeans(embs, 8, n_iters)
            # recompute each cluster's mean and the members' distance
            member = embs.join(assign, "vec_id")
            dims = member.select(
                "vec_id", "cluster", F.posexplode("embedding").alias("pos", "val")
            )
            cents = dims.groupBy("cluster", "pos").agg(
                F.avg("val").alias("cv")
            )
            joined = dims.join(cents, ["cluster", "pos"])
            per_vec = joined.groupBy("vec_id").agg(
                F.sum((F.col("val") - F.col("cv")) ** 2).alias("d2")
            )
            return per_vec.agg(F.avg("d2")).first()[0]

        assert distortion(3) <= distortion(1) + 1e-9

    def test_rejects_bad_iters(self, spark, embs):
        with pytest.raises(ValueError, match="n_iters"):
            clustering.kmeans(embs, 8, 0)

    def test_empty_input_raises(self, spark, embs):
        with pytest.raises(ValueError, match="no rows"):
            clustering.kmeans(embs.filter(F.lit(False)), 8, 1)


class TestSemanticNearDup:
    def test_pairs_subset_of_exact(self, spark, embs):
        """Every cluster-gated pair is a true near-dup pair (the gate
        only *removes* candidates, never invents them)."""
        from arrow_zarr_spark.operators import dedup

        exact = {
            (r.id_a, r.id_b)
            for r in dedup.embedding_cosine_pairs(
                embs, threshold=0.4
            ).collect()
        }
        gated = {
            (r.id_a, r.id_b)
            for r in clustering.semantic_neardup_pairs(
                embs, threshold=0.4, n_clusters=8, n_iters=1
            ).collect()
        }
        assert gated <= exact
        # the recall trade is real but must not be degenerate: the
        # gate should find a meaningful share of the true pairs
        assert exact, "fixture should contain near-dup embeddings"
        recall = len(gated) / len(exact)
        assert recall >= 0.25, f"cluster-gate recall collapsed: {recall}"

    def test_pair_ordering(self, spark, embs):
        out = clustering.semantic_neardup_pairs(embs, 0.4, 8, 1)
        bad = out.filter(F.col("id_a") >= F.col("id_b")).count()
        assert bad == 0


class TestChunkDocuments:
    def test_nonoverlapping_chunks_partition_tokens(self, spark, docs):
        """stride == chunk_tokens: chunk token counts sum to exactly
        the document's token count."""
        out = text.chunk_documents(docs, 32, 32)
        per_doc = out.groupBy("doc_id").agg(F.sum("n_tok").alias("s"))
        toks = text.token_count(docs).select("doc_id", "n_tokens")
        diff = (
            per_doc.join(toks, "doc_id")
            .filter(F.col("s") != F.col("n_tokens"))
            .count()
        )
        assert diff == 0

    def test_overlap_counts(self, spark, docs):
        """stride < chunk_tokens: every token position lands in >= 1
        chunk and chunk starts advance by exactly stride."""
        out = text.chunk_documents(docs, 64, 32).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for rows in by_doc.values():
            rows.sort(key=lambda r: r.chunk_idx)
            for i, r in enumerate(rows):
                assert r.chunk_idx == i
                assert r.start_tok == i * 32
                assert r.n_tok >= 1

    def test_chunk_text_roundtrip(self, spark, docs):
        """Non-overlapping chunk texts rejoin to the original text."""
        out = text.chunk_documents(docs, 32, 32)
        glued = out.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.getField("chunk_text"),
                ),
                " ",
            ).alias("glued")
        )
        diff = (
            glued.join(docs, "doc_id")
            .filter(F.col("glued") != F.col("text"))
            .count()
        )
        assert diff == 0

    def test_rejects_bad_params(self, spark, docs):
        with pytest.raises(ValueError, match="chunk_tokens"):
            text.chunk_documents(docs, 0, 1)


class TestShardManifest:
    def test_manifest_accounts_for_every_doc(self, spark, docs):
        m = packing.shard_manifest(docs, 16)
        total = m.agg(F.sum("n_docs")).first()[0]
        assert total == docs.count()

    def test_shards_balanced(self, spark, docs):
        """Multiplicative-hash assignment keeps shard sizes within a
        loose band around the mean (no hot shard)."""
        m = packing.shard_manifest(docs, 16).collect()
        sizes = [r.n_docs for r in m]
        assert len(sizes) == 16
        mean = sum(sizes) / len(sizes)
        assert max(sizes) < 2 * mean
        assert min(sizes) > 0.3 * mean

    def test_assignment_row_local(self, spark, docs):
        """shard_assign adds no shuffle: the plan has no Exchange."""
        plan = packing.shard_assign(docs, 16)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestScanParallelismWrapper:
    """bench_entries._with_scan_parallelism is SIZE-aware (r14): the
    repartition target scales with input bytes and caps at
    defaultParallelism, so tiny inputs are never over-parallelized."""

    def _write(self, spark, tmp_path, n_rows):
        path = str(tmp_path / f"t_{n_rows}")
        # sha2 hex: incompressible payload, so file bytes track rows
        spark.range(n_rows).selectExpr(
            "id", "sha2(cast(id AS string), 256) AS pad"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    @staticmethod
    def _file_bytes(df):
        import os as _os
        from urllib.parse import urlparse

        return sum(
            _os.path.getsize(urlparse(f).path) for f in df.inputFiles()
        )

    def test_large_input_gets_full_parallelism(self, spark, tmp_path):
        from arrow_zarr_spark.operators.bench_entries import (
            _SCAN_TASK_MIN_BYTES,
            _with_scan_parallelism,
        )

        par = spark.sparkContext.defaultParallelism
        # enough incompressible rows that the single file clears
        # par * floor bytes with margin
        need_rows = (par * _SCAN_TASK_MIN_BYTES) // 16
        df = self._write(spark, tmp_path, need_rows)
        assert self._file_bytes(df) >= par * _SCAN_TASK_MIN_BYTES
        assert df.rdd.getNumPartitions() < par
        out = _with_scan_parallelism(spark, df)
        assert out.rdd.getNumPartitions() == par

    def test_tiny_input_not_over_parallelized(self, spark, tmp_path):
        from arrow_zarr_spark.operators.bench_entries import (
            _SCAN_TASK_MIN_BYTES,
            _with_scan_parallelism,
        )

        par = spark.sparkContext.defaultParallelism
        df = self._write(spark, tmp_path, 8)  # a few hundred bytes
        out = _with_scan_parallelism(spark, df)
        nbytes = self._file_bytes(df)
        target = min(par, max(1, nbytes // _SCAN_TASK_MIN_BYTES))
        assert out.rdd.getNumPartitions() <= max(target, 1)
        assert out.rdd.getNumPartitions() < par

    def test_already_parallel_input_untouched(self, spark):
        from arrow_zarr_spark.operators.bench_entries import (
            _with_scan_parallelism,
        )

        par = spark.sparkContext.defaultParallelism
        df = spark.range(0, 100000, 1, par + 4).selectExpr("id")
        out = _with_scan_parallelism(spark, df)
        # no inputFiles (range source) and already >= par: unchanged
        assert out is df
