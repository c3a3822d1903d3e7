"""Plan contracts: the physical plans the 100-TB story depends on.

Correctness tests prove values; these pin the SHAPE — filters reaching
the parquet scan, projections pruning the read schema, small dims
broadcasting, operator pipelines staying free of cartesian products.
A regression here is a silent 100x at scale even when every value
still matches.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str):
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


@pytest.fixture(scope="module")
def views(spark):
    from arrow_zarr_spark import suite

    suite.ensure_views(spark, SF_DIR)
    return spark


class TestParquetScanContracts:
    def test_filters_reach_the_scan(self, views):
        df = views.sql(
            "SELECT l_orderkey, l_quantity FROM lineitem "
            "WHERE l_quantity > 30 AND l_discount < 0.05"
        )
        scans = _scan_lines(_plan(df))
        assert scans, "expected a parquet FileScan"
        assert "l_quantity" in scans[0] and "30" in scans[0], (
            "range predicate did not reach the scan"
        )
        assert "l_discount" in scans[0]

    def test_projection_prunes_read_schema(self, views):
        df = views.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 30")
        scan = _scan_lines(_plan(df))[0]
        # the scan's column list must include only referenced columns
        cols = scan.split("[", 1)[1].split("]", 1)[0]
        assert "l_orderkey" in cols and "l_quantity" in cols
        assert "l_comment" not in cols and "l_extendedprice" not in cols


class TestJoinContracts:
    def test_small_dim_broadcasts(self, views):
        df = views.sql(
            "SELECT n_name, COUNT(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        )
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q5_shape_no_cartesian(self, views):
        df = views.sql(
            "SELECT n_name, COUNT(*) AS n FROM customer "
            "JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        )
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_banded_range_join_is_hash_join(self, views):
        from arrow_zarr_spark.operators.joins import range_join

        left = views.table("orders").select(
            F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("lv")
        )
        right = views.table("orders").select(
            F.col("o_orderkey").alias("k2"), F.col("o_totalprice").alias("rv")
        )
        out = range_join(left, right, "lv", "rv", -10.0, 10.0, band=10.0)
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestOperatorPipelineContracts:
    def test_minhash_pipeline_no_cartesian(self, views):
        from arrow_zarr_spark.operators.dedup import minhash_lsh_pairs

        docs = views.table("documents")
        out = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_ann_no_cartesian(self, views):
        from arrow_zarr_spark.operators.similarity import hyperplane_lsh_ann

        embs = views.table("embeddings")
        out = hyperplane_lsh_ann(embs, embs.filter(F.col("vec_id") < 5), k=3)
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_exact_topk_broadcasts_probe_side(self, views):
        from arrow_zarr_spark.operators.similarity import cosine_topk

        embs = views.table("embeddings")
        out = cosine_topk(embs, embs.filter(F.col("vec_id") < 5), k=3)
        # the deliberate cross join must broadcast the SMALL probe set,
        # never shuffle-nest the corpus
        assert "BroadcastNestedLoopJoin" in _plan(out)


class TestZarrScanContracts:
    def test_zarr_filter_stays_exact_above_scan(self, spark):
        """The zarr source prunes chunks (inexact) and must leave a
        row-level Filter in the plan — dropping it would silently
        return whole chunks."""
        from arrow_zarr_spark import fixtures, register

        register(spark)
        df = (
            spark.read.format("zarr")
            .load(fixtures.write_lat_lon_store())
            .filter("lat < 12")
        )
        plan = _plan(df)
        assert "Filter" in plan and "lat" in plan


class TestRound4OperatorContracts:
    def test_contamination_purge_broadcasts_digest_gate(self, views):
        """The corpus-side probe must be a broadcast join on the
        blocklist digest set — a shuffle here would re-partition the
        100-TB side; a cartesian would be fatal."""
        from arrow_zarr_spark.operators import dedup

        docs = views.table("documents")
        plan = _plan(
            dedup.contamination_purge(
                docs.filter(F.col("source") != "src0"),
                docs.filter(F.col("source") == "src0"),
            )
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_boilerplate_flagging_broadcasts(self, views):
        """The boilerplate set must broadcast back onto the exploded
        n-gram table (big-to-big flagging join would shuffle the whole
        exploded corpus twice)."""
        from arrow_zarr_spark.operators import text

        plan = _plan(text.boilerplate_stats(views.table("documents")))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_stream_enrich_is_broadcast_join(self, views):
        """The stream-static enrichment must broadcast the dim: at
        100 TB/day of events a shuffle per micro-batch is not viable."""
        from arrow_zarr_spark.streaming.event_ops import enrich_events

        events = views.table("events")
        dim = views.table("customer").select("c_custkey", "c_mktsegment")
        plan = _plan(
            enrich_events(events, dim, events.user_id == dim.c_custkey)
        )
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan.split(
            "BroadcastHashJoin"
        )[0]

    def test_quantile_gate_single_window_shuffle(self, views):
        """rank + group count must share ONE hash-partition exchange on
        the group key (a second exchange doubles the shuffle at scale)."""
        from arrow_zarr_spark.operators.sampling import quantile_gate

        docs = views.table("documents").select("doc_id", "lang", "n_chars")
        plan = _plan(
            quantile_gate(docs, "lang", "n_chars", 0.5, "doc_id")
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestRound5Contracts:
    def test_quantile_gate_approx_windows_only_the_gated_region(self, views):
        """approx=True is the single-group-skew fallback: the ranking
        window must consume the threshold-FILTERED rows (broadcast
        threshold join + score pre-gate), never the whole group."""
        from arrow_zarr_spark.operators.sampling import quantile_gate

        docs = views.table("documents").select("doc_id", "lang", "n_chars")
        plan = _plan(
            quantile_gate(docs, "lang", "n_chars", 0.5, "doc_id", approx=True)
        )
        assert "BroadcastHashJoin" in plan
        wpos = plan.find("Window")
        fpos = plan.find(">= __t_lo")
        assert wpos >= 0 and fpos >= 0
        # plan trees print children below parents: the threshold filter
        # must sit BELOW the window, i.e. feed it
        assert fpos > wpos, "threshold pre-gate is not below the window"

    def test_token_budget_sharded_has_no_full_corpus_window(self, views):
        """The sharded budget's only window may see the boundary bucket
        (a __bucket equality filter below it), never the whole input."""
        from arrow_zarr_spark.operators.sampling import (
            token_budget_sample_sharded,
        )

        docs = views.table("documents")
        out = token_budget_sample_sharded(
            docs, "n_chars", 20000, ["n_chars", "doc_id"], n_buckets=16
        )
        plan = _plan(out)
        lines = plan.splitlines()
        widx = [i for i, l in enumerate(lines) if "Window" in l]
        assert widx, "expected exactly the boundary-bucket window"
        # Catalyst inlines __bucket into its CASE-WHEN sum, so check
        # structurally: between the Window and its leaf scan there
        # must be a Filter (the bucket-equality gate)
        below = lines[widx[0] + 1 :]
        scan = next(i for i, l in enumerate(below) if "FileScan" in l)
        assert any("Filter" in l for l in below[:scan]), (
            "boundary window consumes the unfiltered corpus"
        )

    def test_deterministic_shuffle_single_exchange_no_global_sort(
        self, views
    ):
        """The epoch shuffle must cost exactly one hash exchange on the
        shard key — a global Sort or SinglePartition exchange would be
        the thing it exists to avoid."""
        from arrow_zarr_spark.operators.sampling import (
            deterministic_shuffle,
        )

        plan = _plan(
            deterministic_shuffle(views.table("documents"), "doc_id", 64)
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange SinglePartition" not in plan
        assert "Exchange rangepartitioning" not in plan

    def test_wordcode_minhash_is_shuffle_free(self, views):
        """The driver-provable MinHash is per-row array arithmetic: a
        narrow projection with no exchange at all."""
        from arrow_zarr_spark.operators.dedup import (
            minhash_signatures_wordcode,
        )

        plan = _plan(minhash_signatures_wordcode(views.table("documents")))
        assert "Exchange" not in plan
        assert "Window" not in plan


class TestLateRound4Contracts:
    def test_dedup_against_corpus_gated_and_hash_joined(self, views):
        """The batch shingle set must broadcast into the corpus gate and
        no stage may degenerate to a cartesian/NLJ."""
        from arrow_zarr_spark.operators import dedup

        docs = views.table("documents")
        plan = _plan(
            dedup.dedup_against_corpus(
                docs.filter(F.col("doc_id") % 10 == 0),
                docs.filter(F.col("doc_id") % 10 != 0),
            )
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_interval_join_is_single_key_shuffle(self, views):
        """The interval join must execute as an equi-join on the key
        with the time range as a post-condition — not a nested loop."""
        from arrow_zarr_spark.streaming.event_ops import interval_join_events

        events = views.table("events")
        plan = _plan(interval_join_events(events, events, within_minutes=5))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
            "BroadcastHashJoin" in plan
        )


class TestBucketedJoinContracts:
    def test_bucketed_join_has_zero_exchanges(self, spark, tmp_path):
        """Two tables bucketed on their join keys with matching bucket
        counts must join with NO Exchange anywhere in the plan — the
        pay-shuffle-once-at-ingest layout for repeated big-big joins.
        Broadcast is disabled so the small fixture can't cheat the
        contract with a BroadcastHashJoin."""
        from arrow_zarr_spark.operators.joins import (
            bucketed_equi_join,
            write_bucketed,
        )

        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        write_bucketed(
            o, "pc_b_orders", "o_custkey", 16, path=str(tmp_path / "o")
        )
        write_bucketed(
            c, "pc_b_customer", "c_custkey", 16, path=str(tmp_path / "c")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = bucketed_equi_join(
                spark, "pc_b_orders", "pc_b_customer",
                "o_custkey", "c_custkey",
            )
            j.collect()
            plan = _plan(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS pc_b_orders")
            spark.sql("DROP TABLE IF EXISTS pc_b_customer")
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        # the AQE plan string nests initial+final plans, so the two
        # bucketed scans can appear twice
        assert plan.count("SelectedBucketsCount") >= 2, (
            "both sides must use the bucketed scan"
        )

    def test_bucketed_join_values_match_plain_join(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from arrow_zarr_spark.operators.joins import (
            bucketed_equi_join,
            write_bucketed,
        )

        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        write_bucketed(
            o, "pc_v_orders", "o_custkey", 16, path=str(tmp_path / "o")
        )
        write_bucketed(
            c, "pc_v_customer", "c_custkey", 16, path=str(tmp_path / "c")
        )
        try:
            got = (
                bucketed_equi_join(
                    spark, "pc_v_orders", "pc_v_customer",
                    "o_custkey", "c_custkey",
                )
                .groupBy("c_custkey")
                .agg(F.count("*").alias("n"))
            )
            exp = (
                o.join(c, o.o_custkey == c.c_custkey)
                .groupBy("c_custkey")
                .agg(F.count("*").alias("n"))
            )
            assert {(r.c_custkey, r.n) for r in got.collect()} == {
                (r.c_custkey, r.n) for r in exp.collect()
            }
        finally:
            spark.sql("DROP TABLE IF EXISTS pc_v_orders")
            spark.sql("DROP TABLE IF EXISTS pc_v_customer")


class TestRound5OperatorContracts:
    def test_multi_store_union_pushes_filters_into_every_member(self, spark):
        """read_zarr_many: each member store gets its own BatchScan and
        the predicate reaches each branch — a lagging store can't force
        the others to scan unfiltered."""
        from pyspark.sql import functions as F

        from arrow_zarr_spark import fixtures, read_zarr_many

        df = read_zarr_many(
            spark,
            [
                fixtures.write_lat_lon_store(),
                fixtures.write_lat_lon_store_shifted(),
            ],
        ).filter(F.col("lat") < 37.0)
        df.collect()
        plan = _plan(df)
        assert "Union" in plan
        assert plan.count("BatchScan zarr") == 2
        # both branches carry the pushed predicate
        assert plan.count("lat") >= 2 and plan.count("< 37.0") >= 2

    def test_vocab_stats_topk_is_take_ordered(self, spark):
        """corpus_vocab_stats' top-k must plan as TakeOrderedAndProject
        (per-partition heaps, driver merges k rows) — a global Sort
        here would shuffle the whole vocabulary to one partition."""
        from arrow_zarr_spark.operators.text import corpus_vocab_stats

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        df = corpus_vocab_stats(docs)
        df.collect()
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan

    def test_fuzzy_dedup_corpus_tail_is_broadcast_joins(self, views):
        """x02's corpus tail: after the candidate equi-join, the corpus
        must never shuffle again — the drop-list anti-join and the
        winner member-count attach must both plan as BroadcastHashJoin,
        and nothing anywhere in the composition may be a cartesian/NLJ
        (the LSH band join keeps candidates equi-keyed)."""
        from arrow_zarr_spark.operators.pipelines import fuzzy_dedup_pipeline

        docs = views.table("documents")
        out = fuzzy_dedup_pipeline(docs)
        out.collect()  # localCheckpoints inside need execution
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # tail joins: LeftAnti (drop list) + LeftOuter (member counts),
        # both broadcast — dup-group-sized build sides
        assert "BroadcastHashJoin" in plan
        anti = [l for l in plan.splitlines() if "LeftAnti" in l]
        outer = [l for l in plan.splitlines() if "LeftOuter" in l]
        assert anti and all("Broadcast" in l for l in anti)
        assert outer and all("Broadcast" in l for l in outer)
        # and the corpus side of the tail must not hash-repartition:
        # the only exchanges after the checkpointed pair set are the
        # component/window shuffles on dup-group-sized frames


class TestRound6Contracts:
    def test_segment_dedup_broadcasts_frequent_set(self, views):
        """d16: the frequent-segment mark must be a broadcast semi-join
        on 8-byte digests (a shuffle here repartitions the exploded
        corpus a second time), and nothing may go cartesian."""
        from arrow_zarr_spark.operators import dedup

        out = dedup.remove_frequent_segments(
            views.table("documents"), min_docs=3, seg_words=6
        )
        out.collect()  # the exploded localCheckpoint executes eagerly
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_pq_ann_single_exchange_no_joins(self, views):
        """s04: the whole PQ pipeline is one MapInPandas pass feeding
        ONE hash exchange of per-partition top-k rows — no join
        anywhere, and the row_number is a WindowGroupLimit (top-k
        prunes before AND after the shuffle)."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.pq_ann(
            embs, embs.filter(F.col("vec_id") < 10)
        )
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "WindowGroupLimit" in plan

    def test_ivf_pq_ann_single_exchange_no_joins(self, views):
        """s05: the IVF gate must not cost a plan shape — coarse
        assignment lives inside the same MapInPandas pass as the PQ
        encode (broadcast NumPy centroids, not a centroid join), so
        the plan is IDENTICAL in shape to s04's: one kernel pass, one
        hash exchange of per-partition top-k rows, no joins, window
        group-limit on both sides of the shuffle."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.ivf_pq_ann(
            embs, embs.filter(F.col("vec_id") < 10), n_cells=16, nprobe=2
        )
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "WindowGroupLimit" in plan

    def test_snapshot_pipeline_text_never_shuffles_after_dedup(
        self, views
    ):
        """x03: every corpus-touching join must be broadcast-gated
        (batch shingles / blocklist digests) — no cartesian, no NLJ,
        and the corpus-side explode joins only through hash joins."""
        from arrow_zarr_spark.operators.pipelines import (
            snapshot_curation_pipeline,
        )

        docs = views.table("documents")
        notblock = F.col("source") != "src0"
        out = snapshot_curation_pipeline(
            docs.filter((F.col("doc_id") % 10 == 0) & notblock),
            docs.filter((F.col("doc_id") % 10 != 0) & notblock),
            docs.filter(F.col("source") == "src0"),
        )
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_interval_overlap_join_is_hash_join(self, views):
        """j06: overlap semantics must plan as a banded equi (hash)
        join — a raw overlap predicate would be a nested loop, fatal
        at scale — and the first-bucket dedup means no Aggregate for
        distinct appears."""
        from arrow_zarr_spark.operators.suite_entries import (
            j06_overlap_frame,
        )

        plan = _plan(j06_overlap_frame(views.table("events")))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Join" in plan
        assert "HashAggregate" not in plan  # no distinct-based dedup

    def test_assemble_chunks_single_shuffle_no_window(self, views):
        """t14: reassembly is ONE groupBy exchange; order comes from
        array_sort after collect (no Window, no global Sort — a
        window/sort formulation would add a second shuffle and a
        per-group sort pass)."""
        from arrow_zarr_spark.operators.text import (
            assemble_chunks,
            chunk_documents,
        )

        out = assemble_chunks(
            chunk_documents(views.table("documents"), chunk_tokens=16)
        )
        plan = _plan(out)
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Window" not in plan
        assert plan.count("Sort") == 0  # array_sort is an expression

    def test_bloom_gate_joins_are_broadcast(self, views):
        """d17: both verify joins broadcast the batch-bounded side —
        the corpus must never shuffle (its only passes are the filter
        build scan and the semi-join probe)."""
        from arrow_zarr_spark.operators.dedup import bloom_gated_dedup

        docs = views.table("documents")
        out = bloom_gated_dedup(
            docs.filter(F.col("doc_id") % 7 == 0),
            docs.filter(F.col("doc_id") % 7 != 0),
            key=F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " "), 1, 8)
            ),
        )
        plan = _plan(out)
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") == 2
        # the only exchanges are the hit-key distincts (batch-bounded
        # 8-to-few-byte keys) — never a corpus-row repartition, which
        # would show as a third join input exchange
        assert plan.count("Exchange hashpartitioning") <= 2


class TestSketchPlans:
    """The bounded-memory sketches' scale contracts, pinned at the
    physical-plan level."""

    def test_kmv_distinct_two_candidate_exchanges_no_join(self, views):
        """t17's relational tail runs entirely over the pruned
        candidate rows (<= n_partitions * k per group, 16 bytes
        each): one exchange for the global dedupe, one for the
        per-group window+agg — and NEVER a join or a shuffle of the
        input rows (the kernel consumes them partition-local)."""
        from arrow_zarr_spark.operators.sketches import kmv_distinct

        orders = views.read.parquet(f"{SF_DIR}/orders.parquet")
        out = kmv_distinct(orders, "o_orderpriority", "o_custkey", k=256)
        plan = _plan(out)
        assert "Join" not in plan
        assert "CartesianProduct" not in plan
        # dedupe exchange + window/agg exchange, both candidate-sized
        assert plan.count("Exchange hashpartitioning") == 2
        assert "Exchange SinglePartition" not in plan
        # the input reaches the Python kernel without a prior shuffle:
        # no exchange may appear below MapInPandas
        below_kernel = plan.split("MapInPandas")[-1]
        assert "Exchange" not in below_kernel

    def test_heavy_hitters_recount_is_broadcast_gated(self, views):
        """t16's exact recount joins the exploded tokens against the
        driver-collected candidate set — that join must broadcast the
        candidates, never shuffle the token stream into a hash join."""
        from arrow_zarr_spark.operators import text as text_ops

        docs = views.read.parquet(f"{SF_DIR}/documents.parquet")
        out = text_ops.heavy_hitters(docs, k=10, capacity=256)
        plan = _plan(out)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestSQ8PlanContracts:
    def test_sq8_ann_single_exchange_no_joins(self, views):
        """s06: same single-exchange contract as s04/s05 — the scales
        reduce and query collect happen at build time, so the scored
        plan is one MapInPandas pass feeding ONE hash exchange of
        per-partition top-k rows; no join anywhere, window group-limit
        prunes both sides of the shuffle."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.sq8_ann(
            embs, embs.filter(F.col("vec_id") < 10)
        )
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "WindowGroupLimit" in plan

    def test_sq8_refine_corpus_never_shuffles(self, views):
        """s07: the rescore must probe the corpus IN PLACE — the
        probe-set-sized shortlist and query set are the broadcast
        sides of both stage-2 joins, so the only hash exchanges are
        the two candidate-sized window merges; no sort-merge join, no
        cartesian, no NLJ."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.sq8_refine_topk(
            embs, embs.filter(F.col("vec_id") < 10), shortlist=16
        )
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("Exchange hashpartitioning") == 2

    def test_binary_ann_jvm_only_corpus_never_shuffles(self, views):
        """s08: NO Python worker anywhere (the whole point — encode,
        hamming, shortlist, rerank are all codegen'd JVM
        expressions); the probe-set broadcast is the ONE nested-loop
        (bounded by contract, s01's shape); the rerank joins
        broadcast the shortlist and query vectors so the corpus never
        shuffles; the only hash exchanges are the two window merges
        over candidate-sized rows."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.binary_ann(
            embs, embs.filter(F.col("vec_id") < 10), shortlist=16
        )
        plan = _plan(df)
        assert "MapInPandas" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("BroadcastNestedLoopJoin") == 1  # probe set
        assert plan.count("BroadcastHashJoin") == 2  # rerank joins
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") == 2


class TestPhashPlanContracts:
    def test_phash_pairs_banded_hash_joins_no_distinct(self, views):
        """m07: candidate generation must be three band EQUI-joins
        (hash joins, never a cartesian/NLJ), and first-band emission
        means no distinct aggregate over pairs appears."""
        from arrow_zarr_spark.operators.multimodal import (
            phash_near_dup_pairs,
        )

        plan = _plan(phash_near_dup_pairs(views.table("documents")))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert (
            plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
            == 3
        )

    def test_phash64_pairs_four_banded_hash_joins(self, views):
        """m08 (production width): four 16-bit band EQUI-joins, same
        no-cartesian / no-distinct contract as m07."""
        from arrow_zarr_spark.operators.multimodal import (
            phash64_near_dup_pairs,
        )

        plan = _plan(phash64_near_dup_pairs(views.table("documents")))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert (
            plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
            == 4
        )


class TestPlanDoctor:
    """plan_doctor (z35): the contract checklist as a tool."""

    def test_flags_the_scale_killers(self, views):
        from pyspark.sql import functions as F

        from arrow_zarr_spark.plan_doctor import audit_plan

        spark = views
        a = spark.range(0, 100).select(F.col("id").alias("k"))
        b = spark.range(0, 100).select(F.col("id").alias("j"))
        bad = a.crossJoin(b)
        flagged = {r["check"] for r in audit_plan(bad) if not r["ok"]}
        assert flagged & {
            "cartesian_product",
            "broadcast_nested_loop_join",
        }

    def test_flags_row_python_but_not_arrow(self, views):
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        from arrow_zarr_spark.plan_doctor import audit_plan

        spark = views
        df = spark.range(0, 10)
        slow = df.select(
            F.udf(lambda x: x + 1, LongType())(F.col("id")).alias("y")
        )
        got = {r["check"]: r for r in audit_plan(slow)}
        assert not got["python_row_udf"]["ok"]

        @F.pandas_udf("long")
        def fast(s):
            return s + 1

        ok = df.select(fast(F.col("id")).alias("y"))
        got = {r["check"]: r for r in audit_plan(ok)}
        assert got["python_row_udf"]["ok"]
        assert got["arrow_python_eval"]["value"] >= 1

    def test_flags_unpushed_filescan(self, views):
        from pyspark.sql import functions as F

        from arrow_zarr_spark.plan_doctor import audit_plan

        li = views.table("lineitem")
        pushed = li.filter(F.col("l_quantity") > 30)
        got = {r["check"]: r for r in audit_plan(pushed)}
        assert got["filescan_without_pushed_filters"]["ok"]
        # a filter the scan can't take: over a computed expression
        blocked = li.filter(
            F.sha2(F.col("l_comment"), 256).startswith("00")
            if "l_comment" in li.columns
            else F.xxhash64(F.col("l_orderkey")) % 100 == 0
        )
        got = {r["check"]: r for r in audit_plan(blocked)}
        assert got["filescan_without_pushed_filters"]["value"] >= 1


class TestRound9OperatorContracts:
    def test_nearest_join_single_exchange_no_join_operator(self, views):
        """j08's contract: the union+window shape costs exactly ONE
        hash exchange on the by-key and contains NO join operator at
        all — both direction carries ride the same sorted partition."""
        from pyspark.sql import functions as F

        from arrow_zarr_spark.operators.joins import nearest_join

        events = views.table("events")
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        vw = events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id", "value"
        )
        plan = _plan(nearest_join(clicks, vw, on="ts", by=["user_id"]))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan  # no join operator anywhere
        assert "CartesianProduct" not in plan

    def test_dataset_card_never_shuffles_text(self, views):
        """x07's contract: the exchanges carry group keys + derived
        integers + 32-byte digests — the text column must not appear
        in any exchange/aggregate output (the review finding: a
        distinct on raw text would move the corpus through the
        Expand)."""
        from arrow_zarr_spark.operators.pipelines import dataset_card

        plan = _plan(dataset_card(views.table("documents")))
        for line in plan.splitlines():
            if "Exchange" in line or "HashAggregate" in line:
                assert "text#" not in line, line

    def test_containment_no_cartesian_and_shared_kernel_shape(
        self, views
    ):
        """d19's contract: candidate discovery is the shingle
        EQUI-join (hash join on the shingle string), never a
        cartesian/NLJ; the directional projection adds no extra
        corpus-wide exchange beyond d04's kernel + the sizes join."""
        from arrow_zarr_spark.operators.dedup import containment_pairs

        plan = _plan(containment_pairs(views.table("documents")))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound13OperatorContracts:
    def test_ivf_sq8_build_zero_joins_zero_windows(
        self, views, tmp_path, monkeypatch
    ):
        """s09 BUILD (r13, verdict item 2): the coarse assignment +
        SQ8 encode must be ONE MapInPandas pass over the corpus —
        no crossJoin x n_cells explode, no per-id row_number window,
        no join of any kind; the only corpus-wide exchange left is
        the (cell, id) range sort the persisted layout requires."""
        from arrow_zarr_spark import io as azio
        from arrow_zarr_spark.operators.ivf_index import (
            build_ivf_sq8_index,
        )

        plans = []
        real_write = azio.write_zarr

        def spy(df, path, **kw):
            plans.append((path, _plan(df)))
            return real_write(df, path, **kw)

        monkeypatch.setattr(azio, "write_zarr", spy)
        embs = views.table("embeddings")
        build_ivf_sq8_index(
            embs, str(tmp_path / "idx"), n_cells=16, chunk_rows=32
        )
        codes_plans = [p for path, p in plans if path.endswith("/codes")]
        assert codes_plans, "codes store was not written"
        plan = codes_plans[0]
        assert "MapInPandas" in plan
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert "Window" not in plan and "row_number" not in plan
        # one range exchange for the (cell, id) layout sort, nothing else
        assert plan.count("Exchange hashpartitioning") == 0

    def test_ivf_ann_corpus_assignment_kernel_side(self, views):
        """s03 (r13 verdict item 2; tightened r14, verdict item 5):
        assignment AND candidate scoring run inside ONE Arrow kernel
        (broadcast NumPy centroids + the collected bounded query set)
        — the plan has no join of any kind, no query-side subtree,
        and exactly one window (the final top-k rank) above the
        kernel."""
        from arrow_zarr_spark.operators import similarity

        embs = views.table("embeddings")
        df = similarity.ivf_ann(
            embs, embs.filter(F.col("vec_id") < 10), n_cells=16, nprobe=2
        )
        plan = _plan(df)
        assert "MapInPandas" in plan
        assert "CartesianProduct" not in plan
        assert "Join" not in plan
        assert plan.count("Window [") == 1
