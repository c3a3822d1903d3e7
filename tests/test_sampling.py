"""Sampling/mixing operators: quota determinism, budget semantics,
stratified rate bounds. (p01/p02 cross-engine parity is covered by
test_oracle_parity.py; these tests pin the operator-level contracts.)"""

import os

import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.operators import sampling

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestPerGroupQuota:
    def test_quota_respected_and_best_kept(self, spark, docs):
        out = sampling.per_group_quota(
            docs, "source", ["n_chars"], 3, tiebreak_col="doc_id"
        )
        rows = out.collect()
        by_group = {}
        for r in rows:
            by_group.setdefault(r.source, []).append(r)
        assert all(len(v) <= 3 for v in by_group.values())
        # each kept row must be >= every dropped row of its group
        kept_min = {g: min(r.n_chars for r in v) for g, v in by_group.items()}
        dropped = docs.join(
            out.select("doc_id"), "doc_id", "left_anti"
        ).collect()
        for r in dropped:
            assert r.n_chars <= kept_min[r.source]

    def test_deterministic(self, spark, docs):
        a = sampling.per_group_quota(docs, "lang", ["n_chars"], 2, "doc_id")
        b = sampling.per_group_quota(docs, "lang", ["n_chars"], 2, "doc_id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestTokenBudget:
    def test_budget_bound(self, spark, docs):
        budget = 5000
        out = sampling.token_budget_sample(
            docs, "n_chars", budget, ["n_chars", "doc_id"]
        ).collect()
        total = sum(r.n_chars for r in out)
        # greedy prefix: total may overshoot by at most the last row
        assert total - max(r.n_chars for r in out) < budget
        assert len(out) >= 1

    def test_takes_longest_docs_first(self, spark, docs):
        out = sampling.token_budget_sample(
            docs, "n_chars", 3000, ["n_chars", "doc_id"]
        ).collect()
        taken_min = min(r.n_chars for r in out)
        n_longer = docs.filter(F.col("n_chars") > taken_min).count()
        # everything strictly longer than the shortest taken doc is in
        assert n_longer < len(out)


class TestStratified:
    def test_rates_within_bounds(self, spark, docs):
        out = sampling.stratified_sample(
            docs, "lang", {"en": 0.5}, seed=7, default_fraction=0.1
        )
        got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        en_rate = got.get("en", 0) / tot["en"]
        assert 0.3 < en_rate < 0.7
        for lang, n in tot.items():
            if lang == "en":
                continue
            if n >= 30:
                assert got.get(lang, 0) / n < 0.35

    def test_seed_deterministic(self, spark, docs):
        a = sampling.stratified_sample(docs, "lang", {"en": 0.5}, seed=7)
        b = sampling.stratified_sample(docs, "lang", {"en": 0.5}, seed=7)
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        )


class TestStratifiedDeterministic:
    """The engine-independent-draw variant (the registered p03 path):
    same statistical contract as sampleBy, plus an exactly replayable
    row set (cross-engine parity in test_oracle_parity.py)."""

    def test_rates_within_bounds(self, spark, docs):
        out = sampling.stratified_sample_deterministic(
            docs, "lang", {"en": 0.5}, key_col="doc_id", seed=7,
            default_fraction=0.1,
        )
        got = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        tot = {r["lang"]: r["n"] for r in
               docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        en_rate = got.get("en", 0) / tot["en"]
        assert 0.3 < en_rate < 0.7
        for lang, n in tot.items():
            if lang == "en":
                continue
            if n >= 30:
                assert got.get(lang, 0) / n < 0.35

    def test_draw_is_pure_function_of_key_and_seed(self, spark, docs):
        a = sampling.stratified_sample_deterministic(
            docs, "lang", {"en": 0.5}, key_col="doc_id", seed=7
        ).collect()
        b = sampling.stratified_sample_deterministic(
            docs, "lang", {"en": 0.5}, key_col="doc_id", seed=7
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # a different seed draws a different set (sanity that the seed
        # actually participates)
        c = sampling.stratified_sample_deterministic(
            docs, "lang", {"en": 0.5}, key_col="doc_id", seed=8
        ).collect()
        assert sorted(r[0] for r in a) != sorted(r[0] for r in c)

    def test_huge_keys_do_not_overflow(self, spark):
        # ANSI mode throws on int64 overflow; the pre-multiply modulo
        # must keep the draw finite at any key magnitude
        df = spark.createDataFrame(
            [(2**62 + i, "en") for i in range(20)], ["doc_id", "lang"]
        )
        out = sampling.stratified_sample_deterministic(
            df, "lang", {"en": 0.5}, key_col="doc_id"
        )
        assert out.count() <= 20


class TestRebalanceMixture:
    def test_realized_mix_tracks_targets(self, spark, docs):
        out = sampling.rebalance_mixture(
            docs, "source", {"src0": 0.3, "src1": 0.2, "src2": 0.5},
            key_col="doc_id",
        )
        got = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # only whitelisted sources survive
        assert set(got) <= {"src0", "src1", "src2"}
        total = sum(got.values())
        assert total > 0
        # realized proportions within a loose Bernoulli band
        for src, w in [("src0", 0.3), ("src1", 0.2), ("src2", 0.5)]:
            assert abs(got.get(src, 0) / total - w) < 0.25

    def test_deterministic_and_schema_preserving(self, spark, docs):
        a = sampling.rebalance_mixture(
            docs, "source", {"src0": 0.5, "src1": 0.5}, key_col="doc_id"
        )
        b = sampling.rebalance_mixture(
            docs, "source", {"src0": 0.5, "src1": 0.5}, key_col="doc_id"
        )
        assert a.columns == docs.columns
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        )

    def test_binding_group_kept_whole(self, spark):
        # src_rare has far less data than its weight demands -> it is
        # the binding group and keeps every row (keep_frac == 1.0)
        rows = [(i, "src_big") for i in range(400)] + [
            (1000 + i, "src_rare") for i in range(10)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = sampling.rebalance_mixture(
            df, "source", {"src_big": 0.5, "src_rare": 0.5}, key_col="doc_id"
        )
        got = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert got["src_rare"] == 10
        # big side downsampled toward ~10 (Bernoulli, not exact-N)
        assert got["src_big"] < 60

    def test_empty_weights_rejected(self, spark, docs):
        with pytest.raises(ValueError, match="empty"):
            sampling.rebalance_mixture(docs, "source", {}, key_col="doc_id")


class TestQuantileGate:
    def test_keeps_top_fraction_per_group(self, spark):
        from arrow_zarr_spark.operators.sampling import quantile_gate

        rows = [(i, "a", i * 10) for i in range(10)] + [
            (100 + i, "b", i) for i in range(5)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        out = quantile_gate(df, "lang", "score", 0.5, "doc_id").collect()
        by_group = {}
        for r in out:
            by_group.setdefault(r.lang, []).append(r)
        # ceil(10*0.5)=5 and ceil(5*0.5)=3 survivors, the highest scores
        assert sorted(r.doc_id for r in by_group["a"]) == [5, 6, 7, 8, 9]
        assert sorted(r.doc_id for r in by_group["b"]) == [102, 103, 104]
        # rank 1 = best in group
        assert {r.group_rank for r in by_group["a"]} == {1, 2, 3, 4, 5}

    def test_tie_broken_by_id(self, spark):
        from arrow_zarr_spark.operators.sampling import quantile_gate

        df = spark.createDataFrame(
            [(1, "a", 7), (2, "a", 7), (3, "a", 7), (4, "a", 7)],
            ["doc_id", "lang", "score"],
        )
        out = quantile_gate(df, "lang", "score", 0.5, "doc_id").collect()
        assert sorted(r.doc_id for r in out) == [1, 2]

    def test_rejects_bad_fraction(self, spark):
        from arrow_zarr_spark.operators.sampling import quantile_gate

        df = spark.createDataFrame([(1, "a", 1)], ["doc_id", "lang", "s"])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="keep_frac"):
            quantile_gate(df, "lang", "s", 0.0, "doc_id")

    @pytest.mark.parametrize("keep_frac", [0.1, 0.5, 0.9, 1.0])
    def test_approx_path_identical_to_exact(self, spark, docs, keep_frac):
        """The skew fallback must return the SAME rows AND ranks as the
        exact window path (the threshold pre-gate is padded past the
        percentile_approx rank-error bound, so it can never cut into
        the true top-k)."""
        d = docs.select("doc_id", "lang", "n_chars")
        exact = sampling.quantile_gate(
            d, "lang", "n_chars", keep_frac, "doc_id"
        )
        approx = sampling.quantile_gate(
            d, "lang", "n_chars", keep_frac, "doc_id", approx=True
        )
        assert exact.columns == approx.columns
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, approx.collect())
        )

    def test_approx_path_identical_under_single_group_skew(self, spark):
        """The exact scenario the fallback exists for: one group holds
        ~99% of the rows (with heavy score ties), tiny groups beside
        it. Output must still match the exact path bit-for-bit."""
        import numpy as np

        rng = np.random.RandomState(11)
        rows = [(int(i), "en", int(rng.randint(0, 50))) for i in range(5000)]
        rows += [(5000 + i, "xx", i) for i in range(7)]
        rows += [(6000, "yy", 1)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        for kf in (0.2, 0.5):
            exact = sampling.quantile_gate(df, "lang", "score", kf, "doc_id")
            approx = sampling.quantile_gate(
                df, "lang", "score", kf, "doc_id", approx=True
            )
            assert sorted(map(tuple, exact.collect())) == sorted(
                map(tuple, approx.collect())
            ), kf

    def test_approx_path_identical_on_ties(self, spark):
        """Score ties around the cutoff: the threshold filter keeps
        whole tie runs and the rank filter re-cuts them exactly."""
        rows = [(i, "a", (i // 3) * 5) for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        exact = sampling.quantile_gate(df, "lang", "score", 0.4, "doc_id")
        approx = sampling.quantile_gate(
            df, "lang", "score", 0.4, "doc_id", approx=True
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, approx.collect())
        )


class TestTokenBudgetSharded:
    @pytest.mark.parametrize("n_buckets", [4, 16, 64])
    def test_identical_to_global_window_form(self, spark, docs, n_buckets):
        total = docs.agg(F.sum("n_chars")).first()[0]
        for budget in (3000, total // 2, total * 2):
            g = sampling.token_budget_sample(
                docs, "n_chars", budget, ["n_chars", "doc_id"]
            )
            s = sampling.token_budget_sample_sharded(
                docs,
                "n_chars",
                budget,
                ["n_chars", "doc_id"],
                n_buckets=n_buckets,
            )
            assert g.columns == s.columns
            assert sorted(r.doc_id for r in g.collect()) == sorted(
                r.doc_id for r in s.collect()
            ), (n_buckets, budget)

    def test_first_row_kept_when_it_alone_overflows(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 90), (3, 80)], ["doc_id", "toks"]
        )
        out = sampling.token_budget_sample_sharded(
            df, "toks", 50, ["toks", "doc_id"], n_buckets=4
        ).collect()
        assert [r.doc_id for r in out] == [1]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id long, toks long")
        out = sampling.token_budget_sample_sharded(
            df, "toks", 50, ["toks", "doc_id"]
        )
        assert out.count() == 0

    def test_zero_token_rows_and_constant_scores(self, spark):
        """Adversarial cases for the bucket math: zero-token rows at
        the exact budget boundary (greedy drops them: prior == budget)
        and a constant order column (every row lands in one bucket)."""
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [
            (int(i), int(rng.choice([0, 0, 5, 50]))) for i in range(500)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "toks"])
        for budget in (1, 55, 137, sum(t for _, t in rows)):
            g = sampling.token_budget_sample(
                df, "toks", budget, ["toks", "doc_id"]
            )
            s = sampling.token_budget_sample_sharded(
                df, "toks", budget, ["toks", "doc_id"], n_buckets=8
            )
            assert sorted(r.doc_id for r in g.collect()) == sorted(
                r.doc_id for r in s.collect()
            ), budget
        const = spark.createDataFrame(
            [(i, 10) for i in range(100)], ["doc_id", "toks"]
        )
        g = sampling.token_budget_sample(
            const, "toks", 305, ["toks", "doc_id"]
        )
        s = sampling.token_budget_sample_sharded(
            const, "toks", 305, ["toks", "doc_id"], n_buckets=8
        )
        assert sorted(r.doc_id for r in g.collect()) == sorted(
            r.doc_id for r in s.collect()
        )


class TestDeterministicShuffle:
    def test_is_a_permutation(self, spark, docs):
        out = sampling.deterministic_shuffle(docs, "doc_id", n_shards=8)
        rows = out.select("doc_id", "shard", "shard_pos").collect()
        assert len(rows) == docs.count()
        assert len({r.doc_id for r in rows}) == len(rows)
        by_shard = {}
        for r in rows:
            assert 0 <= r.shard < 8
            by_shard.setdefault(r.shard, []).append(r.shard_pos)
        # positions dense 0..n-1 within every shard
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))

    def test_partition_invariant_and_seed_sensitive(self, spark, docs):
        a = sampling.deterministic_shuffle(
            docs.repartition(3), "doc_id", n_shards=8
        )
        b = sampling.deterministic_shuffle(
            docs.repartition(17), "doc_id", n_shards=8
        )
        key = lambda df: sorted(
            (r.doc_id, r.shard, r.shard_pos)
            for r in df.select("doc_id", "shard", "shard_pos").collect()
        )
        assert key(a) == key(b)
        c = sampling.deterministic_shuffle(docs, "doc_id", n_shards=8, seed=1)
        assert key(a) != key(c)

    def test_shuffles_neighboring_keys_apart(self, spark):
        """Consecutive keys must not land in consecutive read order —
        the whole point of the epoch shuffle."""
        df = spark.createDataFrame(
            [(i,) for i in range(1000)], ["doc_id"]
        )
        out = sampling.deterministic_shuffle(df, "doc_id", n_shards=4)
        rows = sorted(
            ((r.shard, r.shard_pos), r.doc_id)
            for r in out.collect()
        )
        read_order = [doc for _, doc in rows]
        adjacent = sum(
            1 for x, y in zip(read_order, read_order[1:]) if abs(x - y) == 1
        )
        # a true random permutation has ~2 adjacent pairs in 1000
        assert adjacent < 20


class TestTrainValTestSplit:
    def test_partition_invariant_and_complete(self, spark, docs):
        from arrow_zarr_spark.operators.sampling import train_val_test_split

        out = train_val_test_split(docs.select("doc_id"), "doc_id")
        rows = {r.doc_id: r.split for r in out.collect()}
        assert set(rows.values()) <= {"train", "val", "test"}
        assert len(rows) == docs.count()
        # membership is a pure function of the key: repartitioning must
        # not move any row between splits
        re_rows = {
            r.doc_id: r.split
            for r in train_val_test_split(
                docs.select("doc_id").repartition(13), "doc_id"
            ).collect()
        }
        assert rows == re_rows
        # realized fractions track the request (equidistributed draw)
        n = len(rows)
        test_n = sum(1 for s in rows.values() if s == "test")
        val_n = sum(1 for s in rows.values() if s == "val")
        assert 0.03 <= test_n / n <= 0.2
        assert 0.03 <= val_n / n <= 0.2

    def test_rejects_bad_fractions(self, spark, docs):
        from arrow_zarr_spark.operators.sampling import train_val_test_split

        import pytest as _pytest

        with _pytest.raises(ValueError, match="val_frac"):
            train_val_test_split(docs, "doc_id", val_frac=0.6, test_frac=0.5)


class TestEpochDecorrelation:
    def test_new_seed_gives_a_genuinely_new_order(self, spark):
        """An additive seed before a fixed multiplier shifts every draw
        by the same constant — epochs would replay nearly the same read
        order (>99% of adjacent pairs preserved, the bug this pins).
        With the seed in the multiplier, consecutive epochs must share
        almost no adjacent read-order pairs."""
        df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])

        def read_order(seed):
            out = sampling.deterministic_shuffle(
                df, "doc_id", n_shards=4, seed=seed
            )
            rows = sorted(
                ((r.shard, r.shard_pos), r.doc_id) for r in out.collect()
            )
            return [doc for _, doc in rows]

        o0, o1 = read_order(0), read_order(1)
        assert o0 != o1
        pairs0 = set(zip(o0, o0[1:]))
        pairs1 = set(zip(o1, o1[1:]))
        preserved = len(pairs0 & pairs1)
        # random permutations share ~1 adjacent pair in 1000
        assert preserved < 20


class TestSampledGuards:
    def test_sharded_budget_rejects_single_bucket(self, spark, docs):
        with pytest.raises(ValueError, match="n_buckets"):
            sampling.token_budget_sample_sharded(
                docs, "n_chars", 1000, ["n_chars", "doc_id"], n_buckets=1
            )

    def test_sharded_budget_rejects_null_order_values(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], ["doc_id", "toks"]
        )
        with pytest.raises(ValueError, match="NULL values"):
            sampling.token_budget_sample_sharded(
                df, "toks", 25, ["toks", "doc_id"], n_buckets=2
            )

    def test_quantile_gate_approx_keeps_null_group(self, spark):
        """A NULL group key is a group of its own in the exact path;
        the approx path's broadcast join must not silently drop it."""
        rows = [(i, "en" if i % 2 else None, float(i)) for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        exact = sampling.quantile_gate(df, "lang", "score", 0.5, "doc_id")
        approx = sampling.quantile_gate(
            df, "lang", "score", 0.5, "doc_id", approx=True
        )
        key = lambda d: sorted(
            (r.doc_id, r.lang, r.group_rank) for r in d.collect()
        )
        assert key(exact) == key(approx)
        assert any(lang is None for _, lang, _ in key(exact))


class TestWeightedSample:
    def test_rates_track_weights(self, spark):
        """Bucketed by weight, realized keep rates must track the
        requested probabilities (the multiplicative sweep
        equidistributes consecutive keys)."""
        df = spark.range(0, 20000).select(
            F.col("id").alias("k"),
            ((F.col("id") % 10) / 10.0).alias("w"),
        )
        out = sampling.weighted_sample(df, "w", "k").collect()
        by_w = {}
        for r in out:
            by_w[round(r.w, 1)] = by_w.get(round(r.w, 1), 0) + 1
        assert 0.0 not in by_w  # zero weight keeps nothing
        for w in range(1, 10):
            rate = by_w.get(w / 10.0, 0) / 2000.0
            assert abs(rate - w / 10.0) < 0.05, (w, rate)

    def test_clamps_out_of_range_weights(self, spark):
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 500, F.lit(5.0))
            .otherwise(F.lit(-1.0))
            .alias("w"),
        )
        kept = sampling.weighted_sample(df, "w", "k").collect()
        # weight > 1 clamps to certain keep; < 0 clamps to certain drop
        assert len(kept) == 500
        assert all(r.k < 500 for r in kept)

    def test_deterministic_and_seed_sensitive(self, spark, docs):
        w = F.col("n_chars") / F.lit(600.0)
        a = {r.doc_id for r in sampling.weighted_sample(docs, w, "doc_id").collect()}
        b = {r.doc_id for r in sampling.weighted_sample(docs, w, "doc_id").collect()}
        c = {r.doc_id for r in sampling.weighted_sample(docs, w, "doc_id", seed=43).collect()}
        assert a == b
        assert a != c


class TestTemperatureMixture:
    def test_small_groups_boosted_large_damped(self, spark):
        """alpha=0.5 smoothing: a group 100x larger gets only 10x the
        kept rows (sqrt), so small groups are over-represented
        relative to their share."""
        df = spark.range(0, 10100).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 10000, F.lit("big"))
            .otherwise(F.lit("small"))
            .alias("g"),
        )
        out = sampling.temperature_mixture(df, "g", "k", budget=1000)
        by_g = {
            r.g: r.n
            for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
        }
        # weights: sqrt(10000)=100 : sqrt(100)=10 -> expect ~909 : ~91
        assert 800 < by_g["big"] < 1000
        assert 50 < by_g["small"] <= 100
        # proportional sampling would give "small" ~1% = ~10 rows;
        # smoothing must lift it far above that
        assert by_g["small"] > 40

    def test_saturation_keeps_whole_tiny_group(self, spark):
        df = spark.range(0, 1005).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 1000, F.lit("big"))
            .otherwise(F.lit("tiny"))
            .alias("g"),
        )
        # fair share for "tiny" exceeds its 5 rows -> keep all 5
        out = sampling.temperature_mixture(df, "g", "k", budget=900)
        tiny = [r.k for r in out.collect() if r.g == "tiny"]
        assert len(tiny) == 5

    def test_deterministic_and_exact_columns(self, spark, docs):
        a = sampling.temperature_mixture(docs, "source", "doc_id", 200)
        b = sampling.temperature_mixture(docs, "source", "doc_id", 200)
        ra = sorted(r.doc_id for r in a.collect())
        rb = sorted(r.doc_id for r in b.collect())
        assert ra == rb and len(ra) > 0
        assert sorted(a.columns) == sorted(docs.columns)

    def test_rejects_bad_budget(self, spark, docs):
        with pytest.raises(ValueError, match="budget"):
            sampling.temperature_mixture(docs, "source", "doc_id", 0)


class TestReviewHardening:
    def test_weighted_sample_nan_weight_drops(self, spark):
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 50, F.lit(float("nan")))
            .otherwise(F.lit(1.0))
            .alias("w"),
        )
        kept = sampling.weighted_sample(df, "w", "k").collect()
        assert len(kept) == 50
        assert all(r.k >= 50 for r in kept)

    def test_temperature_mixture_samples_null_group(self, spark):
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 500, F.lit("a"))
            .otherwise(F.lit(None).cast("string"))
            .alias("g"),
        )
        out = sampling.temperature_mixture(df, "g", "k", budget=400).collect()
        n_null = sum(1 for r in out if r.g is None)
        n_a = sum(1 for r in out if r.g == "a")
        # equal-size groups -> equal weights -> ~200 each; the null
        # group must not vanish
        assert 120 < n_null < 280 and 120 < n_a < 280


class TestReplicateByWeight:
    """p13 — deterministic multi-epoch replication."""

    def test_integer_weights_replicate_exactly(self, spark):
        from arrow_zarr_spark.operators.sampling import replicate_by_weight

        df = spark.createDataFrame(
            [(1, 2.0), (2, 1.0), (3, 0.0), (4, 3.0)], ["k", "w"]
        )
        out = replicate_by_weight(df, "w", "k", max_copies=4).collect()
        by_k = {}
        for r in out:
            by_k.setdefault(r.k, []).append(r.copy_idx)
        assert sorted(by_k[1]) == [1, 2]
        assert by_k[2] == [1]
        assert 3 not in by_k  # zero weight drops the row
        assert sorted(by_k[4]) == [1, 2, 3]
        assert all(r.n_copies == len(by_k[r.k]) for r in out)

    def test_fractional_weights_hit_expected_rate(self, spark):
        from arrow_zarr_spark.operators.sampling import replicate_by_weight

        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), F.lit(1.5).alias("w")
        )
        n = replicate_by_weight(df, "w", "k").count()
        # expected 1.5 copies/row; the multiplicative sweep
        # equidistributes, so the realized rate is tight
        assert 5700 <= n <= 6300

    def test_nan_null_and_clamp(self, spark):
        from arrow_zarr_spark.operators.sampling import replicate_by_weight

        df = spark.createDataFrame(
            [(1, float("nan")), (2, None), (3, 99.0), (4, -5.0)],
            ["k", "w"],
        )
        out = replicate_by_weight(df, "w", "k", max_copies=3).collect()
        ks = {r.k for r in out}
        assert 1 not in ks and 2 not in ks and 4 not in ks
        assert sorted(r.copy_idx for r in out if r.k == 3) == [1, 2, 3]

    def test_determinism_and_validation(self, spark):
        from arrow_zarr_spark.operators.sampling import replicate_by_weight

        df = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") % 7 / 2.0).alias("w")
        )
        a = sorted(map(tuple, replicate_by_weight(df, "w", "k").collect()))
        b = sorted(map(tuple, replicate_by_weight(df, "w", "k").collect()))
        assert a == b
        with pytest.raises(ValueError, match="max_copies"):
            replicate_by_weight(df, "w", "k", max_copies=0)
