"""Correctness-harness registrations for the pipeline operators.

Every SQL-expressible operator gets a DuckDB oracle. Two replay
families: engine-independent integer arithmetic (the :mod:`text`
word-code convention), and — since r12 — the crc32 replay
(:func:`_crc32_sql`): zlib.crc32 reproduced in pure DuckDB as a
256-entry byte-table ``list_reduce``, which made the crc32-hashed
production kernels (d03 MinHash-LSH, d05 SimHash) oracle-checkable
bit-for-bit. The rows-only set is r26 alone (approximate aggregates,
engine-specific by nature)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..suite import ensure_views
from . import dedup, multimodal, similarity, text

__all__ = [
    "populate_operator_queries",
    "populate_extended_queries",
    "populate_round4_queries",
    "populate_round5_queries",
    "populate_round6_queries",
    "populate_round6_writer_queries",
    "populate_round6_sampling_queries",
    "populate_round6_grid_queries",
    "populate_round6_late_queries",
    "populate_round6_region_queries",
    "populate_deferred_queries",
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # register() also ships the package zip to Python workers — the
    # operator kernels (module-level pandas_udfs) unpickle by module
    # reference, so this must not depend on a zarr query running first
    from ..datasource import register

    register(spark)
    ensure_views(spark, sf_dir)
    return spark.table("documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datasource import register

    register(spark)
    ensure_views(spark, sf_dir)
    return spark.table("embeddings")


#: DuckDB list-comprehension trigram shingles (WITH ORDINALITY is not
#: available in DuckDB 1.0; list_transform over range is)
_TRI_CTE = (
    "tri AS ("
    "  SELECT doc_id, t.sh AS sh FROM ("
    "    SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),"
    "      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shl"
    "    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"
    "  ), UNNEST(shl) AS t(sh))"
)


def _leakage_split_oracle_sql() -> str:
    """The leakage-safe-split replay SHARED by x06 (exact trigram
    pairs) and x08 (size-adaptive LSH candidates, r11): connected
    components of the exact trigram-Jaccard-at-0.7 graph via a
    recursive CTE, then p07's integer-draw split arithmetic on the
    component id. One oracle for both registrations is the m08/m09
    pattern — x08's LSH route exact-verifies every candidate at the
    same threshold, so it can differ from the exact graph only by a
    true pair escaping all 16 bands; on this corpus (planted
    near-dup pairs at trigram Jaccard >= 0.889, seeded deterministic
    xxhash64 minhashes) every true edge lands in a shared band —
    verified empirically at both driver SFs — and the result is
    bit-identical to x06's, every run."""
    return (
        "WITH RECURSIVE "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2), "
        "pairs AS (SELECT id_a, id_b FROM ("
        "  SELECT id_a, id_b, "
        "  ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS j"
        "  FROM shared JOIN sizes sa ON sa.doc_id = shared.id_a"
        "  JOIN sizes sb ON sb.doc_id = shared.id_b) WHERE j >= 0.7), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach AS ("
        "  SELECT doc_id AS id, doc_id AS label FROM documents "
        "  UNION "
        "  SELECT e.dst AS id, r.label FROM reach r "
        "  JOIN edges e ON e.src = r.id), "
        "comp AS (SELECT id AS doc_id, MIN(label) AS component "
        "FROM reach GROUP BY id) "
        "SELECT doc_id, component, "
        "CASE WHEN d < 100000 THEN 'test' WHEN d < 200000 THEN 'val' "
        "ELSE 'train' END AS split FROM ("
        "SELECT doc_id, component, "
        "((component % 1000003 + 42) * 2654435761) % 1000003 AS d "
        "FROM comp)"
    )


def populate_operator_queries(register) -> None:
    # ---------------- dedup ----------------
    def d04(spark, sf_dir):
        return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.05)

    register(
        "d04_ngram_jaccard_pairs",
        d04,
        "WITH "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2) "
        "SELECT id_a, id_b, j AS jaccard FROM ("
        "  SELECT id_a, id_b, "
        "  ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS j"
        "  FROM shared JOIN sizes sa ON sa.doc_id = shared.id_a"
        "  JOIN sizes sb ON sb.doc_id = shared.id_b"
        ") WHERE j >= 0.05",
    )

    def d07(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.7).select(
            "id_a", "id_b"
        )
        return dedup.connected_components(docs, pairs)

    register(
        "d07_dedup_components",
        d07,
        "WITH RECURSIVE "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2), "
        "pairs AS (SELECT id_a, id_b FROM ("
        "  SELECT id_a, id_b, "
        "  ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS j"
        "  FROM shared JOIN sizes sa ON sa.doc_id = shared.id_a"
        "  JOIN sizes sb ON sb.doc_id = shared.id_b) WHERE j >= 0.7), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach AS ("
        "  SELECT doc_id AS id, doc_id AS label FROM documents "
        "  UNION "
        "  SELECT e.dst AS id, r.label FROM reach r "
        "  JOIN edges e ON e.src = r.id) "
        "SELECT id AS doc_id, MIN(label) AS component FROM reach GROUP BY id",
    )

    # Registered path is the LSH-gated variant (bucket equi-join, no
    # cross join at corpus scale); the oracle is the exact all-pairs
    # SQL, so a green row proves the gate's recall, and the all-pairs
    # Spark form (embedding_cosine_pairs) stays as the small-n verifier
    # in tests/test_operators.py.
    def d06(spark, sf_dir):
        return dedup.embedding_lsh_neardup_pairs(
            _embs(spark, sf_dir), threshold=0.4
        )

    register(
        "d06_embedding_neardup",
        d06,
        "SELECT id_a, id_b, c AS cosine FROM ("
        "  SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "  CAST(b.embedding AS DOUBLE[])), 6) AS c "
        "  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id"
        ") WHERE c >= 0.4",
    )

    # ---------------- similarity search ----------------
    def s01(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        out = similarity.cosine_topk(
            embs, embs.filter(F.col("vec_id") < 20), k=5
        )
        return out.withColumn("rank", F.col("rank").cast("long"))

    register(
        "s01_cosine_topk",
        s01,
        "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) "
        "AS qv FROM embeddings WHERE vec_id < 20), "
        "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) "
        "AS cv FROM embeddings), "
        "s AS (SELECT query_id, neighbor_id, "
        "ROUND(list_cosine_similarity(qv, cv), 6) AS cosine "
        "FROM q, c WHERE query_id <> neighbor_id), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM s) "
        "SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank "
        "FROM r WHERE rank <= 5",
    )

    # Registered with verification-grade LSH params (4 planes × 48
    # tables): at the driver's sf the gate achieves recall 1.0 vs exact
    # top-k (asserted for both sfs in tests/test_operators.py), so the
    # exact-cosine SQL is a true oracle — the d06 approach. Production
    # callers tune planes/tables for their own recall/cost point.
    def s02(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        out = similarity.hyperplane_lsh_ann(
            embs, embs.filter(F.col("vec_id") < 20), k=5,
            n_planes=4, n_tables=48,
        )
        return out.withColumn("rank", F.col("rank").cast("long"))

    register(
        "s02_lsh_ann_topk",
        s02,
        "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) "
        "AS qv FROM embeddings WHERE vec_id < 20), "
        "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) "
        "AS cv FROM embeddings), "
        "s AS (SELECT query_id, neighbor_id, "
        "ROUND(list_cosine_similarity(qv, cv), 6) AS cosine "
        "FROM q, c WHERE query_id <> neighbor_id), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM s) "
        "SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank "
        "FROM r WHERE rank <= 5",
    )

    # ---------------- text analysis ----------------
    def t01(spark, sf_dir):
        return text.token_count(_docs(spark, sf_dir))

    register(
        "t01_token_count",
        t01,
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS "
        "n_tokens, CAST(list_sum(list_transform(string_split(text, ' '), "
        "w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT))) AS BIGINT) AS "
        "n_subwords, CAST(LENGTH(text) AS INTEGER) AS n_chars_measured "
        "FROM documents",
    )

    def t02(spark, sf_dir):
        return text.language_id(_docs(spark, sf_dir))

    _en = "['the','a','of','and','to','in','is']"
    _es = "['el','la','de','que','y','en','un']"
    _fr = "['le','la','de','et','un','une','est']"
    register(
        "t02_language_id",
        t02,
        "SELECT doc_id, hits_en, hits_es, hits_fr, "
        "CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 "
        "THEN 'en' WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es' "
        "WHEN hits_fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred FROM ("
        "SELECT doc_id, "
        f"CAST(len(list_intersect(ws, {_en})) AS INTEGER) AS hits_en, "
        f"CAST(len(list_intersect(ws, {_es})) AS INTEGER) AS hits_es, "
        f"CAST(len(list_intersect(ws, {_fr})) AS INTEGER) AS hits_fr "
        "FROM (SELECT doc_id, string_split(LOWER(text), ' ') AS ws "
        "FROM documents))",
    )

    def t03(spark, sf_dir):
        return text.quality_score(_docs(spark, sf_dir))

    register(
        "t03_quality_score",
        t03,
        "SELECT doc_id, n_words, n_distinct_words, "
        "ROUND(avg_word_len, 6) AS avg_word_len, "
        "ROUND(diversity, 6) AS diversity, "
        "ROUND(0.4 * len_ok + 0.3 * wordlen_ok + 0.3 * diversity, 6) AS "
        "quality FROM ("
        "SELECT doc_id, n_words, n_distinct_words, avg_word_len, "
        "n_distinct_words / (n_words * 1.0) AS diversity, "
        "CASE WHEN n_words >= 10 AND n_words <= 1000 THEN 1.0 ELSE 0.3 END "
        "AS len_ok, "
        "CASE WHEN avg_word_len >= 2.0 AND avg_word_len <= 12.0 THEN 1.0 "
        "ELSE 0.4 END AS wordlen_ok FROM ("
        "SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words, "
        "CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words, "
        "(LENGTH(text) - (len(ws) - 1)) / (len(ws) * 1.0) AS avg_word_len "
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS ws "
        "FROM documents)))",
    )

    def t04(spark, sf_dir):
        return text.document_fingerprint(_docs(spark, sf_dir))

    register(
        "t04_document_fingerprint",
        t04,
        "SELECT doc_id, CAST(list_sum(list_transform(range(1, len(ws)+1), "
        "i -> ((LENGTH(ws[i]) * 31 + ASCII(SUBSTR(ws[i], 1, 1))) * 31 "
        "+ ASCII(SUBSTR(ws[i], LENGTH(ws[i]), 1))) "
        "* ((i * 2654435761) % 1000003))) % 2147483647 AS BIGINT) AS "
        "fingerprint FROM "
        "(SELECT doc_id, string_split(text, ' ') AS ws FROM documents)",
    )

    # ---------------- multimodal ----------------
    def m01(spark, sf_dir):
        media = multimodal.with_binary_payload(_docs(spark, sf_dir))
        return multimodal.byte_features(media)

    # documents text is pure ASCII (verified: octet_length == length), so
    # byte-level features are reconstructable from chars in the oracle
    register(
        "m01_byte_features",
        m01,
        "SELECT doc_id AS media_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "ascii(substr(text, 1, 1)) AS first_byte, "
        "ascii(substr(text, length(text), 1)) AS last_byte, "
        "CAST(list_sum(list_transform(string_split(text, ''), "
        "c -> ascii(c))) % 1000003 AS BIGINT) AS byte_sum_mod "
        "FROM documents",
    )

    def m02(spark, sf_dir):
        # The raw decode output carries `pixels array<double>`, which the
        # driver's pandas canonicalizer cannot hash (r2: unhashable list).
        # The registered form explodes to one row per pixel with an
        # integer micro-pixel digest: px is round(span_mean, 6), so
        # px * 1e6 sits within 1 ulp of the integer numpy chose and
        # ROUND recovers it exactly — no float column reaches the driver.
        media = multimodal.with_binary_payload(_docs(spark, sf_dir))
        decoded = multimodal.decode_image(media, fake=True)
        return decoded.select(
            "media_id",
            F.posexplode("pixels").alias("px_idx", "px"),
            "width",
            "height",
        ).select(
            "media_id",
            "px_idx",
            F.round(F.col("px") * 1000000.0).cast("long").alias("px_micro"),
            "width",
            "height",
        )

    # The fake decode is deterministic span-means over the payload bytes
    # (documents text is pure ASCII, per m01), so DuckDB replays it:
    # np.array_split(buf, 16) puts n%16 spans of n//16+1 bytes first,
    # then n//16-byte spans; numpy's round-half-even is round_even here.
    # Summation order is irrelevant because byte codes are integers —
    # exact in float64 either way.
    register(
        "m02_decode_image_fake",
        m02,
        "WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents "
        "WHERE length(text) > 0), "
        "s AS (SELECT doc_id, text, n, CAST(i AS INT) AS px_idx, "
        "CASE WHEN i < n % 16 THEN n // 16 + 1 ELSE n // 16 END AS span_len, "
        "CASE WHEN i < n % 16 THEN i * (n // 16 + 1) "
        "ELSE (n % 16) * (n // 16 + 1) + (i - n % 16) * (n // 16) "
        "END AS span_start FROM d, range(16) t(i)) "
        "SELECT doc_id AS media_id, px_idx, "
        "CASE WHEN span_len = 0 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(round_even(list_sum(list_transform(string_split("
        "substr(text, span_start + 1, span_len), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / span_len * 1000000.0, 0) "
        "AS BIGINT) END AS px_micro, "
        "4 AS width, 4 AS height FROM s",
    )

    # ---------------- custom joins ----------------
    def j01(spark, sf_dir):
        from . import joins

        ensure_views(spark, sf_dir)
        supplier = spark.table("supplier")
        left = supplier.select(
            F.col("s_suppkey").alias("k1"), F.col("s_acctbal").alias("b1")
        )
        right = supplier.select(
            F.col("s_suppkey").alias("k2"), F.col("s_acctbal").alias("b2")
        )
        return joins.range_join(
            left, right, "b1", "b2", lower=0.0, upper=100.0, band=100.0
        ).select("k1", "k2")

    register(
        "j01_range_join",
        j01,
        "SELECT a.s_suppkey AS k1, b.s_suppkey AS k2 FROM supplier a, "
        "supplier b WHERE b.s_acctbal - a.s_acctbal BETWEEN 0 AND 100",
    )

    def j02(spark, sf_dir):
        from . import joins

        ensure_views(spark, sf_dir)
        events = spark.table("events")
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        views = events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id", "value"
        )
        out = joins.asof_join(clicks, views, on="ts", by=["user_id"])
        return out.select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("view_id"),
            F.col("r_value").alias("view_value"),
        )

    def j03(spark, sf_dir):
        """The reference's theta/range self-join (s3_bench.rs:222-229)
        executed via the banded range join instead of a nested loop —
        same oracle as z11 proves plan-level equivalence."""
        from ..fixtures import write_lat_lon_store
        from . import joins

        df = spark.read.format("zarr").load(write_lat_lon_store())
        left = df.select(F.col("data").alias("d1")).filter(
            F.col("d1") % 12 == 0
        )
        right = df.select(F.col("data").alias("d2"))
        return joins.range_join(
            left, right, "d1", "d2", lower=-1.0, upper=1.0, band=1.0
        ).filter(
            # reference predicate: d1 < d2 + 1 AND d1 >= d2 - 1
            (F.col("d1") < F.col("d2") + 1)
            & (F.col("d1") >= F.col("d2") - 1)
        ).select("d1", "d2")

    _f1_gen = (
        "SELECT CAST(i AS DOUBLE) AS data FROM range(64) t(i)"
    )
    register(
        "j03_theta_join_banded",
        j03,
        f"SELECT t1.data AS d1, t2.data AS d2 FROM ({_f1_gen}) t1 "
        f"JOIN ({_f1_gen}) t2 ON t1.data % 12 = 0 "
        "AND t1.data < t2.data + 1 AND t1.data >= t2.data - 1",
    )

    def j04(spark, sf_dir):
        """Salted skew-join: result must equal the plain equi-join (the
        oracle runs the unsalted form)."""
        from . import joins

        ensure_views(spark, sf_dir)
        lineitem = spark.table("lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity"
        )
        orders = spark.table("orders").select("o_orderkey", "o_orderpriority")
        out = joins.salted_join(
            lineitem.withColumnRenamed("l_orderkey", "k"),
            orders.withColumnRenamed("o_orderkey", "k"),
            on="k",
            n_salts=8,
        )
        return out.select(
            F.col("k").alias("l_orderkey"),
            "l_linenumber",
            "l_quantity",
            "o_orderpriority",
        )

    register(
        "j04_salted_join",
        j04,
        "SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
    )

    register(
        "j02_asof_join",
        j02,
        "SELECT l.user_id AS user_id, l.event_id AS click_id, "
        "r.event_id AS view_id, r.value AS view_value "
        "FROM (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type = 'click') l "
        "ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events "
        "WHERE event_type = 'view') r "
        "ON l.user_id = r.user_id AND r.ts <= l.ts",
    )


    # ---------------- sampling / corpus analysis / exceeds-parity ----
    # Rotated INTO the driver window in r3: none of the queries below
    # (p01-p03, t06, t07, z14, z15, d08) had ever had a driver
    # correctness row, and all of them are oracle-backed now.
    from . import sampling

    def p01(spark, sf_dir):
        return sampling.per_group_quota(
            _docs(spark, sf_dir), "source", ["n_chars"], 5,
            tiebreak_col="doc_id",
        )

    register(
        "p01_per_group_quota",
        p01,
        "SELECT doc_id, text, lang, source, n_chars FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY source "
        "  ORDER BY n_chars DESC, doc_id) AS rn FROM documents"
        ") WHERE rn <= 5",
    )

    def p02(spark, sf_dir):
        return sampling.token_budget_sample(
            _docs(spark, sf_dir), "n_chars", 20000, ["n_chars", "doc_id"]
        )

    register(
        "p02_token_budget_sample",
        p02,
        "SELECT doc_id, text, lang, source, n_chars FROM ("
        "  SELECT *, COALESCE(SUM(n_chars) OVER ("
        "    ORDER BY n_chars DESC, doc_id DESC "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior "
        "  FROM documents"
        ") WHERE prior < 20000",
    )

    # The registered form is the deterministic-draw variant (integer
    # arithmetic over doc_id), so DuckDB replays the exact row set;
    # the sampleBy/engine-RNG variant stays statistically bounded in
    # tests/test_operators.py.
    def p03(spark, sf_dir):
        return sampling.stratified_sample_deterministic(
            _docs(spark, sf_dir), "lang", {"en": 0.5}, key_col="doc_id",
            seed=7, default_fraction=0.1,
        )

    register(
        "p03_stratified_sample",
        p03,
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "WHERE ((doc_id % 1000003 + 7) * 2654435761) % 1000003 "
        "< (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.1 END) * 1000003",
    )

    # corpus analysis (same past-the-window rationale)
    def t06(spark, sf_dir):
        return text.top_ngrams(_docs(spark, sf_dir), n=2, k=50)

    register(
        "t06_top_bigrams",
        t06,
        "WITH g AS ("
        "  SELECT doc_id, t.gram AS gram FROM ("
        "    SELECT doc_id, list_transform(range(1, len(ws)),"
        "      i -> ws[i] || ' ' || ws[i+1]) AS gl"
        "    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"
        "  ), UNNEST(gl) AS t(gram) WHERE len(t.gram) > 0) "
        "SELECT gram, COUNT(*) AS total_freq, "
        "COUNT(DISTINCT doc_id) AS doc_freq FROM g GROUP BY gram "
        "ORDER BY doc_freq DESC, total_freq DESC, gram LIMIT 50",
    )

    # string (vlen-utf8) store scan — the reference rejects string
    # arrays, so this exceeds-parity query registers past the window
    def z14(spark, sf_dir):
        from .. import fixtures
        from ..datasource import register as _reg

        _reg(spark)
        path = fixtures.write_string_store()
        df = spark.read.format("zarr").load(path)
        df.createOrReplaceTempView("zarr_strings")
        return spark.sql(
            "SELECT label, x FROM zarr_strings WHERE label <> 'n3'"
        )

    register(
        "z14_string_scan",
        z14,
        "SELECT 'n' || CAST(i AS VARCHAR) AS label, CAST(i AS DOUBLE) AS x "
        "FROM range(16) t(i) WHERE i <> 3",
    )

    # streaming exact dedup, batch form. The registered output drops
    # the engine-specific xxhash64 content-hash column: the surviving
    # doc_id SET is then exactly "first occurrence per distinct text",
    # which DuckDB expresses as MIN(doc_id) GROUP BY text — a real
    # oracle (the cross-batch state semantics stay pytest-verified in
    # tests/test_streaming.py).
    def d08(spark, sf_dir):
        from ..streaming.event_ops import streaming_exact_dedup

        return streaming_exact_dedup(_docs(spark, sf_dir)).select("doc_id")

    register(
        "d08_streaming_dedup_batchform",
        d08,
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
    )

    # Zarr v2 store scan — the reference rejects v2 metadata, so this
    # exceeds-parity query also registers past the window
    def z15(spark, sf_dir):
        from .. import fixtures
        from ..datasource import register as _reg

        _reg(spark)
        path = fixtures.write_v2_store()
        df = spark.read.format("zarr").load(path)
        df.createOrReplaceTempView("zarr_v2")
        return spark.sql("SELECT lat, lon, data FROM zarr_v2")

    register(
        "z15_v2_store_scan",
        z15,
        "SELECT CAST(10 + 10 * (i // 4) AS DOUBLE) AS lat, "
        "CAST(1 + i % 4 AS DOUBLE) AS lon, CAST(i AS DOUBLE) AS data "
        "FROM range(8) t(i)",
    )

    def t07(spark, sf_dir):
        return text.tf_idf(_docs(spark, sf_dir), min_doc_freq=2)

    register(
        "t07_tf_idf",
        t07,
        "WITH terms AS ("
        "  SELECT doc_id, t.term AS term FROM ("
        "    SELECT doc_id, string_split(text, ' ') AS ws FROM documents"
        "  ), UNNEST(ws) AS t(term) WHERE len(t.term) > 0), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms "
        "GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms "
        "GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 2), "
        "total AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents) "
        "SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, "
        "ROUND(tf.tf * (LN((total.n_docs + 1) * 1.0 / (dfreq.df + 1)) + 1.0), 6) "
        "AS tfidf6 FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN total",
    )


def populate_extended_queries(register) -> None:
    """Round-3 additions to the LLM-data-pipeline surface — all
    oracle-backed, registered past the (already full) 50-query driver
    window; cross-engine parity is enforced every round by
    tests/test_oracle_parity.py and they rotate into the window as
    older rows go multi-round green."""
    from . import sampling
    from .text import PII_PATTERNS

    # t08: PII redaction. The synthetic corpus carries no PII, so the
    # suite form plants a deterministic email/IP/phone per doc (both
    # engines build the same string) and the redaction must find and
    # scrub all three.
    _SUFFIX_SPARK = lambda: F.concat(  # noqa: E731
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" tel 555-123-4567"),
    )

    def t08(spark, sf_dir):
        from .text import pii_redact

        docs = _docs(spark, sf_dir).withColumn("text", _SUFFIX_SPARK())
        return pii_redact(docs)

    _EM, _IP, _PH = (
        PII_PATTERNS["email"], PII_PATTERNS["ip"], PII_PATTERNS["phone"],
    )
    register(
        "t08_pii_redact",
        t08,
        "WITH d AS (SELECT doc_id, text || ' contact user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com or 10.0.0.' || "
        "CAST(doc_id % 256 AS VARCHAR) || ' tel 555-123-4567' AS text "
        "FROM documents) "
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(regexp_replace(text, '{_EM}', "
        f"'<EMAIL>', 'g'), '{_IP}', '<IP>', 'g'), '{_PH}', '<PHONE>', 'g') "
        "AS clean_text, "
        f"CAST(len(regexp_extract_all(text, '{_EM}')) AS INTEGER) AS n_emails, "
        f"CAST(len(regexp_extract_all(text, '{_IP}')) AS INTEGER) AS n_ips, "
        f"CAST(len(regexp_extract_all(text, '{_PH}')) AS INTEGER) AS n_phones "
        "FROM d",
    )

    # t09: Gopher-style repetition signals
    def t09(spark, sf_dir):
        from .text import repetition_signals

        return repetition_signals(_docs(spark, sf_dir))

    register(
        "t09_repetition_signals",
        t09,
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents), "
        "wstats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, "
        "CAST(MAX(c) AS BIGINT) AS top_word_count FROM ("
        "  SELECT doc_id, COUNT(*) AS c FROM "
        "  (SELECT doc_id, UNNEST(ws) AS w FROM ws) GROUP BY doc_id, w) "
        "GROUP BY doc_id), "
        "grams AS (SELECT doc_id, "
        "list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) "
        "AS g2, "
        "list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] "
        "|| ' ' || ws[i+2]) AS g3 FROM ws) "
        "SELECT w.doc_id, n_words, top_word_count, "
        "ROUND(top_word_count * 1.0 / n_words, 6) AS top_word_frac, "
        "CASE WHEN len(g2) > 0 THEN ROUND((len(g2) - "
        "len(list_distinct(g2))) * 1.0 / len(g2), 6) ELSE 0.0 END "
        "AS dup_bigram_frac, "
        "CASE WHEN len(g3) > 0 THEN ROUND((len(g3) - "
        "len(list_distinct(g3))) * 1.0 / len(g3), 6) ELSE 0.0 END "
        "AS dup_trigram_frac "
        "FROM wstats w JOIN grams g ON w.doc_id = g.doc_id",
    )

    # d09: benchmark-contamination check (corpus 5-grams vs a held-out
    # eval slice). The eval set is every 97th doc — deterministic and
    # engine-independent.
    def d09(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return dedup.ngram_contamination(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            k=5,
        )

    register(
        "d09_ngram_contamination",
        d09,
        "WITH gl AS (SELECT doc_id, list_distinct(list_transform("
        "range(1, len(ws)-3), i -> ws[i] || ' ' || ws[i+1] || ' ' || "
        "ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS gl "
        "FROM (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents)), "
        "doc_g AS (SELECT doc_id, t.gram AS gram FROM gl, "
        "UNNEST(gl.gl) AS t(gram) WHERE doc_id % 97 <> 0), "
        "eval_g AS (SELECT DISTINCT t.gram AS gram FROM gl, "
        "UNNEST(gl.gl) AS t(gram) WHERE doc_id % 97 = 0), "
        "totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM doc_g "
        "GROUP BY doc_id), "
        "hits AS (SELECT doc_id, COUNT(*) AS n_contaminated FROM doc_g "
        "JOIN eval_g USING (gram) GROUP BY doc_id) "
        "SELECT t.doc_id, n_grams, "
        "COALESCE(n_contaminated, 0) AS n_contaminated, "
        "ROUND(COALESCE(n_contaminated, 0) * 1.0 / n_grams, 6) "
        "AS contamination_frac FROM totals t LEFT JOIN hits USING (doc_id)",
    )

    # d10: canonical-doc selection — near-dup pairs → components →
    # best-quality doc per group (the keep-list of a dedup pipeline)
    def d10(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.7).select(
            "id_a", "id_b"
        )
        return dedup.canonical_docs(docs, pairs)

    register(
        "d10_canonical_docs",
        d10,
        "WITH RECURSIVE "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2), "
        "pairs AS (SELECT id_a, id_b FROM ("
        "  SELECT id_a, id_b, "
        "  ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS j"
        "  FROM shared JOIN sizes sa ON sa.doc_id = shared.id_a"
        "  JOIN sizes sb ON sb.doc_id = shared.id_b) WHERE j >= 0.7), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach AS ("
        "  SELECT doc_id AS id, doc_id AS label FROM documents "
        "  UNION "
        "  SELECT e.dst AS id, r.label FROM reach r "
        "  JOIN edges e ON e.src = r.id), "
        "comp AS (SELECT id AS doc_id, MIN(label) AS component "
        "FROM reach GROUP BY id), "
        "qual AS (SELECT doc_id, "
        "ROUND(0.4 * len_ok + 0.3 * wordlen_ok + 0.3 * diversity, 6) AS "
        "quality FROM ("
        "SELECT doc_id, "
        "n_distinct_words / (n_words * 1.0) AS diversity, "
        "CASE WHEN n_words >= 10 AND n_words <= 1000 THEN 1.0 ELSE 0.3 END "
        "AS len_ok, "
        "CASE WHEN avg_word_len >= 2.0 AND avg_word_len <= 12.0 THEN 1.0 "
        "ELSE 0.4 END AS wordlen_ok FROM ("
        "SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words, "
        "CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words, "
        "(LENGTH(text) - (len(ws) - 1)) / (len(ws) * 1.0) AS avg_word_len "
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS ws "
        "FROM documents)))) "
        "SELECT component, doc_id AS canonical_doc_id, n_members, "
        "quality AS best_quality FROM ("
        "SELECT c.component, c.doc_id, q.quality, "
        "ROW_NUMBER() OVER (PARTITION BY c.component "
        "ORDER BY q.quality DESC, c.doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY c.component) AS n_members "
        "FROM comp c JOIN qual q ON c.doc_id = q.doc_id) WHERE rn = 1",
    )

    # m03: pixel resize over the fake decode — 4x4 thumbnails block-mean
    # to 2x2 (integer factor: fixed row-major accumulation, see
    # resize_pixels). Digested to integer micro-pixels like m02 so no
    # float column reaches the driver.
    # Digest strategy: quantize the decoded pixels to micro ints FIRST
    # (the m02 digest, driver-proven replayable), resize THAT grid, and
    # report the block SUM (= 4x the quarter-exact block mean). Every
    # step is then exact integer arithmetic in both engines — no
    # double-rounding ulp hazards (a round6-then-digest form diverged
    # by 1 micro on 14/2000 pixels when tried).
    def m03(spark, sf_dir):
        media = multimodal.with_binary_payload(_docs(spark, sf_dir))
        decoded = multimodal.decode_image(media, fake=True)
        micro = decoded.select(
            "media_id",
            F.transform(
                "pixels", lambda p: F.round(p * 1000000.0)
            ).alias("pixels"),
            "width",
            "height",
        )
        resized = multimodal.resize_pixels(micro, 2, 2)
        return resized.select(
            "media_id",
            F.posexplode("pixels").alias("px_idx", "px"),
            "width",
            "height",
        ).select(
            "media_id",
            "px_idx",
            # px is the exact quarter-valued block mean of 4 micro ints;
            # *4 recovers the integer block sum exactly
            (F.col("px") * 4).cast("long").alias("px_micro_sum"),
            "width",
            "height",
        )

    # The oracle rebuilds m02's micro-int pixels and sums each 2x2
    # block (integer SUM — order-free, so a plain GROUP BY is safe).
    register(
        "m03_resize_pixels",
        m03,
        "WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents "
        "WHERE length(text) > 0), "
        "s AS (SELECT doc_id, CAST(i AS INT) AS px_idx, "
        "CASE WHEN i < n % 16 THEN n // 16 + 1 ELSE n // 16 END AS span_len, "
        "CASE WHEN i < n % 16 THEN i * (n // 16 + 1) "
        "ELSE (n % 16) * (n // 16 + 1) + (i - n % 16) * (n // 16) "
        "END AS span_start, text FROM d, range(16) t(i)), "
        "px AS (SELECT doc_id, px_idx, "
        "CASE WHEN span_len = 0 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(round_even(list_sum(list_transform(string_split("
        "substr(text, span_start + 1, span_len), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / span_len * 1000000.0, 0) "
        "AS BIGINT) END AS m FROM s) "
        "SELECT doc_id AS media_id, "
        "CAST((px_idx // 4 // 2) * 2 + (px_idx % 4) // 2 AS INT) AS px_idx, "
        "CAST(SUM(m) AS BIGINT) AS px_micro_sum, 2 AS width, 2 AS height "
        "FROM px GROUP BY 1, 2",
    )

    # m04: frame sampling (fake byte-stream frames) — one payload row
    # expands to every 4th 16-byte frame; payloads are ASCII text, so
    # the suite form decodes frames back to strings for hashing and the
    # oracle replays them with substr arithmetic.
    def m04(spark, sf_dir):
        media = multimodal.with_binary_payload(_docs(spark, sf_dir))
        frames = multimodal.sample_frames(
            media, stride=4, frame_bytes=16, fake=True
        )
        return frames.select(
            "media_id",
            "frame_idx",
            F.decode("frame", "UTF-8").alias("frame_text"),
        )

    register(
        "m04_sample_frames",
        m04,
        "SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx, "
        "substr(text, CAST(t.i AS INT) * 16 + 1, 16) AS frame_text "
        "FROM (SELECT doc_id, text, "
        "range(0, (length(text) + 15) // 16) AS idxs FROM documents), "
        "UNNEST(idxs) AS t(i) WHERE t.i % 4 = 0",
    )

    def m05(spark, sf_dir):
        # the m02 convention: energy is round(mean, 6), so energy * 1e6
        # sits within 1 ulp of numpy's integer and ROUND recovers it —
        # no float column reaches the driver's canonicalizer
        media = multimodal.with_binary_payload(_docs(spark, sf_dir))
        out = multimodal.decode_audio(media, window_bytes=32, fake=True)
        return out.select(
            "media_id",
            "window_idx",
            "n_samples",
            F.round(F.col("energy") * 1000000.0)
            .cast("long")
            .alias("energy_micro"),
        )

    register(
        "m05_decode_audio_fake",
        m05,
        "WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents "
        "WHERE length(text) > 0), "
        "w AS (SELECT doc_id, text, n, CAST(t.i AS INT) AS window_idx, "
        "CAST(t.i AS INT) * 32 AS wstart, "
        "CASE WHEN n - CAST(t.i AS INT) * 32 >= 32 THEN 32 "
        "ELSE n - CAST(t.i AS INT) * 32 END AS wlen "
        "FROM (SELECT doc_id, text, n, range(0, (n + 31) // 32) AS idxs "
        "FROM d), UNNEST(idxs) AS t(i)) "
        "SELECT doc_id AS media_id, window_idx, CAST(wlen AS INT) AS "
        "n_samples, CAST(round_even(list_sum(list_transform("
        "string_split(substr(text, wstart + 1, wlen), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / wlen * 1000000.0, 0) "
        "AS BIGINT) AS energy_micro FROM w",
    )

    # p04: mixture rebalancing to target source weights, deterministic
    # draw so the oracle replays the exact surviving row set
    def p04(spark, sf_dir):
        return sampling.rebalance_mixture(
            _docs(spark, sf_dir),
            "source",
            {"src0": 0.3, "src1": 0.2, "src2": 0.5},
            key_col="doc_id",
            seed=42,
        )

    register(
        "p04_rebalance_mixture",
        p04,
        "WITH counts AS (SELECT source, COUNT(*) AS n_g FROM documents "
        "WHERE source IN ('src0', 'src1', 'src2') GROUP BY source), "
        "w AS (SELECT source, n_g, CASE source "
        "WHEN 'src0' THEN CAST(0.3 AS DOUBLE) "
        "WHEN 'src1' THEN CAST(0.2 AS DOUBLE) "
        "ELSE CAST(0.5 AS DOUBLE) END AS w_g FROM counts), "
        "s AS (SELECT MIN(n_g / w_g) AS scale FROM w), "
        "fr AS (SELECT source, w_g * scale / n_g AS keep_frac "
        "FROM w CROSS JOIN s) "
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars "
        "FROM documents d JOIN fr USING (source) "
        "WHERE ((doc_id % 1000003 + 42) * 2654435761) % 1000003 "
        "< keep_frac * 1000003",
    )

    # ---------------- clustering (SemDeDup shapes) ----------------
    from . import clustering

    # c01: deterministic Lloyd's k-means over the embedding column;
    # the oracle unrolls both iterations into CTEs with the identical
    # strided init, rounded distances, and cluster-id tiebreaks
    def c01(spark, sf_dir):
        return clustering.kmeans(
            _embs(spark, sf_dir), n_clusters=8, n_iters=2
        )

    register("c01_kmeans_clusters", c01, clustering.kmeans_sql(8, 2))

    # c02: cluster-gated embedding near-dup (the SemDeDup shape) —
    # within-cluster pairs only; the oracle replays the same gating,
    # so the hash proves the gate, and tests measure its recall
    # against d06's exact all-pairs
    def c02(spark, sf_dir):
        return clustering.semantic_neardup_pairs(
            _embs(spark, sf_dir), threshold=0.4, n_clusters=8, n_iters=1
        )

    register(
        "c02_semantic_neardup",
        c02,
        clustering.semantic_neardup_sql(0.4, 8, 1),
    )

    # t10: overlapping token-window chunking (context-window prep)
    def t10(spark, sf_dir):
        from .text import chunk_documents

        return chunk_documents(_docs(spark, sf_dir), 64, 32)

    def _t10_sql():
        from .text import chunk_documents_sql

        return chunk_documents_sql(64, 32)

    register("t10_chunk_documents", t10, _t10_sql())

    # p05: training-shard manifest (deterministic multiplicative-hash
    # shard assignment + per-shard doc/token bookkeeping)
    def p05(spark, sf_dir):
        from .packing import shard_manifest

        return shard_manifest(_docs(spark, sf_dir), 16)

    def _p05_sql():
        from .packing import shard_manifest_sql

        return shard_manifest_sql(16)

    register("p05_shard_manifest", p05, _p05_sql())


def populate_round4_queries(register) -> None:
    """Round-4 operator additions — every entry oracle-backed.

    d11: digest-gated contamination purge (the anti-join counterpart of
    d09's flagging); t11: corpus-level boilerplate n-gram stats; p06:
    per-group quantile quality gate; e01: the batch form of the
    stream-static enrichment join (the streaming form is pytest-
    verified against this exact plan in tests/test_streaming.py)."""

    def d11(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        out = dedup.contamination_purge(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
            k=5,
        )
        return out.select("doc_id", "lang", "source", "n_chars")

    register(
        "d11_contamination_purge",
        d11,
        "SELECT doc_id, lang, source, n_chars FROM ("
        + dedup.contamination_purge_sql(k=5, block_pred="source = 'src0'")
        + ")",
    )

    def t11(spark, sf_dir):
        return text.boilerplate_stats(
            _docs(spark, sf_dir), ngram_n=3, min_docs=5
        )

    register(
        "t11_boilerplate_ngrams",
        t11,
        text.boilerplate_stats_sql(ngram_n=3, min_docs=5),
    )

    def p06(spark, sf_dir):
        from .sampling import quantile_gate

        docs = _docs(spark, sf_dir).select(
            "doc_id", "lang", "n_chars"
        )
        return quantile_gate(
            docs,
            group_col="lang",
            score_col="n_chars",
            keep_frac=0.5,
            tiebreak_col="doc_id",
        )

    register(
        "p06_quantile_gate",
        p06,
        "WITH ranked AS (SELECT doc_id, lang, n_chars, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) AS BIGINT) AS group_rank, "
        "COUNT(*) OVER (PARTITION BY lang) AS cnt FROM documents) "
        "SELECT doc_id, lang, n_chars, group_rank FROM ranked "
        "WHERE group_rank <= CAST(CEIL(cnt * 0.5) AS BIGINT)",
    )

    def e01(spark, sf_dir):
        from ..streaming.event_ops import enrich_events

        ensure_views(spark, sf_dir)
        events = spark.table("events")
        # a strict dim subset so the left join exercises both the
        # enriched and the unmatched-null paths
        dim = (
            spark.table("customer")
            .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select("c_custkey", "c_mktsegment", "c_nationkey")
        )
        out = enrich_events(
            events, dim, events.user_id == dim.c_custkey, "left"
        )
        return out.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )

    register(
        "e01_stream_enrich_batchform",
        e01,
        "SELECT e.event_id, e.user_id, e.event_type, "
        "c.c_mktsegment AS segment, c.c_nationkey AS nationkey "
        "FROM events e LEFT JOIN (SELECT * FROM customer WHERE "
        "c_mktsegment IN ('BUILDING', 'MACHINERY')) c "
        "ON e.user_id = c.c_custkey",
    )

    _D12_SH = (
        "SELECT doc_id, t.sh AS sh FROM ("
        "  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),"
        "    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shl"
        "  FROM (SELECT doc_id, string_split(text,' ') AS ws "
        "        FROM documents WHERE {pred})"
        "), UNNEST(shl) AS t(sh)"
    )

    def d12(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        out = dedup.dedup_against_corpus(
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.filter(F.col("doc_id") % 10 != 0),
            k=3,
            threshold=0.2,
        )
        return out.select("doc_id", "lang", "source", "n_chars")

    register(
        "d12_dedup_against_corpus",
        d12,
        "WITH nsh AS (" + _D12_SH.format(pred="doc_id % 10 = 0") + "), "
        "csh AS (" + _D12_SH.format(pred="doc_id % 10 <> 0") + "), "
        "nsz AS (SELECT doc_id, COUNT(*) AS n_n FROM nsh GROUP BY 1), "
        "csz AS (SELECT doc_id, COUNT(*) AS n_c FROM csh GROUP BY 1), "
        "sh AS (SELECT n.doc_id AS a, c.doc_id AS b, COUNT(*) AS shared "
        "FROM nsh n JOIN csh c ON n.sh = c.sh GROUP BY 1, 2), "
        "fl AS (SELECT DISTINCT a FROM sh "
        "JOIN nsz ON a = nsz.doc_id JOIN csz ON b = csz.doc_id "
        "WHERE shared / (n_n + n_c - shared) >= 0.2) "
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT a FROM fl)",
    )

    def p07(spark, sf_dir):
        from .sampling import train_val_test_split

        docs = _docs(spark, sf_dir).select("doc_id", "lang")
        return train_val_test_split(docs, "doc_id")

    register(
        "p07_train_val_test_split",
        p07,
        # same integer-draw arithmetic as the operator; cuts are
        # int(0.1 * 1000003) = 100000 and 200000
        "SELECT doc_id, lang, CASE WHEN d < 100000 THEN 'test' "
        "WHEN d < 200000 THEN 'val' ELSE 'train' END AS split FROM ("
        "SELECT doc_id, lang, "
        "((doc_id % 1000003 + 42) * 2654435761) % 1000003 AS d "
        "FROM documents)",
    )

    def e02(spark, sf_dir):
        from ..streaming.event_ops import interval_join_events

        ensure_views(spark, sf_dir)
        events = spark.table("events")
        return interval_join_events(events, events, within_minutes=5)

    register(
        "e02_interval_join_batchform",
        e02,
        "SELECT e1.user_id AS user_id, e1.event_id AS l_event_id, "
        "e2.event_id AS r_event_id, epoch_us(e1.ts) AS l_us, "
        "epoch_us(e2.ts) AS r_us "
        "FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id "
        "AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTES",
    )

    def e04(spark, sf_dir):
        """Left-outer interval join batch form: funnel-drop rows
        (events with no follow-up within the window) survive with
        null right columns. Streaming parity pinned in
        tests/test_streaming.py."""
        from ..streaming.event_ops import interval_join_events

        ensure_views(spark, sf_dir)
        events = spark.table("events")
        return interval_join_events(
            events, events, within_minutes=5, how="left_outer"
        )

    register(
        "e04_interval_left_join_batchform",
        e04,
        "SELECT e1.user_id AS user_id, e1.event_id AS l_event_id, "
        "e2.event_id AS r_event_id, epoch_us(e1.ts) AS l_us, "
        "epoch_us(e2.ts) AS r_us "
        "FROM events e1 LEFT JOIN events e2 ON e1.user_id = e2.user_id "
        "AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTES",
    )


def populate_round5_queries(register) -> None:
    """Round-5 additions: the driver-provable MinHash (shrinks the
    rows-only set — the production crc32 kernel stays d03), the
    sharded corpus-scale token budget, and the quantile gate's skew
    fallback. All three oracles replay the exact output."""

    def d13(spark, sf_dir):
        return dedup.minhash_signatures_wordcode(_docs(spark, sf_dir))

    n_hashes = 16
    a, b = dedup._hash_params(n_hashes, 42)
    wc = text.word_code_sql
    mins = ", ".join(
        f"MIN(({int(a[i])}*h + {int(b[i])}) % 2147483647) AS mh_{i}"
        for i in range(n_hashes)
    )
    register(
        "d13_minhash_wordcode",
        d13,
        "WITH "
        + _TRI_CTE
        + ", codes AS ("
        "  SELECT DISTINCT doc_id, "
        f"    ((CAST({wc('w3[1]')} AS BIGINT) * 131 + {wc('w3[2]')}) * 131 "
        f"     + {wc('w3[3]')}) % 2147483647 AS h"
        "  FROM (SELECT doc_id, string_split(sh, ' ') AS w3 FROM tri)) "
        f"SELECT doc_id, {mins} FROM codes GROUP BY doc_id",
    )

    def p08(spark, sf_dir):
        from .sampling import token_budget_sample_sharded

        return token_budget_sample_sharded(
            _docs(spark, sf_dir), "n_chars", 500000, ["n_chars", "doc_id"],
            n_buckets=16,
        )

    # identical output to the global-window greedy prefix, so the
    # oracle is p02's window SQL at the corpus-sized budget
    register(
        "p08_token_budget_sharded",
        p08,
        "SELECT doc_id, text, lang, source, n_chars FROM ("
        "  SELECT *, COALESCE(SUM(n_chars) OVER ("
        "    ORDER BY n_chars DESC, doc_id DESC "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior "
        "  FROM documents"
        ") WHERE prior < 500000",
    )

    def p09(spark, sf_dir):
        from .sampling import quantile_gate

        docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
        return quantile_gate(
            docs, "lang", "n_chars", 0.25, "doc_id", approx=True
        )

    def p10(spark, sf_dir):
        from .sampling import deterministic_shuffle

        return deterministic_shuffle(
            _docs(spark, sf_dir), "doc_id", n_shards=64, seed=42
        )

    # the permutation is a pure function of (key, seed), so the oracle
    # replays the exact (shard, shard_pos) assignment — constants from
    # the operator's own shuffle_draw_params (seed-dependent
    # multiplier; an additive seed would make epochs near-identical)
    from .sampling import shuffle_draw_params

    _sa, _sb = shuffle_draw_params(42)
    register(
        "p10_deterministic_shuffle",
        p10,
        "SELECT doc_id, text, lang, source, n_chars, "
        "CAST(d % 64 AS BIGINT) AS shard, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY d % 64 ORDER BY d, doc_id) "
        "- 1 AS BIGINT) AS shard_pos FROM ("
        f"  SELECT *, (doc_id % 1000003 * {_sa} + {_sb}) % 1000003 AS d "
        "  FROM documents)",
    )

    # the approx path's contract is bit-identical output to the exact
    # rank gate, so the oracle is the exact ranked form
    register(
        "p09_quantile_gate_approx",
        p09,
        "WITH ranked AS (SELECT doc_id, lang, n_chars, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) AS BIGINT) AS group_rank, "
        "COUNT(*) OVER (PARTITION BY lang) AS cnt FROM documents) "
        "SELECT doc_id, lang, n_chars, group_rank FROM ranked "
        "WHERE group_rank <= CAST(CEIL(cnt * 0.25) AS BIGINT)",
    )

    def d14(spark, sf_dir):
        return dedup.duplicated_spans(_docs(spark, sf_dir), k=6)

    # per-step mod mirrors the operator exactly (overflow-safe for
    # arbitrarily long tokens; identical values when nothing overflows)
    wc = text.word_code_sql
    poly6 = f"(CAST({wc('ws[i]')} AS BIGINT) % 2147483647)"
    for j in range(1, 6):
        poly6 = f"(({poly6} * 131 + {wc(f'ws[i+{j}]')}) % 2147483647)"
    register(
        "d14_duplicated_spans",
        d14,
        "WITH toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "posed AS ("
        "  SELECT doc_id, ws, UNNEST(range(1, len(ws) - 4)) AS i "
        "  FROM toks), "
        "grams AS ("
        f"  SELECT doc_id, i AS pos, {poly6} AS code "
        "  FROM posed), "
        "dup AS ("
        "  SELECT code FROM grams GROUP BY code HAVING COUNT(*) >= 2), "
        "marked AS ("
        "  SELECT doc_id, pos FROM grams WHERE code IN "
        "    (SELECT code FROM dup)), "
        "isl AS ("
        "  SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER ("
        "    PARTITION BY doc_id ORDER BY pos) <= 6 THEN 0 ELSE 1 END "
        "    AS brk FROM marked), "
        "isl2 AS ("
        "  SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id "
        "    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM isl) "
        "SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 5 AS span_end, "
        "COUNT(*) AS n_dup_grams FROM isl2 GROUP BY doc_id, island",
    )

    def s03(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        out = similarity.ivf_ann(embs, embs.filter(F.col("vec_id") < 20), k=5)
        return out.withColumn("rank", F.col("rank").cast("long"))

    # The oracle replays the whole IVF pipeline: strided centroid pick
    # off MAX(vec_id), nearest-cell assignment (cell-id tiebreak),
    # nprobe=2 query probes, scoring rounded to 6, rank ties broken by
    # neighbor_id. Every cosine is over 1/32768-quantized embeddings:
    # dots and squared norms are exact integer sums (order-free), the
    # cosine three correctly-rounded IEEE ops — bit-identical across
    # engines, unlike raw float cosines whose summation-order drift
    # flipped a round-6 boundary at sf0.001.
    _QV = (
        "list_transform(CAST({e} AS DOUBLE[]), x -> ROUND(x * 32768, 0))"
    )
    _QCOS = (
        "(list_inner_product({a}, {b}) / "
        "(SQRT(list_inner_product({a}, {a})) * "
        "SQRT(list_inner_product({b}, {b}))))"
    )
    register(
        "s03_ivf_ann_topk",
        s03,
        "WITH params AS ("
        "  SELECT GREATEST(1, (MAX(vec_id) + 1) // 16) AS stride "
        "  FROM embeddings), "
        "cents AS ("
        "  SELECT CAST(vec_id // stride AS INT) AS cell, "
        f"  {_QV.format(e='embedding')} AS centroid "
        "  FROM embeddings, params "
        "  WHERE vec_id % stride = 0 AND vec_id // stride < 16), "
        "cassign AS ("
        "  SELECT vec_id AS neighbor_id, cv AS nv, cell FROM ("
        f"    SELECT e.vec_id, {_QV.format(e='e.embedding')} AS cv, "
        "    c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
        f"    {_QCOS.format(a=_QV.format(e='e.embedding'), b='c.centroid')} "
        "    DESC, c.cell) AS rk "
        "    FROM embeddings e CROSS JOIN cents c"
        "  ) WHERE rk = 1), "
        "qassign AS ("
        "  SELECT vec_id AS query_id, qv, cell FROM ("
        f"    SELECT e.vec_id, {_QV.format(e='e.embedding')} AS qv, "
        "    c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
        f"    {_QCOS.format(a=_QV.format(e='e.embedding'), b='c.centroid')} "
        "    DESC, c.cell) AS rk "
        "    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 20"
        "  ) WHERE rk <= 2), "
        "s AS ("
        "  SELECT DISTINCT q.query_id, a.neighbor_id, "
        f"  ROUND({_QCOS.format(a='q.qv', b='a.nv')}, 6) AS cosine "
        "  FROM qassign q JOIN cassign a USING (cell) "
        "  WHERE q.query_id <> a.neighbor_id), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM s) "
        "SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) "
        "AS rank FROM r WHERE rank <= 5",
    )

    # x01: the end-to-end pretraining pipeline (d02 dedup -> t03
    # quality gate -> t08 redaction -> p07 split) as ONE plan and ONE
    # oracle row. A constant PII suffix is planted on every doc (no
    # per-doc id, so duplicate texts stay duplicates and the dedup
    # stage still fires) and the redaction stage must scrub it.
    def x01(spark, sf_dir):
        from .pipelines import pretraining_pipeline

        docs = _docs(spark, sf_dir).withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(
                    " contact admin@example.com or 10.0.0.1 tel"
                    " 555-123-4567"
                ),
            ),
        )
        return pretraining_pipeline(docs)

    _XEM, _XIP, _XPH = (
        text.PII_PATTERNS["email"],
        text.PII_PATTERNS["ip"],
        text.PII_PATTERNS["phone"],
    )
    register(
        "x01_pretraining_pipeline",
        x01,
        "WITH d AS (SELECT doc_id, text || "
        "' contact admin@example.com or 10.0.0.1 tel 555-123-4567' "
        "AS text, lang, source FROM documents), "
        "normed AS (SELECT *, "
        "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS nrm "
        "FROM d), "
        "kept AS (SELECT doc_id, text, lang, source FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY nrm "
        "  ORDER BY doc_id) AS rn FROM normed) WHERE rn = 1), "
        "m AS (SELECT doc_id, text, lang, source, "
        "  CAST(len(ws) AS INTEGER) AS n_words, "
        "  len(list_distinct(ws)) AS nd, "
        "  (LENGTH(text) - (len(ws) - 1)) / (len(ws) * 1.0) AS aw "
        "  FROM (SELECT *, string_split(text, ' ') AS ws FROM kept)), "
        "q AS (SELECT *, ROUND("
        "  0.4 * (CASE WHEN n_words >= 10 AND n_words <= 1000 "
        "  THEN 1.0 ELSE 0.3 END) "
        "  + 0.3 * (CASE WHEN aw >= 2.0 AND aw <= 12.0 "
        "  THEN 1.0 ELSE 0.4 END) "
        "  + 0.3 * (nd / (n_words * 1.0)), 6) AS quality FROM m), "
        "g AS (SELECT * FROM q WHERE quality >= 0.5) "
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(regexp_replace(text, '{_XEM}', "
        f"'<EMAIL>', 'g'), '{_XIP}', '<IP>', 'g'), '{_XPH}', "
        "'<PHONE>', 'g') AS clean_text, "
        "lang, source, n_words, quality, "
        "CASE WHEN dd < 100000 THEN 'test' WHEN dd < 200000 THEN 'val' "
        "ELSE 'train' END AS split FROM ("
        "SELECT *, ((doc_id % 1000003 + 42) * 2654435761) % 1000003 "
        "AS dd FROM g)",
    )

    # w05: the pipeline's output written as a Hive-style partitioned
    # zarr layout (one store per split) and federated back — pipeline,
    # writer, and multi-store reader verified as one flow. On the
    # clean corpus the redaction stage is a no-op, so the oracle is
    # x01's chain minus the planted suffix.
    def w05(spark, sf_dir):
        from ..io import read_zarr_partitioned, write_zarr_partitioned
        from .pipelines import pretraining_pipeline

        out = pretraining_pipeline(_docs(spark, sf_dir))
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w05_{token}"
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_zarr_partitioned(
            out, path, "split", chunk_rows=4096, mode="overwrite"
        )
        return read_zarr_partitioned(spark, path)

    register(
        "w05_partitioned_writer_roundtrip",
        w05,
        "WITH normed AS (SELECT *, "
        "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS nrm "
        "FROM documents), "
        "kept AS (SELECT doc_id, text, lang, source FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY nrm "
        "  ORDER BY doc_id) AS rn FROM normed) WHERE rn = 1), "
        "m AS (SELECT doc_id, text, lang, source, "
        "  CAST(len(ws) AS INTEGER) AS n_words, "
        "  len(list_distinct(ws)) AS nd, "
        "  (LENGTH(text) - (len(ws) - 1)) / (len(ws) * 1.0) AS aw "
        "  FROM (SELECT *, string_split(text, ' ') AS ws FROM kept)), "
        "q AS (SELECT *, ROUND("
        "  0.4 * (CASE WHEN n_words >= 10 AND n_words <= 1000 "
        "  THEN 1.0 ELSE 0.3 END) "
        "  + 0.3 * (CASE WHEN aw >= 2.0 AND aw <= 12.0 "
        "  THEN 1.0 ELSE 0.4 END) "
        "  + 0.3 * (nd / (n_words * 1.0)), 6) AS quality FROM m), "
        "g AS (SELECT * FROM q WHERE quality >= 0.5) "
        "SELECT doc_id, text AS clean_text, lang, source, n_words, "
        "quality, "
        "CASE WHEN dd < 100000 THEN 'test' WHEN dd < 200000 THEN 'val' "
        "ELSE 'train' END AS split FROM ("
        "SELECT *, ((doc_id % 1000003 + 42) * 2654435761) % 1000003 "
        "AS dd FROM g)",
    )

    def d15(spark, sf_dir):
        return dedup.simhash_wordcode(_docs(spark, sf_dir))

    n_bits = 16
    sa, sb = dedup._hash_params(n_bits, 42)
    wc_sql = text.word_code_sql("w")
    votes = ", ".join(
        f"SUM(CASE WHEN (CAST({wc_sql} AS BIGINT) * {int(sa[j])} "
        f"+ {int(sb[j])}) % 2147483647 >= 1073741824 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(n_bits)
    )
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    register(
        "d15_simhash_wordcode",
        d15,
        "WITH wx AS ("
        "  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w "
        "  FROM documents), "
        f"v AS (SELECT doc_id, {votes} FROM wx GROUP BY doc_id) "
        f"SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM v",
    )

    def t12(spark, sf_dir):
        return text.unigram_logprob(_docs(spark, sf_dir))

    def j05(spark, sf_dir):
        """Co-located join: both sides persisted hash-bucketed on the
        join key (the pay-the-shuffle-once-at-ingest layout), then
        joined with ZERO exchanges — plan-contract-pinned in
        tests/test_plan_contracts.py. The aggregate keeps the output
        deterministic for the oracle."""
        import tempfile

        from .joins import bucketed_equi_join, write_bucketed

        ensure_views(spark, sf_dir)
        # dots would break the catalog TABLE name (unlike w02's path)
        token = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        base = tempfile.gettempdir() + f"/azs_j05_{token}"
        write_bucketed(
            spark.table("orders"), f"j05_orders_{token}", "o_custkey",
            16, path=f"{base}/orders",
        )
        write_bucketed(
            spark.table("customer"), f"j05_customer_{token}", "c_custkey",
            16, path=f"{base}/customer",
        )
        joined = bucketed_equi_join(
            spark, f"j05_orders_{token}", f"j05_customer_{token}",
            "o_custkey", "c_custkey",
        )
        return joined.groupBy("c_custkey", "c_mktsegment").agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
        )

    register(
        "j05_bucketed_join",
        j05,
        "SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders, "
        "ROUND(SUM(o_totalprice), 4) AS total_spend "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_custkey, c_mktsegment",
    )

    def t13(spark, sf_dir):
        return text.corpus_vocab_stats(_docs(spark, sf_dir))

    register(
        "t13_corpus_vocab_stats",
        t13,
        "WITH wx AS ("
        "  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents), "
        "c AS (SELECT w, COUNT(*) AS cnt FROM wx GROUP BY w), "
        "top AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top_sum FROM ("
        "  SELECT cnt FROM c ORDER BY cnt DESC LIMIT 100)), "
        "agg AS (SELECT COUNT(*) AS vocab_size, "
        "  CAST(SUM(cnt) AS BIGINT) AS total_tokens, "
        "  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_hapax FROM c) "
        "SELECT vocab_size, total_tokens, n_hapax, "
        "ROUND(CAST(top_sum AS DOUBLE) / total_tokens, 6) AS top_coverage "
        "FROM agg CROSS JOIN top",
    )

    register(
        "t12_unigram_logprob",
        t12,
        "WITH wx AS ("
        "  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w "
        "  FROM documents), "
        "cnts AS (SELECT w, COUNT(*) AS cnt FROM wx GROUP BY w), "
        "tot AS (SELECT SUM(cnt) AS total FROM cnts) "
        "SELECT doc_id, COUNT(*) AS n_words, "
        "ROUND(AVG(LN(CAST(cnt AS DOUBLE) / total)), 6) AS avg_logprob, "
        "MIN(cnt) AS min_count "
        "FROM wx JOIN cnts USING (w) CROSS JOIN tot GROUP BY doc_id",
    )


def populate_rotated_out(register) -> None:
    """d01/d02: rotated OUT of the r3 window (green r1+r2), rotated
    back IN for round 4 — their last driver rows are two rounds old,
    the oldest of any oracle-backed operator query."""

    def d01(spark, sf_dir):
        return dedup.exact_dedup(_docs(spark, sf_dir))

    register(
        "d01_exact_dedup",
        d01,
        "SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY text",
    )

    def d02(spark, sf_dir):
        return dedup.normalized_dedup(_docs(spark, sf_dir))

    register(
        "d02_normalized_dedup",
        d02,
        "SELECT TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS "
        "norm_text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY 1",
    )


def populate_round5_late2_queries(register) -> None:
    """Round-5 session-3 additions: the fuzzy-dedup pipeline as one
    flow (x02) and quality-weighted Bernoulli sampling (p11)."""

    # x02: the production fuzzy-dedup flow — MinHash-LSH candidates →
    # exact Jaccard verify → connected components → best-quality
    # canonical per group → deduplicated corpus — as ONE composition.
    # The oracle generates candidates by exact all-pairs SQL, so a
    # green hash also proves the LSH stage's recall is 1.0 at the 0.7
    # threshold on this corpus (every planted near-dup pair sits at
    # j >= 0.889; escape probability per pair <= (1-0.889^4)^16
    # ~= 1.5e-7 with the production 64-hash/16-band parameters).
    def x02(spark, sf_dir):
        from .pipelines import fuzzy_dedup_pipeline

        return fuzzy_dedup_pipeline(_docs(spark, sf_dir))

    register(
        "x02_fuzzy_dedup_pipeline",
        x02,
        "WITH RECURSIVE "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2), "
        "pairs AS (SELECT id_a, id_b FROM ("
        "  SELECT id_a, id_b, "
        "  ROUND(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS j"
        "  FROM shared JOIN sizes sa ON sa.doc_id = shared.id_a"
        "  JOIN sizes sb ON sb.doc_id = shared.id_b) WHERE j >= 0.7), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach AS ("
        "  SELECT doc_id AS id, doc_id AS label FROM documents "
        "  UNION "
        "  SELECT e.dst AS id, r.label FROM reach r "
        "  JOIN edges e ON e.src = r.id), "
        "comp AS (SELECT id AS doc_id, MIN(label) AS component "
        "FROM reach GROUP BY id), "
        "qual AS (SELECT doc_id, "
        "ROUND(0.4 * len_ok + 0.3 * wordlen_ok + 0.3 * diversity, 6) AS "
        "quality FROM ("
        "SELECT doc_id, "
        "n_distinct_words / (n_words * 1.0) AS diversity, "
        "CASE WHEN n_words >= 10 AND n_words <= 1000 THEN 1.0 ELSE 0.3 END "
        "AS len_ok, "
        "CASE WHEN avg_word_len >= 2.0 AND avg_word_len <= 12.0 THEN 1.0 "
        "ELSE 0.4 END AS wordlen_ok FROM ("
        "SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words, "
        "CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words, "
        "(LENGTH(text) - (len(ws) - 1)) / (len(ws) * 1.0) AS avg_word_len "
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS ws "
        "FROM documents)))), "
        "canon AS (SELECT doc_id AS keep_id, n_members FROM ("
        "SELECT c.doc_id, "
        "ROW_NUMBER() OVER (PARTITION BY c.component "
        "ORDER BY q.quality DESC, c.doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY c.component) AS n_members "
        "FROM comp c JOIN qual q ON c.doc_id = q.doc_id) WHERE rn = 1) "
        "SELECT d.doc_id, d.lang, d.source, d.n_chars, n_members "
        "FROM documents d JOIN canon ON d.doc_id = canon.keep_id",
    )

    # p11: quality-weighted Bernoulli sample — keep probability is a
    # COLUMN (here length-proportional, n_chars/600 clamped to [0,1]);
    # the engine-independent integer draw makes the exact row set
    # SQL-replayable.
    def p11(spark, sf_dir):
        from .sampling import weighted_sample

        docs = _docs(spark, sf_dir)
        return weighted_sample(
            docs, F.col("n_chars") / F.lit(600.0), "doc_id", seed=42
        )

    register(
        "p11_weighted_sample",
        p11,
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "WHERE ((doc_id % 1000003 + 42) * 2654435761) % 1000003 "
        "< LEAST(GREATEST(CAST(n_chars / 600.0 AS DOUBLE), 0.0), 1.0) "
        "* 1000003",
    )

    # p12: temperature-smoothed mixture sampling (alpha = 0.5, the
    # mBERT/XLM-R recipe) — integer-exact: sqrt weights floor to
    # integers, membership is one BIGINT product comparison, so the
    # oracle replays the exact row set with no float division
    def p12(spark, sf_dir):
        from .sampling import temperature_mixture

        return temperature_mixture(
            _docs(spark, sf_dir), "source", "doc_id", budget=200
        )

    register(
        "p12_temperature_mixture",
        p12,
        "WITH counts AS (SELECT source, COUNT(*) AS n, "
        "CAST(FLOOR(SQRT(CAST(COUNT(*) * 10000 AS DOUBLE))) AS BIGINT) "
        "AS w FROM documents GROUP BY source), "
        "tot AS (SELECT SUM(w) AS s FROM counts) "
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars "
        "FROM documents d JOIN counts c ON d.source = c.source, tot "
        "WHERE ((d.doc_id % 1000003 + 42) * 2654435761) % 1000003 "
        "* tot.s * c.n < 200 * c.w * 1000003",
    )


def populate_deferred_queries(register) -> None:
    """EMPTY since r12: the rows-only set is r26 alone (approximate
    aggregates — engine-specific by nature, correctly rows-only
    forever; it registers with the relational tail). The function
    stays as the ledger of the graduations: s03 (r5 — the IVF
    pipeline was deterministic all along), t05/x08 (r11 — recursive-
    CTE packer replay / exact-graph argument,
    populate_round11_queries), and finally d03/d05 (r12 — the crc32
    replay, populate_round12_queries: DuckDB reproduces zlib.crc32
    via a 256-entry byte-table list_reduce, so the production
    signatures themselves are oracle-checkable bit-for-bit)."""


def populate_round6_queries(register) -> None:
    """Round-6 operator additions, every entry oracle-backed.

    d16: segment-level corpus dedup WITH document rewrite (the
    RefinedWeb/Dolma line-dedup cleaning stage — t11 measures
    boilerplate, this removes it); s04: product-quantization ANN
    (ADC scoring over deterministic codebooks, the memory-bounded
    100-TB similarity path, exact-integer arithmetic so the oracle
    replays the ranking bit-for-bit); x03: the incremental
    crawl-snapshot curation pipeline (d02 -> d12 -> d11 -> p06
    composed as one plan, one chained oracle)."""

    def d16(spark, sf_dir):
        # seg_words mode: the synthetic corpus is newline-free, so
        # segments are 6-word windows; min_docs=3 keeps the removal
        # path busy at every SF
        return dedup.remove_frequent_segments(
            _docs(spark, sf_dir), min_docs=3, seg_words=6
        )

    register(
        "d16_remove_frequent_segments",
        d16,
        dedup.remove_frequent_segments_sql(min_docs=3, seg_words=6),
    )

    def s04(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        # m=16/ksub=64 measured best on the 64-dim synthetic
        # vectors (recall@5 0.58 vs exact on random data, PQ's worst
        # case; structured embeddings do far better)
        return similarity.pq_ann(
            embs, embs.filter(F.col("vec_id") < 20), k=5, m=16, ksub=64
        )

    # The oracle replays the whole PQ pipeline: strided codebook pick
    # off MAX(vec_id) (the ksub rows' sub-vector slices ARE the m
    # codebooks), argmin-L2 encoding with code-id tiebreak, ADC dot
    # via the encoded codes, cosine against the reconstruction norm.
    # Every quantity is an exact integer sum over 1/32768-quantized
    # embeddings (s03's convention), the cosine three correctly-
    # rounded IEEE ops, and BOTH engines rank by the raw cosine —
    # bit-identical, with ROUND(6) applied only to the output column.
    _S04_QV = (
        "list_transform(CAST({e} AS DOUBLE[]), x -> ROUND(x * 32768, 0))"
    )
    _m, _ksub, _dsub, _k = 16, 64, 4, 5
    register(
        "s04_pq_ann_topk",
        s04,
        f"WITH params AS (SELECT GREATEST(1, (MAX(vec_id)+1)//{_ksub}) "
        "AS stride FROM embeddings), "
        "cb AS (SELECT CAST(vec_id // stride AS INT) AS code, "
        f"{_S04_QV.format(e='embedding')} AS v "
        "FROM embeddings, params "
        f"WHERE vec_id % stride = 0 AND vec_id // stride < {_ksub}), "
        f"js AS (SELECT unnest(range(0, {_m})) AS j), "
        f"sub AS (SELECT code, j, list_slice(v, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS sv FROM cb, js), "
        f"corp AS (SELECT vec_id, {_S04_QV.format(e='embedding')} AS v "
        "FROM embeddings), "
        f"csub AS (SELECT vec_id, j, list_slice(v, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS cv FROM corp, js), "
        "dist AS (SELECT c.vec_id, c.j, s.code, "
        "list_inner_product(c.cv, c.cv) - 2*list_inner_product(c.cv, s.sv) "
        "+ list_inner_product(s.sv, s.sv) AS d2 "
        "FROM csub c JOIN sub s ON c.j = s.j), "
        "enc AS (SELECT vec_id, j, code FROM ("
        "SELECT vec_id, j, code, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id, j ORDER BY d2, code) AS rk FROM dist) "
        "WHERE rk = 1), "
        "recon AS (SELECT e.vec_id, "
        "SUM(list_inner_product(s.sv, s.sv)) AS nr_sq "
        "FROM enc e JOIN sub s ON e.j = s.j AND e.code = s.code "
        "GROUP BY e.vec_id), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM corp "
        "WHERE vec_id < 20), "
        "qn AS (SELECT query_id, list_inner_product(qv, qv) AS nq_sq "
        "FROM q), "
        f"qsub AS (SELECT query_id, j, list_slice(qv, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS qj FROM q, js), "
        "pdot AS (SELECT qs.query_id, e.vec_id AS neighbor_id, "
        "SUM(list_inner_product(qs.qj, s.sv)) AS dot "
        "FROM qsub qs JOIN enc e ON qs.j = e.j "
        "JOIN sub s ON s.j = e.j AND s.code = e.code "
        "GROUP BY qs.query_id, e.vec_id), "
        "scored AS (SELECT p.query_id, p.neighbor_id, "
        "p.dot / (SQRT(CASE WHEN qn.nq_sq > 0 THEN qn.nq_sq ELSE 1 END) * SQRT(CASE WHEN r.nr_sq > 0 THEN r.nr_sq ELSE 1 END)) AS cos "
        "FROM pdot p JOIN qn USING (query_id) "
        "JOIN recon r ON p.neighbor_id = r.vec_id "
        "WHERE p.query_id <> p.neighbor_id) "
        "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank "
        f"FROM scored) WHERE rank <= {_k}",
    )

    # x03: the incremental snapshot-curation pipeline. The batch is
    # the doc_id % 10 == 0 slice, the corpus the rest, the blocklist
    # src0 (the d11/d12 conventions), so every stage has real work at
    # every SF. The oracle chains the stages' existing SQL forms.
    def x03(spark, sf_dir):
        from .pipelines import snapshot_curation_pipeline

        docs = _docs(spark, sf_dir)
        notblock = F.col("source") != "src0"
        return snapshot_curation_pipeline(
            docs.filter((F.col("doc_id") % 10 == 0) & notblock),
            docs.filter((F.col("doc_id") % 10 != 0) & notblock),
            docs.filter(F.col("source") == "src0"),
        )

    _X3_SH = (
        "SELECT doc_id, t.sh AS sh FROM ("
        "  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),"
        "    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shl"
        "  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM {src})"
        "), UNNEST(shl) AS t(sh)"
    )
    _X3_5G = (
        "SELECT doc_id, t.ng AS ng FROM ("
        "  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-3),"
        "    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || "
        "    ws[i+3] || ' ' || ws[i+4])) AS ngl"
        "  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM {src})"
        "), UNNEST(ngl) AS t(ng)"
    )
    register(
        "x03_snapshot_curation_pipeline",
        x03,
        "WITH b AS (SELECT * FROM documents "
        "WHERE doc_id % 10 = 0 AND source <> 'src0'), "
        "s1 AS (SELECT doc_id, text, lang, source, n_chars FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY "
        "  TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) "
        "  ORDER BY doc_id) AS rn FROM b) WHERE rn = 1), "
        "nsh AS (" + _X3_SH.format(src="s1") + "), "
        "csh AS (" + _X3_SH.format(
            src="(SELECT doc_id, text FROM documents "
            "WHERE doc_id % 10 <> 0 AND source <> 'src0')"
        ) + "), "
        "nsz AS (SELECT doc_id, COUNT(*) AS n_n FROM nsh GROUP BY 1), "
        "csz AS (SELECT doc_id, COUNT(*) AS n_c FROM csh GROUP BY 1), "
        "sh AS (SELECT n.doc_id AS a, c.doc_id AS b2, COUNT(*) AS shared "
        "FROM nsh n JOIN csh c ON n.sh = c.sh GROUP BY 1, 2), "
        "fl AS (SELECT DISTINCT a FROM sh "
        "JOIN nsz ON a = nsz.doc_id JOIN csz ON b2 = csz.doc_id "
        "WHERE shared / (n_n + n_c - shared) >= 0.2), "
        "s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT a FROM fl)), "
        "ng AS (" + _X3_5G.format(src="s2") + "), "
        "bl AS (SELECT DISTINCT ng FROM (" + _X3_5G.format(
            src="(SELECT doc_id, text FROM documents "
            "WHERE source = 'src0')"
        ) + ")), "
        "bad AS (SELECT DISTINCT doc_id FROM ng "
        "WHERE ng IN (SELECT ng FROM bl)), "
        "s3 AS (SELECT * FROM s2 "
        "WHERE doc_id NOT IN (SELECT doc_id FROM bad)), "
        "ranked AS (SELECT doc_id, lang, source, n_chars, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) AS BIGINT) AS group_rank, "
        "COUNT(*) OVER (PARTITION BY lang) AS cnt FROM s3) "
        "SELECT doc_id, lang, source, n_chars, group_rank FROM ranked "
        "WHERE group_rank <= CAST(CEIL(cnt * 0.5) AS BIGINT)",
    )


def populate_round6_writer_queries(register) -> None:
    """w08: the distributed writer's Zarr v2 output round-tripped
    through the scan — metadata (.zarray/.zattrs/.zmetadata), v2
    chunk keys, numcodecs compressor docs, and values all verified
    against the plain-parquet oracle."""

    def w08(spark, sf_dir):
        from ..io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w08_{token}"
        src = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_zarr(
            src, path, chunk_rows=4096, zarr_format=2, mode="overwrite"
        )
        return spark.read.format("zarr").load(path)

    register(
        "w08_v2_writer_roundtrip",
        w08,
        "SELECT o_orderkey, o_totalprice FROM orders",
    )


def populate_round6_sampling_queries(register) -> None:
    """p13: deterministic multi-epoch replication (upsampling by an
    expected-copies COLUMN, fractional part resolved by the shared
    integer draw) — the DCLM/Llama 'good data repeats' recipe in an
    oracle-replayable form."""

    def p13(spark, sf_dir):
        from .sampling import replicate_by_weight

        docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
        return replicate_by_weight(
            docs,
            weight=F.col("n_chars") / F.lit(400.0),
            key_col="doc_id",
            max_copies=3,
        )

    register(
        "p13_quality_replication",
        p13,
        "SELECT doc_id, lang, n_chars, n_copies, "
        "CAST(t.ci AS BIGINT) AS copy_idx FROM ("
        "  SELECT doc_id, lang, n_chars, CAST(LEAST(FLOOR(w) + "
        "  CASE WHEN d < (w - FLOOR(w)) * 1000003 THEN 1 ELSE 0 END, 3) "
        "  AS BIGINT) AS n_copies FROM ("
        "    SELECT doc_id, lang, n_chars, "
        "    LEAST(GREATEST(CAST(n_chars / 400.0 AS DOUBLE), 0.0), 3.0) "
        "    AS w, "
        "    ((doc_id % 1000003 + 42) * 2654435761) % 1000003 AS d "
        "    FROM documents)"
        "), UNNEST(range(1, n_copies + 1)) AS t(ci)",
    )


def populate_round6_grid_queries(register) -> None:
    """w09: grid append round-trip — an N-D store written, extended
    along its time axis (xarray ``append_dim`` semantics: boundary
    chunk merged, metadata republished last), and scanned back; the
    oracle rebuilds the full hypercube from range() arithmetic."""

    def w09(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w09_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def gdf(t0, t1):
            return (
                spark.range(t0, t1)
                .selectExpr("id as t")
                .crossJoin(spark.range(0, 6).selectExpr("id as x"))
                .select(
                    "t",
                    "x",
                    (F.col("t") * 1000 + F.col("x") * 7)
                    .cast("double")
                    .alias("v"),
                )
            )

        write_zarr_grid(
            gdf(0, 10), path, dims=["t", "x"], chunk_shape=(4, 3),
            mode="overwrite",
        )
        # unaligned append: t-axis 10 % 4 != 0, so the boundary chunk
        # merges old and new slices
        write_zarr_grid(
            gdf(10, 17), path, dims=["t", "x"], chunk_shape=(4, 3),
            mode="append", append_dim="t",
        )
        return spark.read.format("zarr").load(path)

    register(
        "w09_grid_append_roundtrip",
        w09,
        "SELECT r1.range AS t, r2.range AS x, "
        "CAST(r1.range * 1000 + r2.range * 7 AS DOUBLE) AS v "
        "FROM range(0, 17) r1, range(0, 6) r2",
    )


def j06_overlap_frame(events):
    """The j06 click/view 2-hour interval-overlap construction — ONE
    definition shared by the suite entry, the bench entry, and the
    plan contract (they must not drift). Exact microseconds (the e02
    convention: seconds-level unix_timestamp truncates where DuckDB's
    epoch() cast rounds) over the session-zone-invariant NTZ
    normalization (unix_micros rejects TIMESTAMP_NTZ)."""
    from ..streaming.event_ops import _as_utc_event_time
    from .joins import interval_overlap_join

    ev = _as_utc_event_time(events)

    def side(tag, etype):
        s = F.unix_micros("ts")
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{tag}_event_id"),
            F.col("user_id").alias("user_id"),
            s.alias(f"{tag}_s"),
            (s + F.lit(7200 * 1_000_000)).alias(f"{tag}_e"),
        )

    return interval_overlap_join(
        side("l", "click"),
        side("r", "view"),
        "l_s", "l_e", "r_s", "r_e",
        band=4096.0 * 1_000_000,
        key="user_id",
    )


def populate_round6_late_queries(register) -> None:
    """Late round-6 additions: j06 interval-overlap join (the
    genomics/session-window join as a banded hash join with a
    no-distinct first-bucket dedup) and z21 metadata row count (the
    COUNT(*) fast path: describe_zarr answers from planning metadata
    alone, and the driver row proves it equals the data)."""

    def j06(spark, sf_dir):
        ensure_views(spark, sf_dir)
        out = j06_overlap_frame(spark.table("events"))
        return out.select(
            "user_id", "l_event_id", "r_event_id",
            F.greatest("l_s", "r_s").alias("ov_start"),
            F.least("l_e", "r_e").alias("ov_end"),
        )

    register(
        "j06_interval_overlap_join",
        j06,
        "WITH l AS (SELECT event_id AS l_event_id, user_id, "
        "epoch_us(ts) AS l_s, epoch_us(ts) + 7200000000 AS l_e "
        "FROM events WHERE event_type = 'click'), "
        "r AS (SELECT event_id AS r_event_id, user_id, "
        "epoch_us(ts) AS r_s, epoch_us(ts) + 7200000000 AS r_e "
        "FROM events WHERE event_type = 'view') "
        "SELECT l.user_id, l_event_id, r_event_id, "
        "GREATEST(l_s, r_s) AS ov_start, LEAST(l_e, r_e) AS ov_end "
        "FROM l JOIN r ON l.user_id = r.user_id "
        "AND l_e >= r_s AND r_e >= l_s",
    )

    def z21(spark, sf_dir):
        import shutil

        from ..io import describe_zarr, write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z21_{token}"
        shutil.rmtree(path, ignore_errors=True)
        src = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_zarr(src, path, chunk_rows=4096, mode="overwrite")
        info = describe_zarr(path)
        # one row, built from METADATA only (no chunk reads)
        return spark.createDataFrame(
            [
                (
                    int(info["n_rows"]),
                    len(info["columns"]),
                    int(info["zarr_format"]),
                )
            ],
            "n_rows long, n_cols int, zfmt int",
        )

    register(
        "z21_metadata_count",
        z21,
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(2 AS INTEGER) AS n_cols, CAST(3 AS INTEGER) AS zfmt "
        "FROM orders",
    )


def populate_round6_region_queries(register) -> None:
    """w10: grid REGION write round-trip — completes the grid writer's
    xarray to_zarr surface (write / append_dim / region): a live
    store's interior points update in place, untouched points and
    columns stay byte-identical, and the oracle rebuilds the expected
    hypercube with a CASE over the updated region."""

    def w10(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid, write_zarr_region

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w10_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def gdf(t0, t1):
            return (
                spark.range(t0, t1)
                .selectExpr("id as t")
                .crossJoin(spark.range(0, 6).selectExpr("id as x"))
                .select(
                    "t",
                    "x",
                    (F.col("t") * 1000 + F.col("x") * 7)
                    .cast("double")
                    .alias("v"),
                )
            )

        write_zarr_grid(
            gdf(0, 12), path, dims=["t", "x"], chunk_shape=(4, 3),
            mode="overwrite",
        )
        upd = (
            gdf(3, 5)
            .filter(F.col("x") % 2 == 0)
            .select("t", "x", (-F.col("v")).alias("v"))
        )
        write_zarr_region(upd, path, dims=["t", "x"])
        return spark.read.format("zarr").load(path)

    register(
        "w10_grid_region_roundtrip",
        w10,
        "SELECT t, x, CASE WHEN t IN (3, 4) AND x % 2 = 0 "
        "THEN -CAST(t * 1000 + x * 7 AS DOUBLE) "
        "ELSE CAST(t * 1000 + x * 7 AS DOUBLE) END AS v "
        "FROM (SELECT r1.range AS t, r2.range AS x "
        "FROM range(0, 12) r1, range(0, 6) r2)",
    )


def populate_round6_bloom_queries(register) -> None:
    """d17: Bloom-gated batch-vs-corpus membership dedup — the exact
    complement of d12's fuzzy Jaccard, keyed here on an 8-word prefix
    fingerprint (the canonical-key role a URL or content digest plays
    in a crawl pipeline; the synthetic corpus has real cross-partition
    prefix collisions at every SF). The Bloom filter is built in Spark
    (per-partition bitmaps ORed on the driver, fixed size regardless
    of corpus cardinality) and only gates the verify, so the result is
    exact and the oracle replays it as a NOT EXISTS anti-join."""

    def d17(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        key = F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, 8)
        )
        out = dedup.bloom_gated_dedup(
            docs.filter(F.col("doc_id") % 7 == 0),
            docs.filter(F.col("doc_id") % 7 != 0),
            key=key,
        )
        return out.select("doc_id", "lang", "source", "n_chars")

    register(
        "d17_bloom_gated_dedup",
        d17,
        "SELECT doc_id, lang, source, n_chars FROM documents b "
        "WHERE doc_id % 7 = 0 AND NOT EXISTS ("
        "SELECT 1 FROM documents c WHERE c.doc_id % 7 <> 0 AND "
        "array_to_string((string_split(c.text, ' '))[1:8], ' ') = "
        "array_to_string((string_split(b.text, ' '))[1:8], ' '))",
    )


def populate_round6_alter_queries(register) -> None:
    """w11: grid ALTER round-trip — add_zarr_arrays attaches a new
    column over a SUBSET of grid points (absent cells must read as the
    fill), drop_zarr_array removes the original data column, and the
    scan of the final store proves both verbs: schema = dims + the new
    column only, values = provided region + fill elsewhere."""

    def w11(spark, sf_dir):
        import shutil

        from ..io import add_zarr_arrays, drop_zarr_array, write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w11_{token}"
        shutil.rmtree(path, ignore_errors=True)

        base = (
            spark.range(0, 12)
            .selectExpr("id as t")
            .crossJoin(spark.range(0, 6).selectExpr("id as x"))
        )
        write_zarr_grid(
            base.select(
                "t", "x",
                (F.col("t") * 1000 + F.col("x") * 7)
                .cast("double")
                .alias("v"),
            ),
            path, dims=["t", "x"], chunk_shape=(4, 3), mode="overwrite",
        )
        add_zarr_arrays(
            base.filter(F.col("t") < 5).select(
                "t", "x", (F.col("t") * 10 + F.col("x")).alias("q")
            ),
            path, dims=["t", "x"], fill_value=-1,
        )
        drop_zarr_array(path, "v")
        return spark.read.format("zarr").load(path)

    register(
        "w11_grid_alter_roundtrip",
        w11,
        "SELECT t, x, CASE WHEN t < 5 THEN t * 10 + x ELSE -1 END AS q "
        "FROM (SELECT r1.range AS t, r2.range AS x "
        "FROM range(0, 12) r1, range(0, 6) r2)",
    )


def populate_round6_assemble_queries(register) -> None:
    """t14: chunk -> reassemble round-trip. The operator pair is the
    real pipeline shape (chunk for context windows, assemble pages
    into documents); running them back to back makes the suite row
    self-checking — the oracle replays the chunker (t10's SQL twin)
    and the ordered string_agg, so any order instability in the
    assembly (collect_list is shuffle-order-dependent without the
    struct sort) hash-fails immediately."""

    def t14(spark, sf_dir):
        from .text import assemble_chunks, chunk_documents

        docs = _docs(spark, sf_dir)
        chunks = chunk_documents(docs, chunk_tokens=16)
        return assemble_chunks(chunks)

    register(
        "t14_assemble_chunks",
        t14,
        "SELECT doc_id, "
        "string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text, "
        "COUNT(*) AS n_chunks FROM ("
        + text.chunk_documents_sql(chunk_tokens=16)
        + ") GROUP BY doc_id",
    )


def populate_round6_audit_queries(register) -> None:
    """z22: the fsck tool's report contract, driver-checked. The query
    builds a grid store, ALTER-adds a half-covered column, and audits:
    the report must show every present object decoded (ok, not
    missing), the added column's uncovered cells as missing-but-ok
    (fill semantics, A13 — missing is NOT an error), and no error
    strings. The oracle is the literal expected report."""

    def z22(spark, sf_dir):
        import shutil

        from ..io import add_zarr_arrays, audit_zarr, write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z22_{token}"
        shutil.rmtree(path, ignore_errors=True)
        g = (
            spark.range(0, 8)
            .selectExpr("id as t")
            .crossJoin(spark.range(0, 6).selectExpr("id as x"))
            .select(
                "t", "x",
                (F.col("t") * 10 + F.col("x")).cast("double").alias("v"),
            )
        )
        write_zarr_grid(
            g, path, dims=["t", "x"], chunk_shape=(4, 3),
            mode="overwrite",
        )
        add_zarr_arrays(
            g.filter("t < 4").select(
                "t", "x", F.col("t").cast("double").alias("q")
            ),
            path, dims=["t", "x"],
        )
        return audit_zarr(spark, path)

    register(
        "z22_audit_report",
        z22,
        "SELECT col0 AS array, col1 AS chunk_key, "
        "CAST(col2 AS BIGINT) AS rows, "
        "CAST(col3 AS BOOLEAN) AS ok, CAST(col4 AS BOOLEAN) AS missing, "
        "CAST(col5 AS VARCHAR) AS error FROM (VALUES "
        "('q', 'c/0/0', 12, true, false, NULL), "
        "('q', 'c/0/1', 12, true, false, NULL), "
        "('q', 'c/1/0', 0, true, true, NULL), "
        "('q', 'c/1/1', 0, true, true, NULL), "
        "('t', 'c/0', 4, true, false, NULL), "
        "('t', 'c/1', 4, true, false, NULL), "
        "('v', 'c/0/0', 12, true, false, NULL), "
        "('v', 'c/0/1', 12, true, false, NULL), "
        "('v', 'c/1/0', 12, true, false, NULL), "
        "('v', 'c/1/1', 12, true, false, NULL), "
        "('x', 'c/0', 3, true, false, NULL), "
        "('x', 'c/1', 3, true, false, NULL))",
    )


def populate_round6_diff_queries(register) -> None:
    """z23: the store-diff tool's report contract, driver-checked —
    build a store, copy it, perturb one grid point and ALTER-add an
    extra column to the copy; the diff must localize the change to
    exactly one cell (n_diff=1), mark every other common cell equal,
    and class the extra column as only_b. Oracle = the literal
    expected report."""

    def z23(spark, sf_dir):
        import shutil

        from ..io import (
            add_zarr_arrays,
            diff_zarr,
            write_zarr_grid,
            write_zarr_region,
        )

        token = sf_dir.strip("/").replace("/", "_")
        pa = f"/tmp/arrow_zarr_spark_z23a_{token}"
        pb = f"/tmp/arrow_zarr_spark_z23b_{token}"
        g = (
            spark.range(0, 8)
            .selectExpr("id as t")
            .crossJoin(spark.range(0, 6).selectExpr("id as x"))
            .select(
                "t", "x",
                (F.col("t") * 100 + F.col("x")).cast("double").alias("v"),
            )
        )
        for p in (pa, pb):
            shutil.rmtree(p, ignore_errors=True)
            write_zarr_grid(
                g, p, dims=["t", "x"], chunk_shape=(4, 3),
                mode="overwrite",
            )
        write_zarr_region(
            spark.createDataFrame([(0, 0, -7.0)], ["t", "x", "v"]),
            pb, dims=["t", "x"],
        )
        add_zarr_arrays(
            g.select("t", "x", F.col("t").cast("double").alias("q")),
            pb, dims=["t", "x"],
        )
        return diff_zarr(spark, pa, pb)

    register(
        "z23_store_diff_report",
        z23,
        "SELECT col0 AS array, CAST(col1 AS VARCHAR) AS chunk_key, "
        "col2 AS status, CAST(col3 AS BIGINT) AS n_diff FROM (VALUES "
        "('q', NULL, 'only_b', NULL), "
        "('t', 'c/0', 'equal', 0), ('t', 'c/1', 'equal', 0), "
        "('x', 'c/0', 'equal', 0), ('x', 'c/1', 'equal', 0), "
        "('v', 'c/0/0', 'changed', 1), ('v', 'c/0/1', 'equal', 0), "
        "('v', 'c/1/0', 'equal', 0), ('v', 'c/1/1', 'equal', 0))",
    )


def populate_round6_string_coord_queries(register) -> None:
    """z24: grid store with a STRING coordinate axis — xarray's
    station/category-dimension pattern (the reference rejects strings
    outright, config.rs:278-281; here the axis is a vlen-utf8
    coordinate array and the broadcast alignment is value-exact). The
    oracle rebuilds the hypercube from a VALUES axis."""

    def z24(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z24_{token}"
        shutil.rmtree(path, ignore_errors=True)
        st = spark.createDataFrame(
            [("nyc", 1.0), ("sfo", 2.0), ("lhr", 3.0)],
            ["station", "code"],
        )
        g = (
            spark.range(0, 6)
            .selectExpr("id as t")
            .crossJoin(st)
            .select(
                "t", "station",
                (F.col("t") * 10.0 + F.col("code")).alias("v"),
            )
        )
        write_zarr_grid(
            g, path, dims=["t", "station"], chunk_shape=(3, 2),
            mode="overwrite",
        )
        return spark.read.format("zarr").load(path)

    register(
        "z24_string_coord_grid",
        z24,
        "SELECT r.range AS t, s.station, "
        "CAST(r.range * 10.0 + s.code AS DOUBLE) AS v "
        "FROM range(0, 6) r, (VALUES ('nyc', 1.0), ('sfo', 2.0), "
        "('lhr', 3.0)) s(station, code)",
    )


def populate_round6_time_axis_queries(register) -> None:
    """z25: grid store with a TimestampNTZ coordinate axis — THE
    xarray layout (a time dimension), with an in-place region write
    addressed BY timestamp before the scan. The oracle rebuilds the
    hypercube with interval arithmetic and a CASE for the updated
    point; z16's timezone/dtype parity conventions apply."""

    def z25(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid, write_zarr_region

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z25_{token}"
        shutil.rmtree(path, ignore_errors=True)
        g = spark.sql(
            "SELECT timestampadd(HOUR, r.id, "
            "TIMESTAMP_NTZ'2024-01-01 00:00:00') AS ts, "
            "x.id AS x, CAST(r.id * 10 + x.id AS DOUBLE) AS v "
            "FROM range(0, 6) r, range(0, 4) x"
        )
        write_zarr_grid(
            g, path, dims=["ts", "x"], chunk_shape=(3, 2),
            mode="overwrite",
        )
        write_zarr_region(
            spark.sql(
                "SELECT TIMESTAMP_NTZ'2024-01-01 02:00:00' AS ts, "
                "1 AS x, CAST(-9 AS DOUBLE) AS v"
            ),
            path, dims=["ts", "x"],
        )
        return spark.read.format("zarr").load(path)

    register(
        "z25_time_axis_grid",
        z25,
        "SELECT TIMESTAMP '2024-01-01 00:00:00' "
        "+ INTERVAL (r.range) HOUR AS ts, x.range AS x, "
        "CAST(CASE WHEN r.range = 2 AND x.range = 1 THEN -9 "
        "ELSE r.range * 10 + x.range END AS DOUBLE) AS v "
        "FROM range(0, 6) r, range(0, 4) x",
    )


def populate_round6_3d_writer_queries(register) -> None:
    """w12: 3-D grid WRITE round-trip — the writer covering the
    scan's 3-D surface (z18 reads a hand-built fixture; this writes
    one from a DataFrame, edge chunks on all three axes, then scans
    it back). Oracle rebuilds the hypercube from three ranges."""

    def w12(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w12_{token}"
        shutil.rmtree(path, ignore_errors=True)
        g3 = spark.sql(
            "SELECT a.id AS a, b.id AS b, c.id AS c, "
            "CAST(a.id * 100 + b.id * 10 + c.id AS DOUBLE) AS v "
            "FROM range(0, 4) a, range(0, 3) b, range(0, 5) c"
        )
        write_zarr_grid(
            g3, path, dims=["a", "b", "c"], chunk_shape=(2, 2, 3),
            mode="overwrite",
        )
        return spark.read.format("zarr").load(path)

    register(
        "w12_3d_grid_roundtrip",
        w12,
        "SELECT a.range AS a, b.range AS b, c.range AS c, "
        "CAST(a.range * 100 + b.range * 10 + c.range AS DOUBLE) AS v "
        "FROM range(0, 4) a, range(0, 3) b, range(0, 5) c",
    )


def populate_round6_sharded_grid_queries(register) -> None:
    """w13: SHARDED grid write round-trip — shard_shape makes the
    store object grid the shard grid (the object-count lever for N-D
    stores: a 100-TB hypercube at 64 MB chunks is millions of objects
    unsharded), with a region write landing on the sharded layout
    before the scan. Oracle rebuilds the hypercube with a CASE."""

    def w13(spark, sf_dir):
        import shutil

        from ..io import write_zarr_grid, write_zarr_region

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w13_{token}"
        shutil.rmtree(path, ignore_errors=True)
        g = (
            spark.range(0, 16)
            .selectExpr("id as t")
            .crossJoin(spark.range(0, 12).selectExpr("id as x"))
            .select(
                "t", "x",
                (F.col("t") * 100 + F.col("x")).cast("double").alias("v"),
            )
        )
        write_zarr_grid(
            g, path, dims=["t", "x"], chunk_shape=(2, 3),
            shard_shape=(8, 6), mode="overwrite",
        )
        write_zarr_region(
            spark.createDataFrame([(5, 7, -1.0)], ["t", "x", "v"]),
            path, dims=["t", "x"],
        )
        return spark.read.format("zarr").load(path)

    register(
        "w13_sharded_grid_roundtrip",
        w13,
        "SELECT t.range AS t, x.range AS x, "
        "CAST(CASE WHEN t.range = 5 AND x.range = 7 THEN -1 "
        "ELSE t.range * 100 + x.range END AS DOUBLE) AS v "
        "FROM range(0, 16) t, range(0, 12) x",
    )


def populate_round6_embdedup_queries(register) -> None:
    """d18: incremental batch-vs-corpus EMBEDDING dedup — the
    semantic-modality twin of d12's text Jaccard: hyperplane-LSH
    bucket gate (batch signatures broadcast, corpus never shuffles) +
    exact cosine verify + broadcast anti-join. Oracle = the exact
    NOT EXISTS anti-join (the gate's auto-derived parameters give
    per-pair miss <= 1e-6 at the threshold, the same recall contract
    d06's exact oracle has held since round 3)."""

    def d18(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        out = dedup.embedding_dedup_against_corpus(
            embs.filter(F.col("vec_id") % 9 == 0),
            embs.filter(F.col("vec_id") % 9 != 0),
            threshold=0.4,
        )
        return out.select("vec_id")

    register(
        "d18_embedding_dedup_corpus",
        d18,
        "SELECT b.vec_id FROM embeddings b WHERE b.vec_id % 9 = 0 "
        "AND NOT EXISTS (SELECT 1 FROM embeddings c "
        "WHERE c.vec_id % 9 <> 0 AND "
        "ROUND(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), "
        "CAST(c.embedding AS DOUBLE[])), 6) >= 0.4)",
    )


def populate_round7_version_queries(register) -> None:
    """z27/z28: snapshot versioning (zarr/versions.py). The reference
    reads Icechunk repositories pinned at (branch "main", now) —
    config.rs:141-197 — and icechunk-python has been absent from this
    environment every round, so the capability is provided natively:
    content-addressed commits (sha256-deduped objects), manifest-
    resolved pinned reads, distributed rollback. Both queries rebuild
    their store from scratch per call (the w09 convention), so they
    are idempotent and fully value-hash-checkable."""

    def z27(spark, sf_dir):
        import shutil

        from ..datasource import read_zarr
        from ..io import write_zarr
        from ..zarr.versions import commit_version

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z27_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * 3).cast("double").alias("d"),
            )

        write_zarr(tbl(0, 64), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1: 64 rows")
        write_zarr(tbl(64, 100), path, chunk_rows=16, mode="append")
        commit_version(spark, path, "v2: 100 rows")
        # live state mutates AGAIN after v2 — a pinned read that sees
        # any of this fails the value hash, not just the row count
        write_zarr(
            spark.range(0, 7).select(
                F.col("id").alias("k"), F.lit(-1.0).alias("d")
            ),
            path,
            chunk_rows=16,
            mode="overwrite",
        )
        return read_zarr(spark, path, version=1)

    register(
        "z27_version_pinned_read",
        z27,
        "SELECT CAST(i AS BIGINT) AS k, CAST(i * 3 AS DOUBLE) AS d "
        "FROM range(64) t(i)",
    )

    def z28(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr.versions import commit_version, rollback_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z28_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(lo, hi, mul):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * mul).cast("double").alias("d"),
            )

        write_zarr(tbl(0, 48, 5), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "good state")
        # regrettable append: more rows with poisoned values
        write_zarr(tbl(48, 80, -7), path, chunk_rows=16, mode="append")
        rollback_zarr(spark, path, 1)
        # the LIVE store is the deliverable: rollback restored objects
        # first, metadata after, and deleted the appended extras
        return spark.read.format("zarr").load(path)

    register(
        "z28_version_rollback",
        z28,
        "SELECT CAST(i AS BIGINT) AS k, CAST(i * 5 AS DOUBLE) AS d "
        "FROM range(48) t(i)",
    )

    def z31(spark, sf_dir):
        # z31: tag + export — the release workflow end to end. Commit
        # v1, pin it under the immutable name "release-1", keep
        # mutating and committing the live store, then EXPORT the tag
        # to a standalone store (no .versions/ rides along) and read
        # THAT. Any leakage of post-tag state into the export fails
        # the value hash. Completes the Icechunk snapshot/tag model
        # (config.rs:141-197) the reference consumes.
        import shutil

        from ..io import write_zarr
        from ..zarr.versions import (
            commit_version,
            export_version,
            tag_version,
        )

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z31_{token}"
        dest = path + "_release"
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)

        def tbl(lo, hi, mul):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * mul).cast("double").alias("d"),
            )

        write_zarr(tbl(0, 56, 7), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1: the release")
        tag_version(path, "release-1")
        # the live store moves on past the release
        write_zarr(tbl(0, 80, -3), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2: post-release churn")
        export_version(spark, path, dest, tag="release-1")
        return spark.read.format("zarr").load(dest)

    register(
        "z31_tag_export_read",
        z31,
        "SELECT CAST(i AS BIGINT) AS k, CAST(i * 7 AS DOUBLE) AS d "
        "FROM range(56) t(i)",
    )


def populate_round7_ivfpq_queries(register) -> None:
    """s05: IVF-PQ ANN — the coarse-quantizer + product-quantizer
    composition (FAISS IVFPQ; Jégou et al. 2011 §V) a 100-TB vector
    index actually deploys. The Spark side folds coarse assignment
    into the PQ kernel's corpus pass (zero extra exchange; see
    similarity.ivf_pq_ann); the oracle composes s03's IVF replay
    (strided centroids, max-cosine assignment with lowest-cell
    tiebreak, nprobe probes) with s04's PQ replay (strided codebooks,
    argmin-L2 encode, ADC scoring) — every quantity an exact integer
    sum over the 1/32768 grid, so the ranking is bit-identical."""

    def s05(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        return similarity.ivf_pq_ann(
            embs,
            embs.filter(F.col("vec_id") < 20),
            k=5,
            n_cells=16,
            nprobe=2,
            m=16,
            ksub=64,
        )

    _qv = "list_transform(CAST({e} AS DOUBLE[]), x -> ROUND(x * 32768, 0))"
    _qcos = (
        "(list_inner_product({a}, {b}) / "
        "(SQRT(list_inner_product({a}, {a})) * "
        "SQRT(list_inner_product({b}, {b}))))"
    )
    _m, _ksub, _dsub, _k, _nc, _np = 16, 64, 4, 5, 16, 2
    register(
        "s05_ivf_pq_ann_topk",
        s05,
        "WITH params AS (SELECT "
        f"GREATEST(1, (MAX(vec_id)+1)//{_ksub}) AS stride, "
        f"GREATEST(1, (MAX(vec_id)+1)//{_nc}) AS cstride "
        "FROM embeddings), "
        f"corp AS (SELECT vec_id, {_qv.format(e='embedding')} AS v "
        "FROM embeddings), "
        "cents AS (SELECT CAST(vec_id // cstride AS INT) AS cell, "
        "v AS centroid FROM corp, params "
        f"WHERE vec_id % cstride = 0 AND vec_id // cstride < {_nc}), "
        "cassign AS (SELECT vec_id, cell FROM ("
        "SELECT c.vec_id, ct.cell, ROW_NUMBER() OVER ("
        "PARTITION BY c.vec_id ORDER BY "
        f"{_qcos.format(a='c.v', b='ct.centroid')} DESC, ct.cell) AS rk "
        "FROM corp c CROSS JOIN cents ct) WHERE rk = 1), "
        "qp AS (SELECT vec_id AS query_id, cell FROM ("
        "SELECT c.vec_id, ct.cell, ROW_NUMBER() OVER ("
        "PARTITION BY c.vec_id ORDER BY "
        f"{_qcos.format(a='c.v', b='ct.centroid')} DESC, ct.cell) AS rk "
        f"FROM corp c CROSS JOIN cents ct WHERE c.vec_id < 20) "
        f"WHERE rk <= {_np}), "
        "cb AS (SELECT CAST(vec_id // stride AS INT) AS code, v "
        "FROM corp, params "
        f"WHERE vec_id % stride = 0 AND vec_id // stride < {_ksub}), "
        f"js AS (SELECT unnest(range(0, {_m})) AS j), "
        f"sub AS (SELECT code, j, list_slice(v, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS sv FROM cb, js), "
        f"csub AS (SELECT vec_id, j, list_slice(v, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS cv FROM corp, js), "
        "dist AS (SELECT c.vec_id, c.j, s.code, "
        "list_inner_product(c.cv, c.cv) - 2*list_inner_product(c.cv, s.sv) "
        "+ list_inner_product(s.sv, s.sv) AS d2 "
        "FROM csub c JOIN sub s ON c.j = s.j), "
        "enc AS (SELECT vec_id, j, code FROM ("
        "SELECT vec_id, j, code, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id, j ORDER BY d2, code) AS rk FROM dist) "
        "WHERE rk = 1), "
        "recon AS (SELECT e.vec_id, "
        "SUM(list_inner_product(s.sv, s.sv)) AS nr_sq "
        "FROM enc e JOIN sub s ON e.j = s.j AND e.code = s.code "
        "GROUP BY e.vec_id), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM corp "
        "WHERE vec_id < 20), "
        "qn AS (SELECT query_id, list_inner_product(qv, qv) AS nq_sq "
        "FROM q), "
        f"qsub AS (SELECT query_id, j, list_slice(qv, j*{_dsub}+1, "
        f"j*{_dsub}+{_dsub}) AS qj FROM q, js), "
        "pdot AS (SELECT qs.query_id, e.vec_id AS neighbor_id, "
        "SUM(list_inner_product(qs.qj, s.sv)) AS dot "
        "FROM qsub qs "
        "JOIN qp ON qp.query_id = qs.query_id "
        "JOIN cassign ca ON ca.cell = qp.cell "
        "JOIN enc e ON e.vec_id = ca.vec_id AND qs.j = e.j "
        "JOIN sub s ON s.j = e.j AND s.code = e.code "
        "GROUP BY qs.query_id, e.vec_id), "
        "scored AS (SELECT p.query_id, p.neighbor_id, "
        "p.dot / (SQRT(CASE WHEN qn.nq_sq > 0 THEN qn.nq_sq ELSE 1 END) "
        "* SQRT(CASE WHEN r.nr_sq > 0 THEN r.nr_sq ELSE 1 END)) AS cos "
        "FROM pdot p JOIN qn USING (query_id) "
        "JOIN recon r ON p.neighbor_id = r.vec_id "
        "WHERE p.query_id <> p.neighbor_id) "
        "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank "
        f"FROM scored) WHERE rank <= {_k}",
    )


def populate_round7_vlog_queries(register) -> None:
    """z29: the version LOG itself as a provable query — (version,
    n_objects, message) for a deterministic two-commit history.
    Timestamps are excluded (wall-clock); object counts are fully
    determined by the write layout (64 rows @ chunk 16 = 4 chunks x 2
    arrays + 3 metadata docs = 11 objects; the append to 100 rows
    regrows each array to 7 chunks = 17), so the literal oracle pins
    the commit protocol's accounting."""

    def z29(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr.versions import commit_version, version_log

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z29_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * 3).cast("double").alias("d"),
            )

        write_zarr(tbl(0, 64), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1: 64 rows")
        write_zarr(tbl(64, 100), path, chunk_rows=16, mode="append")
        commit_version(spark, path, "v2: 100 rows")
        rows = [
            (int(e["version"]), int(e["n_objects"]), str(e["message"]))
            for e in version_log(path)
        ]
        return spark.createDataFrame(
            rows, "version bigint, n_objects bigint, message string"
        )

    register(
        "z29_version_log",
        z29,
        "SELECT * FROM (VALUES "
        "(CAST(1 AS BIGINT), CAST(11 AS BIGINT), 'v1: 64 rows'), "
        "(CAST(2 AS BIGINT), CAST(17 AS BIGINT), 'v2: 100 rows')) "
        "AS t(version, n_objects, message)",
    )


def populate_round7_hh_queries(register) -> None:
    """t16: bounded-memory heavy hitters — the Misra-Gries-per-
    partition + exact-recount plan (no full-vocabulary shuffle; t06's
    exact groupBy shuffles one row per distinct gram, this shuffles
    only MG candidates). The oracle is the plain exact top-k: the MG
    guarantee (any token with global count > N/(capacity+1) reaches
    the recount) makes the bounded plan EXACT at suite scale, so the
    hashes must match."""

    def t16(spark, sf_dir):
        return text.heavy_hitters(_docs(spark, sf_dir), k=20)

    register(
        "t16_heavy_hitters",
        t16,
        "WITH w AS (SELECT t.w AS token FROM ("
        "SELECT string_split(text, ' ') AS ws FROM documents"
        "), UNNEST(ws) AS t(w) WHERE len(t.w) > 0) "
        "SELECT token, COUNT(*) AS total_freq, "
        "CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS BIGINT) "
        "AS rank FROM w GROUP BY token "
        "ORDER BY total_freq DESC, token LIMIT 20",
    )


def populate_round7_sketch_queries(register) -> None:
    """t17: KMV per-group distinct counting — the bounded-memory
    COUNT(DISTINCT) plan (r02/r26's exact form shuffles one row per
    distinct key; this shuffles <= n_partitions * k candidate hashes
    per group). The oracle is the plain exact COUNT(DISTINCT): below
    the sketch size the KMV certificate guarantees exactness
    (sketches.py — the k-min set held every distinct hash), so the
    hashes must match. Value domain chosen for cardinality (orders
    custkeys, ~1.3k distinct per priority at sf0.01), not the tiny
    synthetic token vocabulary."""
    from . import sketches

    def t17(spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        return sketches.kmv_distinct(
            orders, "o_orderpriority", "o_custkey", k=8192
        ).orderBy("o_orderpriority")

    register(
        "t17_kmv_distinct",
        t17,
        "SELECT o_orderpriority, "
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct, "
        "TRUE AS is_exact FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    )


def populate_round7_stream_sketch_queries(register) -> None:
    """e05: the streaming face of the KMV distinct sketch, checked in
    its batch form (applyInPandasWithState is streaming-only; the
    operator's batch path delegates to sketches.kmv_distinct with the
    streaming output schema, and tests/test_streaming.py proves the
    real stream path emits IDENTICAL rows after every micro-batch,
    both regimes, across a checkpoint boundary). Oracle is the plain
    exact COUNT(DISTINCT) — exact-certificate regime at suite
    cardinality (150 distinct users per event_type at sf0.01)."""

    def e05(spark, sf_dir):
        from ..streaming.event_ops import streaming_kmv_distinct

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return streaming_kmv_distinct(
            events, "event_type", "user_id", k=4096
        ).orderBy("group_key")

    register(
        "e05_stream_distinct_batchform",
        e05,
        "SELECT CAST(event_type AS VARCHAR) AS group_key, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct, "
        "TRUE AS is_exact FROM events "
        "GROUP BY event_type ORDER BY group_key",
    )


def populate_round7_upsert_queries(register) -> None:
    """w14: keyed MERGE into a live table store (io.upsert_zarr) —
    update-by-key plus insert-of-unmatched in one call, the row-keyed
    counterpart of w10's coordinate-addressed region write. The
    reference has no write path at all (SURVEY §2: sinks absent).
    The driver row proves the full MERGE state: updated rows carry
    the batch's values, inserted rows land appended, untouched rows
    and the untouched column survive byte-exactly."""

    def w14(spark, sf_dir):
        import shutil

        from ..io import upsert_zarr, write_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w14_{token}"
        shutil.rmtree(path, ignore_errors=True)

        base = spark.range(0, 80).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).cast("double").alias("v"),
            (F.col("id") % 5).alias("w"),
        )
        write_zarr(base, path, chunk_rows=16, mode="overwrite")
        ups = spark.range(10, 20).union(spark.range(80, 90)).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 80, -F.col("id"))
            .otherwise(F.col("id") * 0.5)
            .cast("double")
            .alias("v"),
            (F.col("id") % 5).alias("w"),
        )
        upsert_zarr(
            ups, path, key_col="k", on_missing="insert", chunk_rows=16
        )
        return spark.read.format("zarr").load(path)

    register(
        "w14_upsert_roundtrip",
        w14,
        "SELECT CAST(i AS BIGINT) AS k, "
        "CAST(CASE WHEN i BETWEEN 10 AND 19 THEN -i "
        "WHEN i >= 80 THEN i * 0.5 ELSE i * 3 END AS DOUBLE) AS v, "
        "CAST(i % 5 AS BIGINT) AS w "
        "FROM range(90) t(i)",
    )


def populate_round7_cdc_queries(register) -> None:
    """z30: row-level version CDC as a provable query — the
    incremental-refresh primitive over the native version store
    (zarr/versions.py). The history is two commits with a 2-row
    modification and a 4-row append; the literal oracle pins every
    emitted (array, pos, coords, change, old, new) row, so it proves
    the delta semantics AND the value rendering. The hash-gated
    work-list (only changed chunks decode) is pinned separately by
    tests/test_versions.py::TestVersionCDC."""

    def z30(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr.versions import commit_version, version_cdc

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z30_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(hi, bump):
            d = F.when(
                (F.col("id") >= 2) & (F.col("id") < 4) & F.lit(bump),
                F.col("id") * 5,
            ).otherwise(F.col("id") * 3)
            return spark.range(0, hi).select(
                F.col("id").alias("k"), d.cast("double").alias("d")
            )

        write_zarr(tbl(16, False), path, chunk_rows=8, mode="overwrite")
        commit_version(spark, path, "v1")
        write_zarr(tbl(20, True), path, chunk_rows=8, mode="overwrite")
        commit_version(spark, path, "v2")
        return version_cdc(spark, path, 1, 2).orderBy("array", "pos")

    register(
        "z30_version_cdc",
        z30,
        "SELECT * FROM (VALUES "
        "('d', CAST(2 AS BIGINT), '2', 'modified', '6.0', '10.0'), "
        "('d', CAST(3 AS BIGINT), '3', 'modified', '9.0', '15.0'), "
        "('d', CAST(16 AS BIGINT), '16', 'added', NULL, '48.0'), "
        "('d', CAST(17 AS BIGINT), '17', 'added', NULL, '51.0'), "
        "('d', CAST(18 AS BIGINT), '18', 'added', NULL, '54.0'), "
        "('d', CAST(19 AS BIGINT), '19', 'added', NULL, '57.0'), "
        "('k', CAST(16 AS BIGINT), '16', 'added', NULL, '16'), "
        "('k', CAST(17 AS BIGINT), '17', 'added', NULL, '17'), "
        "('k', CAST(18 AS BIGINT), '18', 'added', NULL, '18'), "
        "('k', CAST(19 AS BIGINT), '19', 'added', NULL, '19')) "
        'AS t("array", pos, coords, change, old_value, new_value) '
        'ORDER BY "array", pos',
    )


def populate_round7_crossmodal_queries(register) -> None:
    """m06: CLIP-score-style cross-modal alignment gate
    (multimodal.crossmodal_alignment) — keep image+caption pairs
    whose modality embeddings agree. The image tower is m02's exact
    integer micro-pixel decode, the text tower is the embeddings
    vector pooled 64->16 by 4-block mean, alignment = ROUND(cosine,
    6) gated at 0.1 (nearest value sits >= 2e-4 away at both driver
    sfs, so the rounding can't flip a row). The oracle replays both
    towers exactly: micro-pixels via m02's span CTE, pooling via the
    same left-to-right double adds."""

    def m06(spark, sf_dir):
        return multimodal.crossmodal_alignment(
            _docs(spark, sf_dir), _embs(spark, sf_dir), threshold=0.1
        )

    register(
        "m06_crossmodal_alignment",
        m06,
        "WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents "
        "WHERE length(text) > 0), "
        "s AS (SELECT doc_id, text, n, CAST(i AS INT) AS px_idx, "
        "CASE WHEN i < n % 16 THEN n // 16 + 1 ELSE n // 16 END AS span_len, "
        "CASE WHEN i < n % 16 THEN i * (n // 16 + 1) "
        "ELSE (n % 16) * (n // 16 + 1) + (i - n % 16) * (n // 16) "
        "END AS span_start FROM d, range(16) t(i)), "
        "px AS (SELECT doc_id, px_idx, "
        "CASE WHEN span_len = 0 THEN 0.0 ELSE "
        "round_even(list_sum(list_transform(string_split("
        "substr(text, span_start + 1, span_len), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / span_len * 1000000.0, 0) "
        "END AS pxm FROM s), "
        "iv AS (SELECT doc_id AS media_id, "
        "list(pxm ORDER BY px_idx) AS img_vec FROM px GROUP BY doc_id), "
        "tv AS (SELECT vec_id AS media_id, "
        "list_transform(range(16), i -> "
        "(v[4*i+1] + v[4*i+2] + v[4*i+3] + v[4*i+4]) / 4.0) AS txt_vec "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)) "
        "SELECT media_id, a AS alignment FROM ("
        "SELECT iv.media_id, "
        "ROUND(list_cosine_similarity(img_vec, txt_vec), 6) AS a "
        "FROM iv JOIN tv USING (media_id)) WHERE a >= 0.1",
    )


def populate_round7_sq8_queries(register) -> None:
    """s06/s07: scalar quantization (SQ8) and retrieve-then-rerank —
    the remaining two rungs of the production ANN ladder (FAISS
    ScalarQuantizer QT_8bit; IndexRefine / ScaNN reordering). s06
    ranks in the compressed domain; s07 shortlists with s06's kernel
    and rescores the shortlist with the EXACT cosine, so its reported
    scores are s01-identical on the surviving pairs. Both oracles
    replay the integer encode verbatim: codes are half-away-from-zero
    integer rounding ``sign(n)*((2|n|+s)//(2s))`` over the 1/32768
    grid with per-dim integer scales ``max(1, ceil(max|n_d|/127))`` —
    no float rounding anywhere, every dot/norm an exact integer sum,
    rankings bit-identical across engines."""

    def s06(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        return similarity.sq8_ann(
            embs, embs.filter(F.col("vec_id") < 20), k=5
        )

    # shared oracle prefix: grid vectors, per-dim integer scales,
    # dequantized codes, SQ8 cosine per (query, neighbor) pair
    _SQ8_PRE = (
        "WITH corp AS (SELECT vec_id, "
        "list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> ROUND(x * 32768, 0)) AS v FROM embeddings), "
        "ds AS (SELECT unnest(range(1, 65)) AS d), "
        "el AS (SELECT vec_id, d, CAST(v[d] AS BIGINT) AS n "
        "FROM corp, ds), "
        "sc AS (SELECT d, GREATEST(1, (MAX(ABS(n)) + 126) // 127) AS s "
        "FROM el GROUP BY d), "
        "enc AS (SELECT vec_id, d, "
        "(CASE WHEN n >= 0 THEN 1 ELSE -1 END) * "
        "((2 * ABS(n) + s) // (2 * s)) * s AS r "
        "FROM el JOIN sc USING (d)), "
        "nr AS (SELECT vec_id, SUM(r * r) AS nr_sq FROM enc "
        "GROUP BY vec_id), "
        "qe AS (SELECT vec_id AS query_id, d, n AS qd FROM el "
        "WHERE vec_id < 20), "
        "qn AS (SELECT query_id, SUM(qd * qd) AS nq_sq FROM qe "
        "GROUP BY query_id), "
        "dots AS (SELECT qe.query_id, e.vec_id AS neighbor_id, "
        "SUM(qe.qd * e.r) AS dot FROM qe JOIN enc e USING (d) "
        "WHERE e.vec_id <> qe.query_id GROUP BY 1, 2), "
        "scored AS (SELECT dt.query_id, dt.neighbor_id, "
        "CAST(dt.dot AS DOUBLE) / "
        "(SQRT(CASE WHEN qn.nq_sq > 0 THEN CAST(qn.nq_sq AS DOUBLE) "
        "ELSE 1 END) * "
        "SQRT(CASE WHEN nr.nr_sq > 0 THEN CAST(nr.nr_sq AS DOUBLE) "
        "ELSE 1 END)) AS cos "
        "FROM dots dt JOIN qn USING (query_id) "
        "JOIN nr ON dt.neighbor_id = nr.vec_id)"
    )
    register(
        "s06_sq8_ann_topk",
        s06,
        _SQ8_PRE + " "
        "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank "
        "FROM scored) WHERE rank <= 5",
    )

    def s07(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        return similarity.sq8_refine_topk(
            embs, embs.filter(F.col("vec_id") < 20), k=5, shortlist=32
        )

    register(
        "s07_sq8_refine_topk",
        s07,
        _SQ8_PRE + ", "
        "sl AS (SELECT query_id, neighbor_id FROM ("
        "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk "
        "FROM scored) WHERE rk <= 32), "
        "ex AS (SELECT s.query_id, s.neighbor_id, "
        "list_inner_product(q.v, c.v) / "
        "(SQRT(CASE WHEN list_inner_product(q.v, q.v) > 0 "
        "THEN list_inner_product(q.v, q.v) ELSE 1 END) * "
        "SQRT(CASE WHEN list_inner_product(c.v, c.v) > 0 "
        "THEN list_inner_product(c.v, c.v) ELSE 1 END)) AS cosx "
        "FROM sl s JOIN corp q ON s.query_id = q.vec_id "
        "JOIN corp c ON s.neighbor_id = c.vec_id) "
        "SELECT query_id, neighbor_id, ROUND(cosx, 6) AS cosine, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT query_id, neighbor_id, cosx, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cosx DESC, neighbor_id) AS rank "
        "FROM ex) WHERE rank <= 5",
    )


def populate_round7_cas_queries(register) -> None:
    """w15: optimistic-concurrency commits as a provable query — the
    multi-writer discipline for the native version store. The row set
    walks the whole CAS story: a fresh commit against expected head 0
    lands version 1; a second commit that still claims head 0 (a
    writer that based its changes on a stale read) is REJECTED with
    the head untouched; the rebased retry against the real head lands
    version 2. The literal oracle pins each step's outcome AND the
    observed head, so a regression to last-writer-wins (or a
    manifests-overwritten bug) flips a row. The narrower race — two
    writers publishing the SAME next version — is pinned by
    tests/test_versions.py::TestOptimisticConcurrency via the
    exclusive (atomic-link) manifest create."""

    def w15(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr import (
            VersionConflictError,
            commit_version,
            latest_version,
        )

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w15_{token}"
        shutil.rmtree(path, ignore_errors=True)

        base = spark.range(0, 48).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        write_zarr(base, path, chunk_rows=16, mode="overwrite")
        rows = []
        info = commit_version(spark, path, "base", expected_head=0)
        rows.append(("initial_commit", "committed", info["version"]))
        write_zarr(
            spark.range(48, 64).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            ),
            path,
            chunk_rows=16,
            mode="append",
        )
        try:
            commit_version(spark, path, "stale", expected_head=0)
            rows.append(("stale_commit", "NO CONFLICT RAISED", -1))
        except VersionConflictError:
            rows.append(("stale_commit", "conflict", latest_version(path)))
        info = commit_version(spark, path, "rebased", expected_head=1)
        rows.append(("rebased_commit", "committed", info["version"]))
        return spark.createDataFrame(
            rows, "step string, outcome string, head long"
        )

    register(
        "w15_commit_cas",
        w15,
        "SELECT 'initial_commit' AS step, 'committed' AS outcome, "
        "CAST(1 AS BIGINT) AS head "
        "UNION ALL SELECT 'stale_commit', 'conflict', 1 "
        "UNION ALL SELECT 'rebased_commit', 'committed', 2",
    )


def populate_round7_replicate_queries(register) -> None:
    """z32: byte-verified store replication (io.replicate_zarr), the
    migration/DR verb. The driver row proves the replica through the
    REAL read path: source store written from a deterministic table,
    replicated with per-object sha256 verification (data objects
    distributed first, metadata documents after, root last), then the
    REPLICA is scanned and must reproduce the table exactly. A copy
    bug, a verify bypass, or a metadata-ordering bug all flip rows."""

    def z32(spark, sf_dir):
        import shutil

        from ..io import replicate_zarr, write_zarr

        token = sf_dir.strip("/").replace("/", "_")
        src = f"/tmp/arrow_zarr_spark_z32_src_{token}"
        dst = f"/tmp/arrow_zarr_spark_z32_dst_{token}"
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)

        base = spark.range(0, 96).select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 13).cast("double").alias("v"),
        )
        write_zarr(base, src, chunk_rows=16)
        info = replicate_zarr(spark, src, dst, verify=True)
        rep = spark.read.format("zarr").load(dst)
        # fold the receipt in: n_mismatch must be 0 on every row
        return rep.withColumn(
            "n_mismatch", F.lit(int(info["n_mismatch"])).cast("long")
        )

    register(
        "z32_replicated_scan",
        z32,
        "SELECT CAST(i AS BIGINT) AS k, "
        "CAST(i * 7 % 13 AS DOUBLE) AS v, "
        "CAST(0 AS BIGINT) AS n_mismatch FROM range(96) t(i)",
    )


def populate_round7_stream_hh_queries(register) -> None:
    """e06: the streaming face of the keyed heavy-hitters sketch,
    checked in its batch form (the e05 convention: the operator's
    batch path delegates to sketches.grouped_heavy_hitters, and
    tests/test_streaming.py proves the real stream path emits
    IDENTICAL rows per micro-batch while summaries stay in the exact
    regime, across a checkpoint boundary, and honestly flags the
    estimator regime past overflow). Oracle is the plain exact
    per-group top-k — exact-certificate regime at suite cardinality
    (~150 users per event_type at sf0.01, capacity 4096)."""

    def e06(spark, sf_dir):
        from ..streaming.event_ops import streaming_heavy_hitters

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return streaming_heavy_hitters(
            events, "event_type", "user_id", k=10, capacity=4096
        ).orderBy("group_key", "rank")

    register(
        "e06_stream_topk_batchform",
        e06,
        "SELECT group_key, value, total_freq, CAST(rank AS BIGINT) "
        "AS rank, TRUE AS is_exact FROM ("
        "SELECT CAST(event_type AS VARCHAR) AS group_key, "
        "CAST(user_id AS VARCHAR) AS value, "
        "CAST(COUNT(*) AS BIGINT) AS total_freq, "
        "ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY COUNT(*) DESC, CAST(user_id AS VARCHAR)) AS rank "
        "FROM events WHERE user_id IS NOT NULL "
        "GROUP BY event_type, user_id) WHERE rank <= 10 "
        "ORDER BY group_key, rank",
    )


def populate_round7_quantile_queries(register) -> None:
    """t18: exact per-group quantiles without a global sort
    (sketches.exact_quantiles) — sketch-bracket-then-select. r32's
    percentile_cont uses Spark's exact percentile, which materializes
    each group's values in executor memory (fine at suite scale,
    fatal for a 100-TB group); this plan's only row shuffle is the
    ~4n/accuracy gap window, and the answer is exact REGARDLESS of
    the sketch's quality (the sketch only sizes the gap; a wrong
    bracket falls back to [min,max], never to a wrong answer). The
    oracle is DuckDB's quantile_disc — identical k = max(1,
    ceil(p*n)) order-statistic semantics, so real data values
    hash-match."""

    def t18(spark, sf_dir):
        from .sketches import exact_quantiles

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return exact_quantiles(
            li,
            "l_extendedprice",
            [0.5, 0.9, 0.99],
            group_col="l_returnflag",
        ).orderBy("group_key", "prob")

    register(
        "t18_exact_quantiles",
        t18,
        "SELECT CAST(l_returnflag AS VARCHAR) AS group_key, "
        "CAST(0.5 AS DOUBLE) AS prob, "
        "quantile_disc(l_extendedprice, 0.5) AS value "
        "FROM lineitem GROUP BY 1 "
        "UNION ALL SELECT CAST(l_returnflag AS VARCHAR), "
        "CAST(0.9 AS DOUBLE), quantile_disc(l_extendedprice, 0.9) "
        "FROM lineitem GROUP BY 1 "
        "UNION ALL SELECT CAST(l_returnflag AS VARCHAR), "
        "CAST(0.99 AS DOUBLE), quantile_disc(l_extendedprice, 0.99) "
        "FROM lineitem GROUP BY 1 "
        "ORDER BY group_key, prob",
    )


def populate_round7_phash_queries(register) -> None:
    """m07: perceptual-hash image near-dup pairs — dHash over the
    deterministic 4x4 thumbnail (m02's fake decode; the real codec
    stays honestly gated), banded hamming LSH (3x8-bit bands,
    pigeonhole-exact recall at hamming <= 2, first-band no-distinct
    dedup), exact bit_count verify. The oracle rebuilds the thumbnail
    from m02's px_micro SQL (rounded-micro comparisons agree exactly
    with the kernel's rounded-double ones), derives all 24 gradient
    bits, and replays the band joins and the xor/bit_count verify —
    the full pipeline is bit-replayable."""

    def m07(spark, sf_dir):
        return multimodal.phash_near_dup_pairs(
            _docs(spark, sf_dir), max_hamming=2
        )

    # the 24 dHash bits over the 1-indexed 16-pixel array, exactly
    # the bit layout of multimodal.perceptual_hash
    terms = []
    bi = 0
    for r in range(4):
        for c in range(3):
            terms.append(
                f"CASE WHEN arr[{r * 4 + c + 1}] < arr[{r * 4 + c + 2}] "
                f"THEN {1 << bi} ELSE 0 END"
            )
            bi += 1
    for c in range(4):
        for r in range(3):
            terms.append(
                f"CASE WHEN arr[{r * 4 + c + 1}] < arr[{(r + 1) * 4 + c + 1}] "
                f"THEN {1 << bi} ELSE 0 END"
            )
            bi += 1
    hash_expr = " + ".join(terms)

    register(
        "m07_phash_near_dup",
        m07,
        "WITH d AS (SELECT doc_id, text, length(text) AS n "
        "FROM documents WHERE length(text) > 0), "
        "s AS (SELECT doc_id, text, n, CAST(i AS INT) AS px_idx, "
        "CASE WHEN i < n % 16 THEN n // 16 + 1 ELSE n // 16 END "
        "AS span_len, "
        "CASE WHEN i < n % 16 THEN i * (n // 16 + 1) "
        "ELSE (n % 16) * (n // 16 + 1) + (i - n % 16) * (n // 16) "
        "END AS span_start FROM d, range(16) t(i)), "
        "px AS (SELECT doc_id AS media_id, px_idx, "
        "CASE WHEN span_len = 0 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(round_even(list_sum(list_transform(string_split("
        "substr(text, span_start + 1, span_len), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / span_len * 1000000.0, 0) "
        "AS BIGINT) END AS pm FROM s), "
        "t AS (SELECT media_id, list(pm ORDER BY px_idx) AS arr "
        "FROM px GROUP BY media_id), "
        f"h AS (SELECT media_id, {hash_expr} AS ph FROM t), "
        "hb AS (SELECT media_id, ph, ph % 256 AS b0, "
        "(ph // 256) % 256 AS b1, ph // 65536 AS b2 FROM h), "
        "cand AS ("
        "SELECT a.media_id AS ia, b.media_id AS ib, a.ph AS pa, "
        "b.ph AS pb FROM hb a JOIN hb b "
        "ON a.b0 = b.b0 AND a.media_id < b.media_id "
        "UNION ALL SELECT a.media_id, b.media_id, a.ph, b.ph "
        "FROM hb a JOIN hb b ON a.b1 = b.b1 AND a.b0 <> b.b0 "
        "AND a.media_id < b.media_id "
        "UNION ALL SELECT a.media_id, b.media_id, a.ph, b.ph "
        "FROM hb a JOIN hb b ON a.b2 = b.b2 AND a.b0 <> b.b0 "
        "AND a.b1 <> b.b1 AND a.media_id < b.media_id) "
        "SELECT ia AS id_a, ib AS id_b, "
        "CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming "
        "FROM cand WHERE bit_count(xor(pa, pb)) <= 2",
    )


def populate_round7_sync_queries(register) -> None:
    """z33: incremental replica sync (zarr.sync_zarr) proven through
    the real read path — seed a replica with full history, advance
    the source twice (append + commit each), pull ONCE, and scan the
    replica; a delta-logic bug (missed object, stale live key,
    skipped manifest) flips rows. Delta-proportionality itself
    (n_objects_copied < store size, no-op when current, shrink
    prunes) is pinned by tests/test_replicate.py::TestSync."""

    def z33(spark, sf_dir):
        import shutil

        from ..io import replicate_zarr, write_zarr
        from ..zarr import commit_version, sync_zarr

        token = sf_dir.strip("/").replace("/", "_")
        src = f"/tmp/arrow_zarr_spark_z33_src_{token}"
        dst = f"/tmp/arrow_zarr_spark_z33_dst_{token}"
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)

        def tbl(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * 11 % 17).cast("double").alias("v"),
            )

        write_zarr(tbl(0, 64), src, chunk_rows=16)
        commit_version(spark, src, "seed")
        replicate_zarr(spark, src, dst, include_versions=True)
        write_zarr(tbl(64, 80), src, chunk_rows=16, mode="append")
        commit_version(spark, src, "v2")
        write_zarr(tbl(80, 112), src, chunk_rows=16, mode="append")
        commit_version(spark, src, "v3")
        info = sync_zarr(spark, src, dst)
        rep = spark.read.format("zarr").load(dst)
        return rep.withColumn(
            "synced_to", F.lit(int(info["to_version"])).cast("long")
        )

    register(
        "z33_incremental_sync_scan",
        z33,
        "SELECT CAST(i AS BIGINT) AS k, "
        "CAST(i * 11 % 17 AS DOUBLE) AS v, "
        "CAST(3 AS BIGINT) AS synced_to FROM range(112) t(i)",
    )


def populate_round7_entropy_queries(register) -> None:
    """t15 (filling the one gap in the text numbering): Shannon
    character/word entropy quality gate. Pure row-local JVM
    expressions (no shuffle anywhere); the distinct symbol list is
    SORTED in both engines before the -sum(p log2 p) accumulation, so
    the float sums are bit-identical term-for-term and the 6-dp
    rounding is display, not reconciliation."""

    def t15(spark, sf_dir):
        return text.entropy_score(_docs(spark, sf_dir))

    _ENT = (
        "CASE WHEN len({a}) > 0 THEN ROUND(CASE WHEN s{t} < 0 "
        "THEN -s{t} ELSE 0.0 END, 6) ELSE 0.0 END"
    )
    register(
        "t15_entropy_score",
        t15,
        "WITH base AS (SELECT doc_id, string_split(text, '') AS cs, "
        "list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws "
        "FROM documents), "
        "s AS (SELECT doc_id, cs, ws, "
        "list_sum(list_transform(list_sort(list_distinct(cs)), "
        "d -> (len(list_filter(cs, x -> x = d)) / CAST(len(cs) AS "
        "DOUBLE)) * log2(len(list_filter(cs, x -> x = d)) / "
        "CAST(len(cs) AS DOUBLE)))) AS sc, "
        "list_sum(list_transform(list_sort(list_distinct(ws)), "
        "d -> (len(list_filter(ws, x -> x = d)) / CAST(len(ws) AS "
        "DOUBLE)) * log2(len(list_filter(ws, x -> x = d)) / "
        "CAST(len(ws) AS DOUBLE)))) AS sw FROM base) "
        "SELECT doc_id, "
        + _ENT.format(a="cs", t="c")
        + " AS char_entropy, "
        + _ENT.format(a="ws", t="w")
        + " AS word_entropy, "
        "(" + _ENT.format(a="cs", t="c") + " < 2.5 OR "
        + _ENT.format(a="ws", t="w") + " < 3.0) AS low_entropy "
        "FROM s",
    )


def populate_round7_mv_queries(register) -> None:
    """x04: incremental materialized-view maintenance over the
    version store — the composition the versioning layer exists for.
    A chunk-granular stats view is materialized at v1, the store
    advances (one in-place modification + a 48-row append, committed
    as v2), and the view is REFRESHED from the manifest delta: only
    chunks whose bytes or coverage changed decode (pinned by
    TestChunkStatView's work-list assertions); byte-identical chunks
    ride through untouched. The literal oracle pins every final
    per-chunk sum, and refresh == full-recompute equality is
    test-pinned."""

    def x04(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr import (
            chunk_stat_view,
            commit_version,
            refresh_chunk_stat_view,
        )

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_x04_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(hi, bump):
            v = F.when(
                (F.col("id") >= 16) & (F.col("id") < 32) & F.lit(bump),
                F.col("id") * 5,
            ).otherwise(F.col("id") * 3)
            return spark.range(0, hi).select(
                F.col("id").alias("k"), v.cast("double").alias("v")
            )

        write_zarr(tbl(64, False), path, chunk_rows=16)
        commit_version(spark, path, "v1")
        base = chunk_stat_view(spark, path, 1)
        write_zarr(tbl(112, True), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2")
        return refresh_chunk_stat_view(spark, path, base, 1, 2)

    register(
        "x04_incremental_view_refresh",
        x04,
        "WITH r AS (SELECT i, i // 16 AS c, "
        "CASE WHEN i >= 16 AND i < 32 THEN i * 5 ELSE i * 3 END AS v "
        "FROM range(112) t(i)) "
        "SELECT 'k' AS array, CAST(c AS VARCHAR) AS chunk_pos, "
        "CAST(COUNT(*) AS BIGINT) AS n_values, "
        "CAST(SUM(i) AS DOUBLE) AS value_sum FROM r GROUP BY c "
        "UNION ALL "
        "SELECT 'v', CAST(c AS VARCHAR), CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(v) AS DOUBLE) FROM r GROUP BY c",
    )


def populate_round7_scrub_queries(register) -> None:
    """z34: manifest scrub (zarr.scrub_zarr) — drift detection vs the
    committed baseline, no decode. The fixture tampers the live store
    three ways after committing (flip bytes in one chunk, delete
    another, plant a stray key); the literal oracle pins every status
    row, keyed by the store's deterministic key layout."""

    def z34(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr import commit_version, open_store, scrub_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z34_{token}"
        shutil.rmtree(path, ignore_errors=True)
        write_zarr(
            spark.range(0, 64).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            path,
            chunk_rows=16,
        )
        commit_version(spark, path, "baseline")
        st = open_store(path)
        st.set("v/c/2", b"\x00corrupted bytes\x00")  # bit-rot stand-in
        st.delete("k/c/3")  # lost object
        st.set("k/c/9", b"debris")  # uncommitted stray
        return scrub_zarr(spark, path).orderBy("key")

    register(
        "z34_manifest_scrub",
        z34,
        "SELECT k AS key, s AS status FROM (VALUES "
        "('k/c/0', 'ok'), ('k/c/1', 'ok'), ('k/c/2', 'ok'), "
        "('k/c/3', 'missing'), ('k/c/9', 'extra'), "
        "('k/zarr.json', 'ok'), "
        "('v/c/0', 'ok'), ('v/c/1', 'ok'), ('v/c/2', 'modified'), "
        "('v/c/3', 'ok'), ('v/zarr.json', 'ok'), "
        "('zarr.json', 'ok')) t(k, s) ORDER BY k",
    )


def populate_round7_interp_queries(register) -> None:
    """j07: linear-interpolation join — the timeseries-alignment
    operator (pandas merge_asof + interpolate, distributed; j02 is
    its nearest-point special case). One shuffle, zero joins: both
    brackets come from last-value windows over one exchange. The
    oracle composes DuckDB's two ASOF directions and replays the
    interpolation on exact integer microseconds — bit-identical
    arithmetic. The right side is pre-aggregated to one row per
    (user, ts) (MIN — order-free), the operator's documented
    uniqueness contract."""

    def j07(spark, sf_dir):
        from . import joins

        ensure_views(spark, sf_dir)
        ev = spark.table("events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        views = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts")
            .agg(F.min("value").alias("value"))
        )
        return joins.interpolation_join(
            clicks, views, on="ts", by=["user_id"]
        ).select("user_id", "click_id", "interp_value")

    register(
        "j07_interpolation_join",
        j07,
        "WITH l AS (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type = 'click'), "
        "r AS (SELECT user_id, ts, MIN(value) AS v FROM events "
        "WHERE event_type = 'view' GROUP BY 1, 2), "
        "p AS (SELECT l.user_id, l.event_id, l.ts, r.ts AS pt, "
        "r.v AS pv FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND r.ts <= l.ts), "
        "n AS (SELECT l.user_id, l.event_id, r.ts AS nt, r.v AS nv "
        "FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND r.ts >= l.ts) "
        "SELECT p.user_id, p.event_id AS click_id, "
        "CASE WHEN pt IS NOT NULL AND nt IS NOT NULL THEN "
        "CASE WHEN epoch_us(nt) = epoch_us(pt) THEN pv "
        "ELSE pv + (nv - pv) * "
        "(CAST(epoch_us(p.ts) AS DOUBLE) - CAST(epoch_us(pt) AS DOUBLE)) "
        "/ (CAST(epoch_us(nt) AS DOUBLE) - CAST(epoch_us(pt) AS DOUBLE)) "
        "END "
        "WHEN pt IS NOT NULL THEN pv "
        "WHEN nt IS NOT NULL THEN nv "
        "ELSE NULL END AS interp_value "
        "FROM p JOIN n ON p.user_id = n.user_id "
        "AND p.event_id = n.event_id",
    )


def populate_round7_rename_queries(register) -> None:
    """w16: ALTER RENAME COLUMN (io.rename_zarr_array) — completes
    the ALTER verb surface (w11 covers ADD/DROP). The driver row
    renames a data column AND a coordinate axis of the same store
    family and reads both back through the real scan: a protocol bug
    (stale cache, missed dimension_names rewrite, dropped chunk)
    flips rows. The crash-safe copy-first ordering is test-pinned in
    tests/test_writer.py::TestRenameArray."""

    def w16(spark, sf_dir):
        import shutil

        from ..io import rename_zarr_array, write_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w16_{token}"
        shutil.rmtree(path, ignore_errors=True)
        base = spark.range(0, 80).select(
            F.col("id").alias("k"),
            (F.col("id") * 3 % 7).cast("double").alias("v"),
        )
        write_zarr(base, path, chunk_rows=16)
        rename_zarr_array(path, "v", "score", spark=spark)
        return spark.read.format("zarr").load(path)

    register(
        "w16_rename_roundtrip",
        w16,
        "SELECT CAST(i AS BIGINT) AS k, "
        "CAST(i * 3 % 7 AS DOUBLE) AS score FROM range(80) t(i)",
    )


def populate_round7_stream_interp_queries(register) -> None:
    """e07: the streaming face of the interpolation join, checked in
    its batch form (the e05/e06 convention). interpolation_join's
    unbounded windows cannot run on a stream, so the streaming
    operator takes the stateless broadcast form — reference curve
    collected and broadcast, two searchsorted probes per row, no
    state, no watermark — and computes the SAME float expression on
    the same exact integer microseconds, so this row shares j07's
    oracle verbatim (modulo output projection).
    tests/test_streaming.py pins real-stream == batch == j07."""

    def e07(spark, sf_dir):
        from ..streaming.event_ops import streaming_interpolate

        ensure_views(spark, sf_dir)
        ev = spark.table("events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        views = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts")
            .agg(F.min("value").alias("value"))
        )
        return streaming_interpolate(
            clicks, views, on="ts", by=["user_id"]
        ).select("user_id", "click_id", "interp_value")

    register(
        "e07_stream_interp_batchform",
        e07,
        "WITH l AS (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type = 'click'), "
        "r AS (SELECT user_id, ts, MIN(value) AS v FROM events "
        "WHERE event_type = 'view' GROUP BY 1, 2), "
        "p AS (SELECT l.user_id, l.event_id, l.ts, r.ts AS pt, "
        "r.v AS pv FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND r.ts <= l.ts), "
        "n AS (SELECT l.user_id, l.event_id, r.ts AS nt, r.v AS nv "
        "FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND r.ts >= l.ts) "
        "SELECT p.user_id, p.event_id AS click_id, "
        "CASE WHEN pt IS NOT NULL AND nt IS NOT NULL THEN "
        "CASE WHEN epoch_us(nt) = epoch_us(pt) THEN pv "
        "ELSE pv + (nv - pv) * "
        "(CAST(epoch_us(p.ts) AS DOUBLE) - CAST(epoch_us(pt) AS DOUBLE)) "
        "/ (CAST(epoch_us(nt) AS DOUBLE) - CAST(epoch_us(pt) AS DOUBLE)) "
        "END "
        "WHEN pt IS NOT NULL THEN pv "
        "WHEN nt IS NOT NULL THEN nv "
        "ELSE NULL END AS interp_value "
        "FROM p JOIN n ON p.user_id = n.user_id "
        "AND p.event_id = n.event_id",
    )


def populate_round7_plandoctor_queries(register) -> None:
    """z35: the plan doctor (plan_doctor.plan_report) — the project's
    plan-contract checklist as a user-facing operator, driver-checked
    on a fixed probe plan (broadcast equi-join + aggregate over an
    in-memory range: independent of sf_dir, so the report is a
    deterministic literal). The checklist itself is what the repo's
    30+ plan-contract tests assert operator-by-operator: cartesians,
    NLJs, row-at-a-time Python, shuffle budget, join strategies,
    codegen spans, unpushed parquet scans."""

    def z35(spark, sf_dir):
        from ..plan_doctor import plan_report

        a = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        )
        b = spark.range(0, 7).select(
            F.col("id").alias("g"), (F.col("id") * 10).alias("w")
        )
        probe = a.join(F.broadcast(b), "g").groupBy("g").agg(
            F.sum("k").alias("s")
        )
        return plan_report(probe)

    register(
        "z35_plan_doctor",
        z35,
        "SELECT c AS check, CAST(v AS BIGINT) AS value, ok FROM "
        "(VALUES ('cartesian_product', 0, TRUE), "
        "('broadcast_nested_loop_join', 0, TRUE), "
        "('python_row_udf', 0, TRUE), "
        "('arrow_python_eval', 0, TRUE), "
        "('exchange', 1, TRUE), "
        "('broadcast_hash_join', 1, TRUE), "
        "('sort_merge_join', 0, TRUE), "
        "('wholestage_codegen', 0, TRUE), "
        "('filescan_without_pushed_filters', 0, TRUE)) t(c, v, ok)",
    )


def populate_round7_repair_queries(register) -> None:
    """z36: scrub-then-repair (zarr.repair_zarr) — detect drift
    against the committed baseline and self-heal ONLY the damaged
    keys from the content store, then prove the result through the
    real read path. A repair that misses a damaged key, restores the
    wrong bytes, or touches the stray key flips rows. The receipt's
    damage-proportionality and the vacuumed-history guidance error
    are pinned in tests/test_versions.py::TestRepair."""

    def z36(spark, sf_dir):
        import shutil

        from ..io import write_zarr
        from ..zarr import commit_version, open_store, repair_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z36_{token}"
        shutil.rmtree(path, ignore_errors=True)
        base = spark.range(0, 96).select(
            F.col("id").alias("k"),
            (F.col("id") * 5 % 11).cast("double").alias("v"),
        )
        write_zarr(base, path, chunk_rows=16)
        commit_version(spark, path, "baseline")
        st = open_store(path)
        st.set("v/c/2", b"\x00rot\x00")
        st.delete("k/c/4")
        info = repair_zarr(spark, path)
        rep = spark.read.format("zarr").load(path)
        return rep.withColumn(
            "n_repaired", F.lit(int(info["n_repaired"])).cast("long")
        )

    register(
        "z36_scrub_repair_scan",
        z36,
        "SELECT CAST(i AS BIGINT) AS k, "
        "CAST(i * 5 % 11 AS DOUBLE) AS v, "
        "CAST(2 AS BIGINT) AS n_repaired FROM range(96) t(i)",
    )


def populate_round8_phash64_queries(register) -> None:
    """m08: production-width perceptual near-dup — 64-bit dHash over
    the deterministic 9x8 thumbnail, four 16-bit bands (pigeonhole-
    exact recall at hamming <= 3), first-band no-distinct dedup,
    exact bit_count verify. The hash rides as two non-negative 32-bit
    halves so every expression stays in exact integer arithmetic in
    both engines (bit 63 would wrap a signed BIGINT). The oracle
    rebuilds the thumbnail from the m02 px_micro replay (72 spans),
    derives all 64 gradient bits, and replays the band joins and the
    per-half xor/bit_count verify — the full pipeline is
    bit-replayable. This is m07's documented scale path (its 24-bit
    hash saturates ~10^4 images; band occupancy at 10^5 is pinned in
    tests/test_operators.py). Reference context: none — the
    reference has no similarity surface."""

    def m08(spark, sf_dir):
        return multimodal.phash64_near_dup_pairs(
            _docs(spark, sf_dir), max_hamming=3
        )

    register("m08_phash64_near_dup", m08, _phash64_oracle_sql())


def _phash64_oracle_sql() -> str:
    """The FULL-pipeline phash64 near-dup replay (m02 px_micro
    thumbnail rebuild, all 64 dHash gradient bits, the four-band
    first-matching-band candidate union, per-half xor/bit_count
    verify at hamming <= 3) — ONE definition serving both m08
    (inline phash64_near_dup_pairs) and m09 (the same query against a
    PERSISTED index store): codes are deterministic JVM expressions,
    so the two Spark paths must be row-identical and share this
    oracle (the s08/x05 shared-tail pattern)."""
    # the 64 dHash bits over the 1-indexed 72-pixel row-major array,
    # exactly the bit layout of multimodal.perceptual_hash64:
    # bit r*8+c set iff arr[r*9+c] < arr[r*9+c+1] (0-indexed)
    lo_terms, hi_terms = [], []
    for r in range(8):
        for c in range(8):
            bi = r * 8 + c
            term = (
                f"CASE WHEN arr[{r * 9 + c + 1}] < arr[{r * 9 + c + 2}] "
                f"THEN {1 << (bi % 32)} ELSE 0 END"
            )
            (lo_terms if bi < 32 else hi_terms).append(term)
    lo_expr = " + ".join(lo_terms)
    hi_expr = " + ".join(hi_terms)

    arms = []
    for i in range(4):
        conds = [f"a.b{i} = b.b{i}", "a.media_id < b.media_id"]
        conds += [f"a.b{j} <> b.b{j}" for j in range(i)]
        arms.append(
            "SELECT a.media_id AS ia, b.media_id AS ib, "
            "a.lo AS la, b.lo AS lb, a.hi AS ha, b.hi AS hb "
            f"FROM hb a JOIN hb b ON {' AND '.join(conds)}"
        )

    return (
        "WITH d AS (SELECT doc_id, text, length(text) AS n "
        "FROM documents WHERE length(text) > 0), "
        "s AS (SELECT doc_id, text, n, CAST(i AS INT) AS px_idx, "
        "CASE WHEN i < n % 72 THEN n // 72 + 1 ELSE n // 72 END "
        "AS span_len, "
        "CASE WHEN i < n % 72 THEN i * (n // 72 + 1) "
        "ELSE (n % 72) * (n // 72 + 1) + (i - n % 72) * (n // 72) "
        "END AS span_start FROM d, range(72) t(i)), "
        "px AS (SELECT doc_id AS media_id, px_idx, "
        "CASE WHEN span_len = 0 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(round_even(list_sum(list_transform(string_split("
        "substr(text, span_start + 1, span_len), ''), "
        "c -> CAST(ascii(c) AS DOUBLE))) / span_len * 1000000.0, 0) "
        "AS BIGINT) END AS pm FROM s), "
        "t AS (SELECT media_id, list(pm ORDER BY px_idx) AS arr "
        "FROM px GROUP BY media_id), "
        f"h AS (SELECT media_id, {lo_expr} AS lo, {hi_expr} AS hi "
        "FROM t), "
        "hb AS (SELECT media_id, lo, hi, lo % 65536 AS b0, "
        "lo // 65536 AS b1, hi % 65536 AS b2, hi // 65536 AS b3 "
        "FROM h), "
        f"cand AS ({' UNION ALL '.join(arms)}) "
        "SELECT ia AS id_a, ib AS id_b, "
        "CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) "
        "AS BIGINT) AS hamming "
        "FROM cand "
        "WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3"
    )


def _binary_topk_oracle_sql() -> str:
    """The FULL-pipeline binary-quantization replay (sign words,
    per-word xor/bit_count hamming, shortlist-128 window, exact
    rerank, top-5) — ONE definition serving both s08 (in-memory
    binary_ann) and x05 (persisted-index query): the two Spark paths
    share one tail (similarity._hamming_shortlist_rerank), so one
    oracle string is the point, not a convenience — divergent copies
    could silently stop pinning the "results are IDENTICAL" claim."""

    def words(alias):
        out = []
        for w in range(2):
            terms = " + ".join(
                f"CASE WHEN embedding[{32 * w + b + 1}] >= 0 "
                f"THEN {1 << b} ELSE 0 END"
                for b in range(32)
            )
            out.append(f"({terms}) AS {alias}w{w}")
        return ", ".join(out)

    return (
        "WITH cenc AS (SELECT vec_id AS neighbor_id, "
        f"{words('c')} FROM embeddings), "
        "qenc AS (SELECT vec_id AS query_id, "
        f"{words('q')} FROM embeddings WHERE vec_id < 20), "
        "scored AS (SELECT query_id, neighbor_id, "
        "bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)) AS h "
        "FROM qenc, cenc WHERE query_id <> neighbor_id), "
        "short AS (SELECT query_id, neighbor_id FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY h, neighbor_id) AS hrank FROM scored) "
        "WHERE hrank <= 128), "
        "resc AS (SELECT s.query_id, s.neighbor_id, "
        "ROUND(list_cosine_similarity("
        "CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])"
        "), 6) AS cosine FROM short s "
        "JOIN embeddings q ON q.vec_id = s.query_id "
        "JOIN embeddings c ON c.vec_id = s.neighbor_id), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM resc) "
        "SELECT query_id, neighbor_id, cosine, "
        "CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"
    )


def populate_round8_binary_ann_queries(register) -> None:
    """s08: binary-quantization ANN — 1-bit sign codes (32x memory
    compression), JVM-only hamming shortlist, exact cosine rerank.
    The only ANN variant with no Python worker anywhere; the oracle
    replays the ENTIRE pipeline (sign words, per-word xor/bit_count
    hamming, shortlist window, rerank) so the shortlist gate itself
    is hash-verified, not just the final ranking. Reference context:
    none (the reference has no similarity surface) — north-star
    scope, the BQ/rerank shape production vector stores use."""

    def s08(spark, sf_dir):
        embs = _embs(spark, sf_dir)
        out = similarity.binary_ann(
            embs, embs.filter(F.col("vec_id") < 20), k=5, shortlist=128
        )
        return out.withColumn("rank", F.col("rank").cast("long"))

    register(
        "s08_binary_ann_topk",
        s08,
        _binary_topk_oracle_sql(),
    )


def populate_round8_vector_index_queries(register) -> None:
    """x05: persisted binary vector index — build (JVM sign-code
    encode -> the engine's own zarr writer) then query (code-store
    scan for the hamming shortlist, broadcast exact rerank against
    the raw table). Codes are deterministic, so results are
    IDENTICAL to s08's in-memory form and the oracle is the same
    full-pipeline SQL replay — which therefore hash-verifies the
    index write/read roundtrip as well as the ANN math."""

    def x05(spark, sf_dir):
        from .vector_index import build_binary_index, query_binary_index

        embs = _embs(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        idx = f"/tmp/arrow_zarr_spark_x05_idx_{token}"
        build_binary_index(embs, idx, mode="overwrite")
        out = query_binary_index(
            spark, idx, embs, embs.filter(F.col("vec_id") < 20),
            k=5, shortlist=128,
        )
        return out.withColumn("rank", F.col("rank").cast("long"))

    register(
        "x05_binary_index_roundtrip",
        x05,
        _binary_topk_oracle_sql(),
    )


def populate_round8_split_queries(register) -> None:
    """x06: leakage-safe train/val/test split — the p07 hash split
    lifted to NEAR-DUP GROUPS (connected components of the exact
    trigram-Jaccard graph at 0.7), so a near-duplicate of a test
    document can never land in train. The oracle chains d07's
    recursive-CTE component computation with p07's integer-draw
    split arithmetic on the component id — the whole
    group-then-split pipeline is hash-verified end to end."""

    def x06(spark, sf_dir):
        from .dedup import ngram_jaccard_pairs
        from .pipelines import leakage_safe_split

        # the EXACT trigram-Jaccard generator is pinned explicitly:
        # the registered oracle below replays exact pairs, while the
        # function's size-adaptive default switches to LSH candidates
        # (recall ≈ 0.988/pair) past exact_max_docs — on a >4096-doc
        # corpus that could drop an edge and change a component, so
        # defaults here would make this row nondeterministic at scale
        # (r10 ADVICE). The adaptive default is exercised by the
        # rows-only x08 entry instead.
        docs = _docs(spark, sf_dir)
        return leakage_safe_split(
            docs, pairs=ngram_jaccard_pairs(docs, threshold=0.7)
        )

    register(
        "x06_leakage_safe_split",
        x06,
        _leakage_split_oracle_sql(),
    )


def populate_round9_queries(register) -> None:
    """Round-9 additions: d19 (directional shingle containment — the
    near-subset detector symmetric Jaccard misses), j08 (nearest
    temporal join — merge_asof direction='nearest', the sensor-
    alignment join), x07 (dataset card — the per-stratum corpus
    report a training-data release ships). All three claim the
    round-9 window's reserved slots in the same round (the r8
    discipline, so no z36-style gap recurs)."""

    def d19(spark, sf_dir):
        return dedup.containment_pairs(_docs(spark, sf_dir), threshold=0.3)

    register(
        "d19_containment_pairs",
        d19,
        "WITH "
        + _TRI_CTE
        + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2)"
        ", dirs AS (SELECT id_a, id_b, shared FROM shared"
        "  UNION ALL SELECT id_b, id_a, shared FROM shared) "
        "SELECT * FROM ("
        "  SELECT dirs.id_a, dirs.id_b,"
        "  ROUND(shared * 1.0 / s.n_sh, 6) AS containment"
        "  FROM dirs JOIN sizes s ON s.doc_id = dirs.id_a"
        ") WHERE containment >= 0.3",
    )

    def j08(spark, sf_dir):
        from . import joins

        ensure_views(spark, sf_dir)
        events = spark.table("events")
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        views = events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id", "value"
        )
        out = joins.nearest_join(clicks, views, on="ts", by=["user_id"])
        return out.select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("view_id"),
            F.col("r_value").alias("view_value"),
        )

    # the oracle composes DuckDB's native ASOF in BOTH directions and
    # picks the nearer side (ties to the backward/earlier row —
    # pandas's direction='nearest' rule, mirrored by the operator)
    _near = (
        "CASE WHEN b.ts IS NULL AND f.ts IS NULL THEN NULL "
        "WHEN f.ts IS NULL THEN b.{c} WHEN b.ts IS NULL THEN f.{c} "
        "WHEN (l.ts - b.ts) <= (f.ts - l.ts) THEN b.{c} "
        "ELSE f.{c} END"
    )
    register(
        "j08_nearest_join",
        j08,
        "SELECT l.user_id AS user_id, l.event_id AS click_id, "
        + _near.format(c="event_id")
        + " AS view_id, "
        + _near.format(c="value")
        + " AS view_value "
        "FROM (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type = 'click') l "
        "ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events "
        "WHERE event_type = 'view') b "
        "ON l.user_id = b.user_id AND b.ts <= l.ts "
        "ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events "
        "WHERE event_type = 'view') f "
        "ON l.user_id = f.user_id AND f.ts >= l.ts",
    )

    def x07(spark, sf_dir):
        from .pipelines import dataset_card

        return dataset_card(_docs(spark, sf_dir))

    register(
        "x07_dataset_card",
        x07,
        "SELECT lang, source, COUNT(*) AS n_docs, "
        "COUNT(*) - COUNT(DISTINCT text) AS n_dup_docs, "
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) "
        "AS total_tokens, "
        "ROUND(AVG(LENGTH(text)), 6) AS avg_chars, "
        "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY LENGTH(text)) "
        "AS median_chars "
        "FROM documents GROUP BY lang, source",
    )


def populate_round10_maint_queries(register) -> None:
    """r10: the distributed-maintenance tier proven through the read
    path (z37) and the grid APPEND's distributed stats remap proven
    through a stats-pruned scan (w17). Both claim reserved
    DRIVER_WINDOW slots (the r8/r9 displacement discipline)."""

    def z37(spark, sf_dir):
        # z37: version GC + scrub atop the r10 DISTRIBUTED
        # maintenance listing. Commit v1, overwrite + commit v2, then
        # vacuum keep_last=1 and scrub — with the tier cutover forced
        # to 0, so the referenced-sha set, the per-shard object
        # listing, the guarded sweep, and the scrub's status join all
        # run as Spark jobs (no driver key list anywhere). The scan
        # after proves the kept version's bytes survived GC intact;
        # the receipt columns pin that v1 was dropped, its objects
        # were actually collected, and the scrub found zero drift.
        # grace_seconds=0 is the documented quiesced-store mode (the
        # grace-window guards are pinned in
        # tests/test_versions_gc_concurrency.py and
        # tests/test_maint_distributed.py).
        import shutil

        from ..io import write_zarr
        from ..zarr import commit_version, vacuum_versions
        from ..zarr import versions as V
        from ..zarr.versions import scrub_zarr

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z37_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def tbl(lo, hi, mul):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") * mul).cast("double").alias("d"),
            )

        write_zarr(tbl(0, 96, 3), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1")
        write_zarr(tbl(0, 64, -5), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2")
        prev = V.MAINT_DRIVER_LIST_MAX
        V.MAINT_DRIVER_LIST_MAX = 0
        try:
            out = vacuum_versions(
                path, keep_last=1, grace_seconds=0, spark=spark
            )
            n_bad = (
                scrub_zarr(spark, path)
                .where("status <> 'ok'")
                .count()
            )
        finally:
            V.MAINT_DRIVER_LIST_MAX = prev
        df = spark.read.format("zarr").load(path)
        return df.select(
            "k",
            "d",
            F.lit(len(out["dropped_versions"])).cast("long").alias(
                "n_dropped"
            ),
            F.lit(1 if out["deleted_objects"] > 0 else 0)
            .cast("long")
            .alias("gc_flag"),
            F.lit(n_bad).cast("long").alias("scrub_bad"),
        )

    register(
        "z37_vacuum_scrub_scan",
        z37,
        "SELECT CAST(i AS BIGINT) AS k, CAST(i * -5 AS DOUBLE) AS d, "
        "CAST(1 AS BIGINT) AS n_dropped, CAST(1 AS BIGINT) AS gc_flag, "
        "CAST(0 AS BIGINT) AS scrub_bad FROM range(64) t(i)",
    )

    def w17(spark, sf_dir):
        # w17: grid APPEND with the r10 DISTRIBUTED stats remap,
        # proven by a stats-pruned scan. STATS_MAX_OBJECTS drops to 4
        # so both writes cross the inline cap: the create assembles
        # sidecar blocks distributed (r9) and the unaligned append
        # routes through _assemble_grid_append_stats_sidecar — old
        # ordinals remapped to the grown grid as a keys-only Spark
        # job (mixed-radix arithmetic, io.py). The filter selects
        # only the appended region, so a remap that misplaced or
        # widened a bound flips rows (wrong prune = missing rows;
        # stats are upper/lower bounds so extra rows are impossible
        # without data corruption).
        import shutil

        from .. import io as io_mod
        from ..io import write_zarr_grid

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w17_{token}"
        shutil.rmtree(path, ignore_errors=True)

        def gdf(t0, t1):
            return (
                spark.range(t0, t1)
                .selectExpr("id as t")
                .crossJoin(spark.range(0, 6).selectExpr("id as x"))
                .select(
                    "t",
                    "x",
                    (F.col("t") * 1000 + F.col("x") * 7)
                    .cast("double")
                    .alias("v"),
                )
            )

        prev = io_mod.STATS_MAX_OBJECTS
        io_mod.STATS_MAX_OBJECTS = 4
        try:
            write_zarr_grid(
                gdf(0, 10), path, dims=["t", "x"], chunk_shape=(4, 3),
                mode="overwrite",
            )
            # unaligned append (10 % 4 != 0): boundary chunk merges,
            # boundary cell stats union, old cells remap
            write_zarr_grid(
                gdf(10, 17), path, dims=["t", "x"], chunk_shape=(4, 3),
                mode="append", append_dim="t",
            )
        finally:
            io_mod.STATS_MAX_OBJECTS = prev
        df = spark.read.format("zarr").load(path)
        # v >= 12000 <=> t >= 12 (x*7 <= 35): every pre-append chunk
        # and the merged boundary chunk prune on the remapped stats
        return df.filter(F.col("v") >= 12000)

    register(
        "w17_grid_append_stats_pruned_scan",
        w17,
        "SELECT r1.range AS t, r2.range AS x, "
        "CAST(r1.range * 1000 + r2.range * 7 AS DOUBLE) AS v "
        "FROM range(0, 17) r1, range(0, 6) r2 "
        "WHERE r1.range * 1000 + r2.range * 7 >= 12000",
    )


def populate_round10_phash_index_queries(register) -> None:
    """m09: the persisted phash64 index (r9 verdict item 5 — m08 was
    the most expensive bench entry two rounds running because it pays
    the Arrow decode + dHash pass and four band joins every run).
    build_phash64_index persists the codes + band columns in the
    engine's own zarr format ONCE; the query path scans 7 small
    integer columns. Codes are deterministic JVM expressions, so the
    indexed query is row-identical to m08 and SHARES its
    full-pipeline DuckDB replay as oracle (the s08/x05 shared-tail
    pattern) — the roundtrip through the index store is exactly what
    the hash check verifies."""

    def m09(spark, sf_dir):
        import shutil

        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_m09_{token}"
        shutil.rmtree(path, ignore_errors=True)
        multimodal.build_phash64_index(_docs(spark, sf_dir), path)
        return multimodal.phash64_near_dup_pairs_indexed(
            spark, path, max_hamming=3
        )

    register(
        "m09_phash64_index_near_dup",
        m09,
        _phash64_oracle_sql(),
    )


def populate_round11_queries(register) -> None:
    """Round-11 oracle graduations (VERDICT r10 items 5+6) — two
    entries leave the rows-only set:

    t05: the greedy first-fit packer is deterministic and sequential
    per corpus shard, exactly the shape a DuckDB recursive CTE can
    replay — the walk carries (pack_after, filled_after) across the
    id-ordered rows of each group and reproduces the budget
    arithmetic bit-for-bit (the r48 WITH RECURSIVE precedent).

    x08: the size-adaptive split's LSH candidate route shares x06's
    oracle — every candidate is exact-verified at the same
    threshold, and on this corpus no true edge escapes the banding
    (see _leakage_split_oracle_sql for the argument), so the split
    is bit-identical to the exact path's, every run."""

    def t05(spark, sf_dir):
        from .packing import pack_sequences

        return pack_sequences(_docs(spark, sf_dir), max_tokens=256)

    register(
        "t05_pack_sequences",
        t05,
        "WITH RECURSIVE "
        "base AS ("
        "  SELECT source, doc_id,"
        "    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,"
        "    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn"
        "  FROM documents), "
        "walk AS ("
        "  SELECT source, rn, doc_id, n_tokens,"
        "    CAST(0 AS BIGINT) AS pack_id,"
        "    CASE WHEN n_tokens >= 256 THEN CAST(1 AS BIGINT)"
        "         ELSE CAST(0 AS BIGINT) END AS pack_after,"
        "    CASE WHEN n_tokens >= 256 THEN CAST(0 AS BIGINT)"
        "         ELSE n_tokens END AS filled_after"
        "  FROM base WHERE rn = 1"
        "  UNION ALL"
        "  SELECT source, rn, doc_id, n_tokens, pack_id,"
        "    CASE WHEN filled_mid >= 256 THEN pack_id + 1"
        "         ELSE pack_id END AS pack_after,"
        "    CASE WHEN filled_mid >= 256 THEN 0"
        "         ELSE filled_mid END AS filled_after"
        "  FROM ("
        "    SELECT b.source, b.rn, b.doc_id, b.n_tokens,"
        "      CASE WHEN w.filled_after > 0"
        "            AND w.filled_after + b.n_tokens > 256"
        "           THEN w.pack_after + 1 ELSE w.pack_after END AS pack_id,"
        "      CASE WHEN w.filled_after > 0"
        "            AND w.filled_after + b.n_tokens > 256"
        "           THEN b.n_tokens"
        "           ELSE w.filled_after + b.n_tokens END AS filled_mid"
        "    FROM walk w JOIN base b"
        "      ON b.source = w.source AND b.rn = w.rn + 1)) "
        "SELECT source, pack_id, doc_id, n_tokens,"
        "  CAST(SUM(n_tokens) OVER (PARTITION BY source, pack_id)"
        "    AS BIGINT) AS pack_tokens,"
        "  CAST(COUNT(*) OVER (PARTITION BY source, pack_id) AS BIGINT)"
        "    AS pack_docs "
        "FROM walk",
    )

    def x08(spark, sf_dir):
        from .pipelines import leakage_safe_split

        # the SIZE-ADAPTIVE default path (split out of x06 in r10):
        # exact_max_docs=0 forces the MinHash-LSH candidate route on
        # any corpus, so the scale path itself gets an oracle-checked
        # driver row against the exact-graph replay.
        return leakage_safe_split(
            _docs(spark, sf_dir), exact_max_docs=0
        )

    register(
        "x08_leakage_split_adaptive",
        x08,
        _leakage_split_oracle_sql(),
    )


# ---------------------------------------------------------------------
# Round 12: the crc32 replay — d03/d05 graduate with their PRODUCTION
# kernels unchanged.
# ---------------------------------------------------------------------

def _crc32_table_sql() -> str:
    """The standard CRC-32 (IEEE 802.3, poly 0xEDB88320 reflected)
    byte table as a DuckDB BIGINT[256] literal — the same table zlib
    consults, generated here from the polynomial so the oracle string
    carries no copied constants."""
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tbl.append(c)
    return "[" + ",".join(str(c) for c in tbl) + "]::BIGINT[]"


def _crc32_sql(s: str) -> str:
    """zlib.crc32 of the ASCII string expression ``s`` in pure DuckDB
    SQL: byte-table CRC via ``list_reduce`` over the character codes,
    init/final xor 0xFFFFFFFF. Requires a cross-joined CTE exposing
    the :func:`_crc32_table_sql` list as ``tb``. Bit-for-bit equal to
    zlib on ASCII input (the synthetic corpus is pure ASCII at every
    SF — re-checked r12: length(text) == strlen(text) on every row)."""
    # parenthesize: for a compound operand like "w || '#'" the
    # subscript would otherwise bind to the literal ('#'[i]), not the
    # concatenation — caught by the r12 vocab-level zlib comparison
    return (
        "xor(list_reduce([4294967295::BIGINT] || "
        f"list_transform(range(1, length(({s}))+1), i -> ascii(({s})[i])), "
        "(c, b) -> xor(c >> 8, tb[(xor(c, b) & 255) + 1])), 4294967295)"
    )


def _minhash_lsh_oracle_sql(
    n_hashes: int = 64, bands: int = 16, threshold: float = 0.05
) -> str:
    """Replay of dedup.minhash_lsh_pairs' ENTIRE pipeline — crc32
    shingle hashes (_crc32_sql), the 64 universal-hash permutation
    minima, 16-band signature strings, the band equi-join, and the
    exact-Jaccard verify — in one DuckDB statement. No corpus
    assumption: unlike x08's escape-probability argument this is
    bit-for-bit at ANY threshold, because the engine-specific part
    (crc32) is itself replayed."""
    from . import dedup as _dd

    a, b = _dd._hash_params(n_hashes, 42)
    rows_per_band = n_hashes // bands
    m31 = 2147483647
    mins = ", ".join(
        f"MIN((h * {int(a[i])} + {int(b[i])}) % {m31}) AS mh_{i}"
        for i in range(n_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {sig} AS sig FROM sigs".format(
            bi=bi,
            sig="||','||".join(
                f"CAST(mh_{bi * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    return (
        f"WITH crct AS (SELECT {_crc32_table_sql()} AS tb), "
        + _TRI_CTE
        + ", dsh AS (SELECT DISTINCT sh FROM tri)"
        f", shh AS (SELECT sh, ({_crc32_sql('sh')}) % {m31} AS h "
        "FROM dsh, crct)"
        ", trih AS (SELECT t.doc_id, s.h FROM tri t JOIN shh s USING (sh))"
        f", sigs AS (SELECT doc_id, {mins} FROM trih GROUP BY doc_id)"
        f", bands AS ({band_selects})"
        ", cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b"
        "  FROM bands l JOIN bands r ON l.band = r.band"
        "  AND l.sig = r.sig AND l.doc_id < r.doc_id)"
        ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2) "
        "SELECT id_a, id_b, j AS jaccard FROM ("
        "  SELECT c.id_a, c.id_b,"
        "  ROUND(s.shared * 1.0 / (sa.n_sh + sb.n_sh - s.shared), 6) AS j"
        "  FROM cand c JOIN shared s ON s.id_a = c.id_a AND s.id_b = c.id_b"
        "  JOIN sizes sa ON sa.doc_id = c.id_a"
        f"  JOIN sizes sb ON sb.doc_id = c.id_b) WHERE j >= {threshold}"
    )


def _simhash64_oracle_sql() -> str:
    """Replay of dedup._simhash64 — the 64-bit crc32-pair SimHash —
    in one DuckDB statement: per-VOCAB-word crc32(w) / crc32(w||'#')
    (the kernel's factorize-once shape), ±1 votes per token
    OCCURRENCE, strict sign per bit, the sign bit composed as
    (-2**63) so the BIGINT result equals the kernel's uint64→int64
    reinterpretation. Grouping then replays simhash_dedup."""
    bit_terms = []
    for j in range(64):
        src = f"(c2 >> {j})" if j < 32 else f"(c1 >> {j - 32})"
        bit_terms.append(
            f"SUM(CASE WHEN {src} & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        )
    votes = ", ".join(bit_terms)
    comp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(63)
    ) + " + (CASE WHEN s63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)"
    c1_expr = _crc32_sql("w")
    c2_expr = _crc32_sql("w || '#'")
    # Degenerate docs mirror the kernel exactly (r13 ADVICE fix): an
    # empty or NULL text emits signature 0 in _simhash64, so those
    # doc_ids are EXCLUDED from tokenization (DuckDB's
    # string_split('', ' ') would otherwise vote crc32('')/crc32('#'))
    # and UNIONed back with simhash = 0.
    return (
        f"WITH crct AS (SELECT {_crc32_table_sql()} AS tb), "
        "toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w"
        "  FROM documents WHERE text IS NOT NULL AND text <> ''), "
        "vocab AS (SELECT DISTINCT w FROM toks), "
        f"vh AS (SELECT w, {c1_expr} AS c1, {c2_expr} AS c2 "
        "FROM vocab, crct), "
        "tv AS (SELECT t.doc_id, v.c1, v.c2 FROM toks t JOIN vh v USING (w)), "
        f"acc AS (SELECT doc_id, {votes} FROM tv GROUP BY doc_id), "
        f"sig AS (SELECT doc_id, CAST({comp} AS BIGINT) AS simhash FROM acc "
        "UNION ALL SELECT doc_id, CAST(0 AS BIGINT) AS simhash "
        "FROM documents WHERE text IS NULL OR text = '') "
        "SELECT simhash, MIN(doc_id) AS doc_id, COUNT(*) AS n_docs "
        "FROM sig GROUP BY simhash"
    )


def populate_round12_queries(register) -> None:
    """Round-12 oracle graduations (VERDICT r11 item 5) — the last
    two rows-only dedup kernels leave the rows-only set, and both
    keep their PRODUCTION kernels unchanged (the verdict's suggested
    construction — a seeded corpus where banding provably loses
    nothing — turned out to be beatable: the engine-specific crc32
    hash itself is replayable in DuckDB as a 256-entry byte-table
    ``list_reduce``, so the oracle is bit-for-bit at any threshold,
    with NO corpus assumption).

    d03: minhash_lsh_pairs at its long-standing jaccard_threshold of
    0.05 — signatures, bands, candidate join, and exact verify all
    replayed (see _minhash_lsh_oracle_sql).

    d05: simhash_dedup — the crc32-pair 64-bit signature replayed
    bit-for-bit including the uint64→int64 sign reinterpretation
    (see _simhash64_oracle_sql).

    Rows-only is now r26 alone (approximate aggregates — engine-
    specific by nature, correctly rows-only forever)."""

    def d03(spark, sf_dir):
        return dedup.minhash_lsh_pairs(
            _docs(spark, sf_dir), jaccard_threshold=0.05
        )

    register(
        "d03_minhash_lsh_pairs",
        d03,
        _minhash_lsh_oracle_sql(),
    )

    def d05(spark, sf_dir):
        return dedup.simhash_dedup(_docs(spark, sf_dir))

    register(
        "d05_simhash_dedup",
        d05,
        _simhash64_oracle_sql(),
    )


def _minhash_index_oracle_sql(
    n_hashes: int = 64, bands: int = 16, threshold: float = 0.05
) -> str:
    """d20's oracle: the d03 crc32 replay extended to the CROSS-split
    band join — signatures for every doc from the replayed crc32
    shingle hashes, the batch split (doc_id % 10 = 0) banded against
    the corpus split, exact-Jaccard verify on the candidates. The
    Spark side reads corpus signatures from the persisted index
    store; the oracle recomputes them from text — equal because
    build_minhash_index persists exactly the production kernel's
    output (pinned in tests/test_minhash_index.py)."""
    from . import dedup as _dd

    a, b = _dd._hash_params(n_hashes, 42)
    rows_per_band = n_hashes // bands
    m31 = 2147483647
    mins = ", ".join(
        f"MIN((h * {int(a[i])} + {int(b[i])}) % {m31}) AS mh_{i}"
        for i in range(n_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {sig} AS sig FROM sigs".format(
            bi=bi,
            sig="||','||".join(
                f"CAST(mh_{bi * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    return (
        f"WITH crct AS (SELECT {_crc32_table_sql()} AS tb), "
        + _TRI_CTE
        + ", dsh AS (SELECT DISTINCT sh FROM tri)"
        f", shh AS (SELECT sh, ({_crc32_sql('sh')}) % {m31} AS h "
        "FROM dsh, crct)"
        ", trih AS (SELECT t.doc_id, s.h FROM tri t JOIN shh s USING (sh))"
        f", sigs AS (SELECT doc_id, {mins} FROM trih GROUP BY doc_id)"
        f", bands AS ({band_selects})"
        ", cand AS (SELECT DISTINCT n.doc_id AS id_new,"
        "  c.doc_id AS id_corpus"
        "  FROM bands n JOIN bands c ON n.band = c.band"
        "  AND n.sig = c.sig"
        "  WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0)"
        ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id)"
        ", shared AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared"
        "  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2) "
        "SELECT id_new, id_corpus, j AS jaccard FROM ("
        "  SELECT c.id_new, c.id_corpus,"
        "  ROUND(s.shared * 1.0 / (sa.n_sh + sb.n_sh - s.shared), 6) AS j"
        "  FROM cand c JOIN shared s"
        "  ON s.id_a = LEAST(c.id_new, c.id_corpus)"
        "  AND s.id_b = GREATEST(c.id_new, c.id_corpus)"
        "  JOIN sizes sa ON sa.doc_id = c.id_new"
        f"  JOIN sizes sb ON sb.doc_id = c.id_corpus) WHERE j >= {threshold}"
    )


def populate_round12_index_queries(register) -> None:
    """d20: incremental dedup against a PERSISTED MinHash signature
    index (operators/minhash_index.py) — the x05/m09 persisted-index
    pattern applied to the ingest-dedup flow. The registered query
    builds the index store from the corpus split (a batch job in
    production; deterministic, so the build is idempotent), then
    answers the batch query from the SIGNATURE STORE — the corpus
    text is never re-shingled; only exact-verify candidates touch it.
    Oracle: the full crc32 replay across the split
    (_minhash_index_oracle_sql)."""

    def d20(spark, sf_dir):
        import tempfile

        from .minhash_index import build_minhash_index, query_minhash_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        token = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        path = tempfile.gettempdir() + f"/azs_d20_{token}/idx"
        build_minhash_index(corpus, path)
        return query_minhash_index(
            spark, path, batch, corpus=corpus, jaccard_threshold=0.05
        )

    register(
        "d20_minhash_index_dedup",
        d20,
        _minhash_index_oracle_sql(),
    )

    def d21(spark, sf_dir):
        """d21 (r13): the d20 flow through the INCREMENTAL path —
        the index is built on the corpus MINUS its id tail, then
        extend_minhash_index appends the tail's signatures (boundary-
        chunk merge, delta ids above the stored max), and the same
        batch query runs against the extended store. The oracle is
        EXACTLY d20's full crc32 replay: extend == rebuild is
        byte-pinned in tests/test_minhash_index.py, so the extended
        index must answer identically to one built on the full
        corpus."""
        import shutil
        import tempfile

        from .minhash_index import (
            build_minhash_index,
            extend_minhash_index,
            query_minhash_index,
        )

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        cut = int(corpus.agg(F.max("doc_id")).first()[0]) * 3 // 4
        token = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        path = tempfile.gettempdir() + f"/azs_d21_{token}/idx"
        shutil.rmtree(path, ignore_errors=True)
        build_minhash_index(corpus.filter(F.col("doc_id") < cut), path)
        extend_minhash_index(
            corpus.filter(F.col("doc_id") >= cut), path
        )
        return query_minhash_index(
            spark, path, batch, corpus=corpus, jaccard_threshold=0.05
        )

    register(
        "d21_minhash_index_extend",
        d21,
        _minhash_index_oracle_sql(),
    )


def _ivf_sq8_oracle_sql(
    n_cells: int = 16, nprobe: int = 2, k: int = 5, n_queries: int = 20
) -> str:
    """s09's oracle: the s03 IVF replay (strided centroids off
    MAX(vec_id), quantized-cosine assignment, cell tiebreak, nprobe
    probes) COMPOSED with the s06 SQ8 replay (integer scales, half-
    away-from-zero integer codes, exact-integer ADC dots) — scoring
    restricted to each query's probed cells. The Spark side reads
    codes from the persisted store; the oracle recomputes them from
    the corpus — equal because the build persists exactly the
    pipeline's intermediates (pinned from-scratch in
    tests/test_ivf_index.py)."""
    qv = "list_transform(CAST(embedding AS DOUBLE[]), x -> ROUND(x * 32768, 0))"
    qcos = (
        "(list_inner_product({a}, {b}) / "
        "(SQRT(list_inner_product({a}, {a})) * "
        "SQRT(list_inner_product({b}, {b}))))"
    )
    return (
        "WITH params AS ("
        f"  SELECT GREATEST(1, (MAX(vec_id) + 1) // {n_cells}) AS stride"
        "  FROM embeddings), "
        f"corp AS (SELECT vec_id, {qv} AS v FROM embeddings), "
        "cents AS ("
        "  SELECT CAST(vec_id // stride AS INT) AS cell, v AS centroid"
        "  FROM corp, params"
        f"  WHERE vec_id % stride = 0 AND vec_id // stride < {n_cells}), "
        "cassign AS ("
        "  SELECT vec_id, cell FROM ("
        "    SELECT c0.vec_id, ct.cell, ROW_NUMBER() OVER ("
        "      PARTITION BY c0.vec_id ORDER BY "
        + qcos.format(a="c0.v", b="ct.centroid")
        + " DESC, ct.cell) AS rk"
        "    FROM corp c0 CROSS JOIN cents ct"
        "  ) WHERE rk = 1), "
        "qassign AS ("
        "  SELECT vec_id, cell FROM ("
        "    SELECT c0.vec_id, ct.cell, ROW_NUMBER() OVER ("
        "      PARTITION BY c0.vec_id ORDER BY "
        + qcos.format(a="c0.v", b="ct.centroid")
        + " DESC, ct.cell) AS rk"
        f"    FROM corp c0 CROSS JOIN cents ct WHERE c0.vec_id < {n_queries}"
        f"  ) WHERE rk <= {nprobe}), "
        "ds AS (SELECT unnest(range(1, 65)) AS d), "
        "el AS (SELECT vec_id, d, CAST(v[d] AS BIGINT) AS n FROM corp, ds), "
        "sc AS (SELECT d, GREATEST(1, (MAX(ABS(n)) + 126) // 127) AS s "
        "FROM el GROUP BY d), "
        "enc AS (SELECT vec_id, d, "
        "(CASE WHEN n >= 0 THEN 1 ELSE -1 END) * "
        "((2 * ABS(n) + s) // (2 * s)) * s AS r "
        "FROM el JOIN sc USING (d)), "
        "nr AS (SELECT vec_id, SUM(r * r) AS nr_sq FROM enc "
        "GROUP BY vec_id), "
        f"qe AS (SELECT vec_id AS query_id, d, n AS qd FROM el "
        f"WHERE vec_id < {n_queries}), "
        "qn AS (SELECT query_id, SUM(qd * qd) AS nq_sq FROM qe "
        "GROUP BY query_id), "
        "cand AS (SELECT DISTINCT q.vec_id AS query_id, "
        "a.vec_id AS neighbor_id "
        "FROM qassign q JOIN cassign a USING (cell) "
        "WHERE q.vec_id <> a.vec_id), "
        "dots AS (SELECT c.query_id, c.neighbor_id, "
        "SUM(qe.qd * e.r) AS dot "
        "FROM cand c JOIN qe ON qe.query_id = c.query_id "
        "JOIN enc e ON e.vec_id = c.neighbor_id AND e.d = qe.d "
        "GROUP BY 1, 2), "
        "scored AS (SELECT dt.query_id, dt.neighbor_id, "
        "CAST(dt.dot AS DOUBLE) / "
        "(SQRT(CASE WHEN qn.nq_sq > 0 THEN CAST(qn.nq_sq AS DOUBLE) "
        "ELSE 1 END) * "
        "SQRT(CASE WHEN nr.nr_sq > 0 THEN CAST(nr.nr_sq AS DOUBLE) "
        "ELSE 1 END)) AS cos "
        "FROM dots dt JOIN qn USING (query_id) "
        "JOIN nr ON dt.neighbor_id = nr.vec_id) "
        "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank "
        f"FROM scored) WHERE rank <= {k}"
    )


def populate_round12_ivf_index_queries(register) -> None:
    """s09: ANN against the PERSISTED IVF+SQ8 index
    (operators/ivf_index.py) — the first index whose LAYOUT turns
    routing into the engine's own statistics pruning: codes are
    written (cell, id)-sorted, so the query's cell IN (probed...)
    filter drops non-probed cells' chunks at planning. The registered
    query builds the three index stores (codes/centroids/scales) from
    the embeddings corpus, then answers the probe set from the code
    store; the oracle replays the whole pipeline
    (_ivf_sq8_oracle_sql)."""

    def s09(spark, sf_dir):
        import tempfile

        from .ivf_index import build_ivf_sq8_index, query_ivf_sq8_index

        embs = _embs(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        path = tempfile.gettempdir() + f"/azs_s09_{token}/idx"
        build_ivf_sq8_index(embs, path, n_cells=16, chunk_rows=32)
        return query_ivf_sq8_index(
            spark,
            path,
            embs.filter(F.col("vec_id") < 20),
            k=5,
            nprobe=2,
        )

    register(
        "s09_ivf_sq8_index_topk",
        s09,
        _ivf_sq8_oracle_sql(),
    )
