"""Text-analysis operators: tokenization, token counting, language ID,
quality scoring, document fingerprinting.

Everything here is built-in-function compositions (JVM-side, codegen)
— no Python in the hot path. The deterministic "word code" arithmetic
is chosen to be expressible in both Spark SQL and the DuckDB oracle so
the correctness harness can verify it (engine hash functions like
xxhash64 differ across engines and would defeat the oracle).

Scale notes: every operator is a narrow per-row projection or a single
explode+groupBy — no joins, no driver collection; at 100 TB these
pipeline at input-scan speed with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "words_col",
    "token_count",
    "bpe_ish_token_count",
    "language_id",
    "quality_score",
    "quality_columns",
    "document_fingerprint",
    "word_code_sql",
    "top_ngrams",
    "tf_idf",
    "pii_redact",
    "repetition_signals",
    "boilerplate_stats",
    "boilerplate_stats_sql",
    "unigram_logprob",
    "corpus_vocab_stats",
    "word_code_col",
    "assemble_chunks",
    "heavy_hitters",
]

#: PII patterns, shared by redaction and counting. Kept to the regex
#: subset Java (Spark) and RE2 (DuckDB, the oracle engine) evaluate
#: identically: literal classes, bounded repeats, \b word boundaries —
#: no backrefs or lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
}


def words_col(text: Column) -> Column:
    """Whitespace tokenization (single-space split matches the oracle)."""
    return F.split(text, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (word-piece count approximated by ceil(len/4), the common
    tokens≈chars/4 rule)."""
    words = words_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
        ).alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex-based token split closer to a BPE pre-tokenizer: words,
    numbers, and punctuation runs each count as a token."""
    return df.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.col(text_col), r"\s+|(?=[^\w\s])"),
                lambda t: F.length(t) > 0,
            )
        ).alias("n_bpe_tokens"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic. Deterministic argmax with a
    fixed preference order on ties (en > es > fr > und)."""
    words = words_col(F.lower(F.col(text_col)))
    hits = {
        lang: F.size(
            F.array_intersect(
                words, F.array(*[F.lit(w) for w in vocab])
            )
        )
        for lang, vocab in STOPWORDS.items()
    }
    en, es, fr = hits["en"], hits["es"], hits["fr"]
    pred = (
        F.when((en >= es) & (en >= fr) & (en > 0), F.lit("en"))
        .when((es >= fr) & (es > 0), F.lit("es"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return df.select(
        "doc_id",
        en.alias("hits_en"),
        es.alias("hits_es"),
        fr.alias("hits_fr"),
        pred.alias("lang_pred"),
    )


def quality_columns(text: Column) -> dict:
    """The quality-signal expressions, as one shared definition —
    :func:`quality_score` (t03) and the x01 pretraining pipeline both
    build from these, so the oracle-critical formula cannot drift
    between them."""
    words = words_col(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    n_distinct = F.size(F.array_distinct(words))
    avg_word_len = (n_chars - (n_words - 1)) / n_words  # exact: single spaces
    diversity = n_distinct / n_words
    len_ok = F.when((n_words >= 10) & (n_words <= 1000), 1.0).otherwise(0.3)
    wordlen_ok = F.when(
        (avg_word_len >= 2.0) & (avg_word_len <= 12.0), 1.0
    ).otherwise(0.4)
    return {
        "n_words": n_words,
        "n_distinct_words": n_distinct,
        "avg_word_len": avg_word_len,
        "diversity": diversity,
        "quality": F.round(
            0.4 * len_ok + 0.3 * wordlen_ok + 0.3 * diversity, 6
        ),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / lexical-diversity / word-shape quality signals with a
    combined score in [0,1]. Pure arithmetic so the oracle can replay it
    bit-for-bit (rounded to 6 places)."""
    q = quality_columns(F.col(text_col))
    return df.select(
        "doc_id",
        q["n_words"].alias("n_words"),
        q["n_distinct_words"].alias("n_distinct_words"),
        F.round(q["avg_word_len"], 6).alias("avg_word_len"),
        F.round(q["diversity"], 6).alias("diversity"),
        q["quality"].alias("quality"),
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text signals in ONE narrow projection — token counts,
    language hits, quality, and the positional fingerprint computed
    per-row with higher-order functions (no explode, no joins, no
    shuffle). The single-pass shape for a 100-TB featurization sweep;
    the individual operators remain for composability and the oracle
    suite."""
    text = F.col(text_col)
    words = words_col(text)
    lwords = words_col(F.lower(text))
    n_words = F.size(words)
    n_chars = F.length(text)
    n_distinct = F.size(F.array_distinct(words))
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    diversity = n_distinct / n_words
    len_ok = F.when((n_words >= 10) & (n_words <= 1000), 1.0).otherwise(0.3)
    wordlen_ok = F.when(
        (avg_word_len >= 2.0) & (avg_word_len <= 12.0), 1.0
    ).otherwise(0.4)
    hits = {
        lang: F.size(
            F.array_intersect(lwords, F.array(*[F.lit(w) for w in vocab]))
        )
        for lang, vocab in STOPWORDS.items()
    }
    # positional fingerprint without explode: aggregate over positions
    def _contrib(w, i):
        code = (
            F.length(w) * 31 + F.ascii(w.substr(F.lit(1), F.lit(1)))
        ) * 31 + F.ascii(w.substr(F.length(w), F.lit(1)))
        return code.cast("long") * (
            (i.cast("long") * F.lit(2654435761)) % 1000003
        )

    fingerprint = F.aggregate(
        F.zip_with(words, F.sequence(F.lit(1), n_words), _contrib),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ) % F.lit(2147483647)
    en, es, fr = hits["en"], hits["es"], hits["fr"]
    return df.select(
        "doc_id",
        n_words.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(diversity, 6).alias("diversity"),
        F.round(0.4 * len_ok + 0.3 * wordlen_ok + 0.3 * diversity, 6).alias(
            "quality"
        ),
        en.alias("hits_en"),
        es.alias("hits_es"),
        fr.alias("hits_fr"),
        fingerprint.alias("fingerprint"),
    )


#: SQL fragment for the engine-independent word code (see module doc):
#: ((len(w)*31 + first_char_code) * 31 + last_char_code)
def word_code_sql(w: str) -> str:
    return (
        f"((LENGTH({w}) * 31 + ASCII(SUBSTR({w}, 1, 1))) * 31 "
        f"+ ASCII(SUBSTR({w}, LENGTH({w}), 1)))"
    )


def word_code_col(w: Column) -> Column:
    """Spark Column form of :func:`word_code_sql` — THE single
    definition of the oracle-critical word-code convention (the
    signature/dedup operators all import this; keeping per-operator
    copies bit-identical by hand is how conventions drift)."""
    return (
        (F.length(w) * 31 + F.ascii(w.substr(F.lit(1), F.lit(1)))) * 31
        + F.ascii(w.substr(F.length(w), F.lit(1)))
    ).cast("long")


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling fingerprint: sum over word positions of
    word_code(w) * ((pos * 2654435761) % 1000003), all mod 2^31-1.

    A rolling polynomial hash over engine-independent word codes —
    deterministic, positional (reordered words change it), and
    expressible in the DuckDB oracle. Implemented as posexplode +
    groupBy sum (map-side combine, single shuffle on doc_id)."""
    words = words_col(F.col(text_col))
    exploded = df.select("doc_id", F.posexplode(words).alias("pos", "w"))
    wc = F.expr(word_code_sql("w"))
    contrib = (wc * (((F.col("pos") + 1) * F.lit(2654435761)) % 1000003))
    return (
        exploded.groupBy("doc_id")
        .agg((F.sum(contrib) % F.lit(2147483647)).alias("fingerprint"))
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone numbers, replacing each
    with a typed placeholder (``<EMAIL>`` etc.), and count what was
    removed per document.

    Order matters and is fixed: emails first (their host part would
    otherwise be half-eaten by the IP pattern), then IPs, then phones.
    Pure ``regexp_replace``/``regexp_extract_all`` — a narrow per-row
    projection that pipelines at scan speed on 100 TB, and the pattern
    subset is chosen so the DuckDB oracle replays it byte-for-byte."""
    text = F.col(text_col)
    counts = {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }
    clean = text
    for kind in ("email", "ip", "phone"):  # fixed order, see docstring
        clean = F.regexp_replace(
            clean, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        counts["email"].alias("n_emails"),
        counts["ip"].alias("n_ips"),
        counts["phone"].alias("n_phones"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_word_frac``: occurrences of the most frequent word over all
      words (near 1.0 = degenerate repetition),
    - ``dup_bigram_frac`` / ``dup_trigram_frac``: fraction of n-grams
      that are repeats of an earlier n-gram in the same document.

    Word stats go through explode + two-level groupBy (map-side
    combine, one shuffle keyed on doc_id — scan-bound at 100 TB); the
    n-gram fractions are per-row higher-order functions, no shuffle at
    all. Fractions round to 6 places for stable cross-engine hashes."""
    words = words_col(F.col(text_col))

    def _dup_frac(n: int) -> Column:
        grams = F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.when(
            F.size(grams) > 0,
            F.round(
                (F.size(grams) - F.size(F.array_distinct(grams)))
                / F.size(grams),
                6,
            ),
        ).otherwise(F.lit(0.0))

    per_word = (
        df.select("doc_id", F.explode(words).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_word_count"),
            F.sum("c").alias("n_words"),
        )
    )
    gram_fracs = df.select(
        "doc_id",
        _dup_frac(2).alias("dup_bigram_frac"),
        _dup_frac(3).alias("dup_trigram_frac"),
    )
    return per_word.join(gram_fracs, "doc_id").select(
        "doc_id",
        "n_words",
        "top_word_count",
        F.round(F.col("top_word_count") / F.col("n_words"), 6).alias(
            "top_word_frac"
        ),
        "dup_bigram_frac",
        "dup_trigram_frac",
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` word n-grams by document frequency, then
    total frequency, with the n-gram string as the final tiebreak so
    the ranking is total and engine-independent.

    One explode + one groupBy (map-side partial counts) + one top-k
    sort of k rows — the corpus-analysis staple, scan-speed at 100 TB."""
    words = words_col(F.col(text_col))
    if n == 1:
        grams = words
    else:
        # index transform builds n-grams JVM-side; the when() guard
        # matters: sequence(0, -1) would generate a DESCENDING range
        # for docs shorter than n, not an empty one
        grams = F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col("doc_id"), F.explode(grams).alias("gram")
    ).filter(F.length("gram") > 0)
    counts = exploded.groupBy("gram").agg(
        F.count("*").alias("total_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return (
        counts.orderBy(
            F.col("doc_freq").desc(), F.col("total_freq").desc(), F.col("gram")
        )
        .limit(k)
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 2,
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf6): raw term frequency x smoothed
    idf ``ln((N+1)/(df+1)) + 1``, rounded to 6 decimals for stable
    cross-engine comparison.

    Two shuffles total — explode+groupBy for per-doc term counts, one
    groupBy for document frequencies — and the corpus size N rides in
    as a scalar subquery (no driver collect, no cross join)."""
    terms = df.select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        terms.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
    )
    total = df.select(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf6"),
        )
    )


def boilerplate_stats(
    df: DataFrame,
    ngram_n: int = 3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate detection: an n-gram is *boilerplate*
    when it appears in >= ``min_docs`` distinct documents (headers,
    navigation chrome, license blurbs in a web corpus). Returns one row
    per document: (doc_id, n_ngrams, n_boiler, boiler_frac) where the
    fraction is over the document's DISTINCT n-grams.

    Scale: per-doc distinct n-grams explode ONCE (explode_outer keeps
    shingle-free docs as a null row, so no fix-up join is needed, and
    an eager localCheckpoint materializes the exploded table exactly
    once — it feeds both the doc-frequency aggregate and the per-doc
    counts, and Catalyst would otherwise re-run the explode per
    consumer). Doc frequency is a single groupBy on the n-gram
    (uniform hash keys, map-side combine); the surviving boilerplate
    set is orders of magnitude smaller than the corpus, so flagging is
    a broadcast mark-join folded into the one per-doc aggregation.
    Two shuffles total, neither carrying text rows, no big-to-big
    join. (localCheckpoint is ContextCleaner-reclaimed; on a real
    cluster swap for checkpoint() if executor loss must be survivable
    mid-query.)
    """
    words = words_col(F.col(text_col))
    # n-gram IDENTITY is all the doc-frequency groupBy and the flagging
    # join need, so hash each n-gram straight from its word slice
    # (multi-arg xxhash64 — no n-gram string is ever built) and shuffle
    # 8-byte digests instead of text: the checkpoint holds 16-byte rows
    # and shuffle volume drops ~2.5x vs n-gram strings. A 64-bit
    # collision would merge two distinct n-grams' counts — p ~ n²/2^65,
    # ~1e-10 at 100k distinct n-grams, and it perturbs one count if it
    # ever happens. Word boundaries are preserved because multi-arg
    # xxhash64 folds each argument separately ("a bc" vs "ab c" differ).
    grams = F.when(
        F.size(words) >= ngram_n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - ngram_n),
                lambda i: F.xxhash64(
                    *[F.element_at(words, i + j + 1) for j in range(ngram_n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    ng = df.select(
        F.col(id_col), F.explode_outer(grams).alias("ng")
    ).localCheckpoint(eager=True)
    boiler = (
        ng.filter(F.col("ng").isNotNull())
        .groupBy("ng")
        .agg(F.count("*").alias("ndocs"))  # ng is distinct per doc
        .filter(F.col("ndocs") >= min_docs)
        .select("ng", F.lit(1).cast("long").alias("_b"))
    )
    return (
        ng.join(F.broadcast(boiler), "ng", "left")
        .groupBy(id_col)
        .agg(
            F.count("ng").alias("n_ngrams"),  # count() skips nulls
            F.coalesce(F.sum("_b"), F.lit(0).cast("long")).alias(
                "n_boiler"
            ),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_boiler",
            # when() guard, not coalesce: under ANSI mode a literal 0
            # divisor throws rather than yielding null
            F.when(
                F.col("n_ngrams") > 0,
                F.round(F.col("n_boiler") / F.col("n_ngrams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
        )
    )


def boilerplate_stats_sql(
    ngram_n: int = 3,
    min_docs: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`boilerplate_stats`: list_transform over
    range() builds the same distinct n-grams, HAVING gives the
    boilerplate set, and the per-doc stats replay the two counts."""
    concat = " || ' ' || ".join(
        "ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(ngram_n)
    )
    return (
        f"WITH ng AS ("
        f"  SELECT {id_col}, t.ng AS ng FROM ("
        f"    SELECT {id_col}, list_distinct(list_transform("
        f"      range(1, len(ws) - {ngram_n - 2}), i -> {concat})) AS ngl"
        f"    FROM (SELECT {id_col}, string_split({text_col}, ' ') AS ws "
        f"          FROM {table})"
        f"  ), UNNEST(ngl) AS t(ng)), "
        f"b AS (SELECT ng FROM ng GROUP BY ng "
        f"      HAVING COUNT(*) >= {min_docs}), "
        f"per AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_ngrams, "
        f"  CAST(SUM(CASE WHEN ng IN (SELECT ng FROM b) THEN 1 ELSE 0 END) "
        f"       AS BIGINT) AS n_boiler "
        f"  FROM ng GROUP BY {id_col}) "
        f"SELECT d.{id_col}, COALESCE(per.n_ngrams, 0) AS n_ngrams, "
        f"COALESCE(per.n_boiler, 0) AS n_boiler, "
        f"ROUND(COALESCE(per.n_boiler / (per.n_ngrams * 1.0), 0.0), 6) "
        f"AS boiler_frac "
        f"FROM {table} d LEFT JOIN per ON d.{id_col} = per.{id_col}"
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: Optional[int] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into (optionally overlapping) token-window
    chunks — the context-window prep step between cleaning and
    tokenized shards. ``stride`` defaults to ``chunk_tokens`` (no
    overlap); ``stride < chunk_tokens`` yields overlapping chunks.

    Returns (doc_id, chunk_idx, start_tok, n_tok, chunk_text), one row
    per chunk, chunk_idx = start_tok / stride. Whitespace tokens (the
    module's words_col convention) so the DuckDB oracle can replay the
    split exactly.

    Scale: pure JVM expressions — sequence() enumerates chunk starts,
    posexplode fans out, slice()/array_join materialize each window.
    No shuffle at all: chunking is row-local, the explode multiplies
    rows in place and Catalyst keeps it inside the scan stage.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_documents: chunk_tokens and stride must be >= 1, "
            f"got {chunk_tokens}, {stride}"
        )
    words = words_col(F.col(text_col))
    n = F.size(words)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        id_col,
        words.alias("_ws"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    piece = F.slice(F.col("_ws"), F.col("start_tok") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_tokens: int = 64,
    stride: Optional[int] = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`chunk_documents`: string_split + a
    range() of chunk starts + list_slice, same windows, same joins."""
    if stride is None:
        stride = chunk_tokens
    return (
        f"SELECT {id_col}, "
        f"CAST(s // {stride} AS BIGINT) AS chunk_idx, "
        f"CAST(s AS BIGINT) AS start_tok, "
        f"CAST(len(ws[s + 1 : s + {chunk_tokens}]) AS BIGINT) AS n_tok, "
        f"array_to_string(ws[s + 1 : s + {chunk_tokens}], ' ') "
        f"AS chunk_text "
        f"FROM ("
        f"  SELECT {id_col}, ws, "
        f"  UNNEST(range(0, GREATEST(len(ws), 1), {stride})) AS s "
        f"  FROM (SELECT {id_col}, string_split({text_col}, ' ') AS ws "
        f"        FROM {table})"
        f")"
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Perplexity-style quality score from a unigram language model
    fit on the corpus itself: per document, the mean natural-log
    probability of its words under corpus-wide unigram frequencies
    (the classic cheap proxy for "does this look like the corpus" —
    low scores flag gibberish and rare-token soup, the same role
    KenLM perplexity plays in CCNet/Gopher-style pipelines).
    ``min_count`` (the corpus frequency of the document's rarest
    word) rides along as an exact-integer rarity signal.

    Scale shape (100 TB): one word explode feeding a groupBy(word)
    count — map-side combine collapses the Zipf head before the
    shuffle, so the shuffled stream is near-vocabulary-sized — then
    the model joins back onto the same exploded stream (AQE
    broadcasts the vocab table when it fits; at open-vocabulary
    scale a min-frequency floor would cap it) and one groupBy(doc)
    with partial aggregation folds the scores. The corpus total
    rides in via a broadcast single-row cross join, never a driver
    collect."""
    words = words_col(F.col(text_col))
    exploded = df.select(F.col(id_col), F.explode(words).alias("w"))
    counts = exploded.groupBy("w").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    model = counts.crossJoin(F.broadcast(total))
    return (
        exploded.join(model, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total"))), 6
            ).alias("avg_logprob"),
            F.min("cnt").alias("min_count"),
        )
        .select(id_col, "n_words", "avg_logprob", "min_count")
    )


def corpus_vocab_stats(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """One-row corpus vocabulary profile: vocabulary size, total
    token count, hapax-legomena count (words occurring exactly once
    — the long-tail/noise gauge), and the token-mass fraction covered
    by the ``top_k`` most frequent words (the Zipf-head coverage
    number a tokenizer-vocab or stopword decision starts from).

    Scale shape (100 TB): one word explode into a groupBy(word) with
    map-side combine (the Zipf head collapses before the shuffle);
    everything after runs on the vocabulary-sized count table — a
    scalar aggregate plus a TakeOrderedAndProject top-k (per-partition
    heaps, driver merges top_k rows only). The top-k sum is
    tie-insensitive: whichever boundary words are chosen, the sum of
    the k largest counts is the same multiset sum."""
    exploded = df.select(F.explode(words_col(F.col(text_col))).alias("w"))
    counts = exploded.groupBy("w").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.count("*").alias("vocab_size"),
        F.sum("cnt").alias("total_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    top = (
        counts.orderBy(F.col("cnt").desc())
        .limit(top_k)
        .agg(F.sum("cnt").alias("top_sum"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "vocab_size",
        "total_tokens",
        "n_hapax",
        F.round(F.col("top_sum") / F.col("total_tokens"), 6).alias(
            "top_coverage"
        ),
    )


def assemble_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    joiner: str = " ",
) -> DataFrame:
    """Reassemble chunked or paged records into whole documents with a
    DETERMINISTIC piece order — the inverse of :func:`chunk_documents`
    at ``stride == chunk_tokens``, and the page→document assembly step
    of a crawl/PDF pipeline (pages, posts of a thread, shards of a
    transcript). Returns (id, text, n_chunks).

    Order is pinned by ``order_col``, never by arrival order: a
    shuffle destroys row order, so ``collect_list`` alone would
    assemble different texts on different runs. The sort happens
    AFTER collection via ``array_sort`` over (order, text) structs —
    one groupBy shuffle total, no window, no secondary sort; the
    per-doc sort is row-local over chunk-count-sized arrays. A
    duplicate ``order_col`` value within a document still yields a
    deterministic text (the struct comparator falls through to the
    text), but indicates upstream damage."""
    pieces = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"), F.col(text_col).alias("t")
            )
        )
    )
    return df.groupBy(id_col).agg(
        F.array_join(
            F.transform(pieces, lambda x: x["t"]), joiner
        ).alias("text"),
        F.count("*").cast("long").alias("n_chunks"),
    )


def heavy_hitters(
    df: DataFrame,
    k: int = 20,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` tokens WITHOUT a full-vocabulary shuffle —
    the bounded-memory heavy-hitters plan for vocabularies too large
    to ``groupBy`` (t06's exact form shuffles one row per DISTINCT
    gram; at web scale that is billions of keys):

    1. a Misra-Gries summary of size ``capacity`` per partition
       (vectorized over Arrow batches: pandas ``value_counts`` per
       slab merged into a counter dict, batched MG reduction
       subtracting the (capacity+1)-th largest count when full);
    2. the summaries collect to the driver (``<= n_partitions *
       capacity`` small rows — same bounded class as the suite's
       other candidate collects) and union into a candidate set;
    3. an exact recount of ONLY candidate tokens: broadcast hash
       join gate, then a groupBy over ``<= |candidates|`` distinct
       keys with map-side combine, top-k with a total order
       (count desc, token asc).

    EXACTNESS guarantee (why the SQL oracle can hash-match): MG keeps
    every token whose partition count exceeds N_p/(capacity+1); a
    token with GLOBAL count > N/(capacity+1) must clear that bar in
    at least one partition (weighted pigeonhole), so it reaches the
    exact recount. The result is therefore exactly the true top-k
    whenever the k-th count exceeds N/(capacity+1) — trivially true
    for zipfian token distributions with capacity >> k; the
    adversarial unit test pins a 50k-token vocabulary through a
    capacity-64 summary and still matches exact counts."""
    import pandas as pd

    if k < 1 or capacity < k:
        raise ValueError(
            f"heavy_hitters: need capacity >= k >= 1, got k={k}, "
            f"capacity={capacity}"
        )
    exploded = df.select(
        F.explode(words_col(F.col(text_col))).alias("token")
    ).filter(F.length("token") > 0)

    cap = int(capacity)

    def mg_kernel(batches):
        counters: dict = {}
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            vc = pdf["token"].value_counts()  # vectorized C path
            for tok, cnt in vc.items():  # O(unique-per-batch), not per-row
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > cap:
                # batched Misra-Gries reduction: subtract the
                # (cap+1)-th largest count from everyone, drop <= 0.
                # Total subtracted mass per survivor is bounded by
                # N_p/(cap+1), preserving the MG guarantee.
                values = sorted(counters.values(), reverse=True)
                cut = values[cap]
                counters = {
                    t: c - cut for t, c in counters.items() if c > cut
                }
        if not seen or not counters:
            return
        yield pd.DataFrame(
            {
                "token": list(counters.keys()),
                "est": list(counters.values()),
            }
        )

    summaries = exploded.mapInPandas(
        mg_kernel, schema="token string, est long"
    ).collect()  # <= n_partitions * capacity rows — bounded
    cand = sorted({r["token"] for r in summaries})
    spark = df.sparkSession
    if not cand:
        return spark.createDataFrame(
            [], "token string, total_freq long, rank long"
        )
    cand_df = spark.createDataFrame([(t,) for t in cand], "token string")

    counted = (
        exploded.join(F.broadcast(cand_df), "token")
        .groupBy("token")
        .agg(F.count("*").alias("total_freq"))
    )
    w = Window.orderBy(F.col("total_freq").desc(), F.col("token"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("token", "total_freq", F.col("rank").cast("long").alias("rank"))
    )


def entropy_score(
    df: DataFrame,
    text_col: str = "text",
    min_char_entropy: float = 2.5,
    min_word_entropy: float = 3.0,
) -> DataFrame:
    """Shannon-entropy quality gate (t15) — the curation filter for
    gibberish, keyboard-mash, and template spam that length/stopword
    heuristics (t03) miss: natural English sits near 4.1 bits/char
    and well above 5 bits/word, repeated-character junk near 0.

    Entirely ROW-LOCAL JVM expressions — no explode, no shuffle, no
    Python: per doc, ``-sum(p_x * log2(p_x))`` over the distinct
    characters (and words), with the distinct list SORTED so the
    float accumulation order is engine-independent (bit-identical in
    DuckDB, which does not preserve first-occurrence order in
    list_distinct). Cost is O(distinct * length) per document — the
    right trade for web-doc-scale texts (a few k words); for
    book-length documents switch to the explode+groupBy form (the
    t06 family's shape).

    Returns (doc_id, char_entropy, word_entropy, low_entropy)."""

    def ent(arr):
        n = F.size(arr)
        dist = F.array_sort(F.array_distinct(arr))
        s = F.aggregate(
            dist,
            F.lit(0.0),
            lambda acc, d: acc
            + (
                F.size(F.filter(arr, lambda x: x == d))
                / n.cast("double")
            )
            * F.log2(
                F.size(F.filter(arr, lambda x: x == d))
                / n.cast("double")
            ),
        )
        # single-symbol docs give s == 0; avoid exporting -0.0
        pos = F.when(s < 0, -s).otherwise(F.lit(0.0))
        return F.when(n > 0, F.round(pos, 6)).otherwise(F.lit(0.0))

    cs = F.split(F.col(text_col), "")
    ws = F.filter(
        F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
    )
    out = df.select(
        "doc_id",
        ent(cs).alias("char_entropy"),
        ent(ws).alias("word_entropy"),
    )
    return out.withColumn(
        "low_entropy",
        (F.col("char_entropy") < F.lit(float(min_char_entropy)))
        | (F.col("word_entropy") < F.lit(float(min_word_entropy))),
    )
