"""End-to-end pipeline compositions over the operator library.

The individual operators (dedup, text, sampling, …) are the reusable
pieces; this module wires them into the canonical pretraining-data
flow a user actually runs, as ONE lazy DataFrame plan — Catalyst sees
the whole composition, so stages fuse (the quality gate and the PII
projection run in the same stage as the dedup window's output, and
nothing materializes between steps).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import train_val_test_split
from .text import PII_PATTERNS, quality_columns

__all__ = [
    "pretraining_pipeline",
    "fuzzy_dedup_pipeline",
    "snapshot_curation_pipeline",
    "leakage_safe_split",
    "dataset_card",
]


def pretraining_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """The canonical pretraining-data pipeline in one plan:

    1. **normalized dedup** — keep the lowest-id document per
       lowercased/whitespace-collapsed text (one window over the
       normalized text, same semantics as d02);
    2. **quality gate** — drop documents scoring under ``quality_min``
       on the t03 length/word-shape/diversity score;
    3. **PII redaction** — emails, IPs, phone numbers replaced with
       typed placeholders (t08's fixed order: email → ip → phone);
    4. **leak-proof split** — the p07 integer draw labels each
       survivor train/val/test, pinned to the id forever.

    Output: (id, clean_text, lang, source, n_words, quality, split).

    Scale shape (100 TB): stage 1 is the only shuffle (one hash
    exchange on the normalized text); stages 2–4 are narrow
    projections Catalyst folds into the window's output stage. No
    joins, no driver collection; every stage's semantics is
    individually driver-verified (d02/t03/t08/p07), and the whole
    composition is verified end-to-end as one oracle row."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    w = Window.partitionBy("__norm").orderBy(F.col(id_col))
    kept = (
        df.withColumn("__norm", norm)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__norm", "__rn")
    )

    q = quality_columns(F.col(text_col))  # t03's exact expressions
    gated = (
        kept.withColumn("n_words", q["n_words"])
        .withColumn("quality", q["quality"])
        .filter(F.col("quality") >= quality_min)
    )

    clean = F.col(text_col)
    for kind in ("email", "ip", "phone"):  # t08's fixed order
        clean = F.regexp_replace(
            clean, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )

    # p07's operator, not a re-implementation of its draw — one
    # definition of the leak-proof membership arithmetic
    labeled = train_val_test_split(
        gated, id_col, val_frac=val_frac, test_frac=test_frac, seed=seed
    )
    return labeled.select(
        F.col(id_col),
        clean.alias("clean_text"),
        "lang",
        "source",
        "n_words",
        "quality",
        "split",
    )


def fuzzy_dedup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The production fuzzy-dedup flow (the MinHash pipeline of Lee et
    al. 2022 / RefinedWeb) end to end, candidate generation included:

    1. **MinHash-LSH candidates** — banded signatures, band-bucket
       equi-join (never all-pairs);
    2. **exact verify** — true word-k-gram Jaccard computed on the
       candidates only, pairs kept at ``>= threshold``;
    3. **connected components** — pairs become duplicate groups by
       label propagation (docs in no pair stay singletons);
    4. **canonical selection** — one survivor per group: highest t03
       quality score, doc id as the deterministic tiebreak;
    5. **corpus filter** — the deduplicated corpus: every surviving
       doc with the member count it now represents.

    Output: (id, lang, source, n_chars, n_members), one row per kept
    document. ``n_members`` = 1 for docs with no near-duplicate.

    Scale shape (100 TB): stages 1-2 are the d03/d04 shapes — the
    signature kernel is a shuffle-free Arrow pandas_udf, candidates
    come from a band-bucket equi-join, and the exact verify explodes
    only candidate docs. Everything after is restricted to PAIR-
    INVOLVED docs (dup-group members << corpus): label propagation,
    the quality join, and the per-component window all run on that
    small set, and the corpus itself never shuffles again — the tail
    is two broadcast joins (the drop-list anti-join and the winners'
    member-count attach). Nothing in the plan is quadratic in the
    corpus, and no stage after the candidate join is corpus-wide.

    The driver-verified row (x02) runs this against an exact all-pairs
    SQL oracle, so a green hash additionally proves the LSH stage's
    recall is 1.0 at ``threshold`` on the checked corpus (the d06
    framing; at j >= threshold = 0.7 a pair escapes 16 4-row bands
    with p <= (1 - 0.7^4)^16 ~= 1.5e-7, and every planted duplicate
    in the test corpora sits at j >= 0.889)."""
    from .dedup import connected_components, minhash_lsh_pairs
    from .text import quality_columns as _qc

    pairs = minhash_lsh_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        verify_jaccard=True,
        jaccard_threshold=threshold,
    ).select("id_a", "id_b")
    # The verified pair set fans out to three consumers (both unions
    # of pair_ids + the component edges), and its lineage contains the
    # whole signature kernel — materialize it once. Pair-count-sized,
    # ContextCleaner-reclaimed.
    pairs = pairs.localCheckpoint(eager=True)

    # Docs outside every pair are singletons by construction — keep
    # the group machinery (components + quality + window) off them
    # entirely. pair_ids is dup-group-sized, so the semi-join gating
    # the corpus down to dup members broadcasts.
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    dup_docs = df.join(F.broadcast(pair_ids), id_col, "left_semi")
    # components over pair_ids, not dup_docs (r14): the node set CC
    # needs is exactly the pair-involved ids — pair_ids ⊆ df ids by
    # construction (pairs come from df), so the corpus semi-join adds
    # nothing to the node set and its scan can stay out of CC's
    # labels/probe lineage
    comp = connected_components(pair_ids, pairs, id_col=id_col)
    # t03's exact quality expressions, selected under the caller's id
    # column (quality_score() pins "doc_id", which would break any
    # other id_col)
    quality = dup_docs.select(
        id_col, _qc(F.col(text_col))["quality"].alias("quality")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    ranked = comp.join(quality, id_col).select(
        id_col,
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("component")).alias(
            "n_members"
        ),
    )
    winners = ranked.filter(F.col("rn") == 1).select(id_col, "n_members")
    losers = ranked.filter(F.col("rn") > 1).select(id_col)

    other_cols = [c for c in df.columns if c not in (id_col, text_col)]
    return (
        df.select(id_col, *other_cols)
        .join(F.broadcast(losers), id_col, "left_anti")
        .join(F.broadcast(winners), id_col, "left")
        .withColumn(
            "n_members",
            F.coalesce(F.col("n_members"), F.lit(1).cast("long")),
        )
    )


def snapshot_curation_pipeline(
    batch: DataFrame,
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dedup_k: int = 3,
    dedup_threshold: float = 0.2,
    contam_k: int = 5,
    group_col: str = "lang",
    score_col: str = "n_chars",
    keep_frac: float = 0.5,
    extra_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Incremental crawl-snapshot curation — the flow a continuously-
    trained model's data team runs on every new crawl batch, composed
    from the library's verified stages into one lazy plan:

    1. **exact dedup within the batch** — keep the lowest-id document
       per normalized text (d02 semantics; the new snapshot always
       carries internal duplicates);
    2. **near-dup vs the existing corpus** — drop batch documents
       whose exact word-``dedup_k``-gram Jaccard against ANY corpus
       document reaches ``dedup_threshold``
       (:func:`~arrow_zarr_spark.operators.dedup.dedup_against_corpus`,
       d12 — the corpus never re-deduplicates);
    3. **benchmark decontamination** — purge survivors sharing any
       word-``contam_k``-gram with the blocklist
       (:func:`~arrow_zarr_spark.operators.dedup.contamination_purge`,
       d11);
    4. **per-group quality gate** — keep the top ``keep_frac`` of each
       ``group_col`` by ``score_col``
       (:func:`~arrow_zarr_spark.operators.sampling.quantile_gate`,
       p06), adding ``group_rank``.

    Output: the curated batch rows
    ``(id_col, group_col, *extra_cols, score_col, group_rank)`` —
    ``extra_cols`` are passthrough columns the batch must carry
    (default the harness tables' ``source``).

    Scale shape (100 TB corpus, batch-sized snapshot): every
    corpus-touching stage is bounded by the BATCH — stage 2 gates the
    corpus explode with the broadcast batch-shingle set (join bounded
    by batch size, corpus never shuffles), stage 3 is the broadcast
    digest gate (no shuffle carries text), and stages 1 and 4 are one
    batch-sized window each. Catalyst sees the whole composition, so
    the stage-3 anti-join and stage-4 window fold onto stage 2's
    output without materialization."""
    from .dedup import contamination_purge, dedup_against_corpus
    from .sampling import quantile_gate

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    w = Window.partitionBy("__norm").orderBy(F.col(id_col))
    s1 = (
        batch.withColumn("__norm", norm)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__norm", "__rn")
    )
    # The deduped batch fans out to ~5 consumers through the d12/d11
    # joins (shingle explode, size aggregates, both anti-join probes),
    # and Catalyst re-runs the stage-1 window for each — materialize
    # it once (batch-sized; ContextCleaner-reclaimed, the x02
    # rationale; swap for checkpoint() on a real cluster if executor
    # loss must be survivable mid-query). Measured neutral at sf0.1
    # (window cost ~ batch scan), kept for the multi-consumer
    # contract: recompute count grows with pipeline depth, the
    # materialization doesn't.
    #
    # NOT repartitioned before the checkpoint: AQE coalesces the
    # window's small shuffle to one partition, and the batch-side
    # shingle explode does run as a single task — but that task
    # overlaps the corpus-side stages (broadcast-exchange thread), so
    # wall time is unaffected, and an interleaved A/B (r13) showed the
    # extra round-robin exchange LOSES ~0.35 s. Revisit only if the
    # batch stops being small relative to the corpus.
    s1 = s1.localCheckpoint(eager=False)
    s2 = dedup_against_corpus(
        s1, corpus, id_col=id_col, text_col=text_col,
        k=dedup_k, threshold=dedup_threshold,
    )
    s3 = contamination_purge(
        s2, blocklist, id_col=id_col, text_col=text_col, k=contam_k
    )
    return quantile_gate(
        s3.select(id_col, group_col, *extra_cols, score_col),
        group_col=group_col,
        score_col=score_col,
        keep_frac=keep_frac,
        tiebreak_col=id_col,
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 42,
    pairs: DataFrame = None,
    exact_max_docs: int = 4096,
) -> DataFrame:
    """Train/val/test split whose atomic unit is the NEAR-DUP GROUP,
    not the document (x06): p07's per-document hash split still
    leaks — a training document that is a near-duplicate of a test
    document teaches the model the test answer. Here the
    deterministic integer draw is taken on the CONNECTED COMPONENT
    of the near-dup graph, so every member of a duplicate group
    lands in the same split, forever (the draw is pure integer
    arithmetic on the group id — membership survives reruns,
    engines, and cluster sizes, p07's reproducibility contract
    lifted to groups).

    ``pairs`` defaults to a SIZE-ADAPTIVE candidate generator (r9,
    r8 verdict item 4): corpora up to ``exact_max_docs`` rows use
    exact word-trigram Jaccard pairs (d04's kernel — the
    oracle-replayable path); larger corpora auto-switch to MinHash-
    LSH candidates verified by the SAME exact Jaccard (d03's kernel
    = x02's proven shape), because d04's shared-shingle pair join is
    quadratic in the count of documents sharing a hot shingle ("of
    the and…") and becomes the blowup path at corpus scale. The
    LSH route is candidate-recall-bounded (P_detect ≈ 0.988 at
    J = 0.7 with the default 16x4 banding, higher above), not
    exact — pass ``pairs=`` explicitly to pin either generator.

    Scale shape: pairs = banded equi-join + verification confined to
    candidates (large corpora) or one shared-shingle equi-join
    (small); components = label propagation (one equi-join + groupBy
    per round, O(diameter) rounds, checkpoint-cycled); then a narrow
    split projection. Returns (id_col, component, split)."""
    from .dedup import (
        connected_components,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from .sampling import _DRAW_MOD, _DRAW_MULT

    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError(
            "leakage_safe_split: need val_frac, test_frac >= 0 and "
            f"val_frac + test_frac < 1, got {val_frac}, {test_frac}"
        )
    if pairs is None:
        # limit-bounded probe: deciding "<= exact_max_docs?" must not
        # itself scan the corpus the switch exists to protect
        if df.limit(exact_max_docs + 1).count() <= exact_max_docs:
            pairs = ngram_jaccard_pairs(
                df, id_col=id_col, text_col=text_col,
                threshold=jaccard_threshold,
            )
        else:
            # LSH candidates + exact-Jaccard verify at the same
            # threshold — the hot-shingle quadratic never runs
            pairs = minhash_lsh_pairs(
                df, id_col=id_col, text_col=text_col,
                jaccard_threshold=jaccard_threshold,
            )
    comp = connected_components(
        df, pairs.select("id_a", "id_b"), id_col=id_col
    )
    draw = (
        (F.col("component") % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    test_cut = int(test_frac * _DRAW_MOD)
    val_cut = test_cut + int(val_frac * _DRAW_MOD)
    # connected_components already emits one row per document
    # (docs in no pair are singleton components), so the split is a
    # narrow projection on its output — no join back at all
    return comp.select(
        id_col,
        "component",
        F.when(draw < test_cut, F.lit("test"))
        .when(draw < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = ("lang", "source"),
) -> DataFrame:
    """Per-group corpus report (x07) — the "dataset card" table a
    training-data release ships: document counts, exact-duplicate
    counts, whitespace-token totals, and length statistics per
    (lang, source) stratum, from ONE narrow scan and ONE groupBy.
    The operational face of the curation pipeline: run it before and
    after x01/x02 and diff the strata.

    All aggregates are engine-replayable: counts and token sums are
    exact integers, avg is one correctly-rounded divide of an exact
    integer sum, and the median is the exact interpolated percentile
    (r32's convention — no sketch). Exact-dup counting reuses d01's
    definition (identical raw text), per stratum:
    ``n_docs - COUNT(DISTINCT <32-byte sha256 of text>)`` counts the
    redundant copies — the distinct runs on the digest so the TEXT
    never shuffles (a distinct on the raw column would move the
    whole corpus through the Expand exchange); a sha256 collision
    would undercount by one, a risk cryptographically below the
    hardware error rate, and the oracle's COUNT(DISTINCT text)
    hash-verifies the equality on every checked corpus.

    Scale: one shuffle on the (low-cardinality) group key carrying
    per-row derived integers and 32-byte digests — never text. The
    exact median is the one non-map-side-combinable term; swap it
    for percentile_approx at extreme stratum sizes if the sort
    becomes the bottleneck (the card stays honest, the quantile gets
    a documented error bound)."""
    from .text import words_col

    gcols = list(group_cols)
    base = df.select(
        *gcols,
        F.sha2(F.col(text_col), 256).alias("__dig"),
        F.size(words_col(F.col(text_col))).cast("long").alias("__tok"),
        F.length(text_col).cast("long").alias("__chars"),
    )
    return base.groupBy(*gcols).agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("__dig")).alias("n_dup_docs"),
        F.sum("__tok").alias("total_tokens"),
        F.round(F.avg("__chars"), 6).alias("avg_chars"),
        F.expr("percentile(__chars, 0.5D)").alias("median_chars"),
    )
