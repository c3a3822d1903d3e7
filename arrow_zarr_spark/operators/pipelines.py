"""End-to-end pipeline compositions over the operator library.

The individual operators (dedup, text, sampling, …) are the reusable
pieces; this module wires them into the canonical pretraining-data
flow a user actually runs, as ONE lazy DataFrame plan — Catalyst sees
the whole composition, so stages fuse (the quality gate and the PII
projection run in the same stage as the dedup window's output, and
nothing materializes between steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import train_val_test_split
from .text import PII_PATTERNS, quality_columns

__all__ = ["pretraining_pipeline"]


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
