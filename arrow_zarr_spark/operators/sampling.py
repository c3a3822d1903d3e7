"""Corpus sampling / mixing operators for training-data pipelines.

A 100-TB pretraining corpus is rarely used whole: pipelines take
deterministic per-domain quotas, token-budgeted slices, and seeded
stratified samples. These are the Spark-first shapes for each:

- :func:`per_group_quota` — top-N rows per group under a total order
  (window row_number, one shuffle on the group key).
- :func:`token_budget_sample` — greedy prefix of a deterministic
  ordering until a global token budget is exhausted (running sum over
  an ordered window; single global-ordered window, used for
  budget-sized — not corpus-sized — selections).
- :func:`stratified_sample` — seeded per-stratum Bernoulli sampling
  via ``sampleBy`` (engine-specific RNG, so no cross-engine oracle;
  validated by statistical bounds in tests).

The quota and budget operators are fully deterministic and verified
against DuckDB SQL oracles; the reference engine has no sampling
surface (its scan layer is read-only — see SURVEY.md §2 "Absent").
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "per_group_quota",
    "token_budget_sample",
    "token_budget_sample_sharded",
    "stratified_sample",
    "stratified_sample_deterministic",
    "rebalance_mixture",
    "quantile_gate",
    "train_val_test_split",
    "deterministic_shuffle",
    "replicate_by_weight",
]


def per_group_quota(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    n: int,
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Keep the top-``n`` rows per group under ``order_cols`` DESC.

    The deterministic domain-mixing primitive: "at most n documents per
    source/language, best first". One shuffle (window partitioned by
    the group key); no global sort. ``tiebreak_col`` must be a unique
    column making the order total — without one, ties are broken by
    shuffle arrival and the quota keeps different rows run-to-run, so
    it is required rather than silently defaulted."""
    if tiebreak_col is None:
        raise ValueError(
            "per_group_quota requires tiebreak_col (a unique column, "
            "e.g. the id) so the per-group order is total and the "
            "quota is deterministic"
        )
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c).desc() for c in order_cols], F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def quantile_gate(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
    tiebreak_col: str,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep the top ``keep_frac`` of each group by ``score_col`` — the
    "drop the bottom half by quality, per language" gate. The cutoff is
    rank-based (``ceil(group_count * keep_frac)``), so it is exact and
    deterministic where a percentile-threshold filter would wobble on
    ties; ``tiebreak_col`` (unique) makes the order total. Adds
    ``group_rank`` (1 = best in group) to the output.

    Scale: one shuffle — a window partitioned by the group key computes
    rank and group count in the same pass; no global sort and no second
    scan. Per-group data must fit a task's spill budget (windows spill
    to disk, not OOM).

    ``approx=True`` is the skew fallback for single-group-dominant
    corpora (one language = the whole corpus through one window
    partition): a map-side ``percentile_approx`` agg pre-computes a
    per-group score threshold padded past the sketch's rank-error bound
    (relative error ``1/accuracy``), broadcasts it back, and only the
    surviving ~``keep_frac`` of each group flows into the ranking
    window. The output is IDENTICAL to the exact path: the threshold
    filter is upward-closed in the score, so the gated rows are a
    prefix of each group's (score DESC, tiebreak) order and ranks
    among them equal global ranks; the padding guarantees no true
    top-k row is filtered (for groups smaller than ``accuracy`` the
    sketch is exact, for larger groups the pad of 5/accuracy covers
    the 1/accuracy error). Requires non-null scores (the exact path
    sorts nulls last; the threshold filter would drop them)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(
            f"quantile_gate: keep_frac must be in (0, 1], got {keep_frac}"
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    if approx:
        p_star = min(1.0, float(keep_frac) + 5.0 / accuracy)
        stats = df.groupBy(group_col).agg(
            F.count("*").alias("__n"),
            F.percentile_approx(
                score_col, F.lit(1.0 - p_star), F.lit(int(accuracy))
            ).alias("__t_lo"),
        ).withColumnRenamed(group_col, "__g")
        # eqNullSafe: a NULL group key is a group of its own in the
        # exact path's window, so the approx path must not silently
        # drop those rows at the join
        gated = df.join(
            F.broadcast(stats),
            F.col(group_col).eqNullSafe(F.col("__g")),
        ).filter(F.col(score_col) >= F.col("__t_lo"))
        return (
            gated.withColumn(
                "group_rank", F.row_number().over(w).cast("long")
            )
            .filter(
                F.col("group_rank")
                <= F.ceil(F.col("__n") * F.lit(float(keep_frac)))
            )
            .select(*df.columns, "group_rank")
        )
    cnt = Window.partitionBy(group_col)
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("long"))
        .withColumn("__cnt", F.count("*").over(cnt))
        .filter(
            F.col("group_rank")
            <= F.ceil(F.col("__cnt") * F.lit(float(keep_frac)))
        )
        .drop("__cnt")
    )


def token_budget_sample(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Rows in ``order_cols`` order while the running token total stays
    within ``budget`` (the first row is always taken if it alone
    overflows — standard greedy-prefix semantics: a row is kept when
    the budget minus all PRIOR rows' tokens is still positive).

    A single global-ordered window: correct for budget-sized outputs
    (the selection is small by construction); for corpus-sized budgets
    shard the budget per partition first."""
    order = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("__prior", prior)
        .filter(F.col("__prior") < budget)
        .drop("__prior")
    )


def token_budget_sample_sharded(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    descending: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """:func:`token_budget_sample` semantics (greedy prefix of the
    global order until the running token total reaches ``budget``)
    WITHOUT the single global-ordered window — the corpus-sized-budget
    path. Token counts must be non-negative, ``n_buckets >= 2``, and
    the primary order column must be non-null (checked in the same
    pass as the quantiles; the global form sorts NULLs by engine
    null-ordering rules, which bucket thresholds cannot reproduce —
    fail fast rather than silently diverge).

    Shape: approximate quantiles of the primary order column split the
    corpus into ``n_buckets`` order-respecting buckets (one map-side
    ``percentile_approx`` agg); per-bucket token sums (one tiny
    groupBy) give driver-side running totals over ``n_buckets``
    numbers; buckets wholly inside the budget pass with a narrow
    filter, buckets wholly beyond it are dropped, and ONLY the one
    boundary bucket (~1/n_buckets of the data) flows through the
    ordered window, seeded with the running total of the buckets
    before it. Output is row-for-row identical to the global-window
    form: bucket boundaries are score thresholds, so buckets are
    intervals of the global order and the boundary window's rank
    offset reproduces every row's exact prior sum."""
    if not order_cols:
        raise ValueError("token_budget_sample_sharded: order_cols is empty")
    if n_buckets < 2:
        raise ValueError(
            f"token_budget_sample_sharded: n_buckets must be >= 2 "
            f"(got {n_buckets}); use token_budget_sample for the "
            f"unsharded form"
        )
    primary = order_cols[0]
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_row = df.select(
        F.percentile_approx(
            primary, F.array(*[F.lit(q) for q in qs]), F.lit(10000)
        ).alias("qs"),
        F.max(F.col(primary).isNull().cast("int")).alias("has_null"),
    ).first()
    if bounds_row is not None and bounds_row["has_null"]:
        raise ValueError(
            f"token_budget_sample_sharded: NULL values in order column "
            f"{primary!r} — filter or fill them first"
        )
    bounds = bounds_row["qs"] if bounds_row is not None else None
    if not bounds:
        return df.filter(F.lit(False))
    bounds = sorted({float(b) for b in bounds})
    bucket = F.lit(0)
    for b in bounds:
        past = (
            F.lit(b) > F.col(primary)
            if descending
            else F.lit(b) < F.col(primary)
        )
        bucket = bucket + F.when(past, 1).otherwise(0)
    tagged = df.withColumn("__bucket", bucket)
    sums = {
        r["__bucket"]: r["s"]
        for r in tagged.groupBy("__bucket")
        .agg(F.sum(token_col).alias("s"))
        .collect()
    }
    cum = 0
    full: list = []
    boundary = None
    offset = 0
    for bi in range(len(bounds) + 1):
        s = int(sums.get(bi, 0) or 0)
        if cum + s < budget:
            full.append(bi)
            cum += s
        elif cum < budget:
            # cum < budget <= cum + s: greedy stops inside this bucket
            boundary, offset = bi, cum
            break
        else:
            break
    parts = []
    if full:
        parts.append(tagged.filter(F.col("__bucket").isin(full)))
    if boundary is not None:
        order = [
            F.col(c).desc() if descending else F.col(c).asc()
            for c in order_cols
        ]
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        prior = F.coalesce(F.sum(token_col).over(w), F.lit(0)) + F.lit(
            int(offset)
        )
        parts.append(
            tagged.filter(F.col("__bucket") == boundary)
            .withColumn("__prior", prior)
            .filter(F.col("__prior") < budget)
            .drop("__prior")
        )
    if not parts:
        return df.filter(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.drop("__bucket")


#: modulus for the engine-independent draw (prime, so the Knuth
#: multiplier sweeps all residues)
_DRAW_MOD = 1000003
_DRAW_MULT = 2654435761  # Knuth's 2^32 / phi


def shuffle_draw_params(seed: int) -> tuple:
    """Affine-permutation parameters over the prime draw modulus for
    :func:`deterministic_shuffle`: ``draw = (key*a + b) % M`` with a
    seed-DEPENDENT multiplier (``M`` prime, so any nonzero ``a`` is a
    bijection). Exposed so the correctness oracle inlines the same
    constants."""
    a = (_DRAW_MULT + seed * 4099) % _DRAW_MOD
    if a == 0:
        a = 1
    b = (seed * 7919) % _DRAW_MOD
    return a, b


def stratified_sample_deterministic(
    df: DataFrame,
    strata_col: str,
    fractions: Dict,
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sample whose draw is pure integer
    arithmetic over a unique ``key_col`` — engine-independent, so any
    SQL engine (and the DuckDB oracle) replays the exact row set,
    unlike ``sampleBy``'s engine-specific RNG.

    draw(key) = ((key % p + seed) * 2654435761) % p with prime
    p = 1000003; a row survives when draw < fraction * p. The key is
    reduced mod p *before* the multiply so the product stays far from
    int64 overflow (ANSI mode throws on overflow) at any key
    magnitude; the seed shifts the key BEFORE the multiplicative
    sweep, so consecutive seeds move every draw by ~428k (not by a
    near-zero constant) and select materially different rows. The
    sweep equidistributes consecutive keys, so realized rates track
    the requested fractions (bounded in tests); same narrow-plan
    shape as a WHERE — no shuffle at all."""
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    frac = F.lit(float(default_fraction))
    for stratum, fraction in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(float(fraction))
        ).otherwise(frac)
    return df.filter(draw < frac * _DRAW_MOD)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Assign each row a deterministic ``split`` label (train/val/test)
    from pure integer arithmetic over a unique ``key_col`` — the same
    engine-independent draw as :func:`stratified_sample_deterministic`,
    so the assignment is reproducible across engines, runs, and
    cluster sizes (a seeded ``rand()`` split changes membership with
    partitioning; a hash split pins membership to the key forever —
    what leakage-free eval requires: a document can never migrate from
    test into train between pipeline runs).

    Scale: a narrow projection, no shuffle; downstream writers
    partition by the ``split`` column."""
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError(
            "train_val_test_split: need val_frac, test_frac >= 0 and "
            f"val_frac + test_frac < 1, got {val_frac}, {test_frac}"
        )
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    test_cut = int(test_frac * _DRAW_MOD)
    val_cut = test_cut + int(val_frac * _DRAW_MOD)
    return df.withColumn(
        "split",
        F.when(draw < test_cut, F.lit("test"))
        .when(draw < val_cut, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def weighted_sample(
    df: DataFrame,
    weight,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-row Bernoulli sample whose keep probability is a COLUMN —
    quality-weighted subsampling (keep high-quality documents at a
    higher rate, the DCLM/FineWeb-style soft quality filter), with the
    same engine-independent integer draw as
    :func:`stratified_sample_deterministic`, so any SQL engine replays
    the exact row set.

    ``weight`` is a Column expression (or column name) giving each
    row's keep probability; values are clamped to [0, 1]. A row
    survives when ``draw(key) < clamp(weight) * p`` with the shared
    prime modulus — the draw is pure integer arithmetic over the
    unique ``key_col``, and the right-hand side is one correctly-
    rounded multiply, identical across engines.

    Scale: a narrow WHERE — no shuffle, no UDF; realized rates track
    the weights because the multiplicative sweep equidistributes
    consecutive keys (bounded in tests). A NaN weight drops the row
    (keep probability 0) — the conservative reading of an undefined
    weight; Spark's NaN-sorts-highest would otherwise clamp it to
    certain keep. NULL weights drop too (the comparison is null)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    wd = w.cast("double")
    clamped = F.when(F.isnan(wd), F.lit(0.0)).otherwise(
        F.least(F.greatest(wd, F.lit(0.0)), F.lit(1.0))
    )
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    return df.filter(draw < clamped * _DRAW_MOD)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    budget: int,
    seed: int = 42,
) -> DataFrame:
    """Temperature-smoothed mixture sampling (the multilingual-corpus
    recipe of mBERT / XLM-R, alpha = 0.5): draw ~``budget`` rows total
    with per-group allocation proportional to ``sqrt(n_g)`` — small
    groups are boosted relative to their share, large groups damped,
    without the starvation of a uniform split.

    Fully engine-exact: group weights are ``floor(sqrt(n_g * 10^4))``
    (an integer — sqrt is correctly rounded in IEEE and its argument
    stays under 2^53), and membership is the INTEGER comparison
    ``draw(key) * S * n_g < budget * w_g * p`` over the shared prime
    draw — no float division anywhere, so any SQL engine replays the
    exact row set. Expected kept per group = n_g * budget * w_g /
    (S * n_g) = budget * w_g / S; groups whose fair share exceeds
    their size keep everything (the comparison saturates past the
    draw range).

    Scale shape: one metadata-sized groupBy (group cardinality rows),
    its total via a broadcast single-row cross join, one broadcast
    join back (null-safe, so a NULL group samples like any other
    group rather than silently vanishing while its weight depresses
    everyone else's rate), then a narrow WHERE. Products stay in
    int64 up to ``n_g * S * p < 2^63`` (~1e12 row groups at 100-group
    corpora); ANSI mode fails loudly past that rather than
    wrapping."""
    if budget <= 0:
        raise ValueError("temperature_mixture: budget must be positive")
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .withColumnRenamed(group_col, "__g")
        .withColumn(
            "__w",
            F.floor(F.sqrt((F.col("__n") * 10000).cast("double"))).cast(
                "long"
            ),
        )
    )
    total = counts.agg(F.sum("__w").alias("__S"))
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    return (
        df.join(
            F.broadcast(counts),
            F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .crossJoin(F.broadcast(total))
        .filter(
            draw * F.col("__S") * F.col("__n")
            < F.lit(int(budget)) * F.col("__w") * F.lit(_DRAW_MOD)
        )
        .drop("__g", "__n", "__w", "__S")
    )


def rebalance_mixture(
    df: DataFrame,
    group_col: str,
    target_weights: Dict,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Downsample groups so the surviving corpus matches a target
    mixture (e.g. ``{"web": 0.6, "code": 0.3, "books": 0.1}``) while
    keeping as many rows as possible.

    The binding group is the one with the least data relative to its
    weight: ``scale = min_g(count_g / weight_g)`` rows of total output
    are achievable, so each group keeps ``weight_g * scale / count_g``
    of its rows via the same engine-independent deterministic draw as
    :func:`stratified_sample_deterministic` (DuckDB replays the exact
    row set). Groups absent from ``target_weights`` are dropped — a
    mixture definition is a whitelist.

    Plan shape at 100 TB: one groupBy for counts (tiny result), the
    min-scale as a broadcast aggregate, one broadcast join of the
    per-group fraction back onto the corpus, then a WHERE — the corpus
    is scanned once and never shuffled."""
    if not target_weights:
        raise ValueError("rebalance_mixture: target_weights is empty")
    weights = F.create_map(
        *[
            F.lit(x)
            for kv in sorted(target_weights.items())
            for x in (kv[0], float(kv[1]))
        ]
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("n_g"))
        .withColumn("w_g", weights[F.col(group_col)])
        .filter(F.col("w_g").isNotNull())
    )
    scale = counts.agg(F.min(F.col("n_g") / F.col("w_g")).alias("scale"))
    fracs = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        (F.col("w_g") * F.col("scale") / F.col("n_g")).alias("keep_frac"),
    )
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    return (
        df.join(F.broadcast(fracs), group_col)
        .filter(draw < F.col("keep_frac") * _DRAW_MOD)
        .select(*df.columns)
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Stable global corpus shuffle for training epochs: every row gets
    a (``shard``, ``shard_pos``) coordinate that is a pure function of
    the unique key and the seed — reshuffling between epochs is just a
    new seed, and any engine (including the DuckDB oracle) reproduces
    the exact permutation. Readers consume shard files in order and
    rows by ``shard_pos`` within each; the multiplicative draw
    decorrelates neighboring keys so the read order is
    statistically shuffled.

    The seed enters through the MULTIPLIER (``a(seed)``, via
    :func:`shuffle_draw_params`), not additively: an additive seed
    before a fixed multiplier would shift every key's draw by the
    same constant, so "new epoch, new seed" would replay almost the
    same read order (a rotation, measured at >99% preserved adjacent
    pairs). Distinct multipliers mod the prime draw modulus give
    genuinely different permutations per seed.

    Scale: NO global sort — the only shuffle partitions by ``shard``
    and each window ranks ~corpus/n_shards rows; pick ``n_shards`` so
    a shard fits a task's spill budget (windows spill, not OOM)."""
    if n_shards <= 0:
        raise ValueError(f"deterministic_shuffle: n_shards must be > 0")
    a, b = shuffle_draw_params(seed)
    draw = (F.col(key_col) % _DRAW_MOD * F.lit(a) + F.lit(b)) % _DRAW_MOD
    with_draw = df.withColumn("__draw", draw)
    shard = (F.col("__draw") % n_shards).cast("long")
    w = Window.partitionBy(shard).orderBy(
        F.col("__draw").asc(), F.col(key_col).asc()
    )
    return (
        with_draw.withColumn("shard", shard)
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("__draw")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Seeded per-stratum Bernoulli sample (``df.sampleBy``).

    Strata absent from ``fractions`` get ``default_fraction``. RNG is
    engine-specific, so this has no cross-engine oracle — tests bound
    the per-stratum sample rate statistically instead."""
    if default_fraction:
        present = {r[0] for r in df.select(strata_col).distinct().collect()}
        fractions = {
            **{k: default_fraction for k in present},
            **fractions,
        }
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def replicate_by_weight(
    df: DataFrame,
    weight,
    key_col: str,
    max_copies: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic UPSAMPLING by expected copy count — the
    multi-epoch replication recipe (DCLM / Llama-style "high-quality
    data is seen several times per epoch"): ``weight`` is a COLUMN
    giving each row's expected number of copies (2.3 → 2 copies plus a
    30% chance of a third), and the fractional part resolves through
    the library's shared engine-independent integer draw, so any SQL
    engine replays the exact replicated row set. Weights clamp to
    ``[0, max_copies]``; weights under 1 become a downsampling
    probability (0.4 → the row survives with one copy 40% of the
    time); NaN/NULL weights drop the row (the
    :func:`weighted_sample` convention).

    Output: the input rows with ``n_copies`` and ``copy_idx``
    (1-based) — one row per copy. Pair with
    :func:`deterministic_shuffle` keyed on ``(key, copy_idx)`` so the
    copies spread across the training order instead of arriving
    back-to-back.

    Scale: a narrow projection + row-local explode — zero shuffle;
    output volume is the weighted sum, which is the point."""
    if max_copies < 1:
        raise ValueError(
            f"replicate_by_weight: max_copies must be >= 1, got "
            f"{max_copies}"
        )
    w = F.col(weight) if isinstance(weight, str) else weight
    wd = w.cast("double")
    clamped = F.when(F.isnan(wd), F.lit(0.0)).otherwise(
        F.least(F.greatest(wd, F.lit(0.0)), F.lit(float(max_copies)))
    )
    base = F.floor(clamped)
    frac = clamped - base
    draw = (
        (F.col(key_col) % _DRAW_MOD + F.lit(seed)) * F.lit(_DRAW_MULT)
    ) % _DRAW_MOD
    n = F.least(
        base + F.when(draw < frac * _DRAW_MOD, F.lit(1)).otherwise(F.lit(0)),
        F.lit(max_copies),
    ).cast("long")
    # sequence(1, 0) would count DOWN in Spark — guard the empty case
    copies = F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)).otherwise(
        F.array().cast("array<long>")
    )
    return df.withColumn("n_copies", n).withColumn(
        "copy_idx", F.explode(copies)
    )
