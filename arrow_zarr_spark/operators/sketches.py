"""Bounded-memory distinct-counting: the KMV (k-minimum-values)
sketch with an exactness certificate.

``COUNT(DISTINCT v)`` per group shuffles one row per distinct key —
at web scale that is billions of rows for a single statistic. KMV
(Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"; the public basis for every engine's approx_count_distinct
family) keeps only the k smallest distinct hash values per group:
fixed memory, mergeable across partitions, and — unlike a raw
estimator — self-certifying: when fewer than k distinct hashes exist
the sketch held ALL of them, so the count is exact and the DuckDB
oracle can hash-match it.

Reference context: the reference engine stubs statistics entirely
(arrow-zarr opener.rs:171-173) and has no sketch layer; this module
is part of the repo's training-data-pipeline extension alongside the
Misra-Gries heavy hitters (text.py) and the approx aggregates (r26).

Scale shape: one narrow JVM-side hash projection, one Arrow-batched
per-partition k-min kernel, then an exact SQL tail over at most
``n_partitions * k`` 16-byte rows per group — shuffle volume is
independent of the data's distinct cardinality. Both regimes are
deterministic AND partition-invariant: the union of per-partition
k-min sets always contains the global k smallest distinct hashes, so
the tail reconstructs the same global sketch however the input was
split.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_quantiles", "grouped_heavy_hitters", "kmv_distinct"]


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 8192,
) -> DataFrame:
    """Per-group distinct count of ``value_col`` in bounded memory.

    Returns (group_col, n_distinct, is_exact) where ``is_exact`` is
    true iff the group's sketch never filled — i.e. the group has
    fewer than ``k`` distinct hash values, so ``n_distinct`` is the
    true count (modulo 64-bit hash collisions, ~d²/2⁶⁵ — negligible
    below billions of distinct keys). Groups at or past ``k`` report
    the standard KMV estimate ``(k-1)/u_(k)`` (u_(k) = the k-th
    smallest hash mapped to (0,1]); relative error ~1/sqrt(k-2).

    Plan:
    1. JVM-side ``xxhash64`` projection (no Python in the row path);
       NULL values are dropped first to match ``COUNT(DISTINCT)``
       semantics (xxhash64 would otherwise fold them to the seed).
    2. A per-partition k-min kernel over Arrow batches: per group,
       merge the batch's hashes into a sorted ≤k array via
       ``np.unique`` (C path) — memory is O(n_groups * k) per
       partition, the usual per-group-aggregate bound.
    3. An exact relational tail over the emitted candidates
       (``<= n_partitions * k`` rows per group): global dedupe, rank
       by hash, keep rank ≤ k, then count + k-th hash per group.
       Signed-long order is used consistently in both the kernel and
       the tail, so the (0,1] mapping ``(h + 2⁶³ + 1)/2⁶⁴`` is
       monotone and the reconstructed sketch is exactly the global
       k-min set.
    """
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"kmv_distinct: need k >= 2, got k={k}")
    kk = int(k)

    hashed = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("grp"),
        F.xxhash64(F.col(value_col)).alias("h"),
    )

    def kmin_kernel(batches):
        state: dict = {}  # grp -> ascending np.int64 array, len <= kk
        for pdf in batches:
            if not len(pdf):
                continue
            for grp, sub in pdf.groupby("grp", sort=False, dropna=False):
                new = sub["h"].to_numpy(dtype=np.int64)
                cur = state.get(grp)
                merged = np.unique(
                    new if cur is None else np.concatenate([cur, new])
                )
                state[grp] = merged[:kk]
        for grp, arr in state.items():
            yield pd.DataFrame({"grp": grp, "h": arr})

    candidates = hashed.mapInPandas(kmin_kernel, schema="grp string, h long")

    w = Window.partitionBy("grp").orderBy("h")
    sketch = (
        candidates.distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= kk)
        .groupBy("grp")
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth"))
    )

    # k-th smallest hash mapped to (0,1]; double rounding of the low
    # bits is ~2⁻¹¹ relative — far under the estimator's own error.
    u_k = (F.col("kth").cast("double") + 2.0**63 + 1.0) / 2.0**64
    return sketch.select(
        F.col("grp").alias(group_col),
        F.when(F.col("n_kept") < kk, F.col("n_kept"))
        .otherwise(F.round(F.lit(float(kk - 1)) / u_k))
        .cast("long")
        .alias("n_distinct"),
        (F.col("n_kept") < kk).alias("is_exact"),
    )


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """Per-group top-``k`` values in bounded memory — the keyed form
    of ``text.heavy_hitters`` (t16), sharing its Misra-Gries +
    exact-recount plan and its exactness law: any value with in-group
    count > N_g,p/(capacity+1) in some partition survives that
    partition's summary, so every global heavy hitter reaches the
    exact recount. ``is_exact`` is true for a group iff NO partition
    summary for it ever overflowed (every count in every summary was
    exact), which certifies the whole top-k.

    Returns (group_key, value, total_freq, rank, is_exact), values as
    strings (hash/recount domain), rank by (count desc, value asc).

    Scale shape: one Arrow-batched MG pass (per-partition state is
    O(n_groups * capacity) — the per-group-aggregate bound), a
    DISTINCT over candidate rows (<= n_partitions * capacity per
    group), a broadcast candidate gate on the recount (swap to a plain
    equi-join when n_groups * capacity outgrows the broadcast
    threshold), then a groupBy over candidates only — shuffle volume
    is independent of the value domain's cardinality."""
    import numpy as np  # noqa: F401
    import pandas as pd

    if k < 1 or capacity < k:
        raise ValueError(
            f"grouped_heavy_hitters: need capacity >= k >= 1, got "
            f"k={k}, capacity={capacity}"
        )
    cap = int(capacity)

    # NULL groups are dropped up front (documented): the recount's
    # equi-joins are not null-safe, so a kept null group would emit
    # summaries but silently vanish from the output — and diverge
    # from the streaming face, which keys state by the same contract
    keyed = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("v"),
    )

    def mg_kernel(batches):
        counters: dict = {}  # grp -> {v: est}
        reduced: dict = {}  # grp -> bool
        for pdf in batches:
            if not len(pdf):
                continue
            for grp, sub in pdf.groupby("grp", sort=False, dropna=False):
                ctr = counters.setdefault(grp, {})
                vc = sub["v"].value_counts()
                for val, cnt in vc.items():
                    ctr[val] = ctr.get(val, 0) + int(cnt)
                if len(ctr) > cap:
                    values = sorted(ctr.values(), reverse=True)
                    cut = values[cap]
                    counters[grp] = {
                        t: c - cut for t, c in ctr.items() if c > cut
                    }
                    reduced[grp] = True
        for grp, ctr in counters.items():
            if not ctr:
                # an annihilated summary still carries information:
                # this partition REDUCED the group, so the group must
                # not be certified exact — emit a null-value marker
                yield pd.DataFrame(
                    {"grp": [grp], "v": [None], "reduced": [True]}
                )
                continue
            yield pd.DataFrame(
                {
                    "grp": grp,
                    "v": list(ctr.keys()),
                    "reduced": bool(reduced.get(grp, False)),
                }
            )

    summaries = keyed.mapInPandas(
        mg_kernel, schema="grp string, v string, reduced boolean"
    )
    # a group is exact iff no partition summary for it ever reduced —
    # including partitions whose summary annihilated (null markers)
    exact_flags = summaries.groupBy("grp").agg(
        (~F.max("reduced")).alias("is_exact")
    )
    cands = (
        summaries.filter(F.col("v").isNotNull())
        .select("grp", "v")
        .distinct()
    )
    counted = (
        keyed.join(F.broadcast(cands), ["grp", "v"])
        .groupBy("grp", "v")
        .agg(F.count("*").alias("total_freq"))
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("total_freq").desc(), F.col("v")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .join(F.broadcast(exact_flags), "grp")
        .select(
            F.col("grp").alias("group_key"),
            F.col("v").alias("value"),
            "total_freq",
            F.col("rank").cast("long").alias("rank"),
            "is_exact",
        )
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs,
    group_col: Optional[str] = None,
    accuracy: int = 10000,
) -> DataFrame:
    """EXACT per-group quantiles without a global sort — the
    sketch-bracket-then-select plan (the classic distributed
    selection refinement; Spark's own ``percentile`` collects every
    group's values into executor memory, r32's shape, which a 100-TB
    group cannot do):

    1. one pass: per-group counts + an approx-percentile BRACKET
       ``[c_lo, c_hi]`` around each target (rank error of the sketch
       is <= n/accuracy, so bracketing at p +- 2/accuracy over-covers;
       p near 0/1 clamps to the group min/max);
    2. one pass: EXACT ranks of the bracket ends (conditional
       partial-aggregated sums — n_lt(c_lo), n_le(c_hi)); brackets
       the sketch got wrong (possible only adversarially) fall back
       to [min, max], never to a wrong answer;
    3. the gap rows (v in [c_lo, c_hi], ~4n/accuracy per target) are
       the ONLY rows that shuffle: a per-(group, prob) window picks
       the (k - n_lt(c_lo))-th smallest, where k = max(1, ceil(p*n))
       — SQL ``percentile_disc``/DuckDB ``quantile_disc`` semantics,
       so the oracle hash-matches on real data values.

    The answer is exact regardless of the sketch's quality — the
    sketch only sizes the gap. Returns (group_key, prob, value),
    one row per group per prob."""
    import math

    # dedupe (order-preserving): a duplicated prob would join its
    # bracket against the base twice and double the exact rank
    # counts — a silently wrong selection index
    probs = list(dict.fromkeys(float(p) for p in probs))
    if not probs or any(p < 0 or p > 1 for p in probs):
        raise ValueError(
            f"exact_quantiles: probs must be in [0, 1], got {probs}"
        )
    delta = 2.0 / float(accuracy)

    gexpr = (
        F.col(group_col).cast("string")
        if group_col
        else F.lit("all")
    ).alias("grp")
    base = df.filter(F.col(value_col).isNotNull()).select(
        gexpr, F.col(value_col).alias("v")
    )

    lo_ps = [max(0.0, p - delta) for p in probs]
    hi_ps = [min(1.0, p + delta) for p in probs]
    stats = base.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.percentile_approx("v", lo_ps, accuracy).alias("clo"),
        F.percentile_approx("v", hi_ps, accuracy).alias("chi"),
    )
    # one bracket row per (group, prob); clamp the ends at min/max
    pr = F.posexplode(F.array(*[F.lit(p) for p in probs]))
    brackets = stats.select(
        "grp", "n", "vmin", "vmax", "clo", "chi", pr.alias("pi", "prob")
    ).select(
        "grp",
        "n",
        "vmin",
        "vmax",
        "prob",
        F.greatest(F.lit(1), F.ceil(F.col("prob") * F.col("n")))
        .cast("long")
        .alias("k"),
        F.least(
            F.element_at(F.col("clo"), F.col("pi") + 1), F.col("vmax")
        ).alias("c_lo"),
        F.greatest(
            F.element_at(F.col("chi"), F.col("pi") + 1), F.col("vmin")
        ).alias("c_hi"),
    )

    # exact ranks of the bracket ends, one conditional-agg pass
    joined = base.join(F.broadcast(brackets), "grp")
    ranks = joined.groupBy("grp", "prob", "k", "n", "vmin", "vmax").agg(
        F.sum(F.when(F.col("v") < F.col("c_lo"), 1).otherwise(0))
        .alias("n_lt_lo"),
        F.sum(F.when(F.col("v") <= F.col("c_hi"), 1).otherwise(0))
        .alias("n_le_hi"),
        F.first("c_lo").alias("c_lo"),
        F.first("c_hi").alias("c_hi"),
    )
    ok = (F.col("n_lt_lo") < F.col("k")) & (
        F.col("k") <= F.col("n_le_hi")
    )
    verified = ranks.select(
        "grp",
        "prob",
        "k",
        F.when(ok, F.col("c_lo")).otherwise(F.col("vmin")).alias("c_lo"),
        F.when(ok, F.col("c_hi")).otherwise(F.col("vmax")).alias("c_hi"),
        F.when(ok, F.col("n_lt_lo")).otherwise(F.lit(0)).alias("n_lt_lo"),
    )

    # gap selection: only bracket rows shuffle. verified derives from
    # base, so disambiguate the join keys by renaming its side.
    vr = verified.select(
        F.col("grp").alias("g2"),
        "prob",
        "k",
        "c_lo",
        "c_hi",
        "n_lt_lo",
    )
    gap = base.join(
        F.broadcast(vr),
        on=[
            F.col("grp") == F.col("g2"),
            F.col("v") >= F.col("c_lo"),
            F.col("v") <= F.col("c_hi"),
        ],
    ).select("grp", "prob", "k", "n_lt_lo", "v")
    w = Window.partitionBy("grp", "prob").orderBy("v")
    return (
        gap.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == F.col("k") - F.col("n_lt_lo"))
        .select(
            F.col("grp").alias("group_key"),
            "prob",
            F.col("v").alias("value"),
        )
    )
