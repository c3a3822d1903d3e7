"""Join operators Spark lacks natively: banded range join and as-of join.

Spark executes a pure range/theta predicate as a BroadcastNestedLoopJoin
— O(|L|·|R|). Both operators here convert the range semantics into
equi-joins on derived keys so Catalyst uses hash joins:

- **range_join**: band the numeric axis into width-``band`` buckets;
  each left row joins its own and neighboring buckets, then the exact
  predicate filters. Cost drops from |L|·|R| to Σ per-bucket products —
  data-linear when the band matches the predicate tolerance.
- **asof_join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` (per key) — the time-series join. Implemented
  as union + per-key window (sort-based, one shuffle on the key), which
  at 100 TB is a single repartition by key: no driver involvement, skew
  handled by AQE. The ``tolerance`` variant drops matches older than the
  window."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "range_join",
    "asof_join",
    "salted_join",
    "write_bucketed",
    "bucketed_equi_join",
    "interval_overlap_join",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: Optional[str] = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and by default
    sorted) on ``key`` — the storage-layout half of the shuffle-free
    join: two tables bucketed on their join keys with the SAME bucket
    count join with NO exchange (and, when sorted, no sort), because
    each bucketed FileScan already reports the hash partitioning the
    sort-merge join requires.

    This is THE lever for a 100-TB fact table that joins on the same
    key query after query (orders ⋈ lineitem on orderkey): pay the
    shuffle once at ingest, never again. ``n_buckets`` must match
    across co-joined tables and should track cluster parallelism.
    ``path`` makes the table external (data at ``path``, name in the
    session catalog); without it Spark manages it under the warehouse
    dir."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_equi_join(
    spark,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two :func:`write_bucketed` tables on their bucket
    keys. Catalyst sees matching ``HashPartitioning`` from both scans
    and plans a zero-exchange sort-merge join (plan-contract-pinned in
    tests/test_plan_contracts.py) — bucket-local, no shuffle network
    traffic, the co-located join shape for repeated big-big joins."""
    lhs = spark.table(left_table)
    rhs = spark.table(right_table)
    return lhs.join(rhs, lhs[left_on] == rhs[right_on], how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting — the standard mitigation when a few
    hot keys would otherwise send one shuffle partition 100x the data.

    Each left row gets a deterministic pseudo-random salt (hash of the
    whole row, stable across retries); the right side replicates once
    per salt. The join key becomes (key, salt), spreading every hot key
    over ``n_salts`` partitions. Result set is IDENTICAL to the plain
    join (verified against it in the oracle suite); cost is an
    n_salts-fold replication of the right side — use when right is the
    small-ish side and left is skewed. (AQE's skew-join handles many
    cases automatically; salting is the explicit, planner-independent
    form.)"""
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), n_salts)
    lhs = left.withColumn("__salt", salt_l)
    rhs = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = lhs.join(rhs, [on, "__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    lower: float,
    upper: float,
    band: Optional[float] = None,
) -> DataFrame:
    """Inner join on ``right_on - left_on ∈ [lower, upper]`` via banded
    equi-join (plus exact filter).

    ``band`` defaults to the interval width; each left row probes
    ceil((upper-lower)/band)+1 buckets."""
    width = upper - lower
    if width < 0:
        raise ValueError("upper must be >= lower")
    band = band or max(width, 1e-9)
    n_buckets = int(width / band) + 2

    l_bucket = F.floor((F.col(left_on) + F.lit(lower)) / band)
    probes = F.explode(
        F.array(*[l_bucket + i for i in range(n_buckets)])
    ).alias("__bucket")
    lhs = left.select("*", probes)
    rhs = right.withColumn("__bucket", F.floor(F.col(right_on) / F.lit(band)))

    diff = F.col(right_on) - F.col(left_on)
    return (
        lhs.join(rhs, "__bucket")
        .filter((diff >= lower) & (diff <= upper))
        .drop("__bucket")
    )


def _as_ticks(col, dtype):
    """EXACT comparable ticks for time arithmetic: timestamps become
    whole microseconds (``unix_micros`` — epoch-seconds DOUBLES round
    independently per value and can flip an equidistant-tie
    comparison by 1 ulp at modern epochs, silently breaking the
    'earlier right row wins' rule); numeric time columns compare
    natively. Spark 4.1 refuses TIMESTAMP_NTZ -> DOUBLE anyway, so
    NTZ routes through TIMESTAMP (session tz pinned UTC repo-wide;
    the offset cancels in every difference)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(dtype, TimestampNTZType):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    return col


def _ticks_per_second(dtype) -> float:
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampNTZType, TimestampType)):
        return 1_000_000.0
    return 1.0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (optionally within ``tolerance_seconds``),
    matching per ``by`` keys — pandas ``merge_asof`` semantics,
    distributed.

    Plan: tag both sides, union, repartition on ``by``, and carry the
    latest right values forward with a last-value window — one shuffle,
    sort within partitions, no nested loop."""
    by = list(by or [])
    l_cols = [c for c in left.columns if c != on and c not in by]
    r_cols = [c for c in right.columns if c != on and c not in by]

    lhs = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(
                f"{right_prefix}{c}"
            )
            for c in r_cols
        ],
        F.lit(None).cast(left.schema[on].dataType).alias("__r_t"),
    )
    rhs = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        F.col(on).alias("__r_t"),
    )
    unioned = lhs.unionByName(rhs)

    # right rows sort before left rows at equal timestamps so a left row
    # can match a right row with the exact same time
    if not by:
        import warnings

        warnings.warn(
            "asof_join without 'by' keys needs a global time order and "
            "collapses to a single partition — fine for small inputs, "
            "not for the 100-TB path; provide per-entity keys",
            stacklevel=2,
        )
    w = (
        Window.partitionBy(*by)
        if by
        else Window.partitionBy(F.lit(1))
    ).orderBy(F.col("__t"), F.col("__is_left")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        *by,
        "__t",
        "__is_left",
        *l_cols,
        *[
            F.last(f"{right_prefix}{c}", ignorenulls=True).over(w).alias(
                f"{right_prefix}{c}"
            )
            for c in r_cols
        ],
        F.last("__r_t", ignorenulls=True).over(w).alias("__r_t"),
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        _tt = left.schema[on].dataType
        within = (
            _as_ticks(F.col("__t"), _tt)
            - _as_ticks(F.col("__r_t"), _tt)
            <= tolerance_seconds * _ticks_per_second(_tt)
        )
        out = out.select(
            *by,
            "__t",
            *l_cols,
            *[
                F.when(within, F.col(f"{right_prefix}{c}"))
                .otherwise(F.lit(None))
                .alias(f"{right_prefix}{c}")
                for c in r_cols
            ],
            F.when(within, F.col("__r_t")).otherwise(F.lit(None)).alias(
                f"{right_prefix}{on}"
            ),
        )
    else:
        out = out.select(
            *by,
            "__t",
            *l_cols,
            *[F.col(f"{right_prefix}{c}") for c in r_cols],
            F.col("__r_t").alias(f"{right_prefix}{on}"),
        )
    return out.withColumnRenamed("__t", on)


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row whose ``on`` time is
    CLOSEST in EITHER direction (j08) — pandas ``merge_asof(...,
    direction='nearest')`` semantics, distributed. :func:`asof_join`
    is backward-only (the "state as of" read); nearest is the sensor-
    alignment join (match a reading to the closest calibration event,
    before or after). Ties (equidistant before/after) resolve to the
    EARLIER right row, pandas's rule.

    Plan: the asof_join shape run once in each direction over ONE
    union + ONE shuffle on ``by`` — the backward pass carries the
    latest right values forward (last over preceding rows), the
    forward pass the next right values backward (first over following
    rows), and a null-safe comparison picks the nearer side. At equal
    timestamps the right row orders before the left row, so it lands
    in the backward carry with distance 0 and always wins.

    ``tolerance_seconds`` bounds |dt|; out-of-tolerance matches null
    out (left rows always survive — left-outer semantics)."""
    from pyspark.sql.types import StructField, StructType

    time_type = left.schema[on].dataType
    by = list(by or [])
    l_cols = [c for c in left.columns if c != on and c not in by]
    r_cols = [c for c in right.columns if c != on and c not in by]

    # the right row rides as ONE struct so the nearest match is
    # atomic — carrying each value column independently with
    # last/first(ignorenulls) would backfill a NULL field of the
    # nearest row from a different, farther right row (a composite
    # row no input ever contained)
    r_struct = StructType(
        [StructField("__rt", right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in r_cols]
    )
    lhs = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(r_struct).alias("__r"),
    )
    rhs = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.struct(
            F.col(on).alias("__rt"), *[F.col(c) for c in r_cols]
        ).alias("__r"),
    )
    unioned = lhs.unionByName(rhs)
    if not by:
        import warnings

        warnings.warn(
            "nearest_join without 'by' keys needs a global time order "
            "and collapses to a single partition — fine for small "
            "inputs, not for the 100-TB path; provide per-entity keys",
            stacklevel=2,
        )
    base = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    ).orderBy(F.col("__t"), F.col("__is_left"))
    w_back = base.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, Window.unboundedFollowing)
    carried = unioned.select(
        *by,
        "__t",
        "__is_left",
        *l_cols,
        F.last("__r", ignorenulls=True).over(w_back).alias("__b"),
        F.first("__r", ignorenulls=True).over(w_fwd).alias("__f"),
    ).filter(F.col("__is_left") == 1)
    bt, ft = F.col("__b.__rt"), F.col("__f.__rt")
    t_k = _as_ticks(F.col("__t"), time_type)
    back_dt = t_k - _as_ticks(bt, time_type)
    fwd_dt = _as_ticks(ft, time_type) - t_k
    use_back = bt.isNotNull() & (ft.isNull() | (back_dt <= fwd_dt))
    chosen = F.when(use_back, F.col("__b")).otherwise(F.col("__f"))
    chosen_t = chosen.getField("__rt")
    if tolerance_seconds is not None:
        within = (
            F.abs(t_k - _as_ticks(chosen_t, time_type))
            <= tolerance_seconds * _ticks_per_second(time_type)
        )
    else:
        within = chosen_t.isNotNull()
    picked = F.when(within, chosen).otherwise(
        F.lit(None).cast(r_struct)
    )
    out = carried.select(
        *by,
        "__t",
        *l_cols,
        *[
            picked.getField(c).alias(f"{right_prefix}{c}")
            for c in r_cols
        ],
        picked.getField("__rt").alias(f"{right_prefix}{on}"),
    )
    return out.withColumnRenamed("__t", on)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    band: float,
    key: Optional[str] = None,
    how_filter=None,
) -> DataFrame:
    """Inner join on INTERVAL OVERLAP — ``[ls, le] ∩ [rs, re] ≠ ∅``
    (closed intervals: ``le >= rs AND re >= ls``) — the
    genomics/session/maintenance-window join Spark would otherwise
    nested-loop. Bounds must be numeric (epoch-convert timestamps
    first); rows with ``start > end`` are malformed intervals and
    drop out (they overlap nothing).

    Scale shape: each interval explodes into the width-``band``
    buckets it spans and the join is an equi-join on (``key``,)
    bucket — hash join, never a cross product. A pair meeting in
    several buckets is emitted ONCE without any distinct: only the
    bucket containing ``max(ls, rs)`` (the overlap's left edge, which
    both sides necessarily exploded) reports it. Choose ``band`` near
    the typical interval length — explode factor is
    ``len/band + 1`` per row, and per-bucket products bound the join.
    ``key`` adds an equi-key (per-user/per-chromosome) to the bucket
    key; ``how_filter`` is an optional extra Column predicate applied
    with the exact overlap check (e.g. an id inequality for
    self-joins). Column names must not collide across the inputs
    (alias first); ``key`` is the one shared name."""
    if band <= 0:
        raise ValueError(f"interval_overlap_join: band must be > 0, got {band}")
    shared = set(left.columns) & set(right.columns) - ({key} if key else set())
    if shared:
        raise ValueError(
            f"interval_overlap_join: column names collide across inputs: "
            f"{sorted(shared)} — alias before joining"
        )
    for df in (left, right):
        if "__b" in df.columns:
            raise ValueError(
                "interval_overlap_join: '__b' is reserved for the "
                "bucket key — rename that input column first"
            )

    def burst(df, start, end):
        return df.filter(F.col(start) <= F.col(end)).withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / band).cast("long"),
                    F.floor(F.col(end) / band).cast("long"),
                )
            ),
        )

    l = burst(left, left_start, left_end)
    r = burst(right, right_start, right_end)
    on = ([key] if key else []) + ["__b"]
    exact = (F.col(left_end) >= F.col(right_start)) & (
        F.col(right_end) >= F.col(left_start)
    )
    first_bucket = F.col("__b") == F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / band
    ).cast("long")
    out = l.join(r, on).filter(exact & first_bucket)
    if how_filter is not None:
        out = out.filter(how_filter)
    return out.drop("__b")


def interpolation_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Optional[Sequence[str]] = None,
    value_col: str = "value",
    out_col: str = "interp_value",
) -> DataFrame:
    """Linear-interpolation join (j07) — align a timeseries to
    reference points the way sensor/market pipelines do (pandas
    ``merge_asof`` + ``interpolate``, distributed): for each left
    row, bracket it with the latest right row at-or-before and the
    earliest at-or-after (per ``by`` keys) and emit

        prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)

    Exactly one bracketing side present -> that side's value
    (flat extrapolation); none -> NULL. An exact-time match brackets
    itself on both sides, so the emitted value is exactly that row's.

    The right side must be unique per (by, on) — pre-aggregate
    duplicates first (ties would make "the" bracketing value
    ambiguous under any engine).

    Plan — one shuffle total, no joins at all: both sides tag and
    union (the :func:`asof_join` shape), one exchange on ``by``, and
    BOTH brackets come from last-value windows over the same
    partitioning — the backward pass in (t asc, right-first) order,
    the forward pass in (t desc, right-first) order; Catalyst reuses
    the exchange and only re-sorts. Time arithmetic runs on exact
    integer microseconds (``unix_micros``), so the interpolation is
    three IEEE ops on engine-identical inputs — SQL-replayable
    bit-for-bit (DuckDB: two ASOF joins + ``epoch_us``)."""
    from pyspark.sql import types as T

    by = list(by or [])
    l_cols = [c for c in left.columns if c != on and c not in by]

    def t_num(col):
        dt = left.schema[on].dataType
        if isinstance(dt, T.TimestampNTZType):
            # the suite pins the session timezone to UTC, so NTZ ->
            # TS is the identity wall time and epoch micros agree
            # with DuckDB's epoch_us on its (NTZ-like) TIMESTAMP
            return F.unix_micros(col.cast("timestamp")).cast("double")
        if isinstance(dt, T.TimestampType):
            return F.unix_micros(col).cast("double")
        return col.cast("double")

    lhs = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast("double").alias("__r_v"),
    )
    # a NULL-valued or NULL-timed right row is not a reference point:
    # keeping either would let the bracket TIME come from a row whose
    # VALUE the last-value window skips (ignorenulls) — a mismatched
    # (t, v) pair and a silently wrong slope
    rhs = right.filter(
        F.col(value_col).isNotNull() & F.col(on).isNotNull()
    ).select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.col(value_col).cast("double").alias("__r_v"),
    )
    unioned = lhs.unionByName(rhs)
    if not by:
        import warnings

        warnings.warn(
            "interpolation_join without 'by' keys needs a global time "
            "order and collapses to a single partition — provide "
            "per-entity keys for the 100-TB path",
            stacklevel=2,
        )

    part = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    # right rows order before left rows at equal times in BOTH
    # directions, so an exact-time match brackets itself
    w_back = part.orderBy(F.col("__t").asc(), F.col("__is_left").asc())
    w_fwd = part.orderBy(F.col("__t").desc(), F.col("__is_left").asc())
    rt = F.when(F.col("__is_left") == 0, F.col("__t"))
    back = w_back.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w_fwd.rowsBetween(Window.unboundedPreceding, 0)
    tagged = (
        unioned.withColumn(
            "__prev_v", F.last("__r_v", ignorenulls=True).over(back)
        )
        .withColumn("__prev_t", F.last(rt, ignorenulls=True).over(back))
        .withColumn(
            "__next_v", F.last("__r_v", ignorenulls=True).over(fwd)
        )
        .withColumn("__next_t", F.last(rt, ignorenulls=True).over(fwd))
    )
    t, pt, nt = (
        t_num(F.col("__t")),
        t_num(F.col("__prev_t")),
        t_num(F.col("__next_t")),
    )
    interp = (
        F.when(F.col("__t").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("__prev_t").isNotNull() & F.col("__next_t").isNotNull(),
            F.when(nt == pt, F.col("__prev_v")).otherwise(
                F.col("__prev_v")
                + (F.col("__next_v") - F.col("__prev_v"))
                * (t - pt)
                / (nt - pt)
            ),
        )
        .when(F.col("__prev_t").isNotNull(), F.col("__prev_v"))
        .when(F.col("__next_t").isNotNull(), F.col("__next_v"))
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        tagged.filter(F.col("__is_left") == 1)
        .withColumn(out_col, interp)
        .select(*by, F.col("__t").alias(on), *l_cols, out_col)
    )
