"""Event-stream operators: windowed aggregation, sessionization,
custom stateful processing.

Each operator works on both a batch DataFrame and a streaming one
(identical plan shape — Structured Streaming's contract); watermarks
only attach on streams. Scale notes: all state is keyed by
(user/window), so it shards across executors; watermarks bound state
size; sessionization uses session_window (native state merge) rather
than a global sort."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

__all__ = [
    "windowed_event_stats",
    "sessionize_batch",
    "sessionize_stream",
    "stateful_user_counts",
    "streaming_exact_dedup",
    "streaming_heavy_hitters",
    "streaming_interpolate",
    "streaming_kmv_distinct",
    "enrich_events",
    "interval_join_events",
]


def _as_utc_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP.

    Parquet written without isAdjustedToUTC surfaces as TIMESTAMP_NTZ
    in Spark 4, which unix_micros / withWatermark / session_window all
    reject. Interpret the naive value as a UTC wall clock.

    NOT ``to_utc_timestamp(col, 'UTC')``: Spark implicitly casts NTZ
    to TIMESTAMP through the *session* zone first, making that form
    (and a plain cast) shift event times on any non-UTC session.
    ``convert_timezone('UTC', current_timezone(), ntz)`` instead
    re-labels the naive value from UTC into the session zone while
    still NTZ, so the final cast lands on the exact UTC instant
    regardless of spark.sql.session.timeZone (pinned by a test that
    flips the session zone). DuckDB's epoch_us on the same naive
    value agrees, so oracle comparisons stay bit-stable."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return df.withColumn(
            col,
            F.convert_timezone(
                F.lit("UTC"), F.current_timezone(), F.col(col)
            ).cast("timestamp"),
        )
    return df


def windowed_event_stats(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window stats per event_type."""
    df = _as_utc_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return df.groupBy(win.alias("win"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to an
    event stream (user profile, device table, geo lookup).

    The dimension side is explicitly broadcast — stream-static joins
    are stateless in Structured Streaming (each micro-batch probes the
    static side; no watermark, no state store), and at 100 TB/day of
    events the only viable physical plan is a broadcast hash join: a
    shuffle would re-partition the firehose every micro-batch. The same
    plan serves the batch backfill identically (Structured Streaming's
    unified-API contract), which is what the correctness suite
    verifies. The static side is re-read per micro-batch only on
    restart; for slowly-changing dims use a Delta/parquet path that
    overwrites atomically."""
    return events.join(F.broadcast(dim), on, how)


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within_minutes: int = 5,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the right
    events of the same key that happen strictly AFTER it but within
    ``within_minutes`` (click→conversion attribution, request→response
    matching). Works identically on batch frames (no watermark
    attached) — the correctness suite verifies the batch form against
    a plain SQL BETWEEN join, and the streaming test pins micro-batch
    parity with it.

    Scale: Spark executes this as a single shuffle of both streams on
    the equi-key; the time-range condition + watermarks bound the join
    state store (each side retains only ``watermark + within`` of
    history per key) — without the range bound, stream-stream state
    grows without limit and the query eventually dies; that is why
    ``within_minutes`` is part of the operator signature, not an
    optional filter.

    ``how="left_outer"`` keeps unmatched left events with null right
    columns — funnel-drop detection (clicks that never converted). In
    streaming mode Spark emits the null row only once the watermark
    passes the event's join window (it must prove no match can still
    arrive), so outer results trail the watermark by ``within`` — and
    BOTH sides need watermarks, which this operator attaches whenever
    the inputs are streams."""
    l_df = _as_utc_event_time(left).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    r_df = _as_utc_event_time(right).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    if l_df.isStreaming:
        l_df = l_df.withWatermark("l_ts", watermark)
    if r_df.isStreaming:
        r_df = r_df.withWatermark("r_ts", watermark)
    bound = F.col("l_ts") + F.expr(
        f"INTERVAL {int(within_minutes)} MINUTES"
    )
    return l_df.join(
        r_df,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= bound),
        how,
    ).select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        F.unix_micros("l_ts").alias("l_us"),
        F.unix_micros("r_ts").alias("r_us"),
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: per-user gap>threshold starts a session.

    lag + cumulative-sum over a per-user window — state shards by
    user_id (no global ordering)."""
    events = _as_utc_event_time(events)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_minutes * 60 * 1_000_000  # microseconds: exact, no
    # second-truncation boundary flips
    with_gap = events.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > gap_us,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sid.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        # sum through DECIMAL: double accumulation is partition-order-
        # dependent, which breaks deterministic comparison; the decimal
        # sum is exact and the final cast keeps the double schema.
        # (38,6): 18 digits would ANSI-overflow on |value| >= 1e12 —
        # a crash the plain double sum never had
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("session_value"),
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming sessionization via native session_window (state merged
    by the engine, bounded by the watermark)."""
    return (
        _as_utc_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("session"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
    )


_STATE_SCHEMA = StructType([StructField("total", LongType(), True)])
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("total_events", LongType(), True),
    ]
)


def _update_counts(
    key: Tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n = sum(len(pdf) for pdf in batches)
    total = (state.get[0] if state.exists else 0) + n
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})


_DEDUP_STATE = StructType([StructField("seen", LongType(), True)])
_DEDUP_OUT = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("content_hash", LongType(), True),
    ]
)


def _dedup_first_occurrence(
    key: Tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # min doc_id within the micro-batch: a deterministic representative
    # (arrival order inside one batch is partition-dependent)
    first_id = None
    for pdf in batches:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            first_id = m if first_id is None else min(first_id, m)
    if state.exists or first_id is None:
        # key already admitted in an earlier batch: duplicates — drop
        if first_id is not None:
            state.update((int(state.get[0]) + 1,))
        return
    state.update((1,))
    yield pd.DataFrame({"doc_id": [first_id], "content_hash": [key[0]]})


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Continuous exact dedup: the FIRST document with each content
    hash passes through; later arrivals (same batch or any later
    batch) are dropped. The streaming half of
    :func:`arrow_zarr_spark.operators.dedup.exact_dedup` — keyed state
    (one counter per distinct content hash) shards across executors,
    which is the standard continuous-ingestion dedup shape.

    Batch frames take a one-shot path (applyInPandasWithState is
    streaming-only in Spark): the same SET of content hashes survives,
    but the representative doc_id can differ — streaming admits the
    min id of the FIRST batch containing the hash, batch mode the
    global min. Returns (doc_id, content_hash)."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id").cast("long"),
        F.xxhash64(F.col(text_col)).alias("content_hash"),
    )
    if not docs.isStreaming:
        return (
            keyed.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "content_hash")
        )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_first_occurrence,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event totals via
    applyInPandasWithState (the arbitrary-state API — the shape any
    bespoke streaming accumulator takes)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

_KMV_STATE = StructType(
    [StructField("kmin", ArrayType(LongType()), True)]
)
_KMV_OUT = StructType(
    [
        StructField("group_key", StringType(), True),
        StructField("n_distinct", LongType(), True),
        StructField("is_exact", BooleanType(), True),
    ]
)


def streaming_kmv_distinct(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 1024,
) -> DataFrame:
    """Continuous per-group distinct counting — the streaming face of
    :func:`arrow_zarr_spark.operators.sketches.kmv_distinct`. Keyed
    state holds each group's k smallest DISTINCT hashes (the KMV
    sketch: fixed-size, mergeable); every micro-batch merges its new
    hashes and emits the group's refreshed (n_distinct, is_exact) in
    update mode.

    Batch frames delegate to the batch operator, and the answers are
    IDENTICAL, not merely compatible: the streaming state after any
    prefix of batches is exactly the k-min set of the union of those
    batches — the same sketch the batch tail reconstructs — in BOTH
    the exact-certificate regime and the estimator regime (the
    estimator arithmetic below mirrors the batch SQL's HALF_UP
    rounding bit for bit).

    Scale shape: state is one <=k long array per group key, sharded
    across executors by the groupBy; choose moderate k for streams
    (the state row is serialized each batch). No watermark is needed
    — the count is monotone over all history, like d08's seen-set."""
    from ..operators.sketches import kmv_distinct

    import numpy as np

    if k < 2:
        raise ValueError(f"streaming_kmv_distinct: need k >= 2, got k={k}")
    kk = int(k)

    if not events.isStreaming:
        return kmv_distinct(events, group_col, value_col, k=kk).select(
            F.col(group_col).cast("string").alias("group_key"),
            "n_distinct",
            "is_exact",
        )

    keyed = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("group_key"),
        F.xxhash64(F.col(value_col)).alias("h"),
    )

    def _kmv_update(
        key: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        parts = [
            pdf["h"].to_numpy(dtype=np.int64)
            for pdf in batches
            if len(pdf)
        ]
        if state.exists:
            parts.append(np.asarray(state.get[0], dtype=np.int64))
        if not parts:
            return
        merged = np.unique(np.concatenate(parts))[:kk]
        state.update((merged.tolist(),))
        n = len(merged)
        if n < kk:
            est, exact = n, True
        else:
            # same (0,1] mapping and HALF_UP rounding as the batch SQL
            u = (float(merged[-1]) + 2.0**63 + 1.0) / 2.0**64
            est, exact = int(np.floor((kk - 1) / u + 0.5)), False
        yield pd.DataFrame(
            {
                "group_key": [key[0]],
                "n_distinct": [est],
                "is_exact": [exact],
            }
        )

    return keyed.groupBy("group_key").applyInPandasWithState(
        _kmv_update,
        outputStructType=_KMV_OUT,
        stateStructType=_KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_STATE = StructType(
    [
        StructField("vals", ArrayType(StringType()), True),
        StructField("ests", ArrayType(LongType()), True),
        StructField("reduced", BooleanType(), True),
    ]
)
_HH_OUT = StructType(
    [
        StructField("group_key", StringType(), True),
        StructField("value", StringType(), True),
        StructField("total_freq", LongType(), True),
        StructField("rank", LongType(), True),
        StructField("is_exact", BooleanType(), True),
    ]
)


def streaming_heavy_hitters(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """Continuous per-group top-``k`` values — the streaming face of
    :func:`arrow_zarr_spark.operators.sketches.grouped_heavy_hitters`
    (t16's keyed form). Keyed state holds each group's Misra-Gries
    summary (``<= capacity`` (value, est) pairs plus an overflow
    flag); every micro-batch folds its counts in, applies the MG
    reduction only when the summary overflows, and emits the group's
    refreshed top-k in update mode.

    Identity contract: while a group's summary has NEVER overflowed
    (``is_exact`` true — the summary holds exact counts of all
    history), the emitted rows are IDENTICAL to the batch operator
    over the union of all batches so far. Past overflow the stream
    honestly flags ``is_exact`` false and emits MG estimates, which
    undercount by at most N_g/(capacity+1) (the batch operator's
    exact recount is not available to a one-pass stream — that is
    the documented price of unbounded history in fixed state).

    Scale shape: state is one <= capacity summary per group key,
    sharded by the groupBy; no watermark — like d08/e05 the answer is
    monotone over all history."""
    from ..operators.sketches import grouped_heavy_hitters

    if k < 1 or capacity < k:
        raise ValueError(
            f"streaming_heavy_hitters: need capacity >= k >= 1, got "
            f"k={k}, capacity={capacity}"
        )
    cap = int(capacity)
    kk = int(k)

    if not events.isStreaming:
        return grouped_heavy_hitters(
            events, group_col, value_col, k=kk, capacity=cap
        )

    # same null-group contract as the batch operator (it drops them;
    # a stateful null key here would break batch/stream identity)
    keyed = events.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("v"),
    )

    def _hh_update(
        key: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, ests, reduced = state.get
            ctr = dict(zip(list(vals), [int(e) for e in ests]))
            reduced = bool(reduced)
        else:
            ctr, reduced = {}, False
        saw = False
        for pdf in batches:
            if not len(pdf):
                continue
            saw = True
            vc = pdf["v"].value_counts()
            for val, cnt in vc.items():
                ctr[val] = ctr.get(val, 0) + int(cnt)
            if len(ctr) > cap:
                values = sorted(ctr.values(), reverse=True)
                cut = values[cap]
                ctr = {t: c - cut for t, c in ctr.items() if c > cut}
                reduced = True
        if not saw:
            return
        # persist even an annihilated summary: the reduced flag is
        # state too — dropping it would let a later batch claim
        # exactness after history was already discarded
        state.update((list(ctr.keys()), list(ctr.values()), reduced))
        if not ctr:
            return
        # top-k by (est desc, value asc) — the batch operator's total
        # order, so exact-regime rows are identical
        top = sorted(ctr.items(), key=lambda t: (-t[1], t[0]))[:kk]
        yield pd.DataFrame(
            {
                "group_key": [key[0]] * len(top),
                "value": [t[0] for t in top],
                "total_freq": [t[1] for t in top],
                "rank": list(range(1, len(top) + 1)),
                "is_exact": [not reduced] * len(top),
            }
        )

    return keyed.groupBy("grp").applyInPandasWithState(
        _hh_update,
        outputStructType=_HH_OUT,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interpolate(
    events: DataFrame,
    reference: DataFrame,
    on: str = "ts",
    by=None,
    value_col: str = "value",
    out_col: str = "interp_value",
    max_reference_rows: int = 1_000_000,
):
    """Streaming face of the interpolation join (j07): enrich a live
    event stream with values linearly interpolated from a STATIC
    reference curve. The windowed batch operator
    (:func:`arrow_zarr_spark.operators.joins.interpolation_join`)
    cannot run on a stream — unbounded windows are not allowed there
    — so this takes the stateless broadcast form: the reference is
    collected (``max_reference_rows``-capped — it is a curve, not a
    second stream), grouped per entity into sorted (micros, value)
    arrays, broadcast, and every micro-batch brackets ALL of an
    entity's rows with two VECTORIZED ``np.searchsorted`` probes (one
    pandas groupby per batch — no per-row Python; no state, no
    watermark, works identically on batch frames).

    Semantics match interpolation_join on every defined input — same
    bracket rules (flat extrapolation at the edges, exact-time
    matches bracket themselves), null-valued and null-TIMED reference
    rows are not points, and a null/NaN event time yields NULL in
    both operators — computed with the SAME float expression on the
    same exact integer microseconds (timestamps convert to micros
    via ``unix_micros`` IN the collect query, so the epoch is
    engine-defined and independent of the driver OS timezone), so
    batch-vs-stream and operator-vs-oracle are bit-equal
    (test-pinned)."""
    import numpy as np

    from pyspark.sql import types as T

    by = list(by or [])
    is_ts = isinstance(
        events.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    # micros computed JVM-side: collect() would hand back OS-local
    # naive datetimes (a hidden epoch shift on non-UTC hosts) — the
    # j07 review taught us to never let the driver timezone in
    t_expr = (
        F.unix_micros(F.col(on).cast("timestamp")).cast("double")
        if is_ts
        else F.col(on).cast("double")
    )
    ref_rows = (
        reference.filter(
            F.col(value_col).isNotNull() & F.col(on).isNotNull()
        )
        .select(*by, t_expr.alias("__us"), F.col(value_col).alias("__v"))
        .limit(max_reference_rows + 1)
        .collect()
    )
    if len(ref_rows) > max_reference_rows:
        raise ValueError(
            f"streaming_interpolate collects the reference side; got "
            f"more than max_reference_rows={max_reference_rows} rows. "
            f"The reference must be a bounded curve — downsample it, "
            f"or use interpolation_join on batch frames."
        )

    curves: dict = {}
    for r in ref_rows:
        key = tuple(r[c] for c in by)
        curves.setdefault(key, []).append(
            (float(r["__us"]), float(r["__v"]))
        )
    curves = {
        k: (
            np.array([t for t, _ in sorted(pts)], dtype=np.float64),
            np.array([v for _, v in sorted(pts)], dtype=np.float64),
        )
        for k, pts in curves.items()
    }
    spark = events.sparkSession
    b = spark.sparkContext.broadcast(curves)

    out_fields = list(events.schema.fields) + [
        T.StructField(out_col, T.DoubleType(), True)
    ]
    out_schema = T.StructType(out_fields)
    in_cols = [f.name for f in events.schema.fields]

    def kernel(batches):
        curves_l = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            if is_ts:
                # mapInPandas delivers session-timezone (UTC-pinned)
                # naive timestamps: micros here == unix_micros above
                t_all = (
                    pdf[on]
                    .to_numpy()
                    .astype("datetime64[us]")
                    .astype(np.int64)
                    .astype(np.float64)
                )
                nat = pdf[on].isna().to_numpy()
                t_all[nat] = np.nan
            else:
                t_all = pdf[on].to_numpy(dtype=np.float64)
            out = np.full(len(pdf), np.nan, dtype=np.float64)
            groups = (
                pdf.groupby(list(by), sort=False, dropna=False).indices
                if by
                else {(): np.arange(len(pdf))}
            )
            for key, idx in groups.items():
                if by and not isinstance(key, tuple):
                    key = (key,)
                curve = curves_l.get(key)
                if curve is None:
                    continue
                ts_arr, v_arr = curve
                t = t_all[idx]
                ok = np.isfinite(t)  # null/NaN event time -> NULL
                if not ok.any():
                    continue
                tt = t[ok]
                j = np.searchsorted(ts_arr, tt, side="left")
                ip = np.searchsorted(ts_arr, tt, side="right") - 1
                has_prev = ip >= 0
                has_next = j < len(ts_arr)
                res = np.full(len(tt), np.nan, dtype=np.float64)
                both = has_prev & has_next
                if both.any():
                    pt = ts_arr[ip[both]]
                    pv = v_arr[ip[both]]
                    nt = ts_arr[j[both]]
                    nv = v_arr[j[both]]
                    same = nt == pt
                    # the exact expression of interpolation_join and
                    # the j07 oracle: ((nv-pv)*(t-pt))/(nt-pt)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        lin = pv + (nv - pv) * (tt[both] - pt) / (
                            nt - pt
                        )
                    res[both] = np.where(same, pv, lin)
                only_prev = has_prev & ~has_next
                if only_prev.any():
                    res[only_prev] = v_arr[ip[only_prev]]
                only_next = has_next & ~has_prev
                if only_next.any():
                    res[only_next] = v_arr[j[only_next]]
                full = np.full(len(idx), np.nan, dtype=np.float64)
                full[ok] = res
                out[idx] = full
            res_pdf = pdf[in_cols].copy()
            # NaN crosses the Arrow boundary as NULL
            res_pdf[out_col] = out
            yield res_pdf

    return events.mapInPandas(kernel, schema=out_schema)
