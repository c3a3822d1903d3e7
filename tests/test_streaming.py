"""Streaming operator tests: batch/stream parity for windowed stats and
sessionization, stateful processing, and the zarr-stream source."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.streaming import (
    ZarrStreamDataSource,
    sessionize_batch,
    sessionize_stream,
    stateful_user_counts,
    windowed_event_stats,
)
from arrow_zarr_spark.suite import ensure_views


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    ensure_views(spark, sf_dir)
    return spark.table("events")


def test_event_time_session_tz_invariant(spark, events):
    """The NTZ→TIMESTAMP normalization must not depend on
    spark.sql.session.timeZone: to_utc_timestamp / a plain cast both
    shift by the session zone (NTZ implicitly casts through it), which
    would move every window and session boundary on a non-UTC cluster.
    Pin invariance by comparing instants under UTC vs LA sessions."""
    from arrow_zarr_spark.streaming.event_ops import _as_utc_event_time

    sample = events.limit(200)
    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc = [
            r[0]
            for r in _as_utc_event_time(sample)
            .select(F.unix_micros("ts"))
            .collect()
        ]
        spark.conf.set(tz_key, "America/Los_Angeles")
        la = [
            r[0]
            for r in _as_utc_event_time(sample)
            .select(F.unix_micros("ts"))
            .collect()
        ]
    finally:
        spark.conf.set(tz_key, old)
    assert sorted(utc) == sorted(la)


def test_windowed_stats_batch(spark, events):
    out = windowed_event_stats(events, window="1 hour").collect()
    assert len(out) > 0
    total = sum(r.n for r in out)
    assert total == events.count()


def test_sessionize_batch(spark, events):
    sessions = sessionize_batch(events, gap_minutes=30)
    rows = sessions.collect()
    assert sum(r.n_events for r in rows) == events.count()
    assert all(r.session_start <= r.session_end for r in rows)
    # sessions for one user must not overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r.session_seq)
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.session_end < b.session_start


def test_windowed_stats_streaming_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    agg = windowed_event_stats(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n) AS total FROM win_out"
        ).first()["total"]
    finally:
        q.stop()
    assert got == events.count()


def test_stream_enrich_matches_batch(spark, events, tmp_path):
    """Stream-static enrichment: the streaming micro-batch join must
    produce exactly the batch join's rows (the unified-API contract
    e01's oracle verifies on the batch side)."""
    from arrow_zarr_spark.streaming.event_ops import enrich_events

    dim = (
        spark.table("customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )
    batch = enrich_events(
        events, dim, events.user_id == dim.c_custkey, "left"
    ).select("event_id", "c_mktsegment")
    src = str(tmp_path / "enrich_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    enriched = enrich_events(
        stream, dim, stream.user_id == dim.c_custkey, "left"
    ).select("event_id", "c_mktsegment")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT event_id, c_mktsegment FROM enrich_out"
        ).collect()
    finally:
        q.stop()
    want = batch.collect()
    key = lambda r: (r.event_id, r.c_mktsegment)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    assert any(r.c_mktsegment is None for r in got)  # unmatched path
    assert any(r.c_mktsegment is not None for r in got)


def test_interval_join_stream_matches_batch(spark, events, tmp_path):
    """Stream-stream interval join (watermarked both sides, event-time
    range condition): the micro-batch result must equal the batch
    self-join e02's oracle verifies."""
    from arrow_zarr_spark.streaming.event_ops import interval_join_events

    batch = interval_join_events(events, events, within_minutes=5)
    want = sorted(
        (r.l_event_id, r.r_event_id) for r in batch.collect()
    )
    assert want, "fixture should produce interval pairs"
    src = str(tmp_path / "ij_src")
    events.write.parquet(src)
    left = spark.readStream.schema(events.schema).parquet(src)
    right = spark.readStream.schema(events.schema).parquet(src)
    joined = interval_join_events(left, right, within_minutes=5)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.l_event_id, r.r_event_id)
            for r in spark.sql(
                "SELECT l_event_id, r_event_id FROM ij_out"
            ).collect()
        )
    finally:
        q.stop()
    assert got == want


def test_sessionize_stream_runs(spark, events, tmp_path):
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT sum(n_events) AS s FROM sess_out").first()["s"]
    finally:
        q.stop()
    assert n == events.count()


def test_stateful_user_counts(spark, events, tmp_path):
    src = str(tmp_path / "state_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stateful_user_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max(total_events) AS n FROM state_out "
            "GROUP BY user_id"
        ).collect()
    finally:
        q.stop()
    got = {r.user_id: r.n for r in rows}
    expect = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect


def test_zarr_stream_source(spark, tmp_path):
    from arrow_zarr_spark.zarr import open_store
    from arrow_zarr_spark.zarr.writer import (
        create_array,
        write_array_data,
        write_root_group,
    )

    path = str(tmp_path / "growing")
    store = open_store(path)
    write_root_group(store)
    meta = create_array(
        store, "x", shape=(6,), chunk_shape=(4,), dtype=np.float64
    )
    write_array_data(store, meta, np.arange(6.0))

    spark.dataSource.register(ZarrStreamDataSource)
    # driver_reader exercises the SimpleDataSourceStreamReader path;
    # the default (parallel) reader has its own test below
    stream = (
        spark.readStream.format("zarr-stream")
        .option("driver_reader", "true")
        .load(path)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("zs_out")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.x for r in spark.sql("SELECT x FROM zs_out").collect()}
        assert first == {0.0, 1.0, 2.0, 3.0, 4.0, 5.0}

        # grow the store, CHUNKS FIRST then metadata: the stream polls
        # continuously, and metadata-first would expose a window where
        # the shape says 10 rows but chunks 1-2 are stale/missing
        # (read as fill values)
        from dataclasses import replace

        from arrow_zarr_spark.zarr.writer import write_chunk

        meta2 = replace(meta, shape=(10,))
        data10 = np.arange(10.0)
        for ci in range(3):
            write_chunk(store, meta2, (ci,), data10[ci * 4 : (ci + 1) * 4])
        import json

        store.set("x/zarr.json", json.dumps(meta2.to_json()).encode())
        q.processAllAvailable()
        grown = {r.x for r in spark.sql("SELECT x FROM zs_out").collect()}
        assert grown == {float(i) for i in range(10)}
    finally:
        q.stop()


def test_zarr_stream_parallel_reader(spark, tmp_path):
    """Default executor-parallel stream reader: same semantics as the
    simple reader, reads run as Spark tasks."""
    import json
    from dataclasses import replace

    from arrow_zarr_spark.zarr import open_store
    from arrow_zarr_spark.zarr.writer import (
        create_array,
        write_array_data,
        write_chunk,
        write_root_group,
    )

    path = str(tmp_path / "par")
    store = open_store(path)
    write_root_group(store)
    meta = create_array(
        store, "x", shape=(10,), chunk_shape=(4,), dtype=np.float64
    )
    write_array_data(store, meta, np.arange(10.0))

    spark.dataSource.register(ZarrStreamDataSource)
    stream = (
        spark.readStream.format("zarr-stream")
        .option("rows_per_task", "3")  # force multiple partitions
        .load(path)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("zsp_out")
        .start()
    )
    try:
        q.processAllAvailable()
        first = sorted(r.x for r in spark.sql("SELECT x FROM zsp_out").collect())
        assert first == [float(i) for i in range(10)]

        # grow: chunks first, then metadata
        meta2 = replace(meta, shape=(14,))
        data14 = np.arange(14.0)
        for ci in range(2, 4):
            write_chunk(store, meta2, (ci,), data14[ci * 4 : (ci + 1) * 4])
        store.set("x/zarr.json", json.dumps(meta2.to_json()).encode())
        q.processAllAvailable()
        grown = sorted(r.x for r in spark.sql("SELECT x FROM zsp_out").collect())
        assert grown == [float(i) for i in range(14)]
    finally:
        q.stop()


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First occurrence of each content hash passes; later arrivals —
    in the same batch or any later micro-batch — are dropped."""
    from arrow_zarr_spark.streaming.event_ops import streaming_exact_dedup

    src = str(tmp_path / "dedup_src")
    schema = "doc_id long, text string"
    batch1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert first == {1, 2}  # 3 is a same-batch duplicate of 1

        batch2 = spark.createDataFrame(
            [(4, "alpha"), (5, "gamma"), (6, "beta")], schema
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        all_rows = {
            r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        # alpha/beta already admitted in batch 1 -> only gamma passes
        assert all_rows == {1, 2, 5}
    finally:
        q.stop()


def test_streaming_exact_dedup_batch_mode(spark, tmp_path):
    """The same operator on a batch frame = one row per distinct text,
    matching the batch exact_dedup's distinct-hash count."""
    from arrow_zarr_spark.streaming.event_ops import streaming_exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = streaming_exact_dedup(docs).collect()
    n_distinct = docs.select("text").distinct().count()
    assert len(out) == n_distinct
    assert len({r.content_hash for r in out}) == n_distinct


def test_zarr_stream_over_sharded_sink_store(spark, tmp_path):
    """The streaming source must tail a store the SHARDED distributed
    writer produced — shard objects decode through the inner-chunk
    machinery while the stream planner tracks the shard-granular
    object grid."""
    from arrow_zarr_spark.io import write_zarr

    path = str(tmp_path / "sharded_tail")
    df = spark.range(0, 2000, 1, 4).select(
        F.col("id").cast("long").alias("k")
    )
    write_zarr(df, path, chunk_rows=100, shard_chunks=5)
    spark.dataSource.register(ZarrStreamDataSource)
    stream = spark.readStream.format("zarr-stream").load(path)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("zs_sharded_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM zs_sharded_out").collect()
        assert {r.k for r in rows} == set(range(2000))
        # exact count: a set compare alone would mask duplicate
        # re-emission of rows from rewritten boundary shards
        assert len(rows) == 2000
        # append through the writer; the stream must pick up the delta
        write_zarr(
            spark.range(2000, 2600).select(F.col("id").cast("long").alias("k")),
            path,
            chunk_rows=100,
            shard_chunks=5,
            mode="append",
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM zs_sharded_out").collect()
        assert {r.k for r in rows} == set(range(2600))
        assert len(rows) == 2600
    finally:
        q.stop()


def test_interval_left_join_stream_matches_batch(spark, events, tmp_path):
    """Left-outer interval join: unmatched left events surface with
    null right columns. Streaming emits the null rows only after the
    watermark clears the join window; processAllAvailable plus a final
    empty batch advances it far enough on a finite source."""
    from arrow_zarr_spark.streaming.event_ops import interval_join_events

    batch = interval_join_events(
        events, events, within_minutes=5, how="left_outer"
    )
    want = sorted(
        (r.l_event_id, r.r_event_id) for r in batch.collect()
    )
    n_unmatched = sum(1 for _, r in want if r is None)
    assert n_unmatched, "fixture should contain funnel-drop rows"
    src = str(tmp_path / "iloj_src")
    events.write.parquet(src)
    left = spark.readStream.schema(events.schema).parquet(src)
    right = spark.readStream.schema(events.schema).parquet(src)
    joined = interval_join_events(
        left, right, within_minutes=5, how="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("iloj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.l_event_id, r.r_event_id)
            for r in spark.sql(
                "SELECT l_event_id, r_event_id FROM iloj_out"
            ).collect()
        )
    finally:
        q.stop()
    # a finite stream never advances the watermark past the last
    # event, so the final window of unmatched rows is withheld by
    # design — every emitted row must be correct and the inner
    # (matched) subset must be complete
    inner = [p for p in want if p[1] is not None]
    assert [p for p in got if p[1] is not None] == inner
    assert set(got) <= set(want)


def test_streaming_kmv_distinct_matches_batch(spark, tmp_path):
    """After each micro-batch, the streamed (n_distinct, is_exact) per
    group equals the batch kmv_distinct over the union of all batches
    so far — the mergeable-sketch claim, exercised across a state
    save/restore boundary. k=8 forces group 'b' into the estimator
    regime so BOTH regimes cross the boundary."""
    from arrow_zarr_spark.streaming.event_ops import streaming_kmv_distinct

    src = str(tmp_path / "kmv_src")
    schema = "event_type string, user_id long"
    batch1 = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(30)],
        schema,
    )
    batch2 = spark.createDataFrame(
        # overlap with batch1 plus new values; 'a' stays under k=8
        [("a", i) for i in range(2, 7)] + [("b", i) for i in range(20, 60)],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        streaming_kmv_distinct(stream, k=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_out")
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .start()
    )

    def batch_answer(df):
        return {
            r.group_key: (r.n_distinct, r.is_exact)
            for r in streaming_kmv_distinct(df, k=8).collect()
        }

    def latest_stream_answer():
        rows = spark.sql("SELECT * FROM kmv_out").collect()
        out = {}
        for r in rows:  # memory sink appends updates in batch order
            out[r.group_key] = (r.n_distinct, r.is_exact)
        return out

    try:
        q.processAllAvailable()
        assert latest_stream_answer() == batch_answer(batch1)
        got = latest_stream_answer()
        assert got["a"] == (5, True)
        assert got["b"][1] is False  # 30 distinct through k=8: estimator

        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert latest_stream_answer() == batch_answer(batch1.union(batch2))
    finally:
        q.stop()


def test_streaming_kmv_distinct_batch_mode_schema(spark, events):
    """Batch frames take the one-shot kmv_distinct path with the
    streaming output schema and exact counts at this cardinality."""
    from arrow_zarr_spark.streaming.event_ops import streaming_kmv_distinct

    got = {
        r.group_key: (r.n_distinct, r.is_exact)
        for r in streaming_kmv_distinct(events, k=4096).collect()
    }
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == {t: (d, True) for t, d in exact.items()}


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    """While summaries stay in the exact regime, the streamed
    per-group top-k after each micro-batch equals the batch operator
    over the union of all batches so far, across a checkpoint
    boundary. A skewed capacity-4 group crosses into the estimator
    regime: it must flag is_exact=false and never OVERcount (the MG
    law; the batch operator's exact recount is unavailable to a
    one-pass stream, so values may legitimately differ there)."""
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / "hh_src")
    schema = "event_type string, user_id long"
    # group 'a': 3 distinct values, capacity 4 never overflows;
    # group 'b': 1 heavy value (10x) + 8 light (2x) through capacity
    # 4 — overflows, heavy value survives the reduction
    batch1 = spark.createDataFrame(
        [("a", i % 3) for i in range(12)]
        + [("b", 0)] * 10
        + [("b", 1 + i % 8) for i in range(16)],
        schema,
    )
    batch2 = spark.createDataFrame(
        [("a", i % 2) for i in range(8)] + [("b", 0)] * 4,
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        streaming_heavy_hitters(stream, k=3, capacity=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )

    def batch_answer(df):
        out = {}
        for r in streaming_heavy_hitters(
            df, k=3, capacity=4
        ).collect():
            out.setdefault(r.group_key, []).append(
                (r.rank, r.value, r.total_freq, r.is_exact)
            )
        return {g: sorted(v) for g, v in out.items()}

    def latest_stream_answer():
        rows = spark.sql("SELECT * FROM hh_out").collect()
        # memory sink appends updates in batch order: keep each
        # group's LAST contiguous update block
        blocks: dict = {}
        for i, r in enumerate(rows):
            cur = blocks.get(r.group_key)
            if cur is None or i > cur[0] + len(cur[1]):
                blocks[r.group_key] = (i, [])
                cur = blocks[r.group_key]
            cur[1].append((r.rank, r.value, r.total_freq, r.is_exact))
        return {g: sorted(v) for g, (_, v) in blocks.items()}

    try:
        q.processAllAvailable()
        got = latest_stream_answer()
        want = batch_answer(batch1)
        assert got["a"] == want["a"]
        assert all(e for _, _, _, e in got["a"])  # exact regime
        assert not any(e for _, _, _, e in got["b"])  # overflowed
        # MG estimates never overcount; the heavy value is rank 1
        true_b = {"0": 10, **{str(v): 2 for v in range(1, 9)}}
        assert all(f <= true_b[v] for _, v, f, _ in got["b"])
        assert got["b"][0][1] == "0"

        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = latest_stream_answer()
        want = batch_answer(batch1.union(batch2))
        assert got["a"] == want["a"]  # still exact across checkpoint
    finally:
        q.stop()


def test_streaming_heavy_hitters_batch_mode(spark, events):
    """Batch frames take the grouped_heavy_hitters path; at suite
    cardinality every group is in the exact-certificate regime and
    counts equal the plain groupBy."""
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_heavy_hitters,
    )

    got = streaming_heavy_hitters(
        events, "event_type", "user_id", k=5, capacity=4096
    ).collect()
    assert got and all(r.is_exact for r in got)
    exact = {
        (r.event_type, str(r.user_id)): r.c
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in got:
        assert exact[(r.group_key, r.value)] == r.total_freq


def test_streaming_interpolate_matches_batch_and_join(spark, tmp_path):
    """The stateless broadcast kernel must emit rows IDENTICAL to the
    windowed interpolation_join on the same inputs, on a REAL stream
    across micro-batches (the operator is stateless so every row is
    final at emission)."""
    from arrow_zarr_spark.operators.joins import interpolation_join
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_interpolate,
    )

    ref = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 4.0, 20.0), ("b", 2.0, 5.0)],
        "k string, ts double, value double",
    )
    batch1 = spark.createDataFrame(
        [("a", 0.5, 1), ("a", 2.0, 2), ("b", 9.0, 3)],
        "k string, ts double, eid long",
    )
    batch2 = spark.createDataFrame(
        [("a", 4.0, 4), ("c", 1.0, 5)],
        "k string, ts double, eid long",
    )
    all_events = batch1.union(batch2)

    want = {
        r.eid: r.interp_value
        for r in interpolation_join(
            all_events, ref, on="ts", by=["k"]
        ).collect()
    }
    got_batch = {
        r.eid: r.interp_value
        for r in streaming_interpolate(
            all_events, ref, on="ts", by=["k"]
        ).collect()
    }
    assert got_batch == want
    assert want[1] == 10.0 and want[2] == 10 + 10 * 1 / 3
    assert want[4] == 20.0 and want[5] is None

    src = str(tmp_path / "si_src")
    batch1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        streaming_interpolate(stream, ref, on="ts", by=["k"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("si_out")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            r.eid: r.interp_value
            for r in spark.sql("SELECT * FROM si_out").collect()
        }
        assert got == want
    finally:
        q.stop()


def test_streaming_interpolate_reference_cap(spark):
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_interpolate,
    )

    ref = spark.createDataFrame(
        [("a", float(i), 1.0) for i in range(10)],
        "k string, ts double, value double",
    )
    ev = spark.createDataFrame(
        [("a", 1.0, 1)], "k string, ts double, eid long"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_reference_rows"):
        streaming_interpolate(
            ev, ref, on="ts", by=["k"], max_reference_rows=3
        )


def test_streaming_interpolate_tz_independent(spark):
    """Regression: reference micros are computed JVM-side
    (unix_micros), so the driver OS timezone cannot shift the curve.
    Before the fix, collect() handed back OS-local naive datetimes
    while the kernel saw session-UTC ones — a silent epoch skew on
    any non-UTC host."""
    import os
    import time as _time

    from arrow_zarr_spark.operators.joins import interpolation_join
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_interpolate,
    )

    ref = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 10.0),
         ("a", "2024-01-01 04:00:00", 20.0)],
        "k string, ts string, value double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "value")
    ev = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1)],
        "k string, ts string, eid long",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "eid")

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        got = streaming_interpolate(ev, ref, on="ts", by=["k"]).collect()
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
    want = interpolation_join(ev, ref, on="ts", by=["k"]).collect()
    assert got[0].interp_value == want[0].interp_value == 12.5


def test_streaming_interpolate_null_contracts_match_join(spark):
    """Regression: null EVENT times yield NULL in both operators, and
    null-TIMED reference rows are not points in either."""
    from arrow_zarr_spark.operators.joins import interpolation_join
    from arrow_zarr_spark.streaming.event_ops import (
        streaming_interpolate,
    )

    ref = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", None, 99.0), ("a", 4.0, 20.0)],
        "k string, ts double, value double",
    )
    ev = spark.createDataFrame(
        [("a", 2.0, 1), ("a", None, 2)],
        "k string, ts double, eid long",
    )
    got = {
        r.eid: r.interp_value
        for r in streaming_interpolate(ev, ref, on="ts", by=["k"]).collect()
    }
    want = {
        r.eid: r.interp_value
        for r in interpolation_join(ev, ref, on="ts", by=["k"]).collect()
    }
    assert got == want
    assert got[1] == 10 + 10 * 1 / 3  # the null-timed 99.0 never brackets
    assert got[2] is None
