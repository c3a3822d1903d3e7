"""upsert_zarr: keyed MERGE into 1-D table stores (io.py). The
row-keyed counterpart of write_zarr_region — delta-proportional via
key-statistics pruning, key-only position scan, invalidate-first
stats. The reference has no write path at all (SURVEY §2)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark import read_zarr
from arrow_zarr_spark.io import upsert_zarr, write_zarr
from arrow_zarr_spark.zarr import ZarrFormatError, open_store
from arrow_zarr_spark.zarr.meta import STATS_ATTR_KEY


def _table(spark, n=64):
    # key-sorted so the key array's per-object stats prune well
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        (F.col("id") % 7).alias("w"),
    )


def _updates(spark, keys, mul=-10.0):
    return spark.createDataFrame(
        [(int(k), float(k) * mul) for k in keys], "k long, v double"
    )


class TestUpsertBasics:
    def test_update_subset_column(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        out = upsert_zarr(_updates(spark, [3, 17, 40]), d, key_col="k")
        assert out["updated_rows"] == 3
        assert out["inserted_rows"] == 0
        got = {
            r["k"]: (r["v"], r["w"])
            for r in read_zarr(spark, d).collect()
        }
        assert len(got) == 64
        for k in (3, 17, 40):
            assert got[k] == (k * -10.0, k % 7)  # v updated, w untouched
        assert got[5] == (10.0, 5)  # unmatched rows untouched

    def test_untouched_objects_not_rewritten(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)  # 4 objects per col
        before = {
            f: os.path.getmtime(os.path.join(d, "v", "c", f))
            for f in os.listdir(os.path.join(d, "v", "c"))
        }
        upsert_zarr(_updates(spark, [3]), d, key_col="k")
        after = {
            f: os.path.getmtime(os.path.join(d, "v", "c", f))
            for f in os.listdir(os.path.join(d, "v", "c"))
        }
        changed = [f for f in before if after[f] != before[f]]
        assert changed == ["0"]  # key 3 lives in object 0 only
        # the key array itself is never rewritten
        kdir = os.path.join(d, "k", "c")
        assert all(
            os.path.getmtime(os.path.join(kdir, f))
            == pytest.approx(os.path.getmtime(os.path.join(kdir, f)))
            for f in os.listdir(kdir)
        )

    def test_duplicate_store_keys_all_update(self, spark, tmp_path):
        d = str(tmp_path / "s")
        rows = [(1, 10.0), (2, 20.0), (1, 11.0), (3, 30.0)]
        write_zarr(
            spark.createDataFrame(rows, "k long, v double").coalesce(1),
            d,
            chunk_rows=2,
        )
        out = upsert_zarr(
            spark.createDataFrame([(1, -1.0)], "k long, v double"),
            d,
            key_col="k",
        )
        assert out["updated_rows"] == 2  # both store rows with k=1
        vals = sorted(
            r["v"] for r in read_zarr(spark, d).where("k = 1").collect()
        )
        assert vals == [-1.0, -1.0]

    def test_string_keys(self, spark, tmp_path):
        d = str(tmp_path / "s")
        rows = [("alpha", 1.0), ("beta", 2.0), ("gamma", 3.0)]
        write_zarr(
            spark.createDataFrame(rows, "name string, v double").coalesce(1),
            d,
            chunk_rows=2,
        )
        upsert_zarr(
            spark.createDataFrame([("beta", -2.0)], "name string, v double"),
            d,
            key_col="name",
        )
        got = {
            r["name"]: r["v"] for r in read_zarr(spark, d).collect()
        }
        assert got == {"alpha": 1.0, "beta": -2.0, "gamma": 3.0}

    def test_sharded_store_update(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(
            _table(spark).select("k", "v"), d, chunk_rows=8, shard_chunks=2
        )
        out = upsert_zarr(_updates(spark, [0, 63]), d, key_col="k")
        assert out["updated_rows"] == 2
        assert out["total_objects"] == 4  # 64 rows / (8*2) per shard
        got = {r["k"]: r["v"] for r in read_zarr(spark, d).collect()}
        assert got[0] == 0.0 and got[63] == -630.0 and got[32] == 64.0


class TestUpsertPruning:
    def test_candidates_pruned_by_key_stats(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)  # 4 objects, sorted keys
        out = upsert_zarr(_updates(spark, [17, 20]), d, key_col="k")
        # keys 17..20 live in object 1 only: stats prune 3 of 4
        assert out["candidate_objects"] == 1
        assert out["touched_objects"] == 1

    def test_stats_recomputed_on_touched_objects(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark).select("k", "v"), d, chunk_rows=16)
        upsert_zarr(
            spark.createDataFrame([(17, 1e6)], "k long, v double"),
            d,
            key_col="k",
        )
        meta = json.loads(open_store(d).get("v/zarr.json"))
        entries = meta["attributes"][STATS_ATTR_KEY]
        assert entries[1][1] == 1e6  # the planted outlier is the new max
        assert entries[0] == [0.0, 30.0]  # untouched object keeps bounds

    def test_stats_false_invalidates_touched(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark).select("k", "v"), d, chunk_rows=16)
        upsert_zarr(
            spark.createDataFrame([(17, 1e6)], "k long, v double"),
            d,
            key_col="k",
            stats=False,
        )
        meta = json.loads(open_store(d).get("v/zarr.json"))
        entries = meta["attributes"][STATS_ATTR_KEY]
        assert entries[1] is None  # unknown, unprunable: sound
        assert entries[0] == [0.0, 30.0]
        # and a value filter still finds the update
        got = read_zarr(spark, d).where("v > 1e5").collect()
        assert [r["k"] for r in got] == [17]

    def test_stats_less_store_scans_everything(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16, stats=False)
        out = upsert_zarr(_updates(spark, [17]), d, key_col="k")
        assert out["candidate_objects"] == 4  # degrade to full key scan
        assert out["updated_rows"] == 1


class TestUpsertMissing:
    def test_unmatched_errors_by_default(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        with pytest.raises(ZarrFormatError, match="not present"):
            upsert_zarr(_updates(spark, [3, 999]), d, key_col="k")

    def test_unmatched_ignored(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        out = upsert_zarr(
            _updates(spark, [3, 999]), d, key_col="k", on_missing="ignore"
        )
        assert out["updated_rows"] == 1
        assert read_zarr(spark, d).count() == 64

    def test_unmatched_inserted(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        ups = spark.createDataFrame(
            [(3, -30.0, 3), (999, 5.0, 1)], "k long, v double, w long"
        )
        out = upsert_zarr(
            ups, d, key_col="k", on_missing="insert", chunk_rows=16
        )
        assert out["updated_rows"] == 1
        assert out["inserted_rows"] == 1
        got = {r["k"]: (r["v"], r["w"]) for r in read_zarr(spark, d).collect()}
        assert len(got) == 65
        assert got[999] == (5.0, 1)
        assert got[3] == (-30.0, 3)

    def test_insert_requires_full_columns(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        with pytest.raises(ZarrFormatError, match="FULL column set"):
            upsert_zarr(
                _updates(spark, [999]), d, key_col="k", on_missing="insert"
            )


class TestStreamUpsertSink:
    def test_changelog_stream_merges(self, spark, tmp_path):
        """The CDC face: a changelog stream with several changes per
        key (ordered by a seq column the store doesn't carry) lands
        as last-change-wins updates plus inserts for unseen keys."""
        from arrow_zarr_spark.streaming import stream_upsert_to_zarr

        store = str(tmp_path / "cdc_store")
        write_zarr(
            _table(spark).select("k", "v"), store, chunk_rows=16
        )
        # changelog: two changes for k=5 (seq 1 then 2), one for k=40,
        # and a brand-new k=100
        src = str(tmp_path / "changes")
        changes = spark.createDataFrame(
            [
                (5, 111.0, 1),
                (5, 222.0, 2),
                (40, -40.0, 1),
                (100, 7.0, 1),
            ],
            "k long, v double, seq long",
        )
        changes.write.parquet(src)
        stream = spark.readStream.schema(changes.schema).parquet(src)
        q = stream_upsert_to_zarr(
            stream,
            store,
            key_col="k",
            dedupe_col="seq",
            chunk_rows=16,
            checkpointLocation=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r["k"]: r["v"] for r in read_zarr(spark, store).collect()}
        assert len(got) == 65
        assert got[5] == 222.0  # last change by seq wins
        assert got[40] == -40.0
        assert got[100] == 7.0  # unseen key inserted
        assert got[6] == 12.0  # untouched
        # the batch marker advanced (exactly-once state)
        assert open_store(store).get("__stream_upsert_sink_state__")

    def test_replayed_batch_skipped(self, spark, tmp_path):
        """A replayed foreachBatch id must be skipped whole — apply
        the same batch id twice, the second is a no-op even with
        different data."""
        import json as _json

        from arrow_zarr_spark.streaming.zarr_sink import (
            _UPSERT_MARKER_KEY,
            _once_per_batch,
        )

        store_path = str(tmp_path / "s")
        write_zarr(_table(spark).select("k", "v"), store_path, chunk_rows=16)
        store = open_store(store_path)
        applied = []
        _once_per_batch(store, _UPSERT_MARKER_KEY, 0, lambda: applied.append(1))
        _once_per_batch(store, _UPSERT_MARKER_KEY, 0, lambda: applied.append(2))
        _once_per_batch(store, _UPSERT_MARKER_KEY, 1, lambda: applied.append(3))
        assert applied == [1, 3]
        state = _json.loads(store.get(_UPSERT_MARKER_KEY))
        assert state["last_batch"] == 1


class TestUpsertValidation:
    def test_duplicate_update_key_rejected(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        ups = spark.createDataFrame(
            [(3, 1.0), (3, 2.0)], "k long, v double"
        )
        with pytest.raises(ZarrFormatError, match="duplicate key"):
            upsert_zarr(ups, d, key_col="k")

    def test_null_update_key_rejected(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        ups = spark.createDataFrame(
            [(None, 1.0)], "k long, v double"
        )
        with pytest.raises(ZarrFormatError, match="NULL key"):
            upsert_zarr(ups, d, key_col="k")

    def test_dtype_mismatch_rejected(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        ups = spark.createDataFrame([(3, 5)], "k long, v long")
        with pytest.raises(ZarrFormatError, match="dtype mismatch"):
            upsert_zarr(ups, d, key_col="k")

    def test_unknown_column_rejected(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark), d, chunk_rows=16)
        ups = spark.createDataFrame([(3, 5.0)], "k long, nope double")
        with pytest.raises(ZarrFormatError, match="not in the store"):
            upsert_zarr(ups, d, key_col="k")

    def test_grid_store_rejected(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr_grid

        d = str(tmp_path / "g")
        rows = [(x, y, float(x * y)) for x in range(4) for y in range(4)]
        write_zarr_grid(
            spark.createDataFrame(rows, "x long, y long, t double"),
            d,
            dims=["x", "y"],
            chunk_shape=(2, 2),
        )
        ups = spark.createDataFrame([(1, 9.0)], "x long, t double")
        with pytest.raises(ZarrFormatError, match="1-D table stores"):
            upsert_zarr(ups, d, key_col="x")
