"""Store replication (io.replicate_zarr): byte-verified distributed
copy with metadata-last publish — the migration/DR verb of the
maintenance kit."""

import pytest
from pyspark.sql import functions as F

import arrow_zarr_spark.io as io_mod
from arrow_zarr_spark.io import replicate_zarr, write_zarr
from arrow_zarr_spark.zarr import (
    ZarrFormatError,
    commit_version,
    open_store,
    version_log,
)


def _table(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


class TestReplicate:
    def test_roundtrip_through_real_scan(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 100), src, chunk_rows=16)
        info = replicate_zarr(spark, src, dst)
        assert info["n_mismatch"] == 0
        assert info["n_objects"] > 0 and info["n_meta_docs"] > 0
        assert info["n_verified"] == info["n_objects"] + info["n_meta_docs"]
        got = spark.read.format("zarr").load(dst)
        assert got.count() == 100
        assert got.agg(F.sum("v")).first()[0] == sum(
            i * 2 for i in range(100)
        )

    def test_history_replicates_when_asked(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        commit_version(spark, src, "first")
        write_zarr(
            _table(spark, 32, 48), src, chunk_rows=16, mode="append"
        )
        commit_version(spark, src, "second")
        replicate_zarr(spark, src, dst, include_versions=True)
        assert [e["message"] for e in version_log(dst)] == [
            "first",
            "second",
        ]
        from arrow_zarr_spark import read_zarr

        assert read_zarr(spark, dst, version=1).count() == 32

    def test_history_excluded_by_default(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        commit_version(spark, src)
        replicate_zarr(spark, src, dst)
        assert version_log(dst) == []

    def test_nonempty_destination_refused(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        write_zarr(_table(spark, 0, 8), dst, chunk_rows=8)
        with pytest.raises(ZarrFormatError, match="not empty"):
            replicate_zarr(spark, src, dst)

    def test_overwrite_clears_old_replica_history(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 8), dst, chunk_rows=8)
        commit_version(spark, dst, "stale history")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        replicate_zarr(spark, src, dst, mode="overwrite")
        assert spark.read.format("zarr").load(dst).count() == 32
        assert version_log(dst) == []

    def test_verify_catches_corruption(self, spark, tmp_path, monkeypatch):
        """A destination that flips bytes must fail the replication,
        not return a count the caller can ignore."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        real_open = io_mod.open_store

        class Corrupting:
            def __init__(self, inner):
                self._inner = inner

            def set(self, key, value):
                if not key.split("/")[-1].startswith((
                    "zarr", ".z"
                )) and value:
                    value = bytes([value[0] ^ 0xFF]) + value[1:]
                self._inner.set(key, value)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        def patched(path, **kw):
            inner = real_open(path, **kw)
            return Corrupting(inner) if path == dst else inner

        monkeypatch.setattr(io_mod, "open_store", patched)
        with pytest.raises(ZarrFormatError, match="byte verification"):
            # spark=None keeps the copy driver-side so the patch holds
            replicate_zarr(None, src, dst)

    def test_metadata_publishes_last_root_latest(
        self, spark, tmp_path, monkeypatch
    ):
        """Write-order contract: every data object lands before any
        metadata document, and the root document lands last."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        order = []
        real_open = io_mod.open_store

        class Recording:
            def __init__(self, inner):
                self._inner = inner

            def set(self, key, value):
                order.append(key)
                self._inner.set(key, value)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        def patched(path, **kw):
            inner = real_open(path, **kw)
            return Recording(inner) if path == dst else inner

        monkeypatch.setattr(io_mod, "open_store", patched)
        replicate_zarr(None, src, dst)
        metas = {"zarr.json", ".zarray", ".zattrs", ".zgroup",
                 ".zmetadata"}
        first_meta = next(
            i for i, k in enumerate(order)
            if k.split("/")[-1] in metas
        )
        assert all(
            k.split("/")[-1] in metas for k in order[first_meta:]
        )
        assert order[-1].count("/") == 0  # a root document is last


class TestSync:
    """Incremental replication (zarr.sync_zarr): delta-proportional
    pulls on top of a replicate_zarr seed."""

    def _seed(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import sync_zarr  # noqa: F401

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 64), src, chunk_rows=16)
        commit_version(spark, src, "v1")
        replicate_zarr(spark, src, dst, include_versions=True)
        return src, dst

    def test_pull_after_append_is_delta_proportional(
        self, spark, tmp_path
    ):
        from arrow_zarr_spark.zarr import sync_zarr

        src, dst = self._seed(spark, tmp_path)
        write_zarr(
            _table(spark, 64, 80), src, chunk_rows=16, mode="append"
        )
        commit_version(spark, src, "v2")
        n_total = len(
            __import__(
                "arrow_zarr_spark.zarr.versions",
                fromlist=["_read_manifest"],
            )._read_manifest(open_store(src), 2)["objects"]
        )
        info = sync_zarr(spark, src, dst)
        assert info["from_version"] == 1 and info["to_version"] == 2
        # only the append delta moved — strictly fewer objects than
        # the full store holds
        assert 0 < info["n_objects_copied"] < n_total
        assert info["n_live_updated"] < n_total
        got = spark.read.format("zarr").load(dst)
        assert got.count() == 80
        assert got.agg(F.sum("v")).first()[0] == sum(
            i * 2 for i in range(80)
        )
        assert [e["message"] for e in version_log(dst)] == ["v1", "v2"]

    def test_noop_when_current(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import sync_zarr

        src, dst = self._seed(spark, tmp_path)
        info = sync_zarr(spark, src, dst)
        assert info["from_version"] == info["to_version"] == 1
        assert info["n_objects_copied"] == 0
        assert info["n_live_updated"] == 0

    def test_overwrite_syncs_and_prunes_stale_keys(self, spark, tmp_path):
        """A source overwrite shrinks the store: the sync must update
        changed keys AND delete replica keys the new version no
        longer has."""
        from arrow_zarr_spark.zarr import sync_zarr

        src, dst = self._seed(spark, tmp_path)
        write_zarr(
            _table(spark, 0, 16), src, chunk_rows=16, mode="overwrite"
        )
        commit_version(spark, src, "v2-shrunk")
        info = sync_zarr(spark, src, dst)
        assert info["n_live_deleted"] > 0
        assert spark.read.format("zarr").load(dst).count() == 16

    def test_unseeded_destination_refused(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import sync_zarr

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        commit_version(spark, src)
        replicate_zarr(spark, src, dst)  # no history
        with pytest.raises(ZarrFormatError, match="include_versions"):
            sync_zarr(spark, src, dst)

    def test_replica_ahead_refused(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import sync_zarr

        src, dst = self._seed(spark, tmp_path)
        write_zarr(
            _table(spark, 64, 70), dst, chunk_rows=16, mode="append"
        )
        commit_version(spark, dst, "local divergence")
        with pytest.raises(ZarrFormatError, match="AHEAD"):
            sync_zarr(spark, src, dst)

    def test_multi_version_catchup(self, spark, tmp_path):
        """Two source commits since the seed: one sync lands both
        manifests and the latest live state."""
        from arrow_zarr_spark.zarr import sync_zarr

        src, dst = self._seed(spark, tmp_path)
        write_zarr(
            _table(spark, 64, 72), src, chunk_rows=16, mode="append"
        )
        commit_version(spark, src, "v2")
        write_zarr(
            _table(spark, 72, 90), src, chunk_rows=16, mode="append"
        )
        commit_version(spark, src, "v3")
        info = sync_zarr(spark, src, dst)
        assert info["to_version"] == 3
        assert info["n_manifests_copied"] == 2
        assert spark.read.format("zarr").load(dst).count() == 90
        from arrow_zarr_spark import read_zarr

        # intermediate history is usable on the replica too
        assert read_zarr(spark, dst, version=2).count() == 72


class TestSyncCrashRecovery:
    """Review pins: a crashed sync must stay retryable, and tags must
    converge to the source."""

    def test_crash_mid_live_flip_is_retryable(
        self, spark, tmp_path, monkeypatch
    ):
        """History publishes LAST: if the live flip dies, the replica
        still reports its OLD version, so the retry recomputes the
        same delta and completes — publishing manifests first would
        make every retry a no-op over stale live data."""
        import arrow_zarr_spark.zarr.versions as vmod
        from arrow_zarr_spark.zarr import sync_zarr, version_log

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 64), src, chunk_rows=16)
        commit_version(spark, src, "v1")
        replicate_zarr(spark, src, dst, include_versions=True)
        write_zarr(_table(spark, 64, 80), src, chunk_rows=16, mode="append")
        commit_version(spark, src, "v2")

        real_live = vmod._live_keys

        def boom(store):
            raise RuntimeError("simulated crash during the live flip")

        monkeypatch.setattr(vmod, "_live_keys", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            sync_zarr(None, src, dst)
        monkeypatch.setattr(vmod, "_live_keys", real_live)
        # the replica still reports v1 — the crashed sync is invisible
        assert [e["version"] for e in version_log(dst)] == [1]
        info = sync_zarr(spark, src, dst)
        assert info["from_version"] == 1 and info["to_version"] == 2
        assert spark.read.format("zarr").load(dst).count() == 80

    def test_tags_converge_not_accumulate(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import (
            delete_tag,
            list_tags,
            sync_zarr,
            tag_version,
        )

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_zarr(_table(spark, 0, 32), src, chunk_rows=16)
        commit_version(spark, src, "v1")
        tag_version(src, "rc1")
        replicate_zarr(spark, src, dst, include_versions=True)
        assert list_tags(dst) == {"rc1": 1}
        delete_tag(src, "rc1")
        tag_version(src, "rc2")
        write_zarr(_table(spark, 32, 40), src, chunk_rows=16, mode="append")
        commit_version(spark, src, "v2")
        sync_zarr(spark, src, dst)
        assert list_tags(dst) == {"rc2": 1}
