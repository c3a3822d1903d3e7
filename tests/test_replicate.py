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
