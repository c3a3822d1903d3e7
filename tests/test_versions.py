"""Store versioning: commit / version-pinned read / rollback / GC
(zarr/versions.py). The reference gets versioned reads from Icechunk
repositories (config.rs:141-197) — absent here all seven rounds, so
the capability is provided natively; these tests pin the commit
protocol's guarantees."""

import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark import read_zarr
from arrow_zarr_spark.io import write_zarr, write_zarr_grid, vacuum_zarr
from arrow_zarr_spark.zarr import (
    ZarrFormatError,
    commit_version,
    open_store,
    open_version,
    rollback_zarr,
    vacuum_versions,
    version_log,
)


def _table(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


class TestCommitAndPinnedRead:
    def test_pinned_read_after_append(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        info = commit_version(spark, d, "first")
        assert info["version"] == 1 and info["n_objects"] > 0
        write_zarr(_table(spark, 64, 100), d, chunk_rows=16, mode="append")
        assert spark.read.format("zarr").load(d).count() == 100
        v1 = read_zarr(spark, d, version=1)
        assert v1.count() == 64
        assert v1.agg(F.sum("v")).first()[0] == sum(i * 2 for i in range(64))

    def test_pinned_read_survives_overwrite(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 0, 5), d, chunk_rows=16, mode="overwrite")
        assert spark.read.format("zarr").load(d).count() == 5
        assert read_zarr(spark, d, version=1).count() == 64

    def test_content_dedup_across_versions(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 64, 100), d, chunk_rows=16, mode="append")
        info = commit_version(spark, d)
        # untouched chunk objects are shared with v1, not re-stored
        assert info["n_new_objects"] < info["n_objects"]

    def test_version_via_sql_options(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 32, 64), d, chunk_rows=16, mode="append")
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW v1view USING zarr "
            f"OPTIONS (path '{d}', version '1')"
        )
        assert spark.sql("SELECT COUNT(*) c FROM v1view").first()["c"] == 32

    def test_grid_region_update_is_pinned_away(self, spark, tmp_path):
        d = str(tmp_path / "g")
        rows = [
            (float(x), float(y), float(x * 10 + y))
            for x in range(4)
            for y in range(4)
        ]
        df = spark.createDataFrame(rows, ["x", "y", "val"])
        write_zarr_grid(df, d, dims=("x", "y"), chunk_shape=(2, 2))
        commit_version(spark, d, "pristine grid")
        from arrow_zarr_spark.io import write_zarr_region

        upd = spark.createDataFrame(
            [(1.0, 1.0, 999.0)], ["x", "y", "val"]
        )
        write_zarr_region(upd, d, dims=("x", "y"))
        live = spark.read.format("zarr").load(d)
        assert (
            live.filter((F.col("x") == 1.0) & (F.col("y") == 1.0))
            .first()["val"]
            == 999.0
        )
        v1 = read_zarr(spark, d, version=1)
        assert (
            v1.filter((F.col("x") == 1.0) & (F.col("y") == 1.0))
            .first()["val"]
            == 11.0
        )

    def test_missing_version_raises(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        with pytest.raises(ZarrFormatError, match="No version 5"):
            open_version(d, 5)

    def test_commit_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(ZarrFormatError, match="empty store"):
            commit_version(spark, str(tmp_path / "nope"))

    def test_version_log(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 16), d, chunk_rows=8)
        commit_version(spark, d, "a")
        write_zarr(_table(spark, 16, 32), d, chunk_rows=8, mode="append")
        commit_version(spark, d, "b")
        log = version_log(d)
        assert [e["version"] for e in log] == [1, 2]
        assert [e["message"] for e in log] == ["a", "b"]
        assert log[1]["n_objects"] > log[0]["n_objects"]


class TestShardedManifest:
    """r9 (r8 verdict item 2): the manifest is content-addressed
    BLOCKS by key range under a tiny CAS'd root — commit never
    materializes the (key, sha) mapping on the driver, and a pinned
    read resolving one key GETs one covering block, not the whole
    manifest."""

    def test_multi_block_layout_and_reads(self, spark, tmp_path):
        import json

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 256), d, chunk_rows=16)
        info = commit_version(spark, d, "sharded", block_keys=4)
        store = open_store(d)
        from arrow_zarr_spark.zarr.versions import (
            _manifest_key,
            _read_manifest_root,
        )

        root = json.loads(store.get(_manifest_key(1)))
        assert root["format"] == 2
        assert "objects" not in root  # O(n_blocks) root, no mapping
        assert len(root["blocks"]) == len(root["block_starts"]) > 3
        assert root["n_objects"] == info["n_objects"]
        assert root["block_starts"] == sorted(root["block_starts"])
        # full pinned scan still exact
        v1 = read_zarr(spark, d, version=1)
        assert v1.count() == 256
        assert v1.agg(F.sum("v")).first()[0] == sum(
            i * 2 for i in range(256)
        )
        # driver-side root validation loads no blocks
        doc = _read_manifest_root(store, 1)
        assert "objects" not in doc

    def test_single_key_read_touches_one_block(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 256), d, chunk_rows=16)
        commit_version(spark, d, block_keys=4)
        view = open_version(d, 1)
        assert view._manifest is None  # nothing materialized yet
        key = "k/zarr.json"
        assert view.get(key) is not None
        assert len(view._blocks) == 1  # exactly the covering block
        assert view._manifest is None
        # a miss resolves through a block too, without materializing
        assert view.get("zzz/no-such-key") is None
        assert view._manifest is None

    def test_format1_manifest_migration(self, spark, tmp_path):
        """Pre-r9 single-document manifests keep working everywhere:
        pinned read, version_log, rollback, vacuum retention."""
        import hashlib
        import json

        from arrow_zarr_spark.zarr.versions import (
            _live_keys,
            _manifest_key,
            _object_key,
        )

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        store = open_store(d)
        # hand-publish a format-1 manifest exactly as pre-r9 commits did
        objects = {}
        for k in _live_keys(store):
            data = store.get(k)
            sha = hashlib.sha256(data).hexdigest()
            store.set(_object_key(sha), data)
            objects[k] = sha
        store.set(
            _manifest_key(1),
            json.dumps(
                {
                    "format": 1,
                    "version": 1,
                    "message": "legacy",
                    "created_unix": 1,
                    "objects": objects,
                }
            ).encode(),
        )
        assert read_zarr(spark, d, version=1).count() == 64
        assert version_log(d)[0]["n_objects"] == len(objects)
        # a NEW commit on the legacy store publishes format 2 and both
        # versions coexist
        write_zarr(_table(spark, 64, 100), d, chunk_rows=16, mode="append")
        info = commit_version(spark, d)
        assert info["version"] == 2
        assert read_zarr(spark, d, version=1).count() == 64
        assert read_zarr(spark, d, version=2).count() == 100
        rollback_zarr(spark, d, 1)
        assert spark.read.format("zarr").load(d).count() == 64

    def test_vacuum_keeps_kept_versions_block_objects(
        self, spark, tmp_path
    ):
        """GC must treat a kept manifest's BLOCK objects as referenced
        — collecting them would leave a root that opens but cannot
        resolve any key."""
        import os
        import time as _time

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d, block_keys=4)
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, block_keys=4)
        # age every object past the grace window, then vacuum to v2
        from arrow_zarr_spark.zarr.versions import _OBJECTS_DIR

        store = open_store(d)
        old = _time.time() - 7200
        for k in store.walk_prefix(_OBJECTS_DIR):
            p = os.path.join(d, *k.split("/"))
            os.utime(p, (old, old))
        out = vacuum_versions(d, keep_last=1)
        assert out["dropped_versions"] == [1]
        assert out["deleted_objects"] > 0  # v1-only objects collected
        assert read_zarr(spark, d, version=2).count() == 32

    def test_distributed_and_serial_commits_publish_identical_manifests(
        self, spark, tmp_path, monkeypatch
    ):
        """r9 second pass: all three commit tiers — serial, spark
        driver-list (small stores), and FULLY distributed (top-level
        fan-out -> distributed sort -> ordinal blocks; no driver key
        list, forced here by zeroing the tier cutover) — must publish
        BIT-IDENTICAL manifests on the same store."""
        import json

        import arrow_zarr_spark.zarr.versions as V
        from arrow_zarr_spark.zarr.versions import _manifest_key

        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        c = str(tmp_path / "c")
        for d in (a, b, c):
            write_zarr(_table(spark, 0, 500), d, chunk_rows=16)
        commit_version(spark, a, "m")   # spark, driver-list tier
        commit_version(None, b, "m")    # serial
        monkeypatch.setattr(V, "COMMIT_DRIVER_LIST_MAX", 0)
        commit_version(spark, c, "m")   # spark, fully distributed
        ra = json.loads(open_store(a).get(_manifest_key(1)))
        rb = json.loads(open_store(b).get(_manifest_key(1)))
        rc = json.loads(open_store(c).get(_manifest_key(1)))
        for k in ("format", "n_objects", "block_starts", "blocks"):
            assert ra[k] == rb[k] == rc[k], k
        # and with an explicit (multi-)block size on the fully
        # distributed tier
        a2 = str(tmp_path / "a2")
        b2 = str(tmp_path / "b2")
        for d in (a2, b2):
            write_zarr(_table(spark, 0, 500), d, chunk_rows=16)
        commit_version(spark, a2, "m", block_keys=7)  # distributed
        commit_version(None, b2, "m", block_keys=7)   # serial
        ra = json.loads(open_store(a2).get(_manifest_key(1)))
        rb = json.loads(open_store(b2).get(_manifest_key(1)))
        assert ra["blocks"] == rb["blocks"]
        assert ra["block_starts"] == rb["block_starts"]
        assert len(ra["blocks"]) > 3
        assert read_zarr(spark, a2, version=1).count() == 500

    def test_unchanged_key_ranges_dedup_across_versions(
        self, spark, tmp_path
    ):
        """Content-addressed blocks: committing an UNCHANGED store
        re-publishes the same block shas and stores zero new objects."""
        import json

        from arrow_zarr_spark.zarr.versions import _manifest_key

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 256), d, chunk_rows=16)
        commit_version(spark, d, block_keys=4)
        info2 = commit_version(spark, d, block_keys=4)
        assert info2["n_new_objects"] == 0
        store = open_store(d)
        r1 = json.loads(store.get(_manifest_key(1)))
        r2 = json.loads(store.get(_manifest_key(2)))
        assert r1["blocks"] == r2["blocks"]


class TestSidecarStatsVersionLifecycle:
    """r9 (r8 verdict item 7): the one seam that had no single test —
    commit -> append (live sidecar blocks patched) -> pinned read at
    the OLD version -> vacuum. The pinned scan must keep pruning
    with the OLD sidecar blocks (resolved through the manifest) and
    GC must never collect the content objects backing them."""

    def test_commit_append_pinned_prune_vacuum(
        self, spark, tmp_path, monkeypatch
    ):
        from pyspark.sql.datasource import LessThan

        import arrow_zarr_spark.io as io_mod
        from arrow_zarr_spark.datasource import ZarrDataSource

        monkeypatch.setattr(io_mod, "STATS_MAX_OBJECTS", 4)
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 800), d, chunk_rows=100)
        store = open_store(d)
        assert list(store.walk_prefix("__stats__"))  # sidecar form
        commit_version(spark, d, "v1")
        old_blocks = {
            k: store.get(k) for k in store.walk_prefix("__stats__")
        }
        write_zarr(
            _table(spark, 800, 1600), d, chunk_rows=100, mode="append"
        )
        commit_version(spark, d, "v2")
        # the append patched the LIVE sidecar blocks in place
        live_blocks = {
            k: store.get(k) for k in store.walk_prefix("__stats__")
        }
        assert live_blocks != old_blocks
        vacuum_versions(d, keep_last=2, grace_seconds=0)

        def cells(version, filters):
            ds = ZarrDataSource({"path": d, "version": str(version)})
            reader = ds.reader(ds.schema())
            list(reader.pushFilters(filters))
            return [c for p in reader.partitions() for c in p.cells]

        # pinned v1 scan prunes with the OLD stats: k < 100 keeps
        # exactly chunk 0 of the 8 committed chunks
        assert cells(1, [LessThan(("k",), 100)]) == [(0,)]
        assert len(cells(1, [])) == 8
        # and the live/v2 scan prunes against the grown store
        assert cells(2, [LessThan(("k",), 100)]) == [(0,)]
        assert len(cells(2, [])) == 16
        # values exact through the pinned pruned path (unfiltered
        # count FIRST — the pinned Spark-4.1 plan-reuse trap: a
        # filtered run caches the pruned planned read for the
        # relation, see TestPushdownPlanReuse)
        v1 = read_zarr(spark, d, version=1)
        assert v1.count() == 800
        assert v1.filter("k < 100").count() == 100
        # a second vacuum dropping v1 must keep v2's sidecar objects
        vacuum_versions(d, keep_last=1, grace_seconds=0)
        assert cells(2, [LessThan(("k",), 100)]) == [(0,)]
        assert read_zarr(spark, d, version=2).count() == 1600


class TestAsOf:
    def test_as_of_resolves_to_newest_at_or_before(
        self, spark, tmp_path, monkeypatch
    ):
        import arrow_zarr_spark.zarr.versions as vmod
        from arrow_zarr_spark.zarr.versions import resolve_as_of

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 16), d, chunk_rows=8)
        monkeypatch.setattr(vmod.time, "time", lambda: 1000.0)
        commit_version(spark, d, "t1000")
        write_zarr(_table(spark, 16, 32), d, chunk_rows=8, mode="append")
        monkeypatch.setattr(vmod.time, "time", lambda: 2000.0)
        commit_version(spark, d, "t2000")
        assert resolve_as_of(d, 1500) == 1
        assert resolve_as_of(d, 2000) == 2
        with pytest.raises(ZarrFormatError, match="at or before"):
            resolve_as_of(d, 999)
        # the reader option routes through the same resolution
        assert read_zarr(spark, d, as_of=1500).count() == 16
        assert read_zarr(spark, d, as_of=5000).count() == 32

    def test_version_and_as_of_conflict(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        with pytest.raises(Exception, match="not both"):
            read_zarr(spark, d, version=1, as_of=10**10).count()


class TestVersionDiff:
    def test_diff_version_vs_live(self, spark, tmp_path):
        from arrow_zarr_spark.io import diff_zarr, write_zarr_region

        d = str(tmp_path / "g")
        rows = [
            (float(x), float(y), float(x * 10 + y))
            for x in range(4)
            for y in range(4)
        ]
        df = spark.createDataFrame(rows, ["x", "y", "val"])
        from arrow_zarr_spark.io import write_zarr_grid

        write_zarr_grid(df, d, dims=("x", "y"), chunk_shape=(2, 2))
        commit_version(spark, d, "pristine")
        write_zarr_region(
            spark.createDataFrame([(3.0, 3.0, -1.0)], ["x", "y", "val"]),
            d,
            dims=("x", "y"),
        )
        out = diff_zarr(spark, d, d, version_a=1).collect()
        changed = [r for r in out if r.status == "changed"]
        # exactly the one cell the region write touched
        assert len(changed) == 1
        assert changed[0].array == "val" and changed[0].n_diff == 1
        # coordinates and untouched cells compare equal
        assert all(
            r.status in ("equal", "changed") for r in out if r.chunk_key
        )

    def test_diff_bad_version_raises(self, spark, tmp_path):
        from arrow_zarr_spark.io import diff_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        with pytest.raises(ZarrFormatError, match="No version 9"):
            diff_zarr(spark, d, d, version_a=9)


class TestReadOnlyView:
    def test_view_rejects_writes(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        view = open_version(d, 1)
        with pytest.raises(ZarrFormatError, match="read-only"):
            view.set("k/c/0", b"x")
        with pytest.raises(ZarrFormatError, match="read-only"):
            view.delete("k/c/0")
        # reads resolve through the manifest
        assert view.exists("zarr.json")
        assert not view.exists(".versions/HEAD.json")


class TestRollback:
    def test_rollback_restores_values_and_deletes_extras(
        self, spark, tmp_path
    ):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 32, 96), d, chunk_rows=16, mode="append")
        out = rollback_zarr(spark, d, 1)
        assert out["deleted"] > 0  # the appended chunk objects
        live = spark.read.format("zarr").load(d)
        assert live.count() == 32
        assert live.agg(F.sum("v")).first()[0] == sum(
            i * 2 for i in range(32)
        )

    def test_rollback_missing_object_raises(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        store = open_store(d)
        # delete a DATA content object, resolved through the
        # manifest's mapping — the first walked objects/ key can be
        # a format-2 manifest BLOCK (different error text)
        from arrow_zarr_spark.zarr.versions import (
            _object_key,
            _read_manifest,
        )

        sha = next(iter(_read_manifest(store, 1)["objects"].values()))
        store.delete(_object_key(sha))
        with pytest.raises(Exception, match="content object"):
            rollback_zarr(spark, d, 1)

    def test_rollback_missing_manifest_block_raises(
        self, spark, tmp_path
    ):
        """The format-2 counterpart: a vacuumed/damaged manifest
        BLOCK must also fail a rollback loudly, with the block error."""
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d, block_keys=2)
        store = open_store(d)
        import json as _json

        from arrow_zarr_spark.zarr.versions import (
            _manifest_key,
            _object_key,
        )

        root = _json.loads(store.get(_manifest_key(1)))
        store.delete(_object_key(root["blocks"][0]))
        with pytest.raises(Exception, match="manifest block missing"):
            rollback_zarr(spark, d, 1)


class TestVacuum:
    def test_vacuum_zarr_preserves_versions_but_finds_real_orphans(
        self, spark, tmp_path
    ):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        store = open_store(d)
        store.set("k/c/999", b"stray")  # beyond the grid: real debris
        report = vacuum_zarr(d)
        assert report["orphans"] == ["k/c/999"]  # versions untouched

    def test_vacuum_versions_gc(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 32, 64), d, chunk_rows=16, mode="append")
        commit_version(spark, d)
        out = vacuum_versions(d, keep_last=1, grace_seconds=0)
        assert out["dropped_versions"] == [1]
        assert out["deleted_objects"] > 0
        with pytest.raises(ZarrFormatError, match="No version 1"):
            open_version(d, 1)
        assert read_zarr(spark, d, version=2).count() == 64
        assert spark.read.format("zarr").load(d).count() == 64

    def test_vacuum_versions_keep_last_validated(self, spark, tmp_path):
        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        with pytest.raises(ZarrFormatError, match="keep_last"):
            vacuum_versions(d, keep_last=0)


class TestTags:
    def test_tag_requires_a_commit(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        with pytest.raises(ZarrFormatError, match="No version"):
            tag_version(d, "release-1")

    def test_tag_roundtrip(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import (
            delete_tag,
            list_tags,
            resolve_tag,
            tag_version,
        )

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d, "v1")
        write_zarr(_table(spark, 64, 100), d, chunk_rows=16, mode="append")
        commit_version(spark, d, "v2")
        tag_version(d, "release-1", version=1)
        tag_version(d, "release-2")  # defaults to latest (v2)
        assert list_tags(d) == {"release-1": 1, "release-2": 2}
        assert resolve_tag(d, "release-1") == 1
        # read by tag through the real reader option path
        assert read_zarr(spark, d, tag="release-1").count() == 64
        assert read_zarr(spark, d, tag="release-2").count() == 100
        delete_tag(d, "release-1")
        with pytest.raises(ZarrFormatError, match="No tag 'release-1'"):
            resolve_tag(d, "release-1")

    def test_tags_are_immutable(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        tag_version(d, "release-1")
        with pytest.raises(ZarrFormatError, match="immutable"):
            tag_version(d, "release-1", version=1)

    def test_tag_name_validated(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        for bad in ("", "a/b", "../x", ".hidden", "a b"):
            with pytest.raises(ZarrFormatError, match="invalid tag name"):
                tag_version(d, bad)

    def test_tag_missing_version_raises(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        with pytest.raises(ZarrFormatError, match="No version 9"):
            tag_version(d, "release-9", version=9)

    def test_tag_option_excludes_version_and_as_of(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        tag_version(d, "release-1")
        with pytest.raises(Exception, match="only one of"):
            read_zarr(spark, d, tag="release-1", version=1).collect()

    def test_vacuum_keeps_tagged_versions(self, spark, tmp_path):
        """A tag is a retention pin: vacuum_versions(keep_last=1) must
        not collect the tagged v1 even though it is out of the
        retention window."""
        from arrow_zarr_spark.zarr import tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d, "v1")
        tag_version(d, "release-1", version=1)
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, "v2")
        write_zarr(_table(spark, 0, 80), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, "v3")
        out = vacuum_versions(d, keep_last=1)
        assert out["kept_versions"] == [1, 3]
        assert out["dropped_versions"] == [2]
        assert read_zarr(spark, d, tag="release-1").count() == 32
        assert read_zarr(spark, d, version=3).count() == 80


class TestExport:
    def test_export_tag_to_standalone_store(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import export_version, tag_version

        d = str(tmp_path / "s")
        dest = str(tmp_path / "release")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d, "v1")
        write_zarr(_table(spark, 0, 7), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, "v2")
        out = export_version(spark, d, dest, tag=None, version=1)
        assert out["version"] == 1 and out["n_objects"] > 0
        got = spark.read.format("zarr").load(dest)
        assert got.count() == 64
        assert got.agg(F.sum("v")).first()[0] == sum(i * 2 for i in range(64))
        # the clone is standalone: no history rides along
        assert not list(open_store(dest).walk_prefix(".versions/"))

    def test_export_by_tag_and_default_latest(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import export_version, tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 48), d, chunk_rows=16)
        commit_version(spark, d, "v1")
        tag_version(d, "release-1")
        write_zarr(_table(spark, 0, 16), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, "v2")
        by_tag = str(tmp_path / "by_tag")
        export_version(spark, d, by_tag, tag="release-1")
        assert spark.read.format("zarr").load(by_tag).count() == 48
        latest = str(tmp_path / "latest")
        export_version(spark, d, latest)
        assert spark.read.format("zarr").load(latest).count() == 16

    def test_export_refuses_nonempty_dest(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import export_version

        d = str(tmp_path / "s")
        dest = str(tmp_path / "occupied")
        write_zarr(_table(spark, 0, 16), d)
        commit_version(spark, d)
        write_zarr(_table(spark, 0, 8), dest)
        with pytest.raises(ZarrFormatError, match="not empty"):
            export_version(spark, d, dest, version=1)
        export_version(spark, d, dest, version=1, mode="overwrite")
        assert spark.read.format("zarr").load(dest).count() == 16

    def test_export_version_and_tag_conflict(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import export_version, tag_version

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 8), d)
        commit_version(spark, d)
        tag_version(d, "release-1")
        with pytest.raises(ZarrFormatError, match="not both"):
            export_version(
                spark, d, str(tmp_path / "x"), version=1, tag="release-1"
            )


class TestStreamingVersionCommits:
    def test_commit_every_batch_pins_epochs(self, spark, tmp_path):
        """stream_to_zarr(commit_every=1): each micro-batch lands as a
        pinned, reproducible version while the live store keeps
        growing — and replays never double-commit."""
        from arrow_zarr_spark.streaming.zarr_sink import stream_to_zarr
        from arrow_zarr_spark.zarr.versions import version_log

        src = str(tmp_path / "src")
        schema = "k long, v double"
        b1 = spark.createDataFrame(
            [(i, float(i)) for i in range(40)], schema
        )
        b1.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        out = str(tmp_path / "store")
        q = stream_to_zarr(
            stream,
            out,
            chunk_rows=16,
            commit_every=1,
            checkpointLocation=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
            assert read_zarr(spark, out, version=1).count() == 40
            b2 = spark.createDataFrame(
                [(i, float(i)) for i in range(40, 70)], schema
            )
            b2.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        log = version_log(out)
        assert [e["version"] for e in log] == [1, 2]
        # version 1 is frozen at 40 rows; version 2 and live see 70
        assert read_zarr(spark, out, version=1).count() == 40
        assert read_zarr(spark, out, version=2).count() == 70
        assert spark.read.format("zarr").load(out).count() == 70
        # the exactly-once markers were NOT frozen into manifests as
        # live keys that rollback would resurrect... they WERE part of
        # the live store at commit time and that is fine — but the
        # staging area must never be
        from arrow_zarr_spark.zarr.versions import open_version

        assert not any(
            k.startswith("__stage__") for k in open_version(out, 1).walk_keys()
        )


class TestVersionCDC:
    """version_cdc — row-level deltas between two committed versions,
    decoded from ONLY the chunks whose manifest hashes (or in-bounds
    regions) differ."""

    def _two_versions(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr
        from arrow_zarr_spark.zarr.versions import commit_version

        path = str(tmp_path / "cdc_store")

        def tbl(hi, bump):
            d = F.when(
                (F.col("id") >= 10) & (F.col("id") < 20) & F.lit(bump),
                F.col("id") * 5,
            ).otherwise(F.col("id") * 3)
            return spark.range(0, hi).select(
                F.col("id").alias("k"), d.cast("double").alias("d")
            )

        write_zarr(tbl(64, False), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1")
        write_zarr(tbl(80, True), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2")
        return path

    def test_modified_and_added_rows(self, spark, tmp_path):
        from arrow_zarr_spark.zarr.versions import version_cdc

        path = self._two_versions(spark, tmp_path)
        rows = [
            tuple(r)
            for r in version_cdc(spark, path, 1, 2)
            .orderBy("array", "pos")
            .collect()
        ]
        expect = (
            [
                ("d", i, str(i), "modified", f"{i*3}.0", f"{i*5}.0")
                for i in range(10, 20)
            ]
            + [
                ("d", i, str(i), "added", None, f"{i*3}.0")
                for i in range(64, 80)
            ]
            + [
                ("k", i, str(i), "added", None, str(i))
                for i in range(64, 80)
            ]
        )
        assert rows == sorted(expect, key=lambda t: (t[0], t[1]))

    def test_work_list_is_delta_only(self, spark, tmp_path):
        """The hash gate must skip byte-identical chunks even though
        v2 was a full overwrite: d touches chunks 0,1 (modified rows
        10-19) and 4 (appended); k only chunk 4."""
        from arrow_zarr_spark.zarr.array import (
            infer_store_arrays_authoritative,
        )
        from arrow_zarr_spark.zarr.store import open_store
        from arrow_zarr_spark.zarr.versions import (
            VersionStoreView,
            _cdc_chunk_work,
            _read_manifest,
        )

        path = self._two_versions(spark, tmp_path)
        store = open_store(path)
        man = {
            v: _read_manifest(store, v)["objects"] for v in (1, 2)
        }
        metas = {
            v: {
                a.meta.name: a.meta
                for a in infer_store_arrays_authoritative(
                    VersionStoreView(store, None, v)
                )
            }
            for v in (1, 2)
        }
        us, work_d = _cdc_chunk_work(
            "d", metas[1]["d"], metas[2]["d"], man[1], man[2]
        )
        assert us == (80,) and work_d == [(0,), (1,), (4,)]
        _, work_k = _cdc_chunk_work(
            "k", metas[1]["k"], metas[2]["k"], man[1], man[2]
        )
        assert work_k == [(4,)]

    def test_shrink_reports_removed(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr
        from arrow_zarr_spark.zarr.versions import (
            commit_version,
            version_cdc,
        )

        path = str(tmp_path / "shrink_store")

        def tbl(hi):
            return spark.range(0, hi).select(
                (F.col("id") * 2).cast("double").alias("v")
            )

        write_zarr(tbl(40), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v1")
        write_zarr(tbl(24), path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2")
        rows = [
            tuple(r)
            for r in version_cdc(spark, path, 1, 2)
            .orderBy("pos")
            .collect()
        ]
        assert rows == [
            ("v", i, str(i), "removed", f"{i*2}.0", None)
            for i in range(24, 40)
        ]

    def test_2d_grid_region_delta(self, spark, tmp_path):
        """A region write on a 2-D grid: CDC reports exactly the
        rewritten cells with N-D coords, and only chunks intersecting
        the region enter the work list."""
        from arrow_zarr_spark.io import write_zarr_grid, write_zarr_region
        from arrow_zarr_spark.zarr.versions import (
            commit_version,
            version_cdc,
        )

        path = str(tmp_path / "grid_store")
        base = spark.createDataFrame(
            [(x, y, float(10 * x + y)) for x in range(6) for y in range(6)],
            "x long, y long, t double",
        )
        write_zarr_grid(
            base, path, dims=["x", "y"], chunk_shape=(3, 3), mode="overwrite"
        )
        commit_version(spark, path, "v1")
        patch = spark.createDataFrame(
            [(4, 4, 999.0), (4, 5, 998.0)], "x long, y long, t double"
        )
        write_zarr_region(patch, path, dims=["x", "y"])
        commit_version(spark, path, "v2")
        rows = [
            tuple(r)
            for r in version_cdc(spark, path, 1, 2, columns=["t"])
            .orderBy("pos")
            .collect()
        ]
        assert rows == [
            ("t", 4 * 6 + 4, "4/4", "modified", "44.0", "999.0"),
            ("t", 4 * 6 + 5, "4/5", "modified", "45.0", "998.0"),
        ]

    def test_layout_change_reported_not_compared(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr
        from arrow_zarr_spark.zarr.versions import (
            commit_version,
            version_cdc,
        )

        path = str(tmp_path / "rechunk_store")
        df = spark.range(0, 32).select(
            (F.col("id") * 2).cast("double").alias("v")
        )
        write_zarr(df, path, chunk_rows=8, mode="overwrite")
        commit_version(spark, path, "v1")
        write_zarr(df, path, chunk_rows=16, mode="overwrite")
        commit_version(spark, path, "v2")
        rows = [
            tuple(r) for r in version_cdc(spark, path, 1, 2).collect()
        ]
        assert ("v", None, None, "layout_differs", None, None) in rows


class TestOptimisticConcurrency:
    """commit_version's CAS surface: expected_head rejects commits
    based on a stale read, and the manifest publish itself is an
    exclusive create — two racers can never both land a version."""

    def test_expected_head_matches(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import VersionConflictError  # noqa: F401

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        info = commit_version(spark, d, "first", expected_head=0)
        assert info["version"] == 1
        write_zarr(_table(spark, 32, 40), d, chunk_rows=16, mode="append")
        assert commit_version(spark, d, expected_head=1)["version"] == 2

    def test_stale_expected_head_conflicts(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import VersionConflictError

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)  # someone else lands version 1
        with pytest.raises(VersionConflictError, match="expected HEAD 0"):
            commit_version(spark, d, expected_head=0)
        # the loser's retry against the real head succeeds
        assert commit_version(spark, d, expected_head=1)["version"] == 2

    def test_conflict_is_a_zarr_error(self, spark, tmp_path):
        """VersionConflictError must subclass ZarrFormatError so
        existing error handling keeps catching it."""
        from arrow_zarr_spark.zarr import VersionConflictError

        assert issubclass(VersionConflictError, ZarrFormatError)

    def test_manifest_publish_is_exclusive(self, spark, tmp_path):
        """Simulate the narrowest race: a competing manifest for the
        same next version lands AFTER this writer listed versions.
        The publish must fail — never silently overwrite the winner's
        manifest."""
        import json

        from arrow_zarr_spark.zarr import VersionConflictError
        from arrow_zarr_spark.zarr.versions import (
            _manifest_key,
            _read_manifest,
        )

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        store = open_store(d)
        winner = {"format": 1, "version": 1, "message": "winner",
                  "created_unix": 0, "objects": {}}
        orig_list = __import__(
            "arrow_zarr_spark.zarr.versions", fromlist=["_manifest_versions"]
        )._manifest_versions

        import arrow_zarr_spark.zarr.versions as vmod

        def race_then_list(s):
            out = orig_list(s)
            # the winner publishes between the list and our publish
            if not s.exists(_manifest_key(1)):
                s.set(_manifest_key(1), json.dumps(winner).encode())
            return out

        vmod._manifest_versions = race_then_list
        try:
            with pytest.raises(VersionConflictError, match="published"):
                commit_version(spark, d)
        finally:
            vmod._manifest_versions = orig_list
        # the winner's manifest is intact
        assert _read_manifest(store, 1)["message"] == "winner"

    def test_local_set_exclusive_atomicity(self, tmp_path):
        """LocalStore.set_exclusive: second create of the same key
        raises and preserves the first value; no temp files remain."""
        import os

        store = open_store(str(tmp_path / "x"))
        store.set_exclusive("a/b", b"first")
        with pytest.raises(FileExistsError):
            store.set_exclusive("a/b", b"second")
        assert store.get("a/b") == b"first"
        leftovers = [
            f
            for _, _, files in os.walk(str(tmp_path / "x"))
            for f in files
            if f.endswith(".xtmp")
        ]
        assert leftovers == []


class TestChunkStatView:
    """chunk_stat_view / refresh_chunk_stat_view (x04): incremental
    materialized-view maintenance at delta cost."""

    def _store(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import chunk_stat_view

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d, "v1")
        return d, chunk_stat_view(spark, d, 1)

    def test_refresh_equals_full_recompute(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import (
            chunk_stat_view,
            refresh_chunk_stat_view,
        )

        d, base = self._store(spark, tmp_path)
        write_zarr(_table(spark, 64, 112), d, chunk_rows=16, mode="append")
        commit_version(spark, d, "v2")
        ref = sorted(
            map(tuple, refresh_chunk_stat_view(spark, d, base, 1).collect())
        )
        full = sorted(map(tuple, chunk_stat_view(spark, d, 2).collect()))
        assert ref == full and len(full) == 14  # 2 arrays x 7 chunks

    def test_work_list_is_delta_only(self, spark, tmp_path, monkeypatch):
        """An append of 3 chunks must recompute only the appended
        chunks (x2 arrays) — byte-identical chunks never decode."""
        import arrow_zarr_spark.zarr.versions as vmod

        d, base = self._store(spark, tmp_path)
        write_zarr(_table(spark, 64, 112), d, chunk_rows=16, mode="append")
        commit_version(spark, d, "v2")
        seen = []
        real = vmod._chunk_stats_rows

        def spy(spark_, path, version, work, metas):
            seen.append(list(work))
            return real(spark_, path, version, work, metas)

        monkeypatch.setattr(vmod, "_chunk_stats_rows", spy)
        vmod.refresh_chunk_stat_view(spark, d, base, 1, 2).collect()
        assert len(seen) == 1
        # 48 appended rows = 3 new chunks per array
        assert sorted(seen[0]) == [
            ("k", (4,)), ("k", (5,)), ("k", (6,)),
            ("v", (4,)), ("v", (5,)), ("v", (6,)),
        ]

    def test_shrink_drops_stale_chunk_rows(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import (
            chunk_stat_view,
            refresh_chunk_stat_view,
        )

        d, base = self._store(spark, tmp_path)
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16, mode="overwrite")
        commit_version(spark, d, "v2-shrunk")
        ref = sorted(
            map(tuple, refresh_chunk_stat_view(spark, d, base, 1).collect())
        )
        full = sorted(map(tuple, chunk_stat_view(spark, d, 2).collect()))
        assert ref == full and len(full) == 4

    def test_layout_change_falls_back_to_full_array(
        self, spark, tmp_path
    ):
        """A rechunked history can't reuse positional chunk rows —
        the refresh must drop and recompute that array in full and
        still equal the from-scratch view."""
        from arrow_zarr_spark.zarr import (
            chunk_stat_view,
            refresh_chunk_stat_view,
        )

        d, base = self._store(spark, tmp_path)
        write_zarr(_table(spark, 0, 64), d, chunk_rows=8, mode="overwrite")
        commit_version(spark, d, "v2-rechunked")
        ref = sorted(
            map(tuple, refresh_chunk_stat_view(spark, d, base, 1).collect())
        )
        full = sorted(map(tuple, chunk_stat_view(spark, d, 2).collect()))
        assert ref == full and len(full) == 16


class TestScrub:
    """scrub_zarr — manifest drift detection (z34)."""

    def test_clean_store_all_ok(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import scrub_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d)
        rows = scrub_zarr(spark, d).collect()
        assert rows and all(r.status == "ok" for r in rows)

    def test_detects_all_three_drift_kinds(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import open_store, scrub_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d)
        st = open_store(d)
        st.set("v/c/1", b"rot")
        st.delete("k/c/2")
        st.set("stray.bin", b"x")
        got = {r.key: r.status for r in scrub_zarr(spark, d).collect()}
        assert got["v/c/1"] == "modified"
        assert got["k/c/2"] == "missing"
        assert got["stray.bin"] == "extra"
        assert got["k/c/0"] == "ok"

    def test_scrub_pins_a_chosen_version(self, spark, tmp_path):
        """Scrubbing against v1 after an append flags the append as
        drift (extras + modified metadata); against v2 it is clean —
        the baseline is the chosen manifest, not 'whatever is live'."""
        from arrow_zarr_spark.zarr import scrub_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        write_zarr(_table(spark, 32, 48), d, chunk_rows=16, mode="append")
        commit_version(spark, d)
        v1 = {r.status for r in scrub_zarr(spark, d, version=1).collect()}
        assert "extra" in v1 and "modified" in v1
        v2 = {r.status for r in scrub_zarr(spark, d, version=2).collect()}
        assert v2 == {"ok"}


class TestRepair:
    """repair_zarr (z36) — scrub's other half: damage-proportional
    self-heal from the committed baseline."""

    def test_repairs_only_damaged_keys(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import open_store, repair_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 64), d, chunk_rows=16)
        commit_version(spark, d)
        st = open_store(d)
        st.set("v/c/1", b"rot")
        st.delete("k/c/2")
        st.set("stray.bin", b"x")  # extras are NOT repair's business
        info = repair_zarr(spark, d)
        assert info["n_repaired"] == 2
        assert sorted(info["repaired"]) == ["k/c/2", "v/c/1"]
        got = spark.read.format("zarr").load(d)
        assert got.count() == 64
        assert got.agg(F.sum("v")).first()[0] == sum(
            i * 2 for i in range(64)
        )
        assert st.get("stray.bin") == b"x"  # untouched

    def test_noop_on_clean_store(self, spark, tmp_path):
        from arrow_zarr_spark.zarr import repair_zarr

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        info = repair_zarr(spark, d)
        assert info["n_repaired"] == 0 and info["repaired"] == []

    def test_vacuumed_history_raises_with_guidance(
        self, spark, tmp_path
    ):
        """Damage older than the retained history can't self-heal —
        the error must say so and point at the replica path."""
        from arrow_zarr_spark.zarr import open_store, repair_zarr
        from arrow_zarr_spark.zarr.versions import _object_key
        import hashlib

        d = str(tmp_path / "s")
        write_zarr(_table(spark, 0, 32), d, chunk_rows=16)
        commit_version(spark, d)
        st = open_store(d)
        orig = st.get("k/c/1")
        st.set("k/c/1", b"rot")
        # simulate a vacuum that dropped the object
        st.delete(_object_key(hashlib.sha256(orig).hexdigest()))
        with pytest.raises(ZarrFormatError, match="sync_zarr"):
            repair_zarr(spark, d)
