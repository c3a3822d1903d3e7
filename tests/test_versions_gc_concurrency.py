"""GC safety under CAS-commit concurrency (r7 verdict item 6) — the
one untested seam in the versioning kit: commit_version writes its
content objects FIRST and publishes its manifest LAST, so a racing
vacuum_versions could collect an in-flight commit's objects and the
commit would land a manifest referencing GC'd bytes.

Two guards close the window (versions.vacuum_versions):
- grace window: unreferenced objects younger than ``grace_seconds``
  (or of unknown age) are never collected;
- manifest re-list: manifests that appear between the vacuum's first
  listing and its delete phase contribute their references.

These tests pin both guards deterministically, then storm the store
with interleaved commit / vacuum / sync threads and assert the
invariant: NO committed manifest ever references a GC'd object, and
a replica sync converges after the dust settles.

All driver-local (spark=None faces) — the protocol under test is the
store-level commit/GC interleaving, not the distributed copy.
"""

import hashlib
import json
import os
import threading
import time

import pytest

import arrow_zarr_spark.zarr.versions as V
from arrow_zarr_spark.zarr import (
    commit_version,
    open_store,
    sync_zarr,
    vacuum_versions,
)
from arrow_zarr_spark.zarr.versions import (
    VersionConflictError,
    _manifest_versions,
    _object_key,
    _read_manifest,
)


def _seed(path: str, n_keys: int = 4) -> None:
    store = open_store(path)
    store.set("zarr.json", json.dumps({"zarr_format": 3}).encode())
    for i in range(n_keys):
        store.set(f"k/c/{i}", f"chunk-{i}".encode())


def _assert_all_manifests_materializable(path: str) -> int:
    """THE invariant: every referenced object of every surviving
    manifest exists. Returns the number of manifests checked."""
    store = open_store(path)
    versions = _manifest_versions(store)
    for v in versions:
        man = _read_manifest(store, v)
        for key, sha in man["objects"].items():
            assert store.exists(_object_key(sha)), (
                f"version {v} references GC'd object {sha} ({key})"
            )
    return len(versions)


class TestGraceWindow:
    def test_young_unreferenced_object_survives_vacuum(self, tmp_path):
        """The pre-publish state of an in-flight commit — a content
        object no manifest references yet — must survive a vacuum."""
        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        data = b"in-flight commit bytes"
        sha = hashlib.sha256(data).hexdigest()
        store.set(_object_key(sha), data)
        out = vacuum_versions(d, keep_last=1)  # default grace
        assert store.exists(_object_key(sha))
        assert out["skipped_young"] >= 1
        assert out["deleted_objects"] == 0

    def test_aged_unreferenced_object_is_collected(self, tmp_path):
        """Grace is a WINDOW, not amnesty: once the object outlives
        it, the next vacuum collects it — GC still does its job."""
        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        data = b"aged debris"
        sha = hashlib.sha256(data).hexdigest()
        key = _object_key(sha)
        store.set(key, data)
        path = os.path.join(d, *key.split("/"))
        old = time.time() - 7200
        os.utime(path, (old, old))
        out = vacuum_versions(d, keep_last=1)  # default grace 3600
        assert not store.exists(key)
        assert out["deleted_objects"] == 1
        _assert_all_manifests_materializable(d)

    def test_unknown_age_is_never_collected(self, tmp_path, monkeypatch):
        """A backend without mtimes (Store.mtime -> None) must degrade
        to KEEPING unreferenced objects, not racing commits."""
        from arrow_zarr_spark.zarr.store import LocalStore

        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        data = b"unknown age"
        sha = hashlib.sha256(data).hexdigest()
        store.set(_object_key(sha), data)
        monkeypatch.setattr(LocalStore, "mtime", lambda self, key: None)
        out = vacuum_versions(d, keep_last=1, grace_seconds=60)
        assert store.exists(_object_key(sha))
        assert out["skipped_young"] >= 1

    def test_mtime_refresh_between_check_and_delete_rescues(
        self, tmp_path, monkeypatch
    ):
        """Guard 3 (r9, from the r8 ADVICE TOCTOU finding): a
        dedup-hit touch() that lands AFTER the first age check but
        BEFORE the delete must still rescue the object — vacuum
        re-reads mtime immediately before each delete."""
        from arrow_zarr_spark.zarr.store import LocalStore

        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        data = b"touched between check and delete"
        sha = hashlib.sha256(data).hexdigest()
        key = _object_key(sha)
        store.set(key, data)
        p = os.path.join(d, *key.split("/"))
        old = time.time() - 7200
        os.utime(p, (old, old))
        real_mtime = LocalStore.mtime
        calls = {"n": 0}

        def racing_mtime(self, k):
            if k == key:
                calls["n"] += 1
                if calls["n"] >= 2:
                    return time.time()  # the touch landed mid-gap
            return real_mtime(self, k)

        monkeypatch.setattr(LocalStore, "mtime", racing_mtime)
        out = vacuum_versions(d, keep_last=1)  # default grace
        assert store.exists(key)
        assert calls["n"] >= 2  # the pre-delete re-check actually ran
        assert out["deleted_objects"] == 0
        assert out["skipped_young"] >= 1

    def test_grace_zero_restores_unguarded_behavior(self, tmp_path):
        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        data = b"collected immediately"
        sha = hashlib.sha256(data).hexdigest()
        store.set(_object_key(sha), data)
        out = vacuum_versions(d, keep_last=1, grace_seconds=0)
        assert not store.exists(_object_key(sha))
        assert out["deleted_objects"] == 1


class TestRelistGuard:
    def test_manifest_published_mid_vacuum_pins_its_objects(
        self, tmp_path, monkeypatch
    ):
        """Guard 2 in isolation: even with grace DISABLED, a manifest
        the vacuum's first listing missed (= published mid-vacuum)
        contributes its references via the re-list, so its objects
        survive the delete phase."""
        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        # v2 rewrites one chunk -> unique content object
        store.set("k/c/0", b"rewritten chunk 0")
        commit_version(None, d, "v2")
        v2_shas = set(_read_manifest(store, 2)["objects"].values())

        real = V._manifest_versions
        state = {"first": True}

        def stale_once(s):
            out = real(s)
            if state["first"]:
                state["first"] = False
                return [v for v in out if v != 2]  # v2 "not yet" visible
            return out

        monkeypatch.setattr(V, "_manifest_versions", stale_once)
        vacuum_versions(d, keep_last=1, grace_seconds=0)
        for sha in v2_shas:
            assert store.exists(_object_key(sha))
        _assert_all_manifests_materializable(d)


class TestInterleavedStorm:
    def test_commit_vacuum_sync_interleave(self, tmp_path):
        """The full seam, threaded on a LocalStore: a committer loop
        (CAS retries), a vacuum loop (keep_last=2, grace > commit
        duration), and a sync loop pulling a replica. Invariants:
        no surviving manifest references a GC'd object, the final
        sync converges the replica to the source's latest version
        byte-for-byte, and an aged final vacuum still collects."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _seed(src)
        commit_version(None, src, "v1")
        from arrow_zarr_spark.io import replicate_zarr

        replicate_zarr(None, src, dst, include_versions=True)

        stop = threading.Event()
        errors = []
        n_commits = [0]

        def committer():
            store = open_store(src)
            i = 0
            while not stop.is_set() and n_commits[0] < 25:
                i += 1
                store.set(
                    f"k/c/{i % 4}", f"gen-{i}-{time.time()}".encode()
                )
                try:
                    # block_keys=2 forces MULTI-BLOCK (format-2)
                    # manifests so the storm also races vacuum
                    # against block-object publication/freshening
                    commit_version(None, src, f"gen {i}", block_keys=2)
                    n_commits[0] += 1
                except VersionConflictError:
                    continue  # CAS loser: rebase (re-read) and retry
                except Exception as e:  # noqa: BLE001
                    errors.append(("commit", repr(e)))
                    return
            stop.set()

        def vacuumer():
            while not stop.is_set():
                try:
                    vacuum_versions(src, keep_last=2, grace_seconds=30)
                except Exception as e:  # noqa: BLE001
                    errors.append(("vacuum", repr(e)))
                    return
                time.sleep(0.01)

        def syncer():
            while not stop.is_set():
                try:
                    sync_zarr(None, src, dst)
                except Exception:
                    # a manifest/object vacuumed mid-pull surfaces as
                    # a loud error — transiently acceptable; the
                    # converges-assertion is the FINAL sync below
                    pass
                time.sleep(0.01)

        threads = [
            threading.Thread(target=committer),
            threading.Thread(target=vacuumer),
            threading.Thread(target=syncer),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stop.set()
        assert not errors, errors
        assert n_commits[0] == 25

        # invariant 1: every surviving manifest fully materializable
        n_manifests = _assert_all_manifests_materializable(src)
        assert n_manifests >= 2  # keep_last=2 under vacuum pressure

        # invariant 2: the replica converges
        out = sync_zarr(None, src, dst)
        src_store, dst_store = open_store(src), open_store(dst)
        assert out["to_version"] == _manifest_versions(src_store)[-1]
        for k in src_store.walk_keys():
            if k.startswith(".versions/manifests/") or not k.startswith(
                ".versions/"
            ):
                assert dst_store.get(k) == src_store.get(k), k
        _assert_all_manifests_materializable(dst)

        # invariant 3: GC still collects once objects age out —
        # backdate everything and vacuum hard
        for k in list(src_store.walk_prefix(".versions/objects")):
            p = os.path.join(src, *k.split("/"))
            old = time.time() - 7200
            os.utime(p, (old, old))
        final = vacuum_versions(src, keep_last=1)
        assert final["deleted_objects"] > 0
        _assert_all_manifests_materializable(src)


class TestDedupFreshening:
    def test_dedup_hit_freshens_object_mtime(self, tmp_path):
        """git's loose-object freshening (r8 review finding): a commit
        whose snapshot DEDUP-hits an existing content object must
        freshen its mtime — otherwise an OLD object that a dropped
        version left unreferenced could be re-referenced by an
        in-flight commit and simultaneously collected by a racing
        aged vacuum (guard 1 only protects YOUNG objects)."""
        d = str(tmp_path / "s")
        _seed(d)
        commit_version(None, d, "v1")
        store = open_store(d)
        obj_keys = list(store.walk_prefix(".versions/objects"))
        assert obj_keys
        old = time.time() - 7200
        for k in obj_keys:
            p = os.path.join(d, *k.split("/"))
            os.utime(p, (old, old))
        # identical content -> every snapshot key is a dedup hit
        commit_version(None, d, "v2")
        for k in obj_keys:
            age = time.time() - store.mtime(k)
            assert age < 60, (k, age)
        # and an aged vacuum right after therefore cannot collect
        # anything v2 references
        out = vacuum_versions(d, keep_last=1)
        assert out["deleted_objects"] == 0
        _assert_all_manifests_materializable(d)
