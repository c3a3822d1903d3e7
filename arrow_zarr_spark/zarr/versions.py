"""Snapshot versioning for Zarr stores — commit, version-pinned read,
rollback, and version GC.

The reference delegates versioned reads to Icechunk repositories
(``config.rs:141-197``: a repo is opened at (branch "main", now) and
scanned like any store). icechunk-python has been absent from this
environment every round, so this module provides the same USER
capability natively, with the repo's own commit discipline:

- :func:`commit_version` snapshots the live store state: every live
  object is content-addressed (sha256) into ``.versions/objects/``
  (byte-identical objects are stored once across all versions), and a
  manifest mapping logical key -> content hash is published under
  ``.versions/manifests/``. The ``HEAD.json`` pointer is written LAST,
  so a crashed commit leaves at worst an unreferenced manifest —
  never a half-visible version (the same metadata-last protocol as
  the writers).
- :func:`open_version` returns a READ-ONLY :class:`VersionStoreView`
  resolving every read through the manifest — scans see exactly the
  committed bytes no matter how the live store has been mutated since
  (append, region write, ALTER, rechunk, even overwrite: the writers'
  clear path preserves ``.versions/``).
- :func:`rollback_zarr` restores the live keys from a manifest
  (data objects first, metadata documents after, stray live keys
  deleted last — readers mid-flight see a consistent store).
- :func:`vacuum_versions` drops old manifests and garbage-collects
  content objects no kept manifest references.

Scale shape: a commit is ONE distributed pass over the store's
objects (hash + conditional copy per key, executor-parallel); the
driver holds only the manifest (one (key, sha256) pair per object —
the same O(n_objects) metadata class as consolidated zarr.json, and
the same lever applies: bigger objects via chunk_rows/shard_chunks
mean smaller manifests). Reads resolve key->hash in memory with no
extra I/O per chunk. Unchanged objects cost a hash but no copy, so
committing after an append prices at one read of the store plus one
write of the delta.
"""

from __future__ import annotations

import hashlib
import json
import re
import time
from typing import Dict, Iterator, List, Optional

from .meta import ZarrFormatError
from .store import Store, open_store

#: Everything the version machinery writes lives under this prefix.
#: Zarr array discovery ignores it (no ``zarr.json`` ever appears at
#: ``.versions/<x>/zarr.json`` depth), and the maintenance verbs
#: (vacuum, overwrite-clear) explicitly preserve it.
VERSIONS_PREFIX = ".versions/"
_MANIFEST_DIR = VERSIONS_PREFIX + "manifests/"
_OBJECTS_DIR = VERSIONS_PREFIX + "objects/"


class VersionConflictError(ZarrFormatError):
    """Another writer committed first. The losing commit published
    NOTHING visible (content objects are addressed by sha256, so a
    lost race costs orphaned-but-dedupable bytes, never a wrong
    manifest) — re-read the store, rebase the update, retry."""


def _object_key(sha: str) -> str:
    """Content objects shard by hash prefix (objects/ab/<sha>) — a
    million-object history must not put a million files in one
    directory (LocalStore) or one listing prefix (object stores)."""
    return f"{_OBJECTS_DIR}{sha[:2]}/{sha}"
_HEAD_KEY = VERSIONS_PREFIX + "HEAD.json"
_TAGS_DIR = VERSIONS_PREFIX + "tags/"

#: Tag names are path-segment-safe by construction: one object per tag
#: (``tags/<name>.json``) so create/delete are single-key operations —
#: no read-modify-write of a shared document to race on an object
#: store that has no atomic RMW.
_TAG_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")


def _tag_key(tag: str) -> str:
    return f"{_TAGS_DIR}{tag}.json"


def _live_keys(store: Store) -> List[str]:
    # __stage__ is the sinks' in-flight staging area (sinks.py): not
    # committed state — snapshotting it would freeze debris into the
    # manifest (and rollback would resurrect it), and a commit racing a
    # sink job would hit the vanished-mid-commit error on transient keys
    return sorted(
        k
        for k in store.walk_keys()
        if not k.startswith(VERSIONS_PREFIX)
        and not k.startswith("__stage__")
    )


def _manifest_key(version: int) -> str:
    return f"{_MANIFEST_DIR}{version:08d}.json"


#: Keys per manifest block (format 2). The commit slices the SORTED
#: live-key list into contiguous ranges of at most this many keys;
#: each block is one content-addressed JSON object, so a pinned-scan
#: task resolving one chunk key GETs one block, never the whole
#: manifest — the stats-sidecar discipline applied to the version
#: store (r8 verdict item 2: the monolithic manifest was the last
#: O(n_objects) metadata document).
MANIFEST_BLOCK_KEYS = 65536


def _read_manifest_root(store: Store, version: int) -> Dict:
    """The root manifest document, WITHOUT materializing blocks.

    format 1 (pre-r9): ``objects`` inline — the migration path; every
    reader accepts it forever. format 2: ``block_starts`` (first key
    per block, ascending) + ``blocks`` (content sha per block) +
    ``n_objects``."""
    raw = store.get(_manifest_key(version))
    if raw is None:
        raise ZarrFormatError(
            f"No version {version} at this store (missing "
            f"{_manifest_key(version)})"
        )
    doc = json.loads(raw)
    fmt = doc.get("format")
    ok = (fmt == 1 and "objects" in doc) or (
        fmt == 2
        and isinstance(doc.get("blocks"), list)
        and isinstance(doc.get("block_starts"), list)
        and len(doc["blocks"]) == len(doc["block_starts"])
        # consumers read these unguarded (version_log) — a corrupt
        # root must fail HERE with the module's ZarrFormatError, not
        # leak a KeyError downstream
        and isinstance(doc.get("n_objects"), int)
    )
    if not ok:
        raise ZarrFormatError(
            f"Malformed version manifest {_manifest_key(version)}"
        )
    return doc


def _manifest_block(store: Store, sha: str) -> Dict[str, str]:
    raw = store.get(_object_key(sha))
    if raw is None:
        raise ZarrFormatError(
            f"Version manifest block missing (sha256 {sha}) — was "
            "vacuum_versions run with this version excluded?"
        )
    return json.loads(raw)


def _manifest_objects(store: Store, doc: Dict) -> Dict[str, str]:
    """Materialize the FULL key->sha mapping (loads every block for
    format 2). Driver-side maintenance verbs use this; pinned-scan
    tasks resolve per-key through covering blocks instead."""
    if doc.get("format") == 1:
        return doc["objects"]
    objects: Dict[str, str] = {}
    for sha in doc["blocks"]:
        objects.update(_manifest_block(store, sha))
    return objects


def _manifest_all_shas(store: Store, doc: Dict) -> set:
    """Every content sha a manifest pins: its data objects AND (format
    2) its block objects — vacuum must keep both, sync must copy
    both."""
    out = set()
    if doc.get("format") == 2:
        out.update(doc["blocks"])
    out.update(_manifest_objects(store, doc).values())
    return out


def _read_manifest(store: Store, version: int) -> Dict:
    """Root manifest with ``objects`` materialized (both formats) —
    the compatibility face every whole-manifest consumer reads."""
    doc = _read_manifest_root(store, version)
    if "objects" not in doc:
        doc = dict(doc)
        doc["objects"] = _manifest_objects(store, doc)
    return doc


def _manifest_versions(store: Store) -> List[int]:
    # prefix listing, NOT a full-store walk: version_log /
    # resolve_as_of / the next-version pick must stay metadata-scale
    # on a store whose data area has millions of keys
    out = []
    for k in store.walk_prefix(_MANIFEST_DIR):
        if k.endswith(".json"):
            stem = k[len(_MANIFEST_DIR) : -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


#: Key-count cutover between commit_version's two spark tiers: up to
#: this many live keys the driver lists them itself and fans out one
#: task per BLOCK (one Spark job — ~130k keys is a few MB of driver
#: strings); beyond it the listing itself distributes
#: (_snapshot_distributed's sort/ordinal pipeline, ~4 keys-only jobs
#: whose fixed overhead would be a 7x regression on small commits but
#: is noise at the scale that needs it). The probe is a BOUNDED walk
#: (``Store.probe_keys``, cap+1 keys through an incremental backend
#: walk), so deciding the tier never lists a huge store.
COMMIT_DRIVER_LIST_MAX = 1 << 17


def _default_block_keys(n_keys: int) -> int:
    """Deterministic in the key count alone (NOT cluster
    parallelism): identical stores slice into identical blocks.
    Floor of 64 keys/block so a tiny store publishes one or two
    block objects, not one per key; ceiling of MANIFEST_BLOCK_KEYS
    so huge stores stay ~64+ blocks wide."""
    return min(MANIFEST_BLOCK_KEYS, max(64, -(-n_keys // 64)))


def _snapshot_block(task_store: Store, bi: int, bkeys: List[str]):
    """Hash + conditionally copy one block's objects and publish the
    block manifest as a content object. ONE definition shared by the
    serial and distributed commit paths (they must publish
    bit-identical blocks). Returns
    ``(block_index, start_key, block_sha, n_entries, n_new)``."""
    entries: Dict[str, str] = {}
    n_new_b = 0
    for key in bkeys:
        data = task_store.get(key)
        if data is None:
            # listed-then-deleted race: surface it — a snapshot must
            # not silently omit a key it enumerated
            raise ZarrFormatError(
                f"commit_version: key {key!r} vanished mid-commit"
            )
        sha = hashlib.sha256(data).hexdigest()
        obj_key = _object_key(sha)
        if task_store.exists(obj_key):
            # git's loose-object freshening: a dedup hit must pull
            # the object back inside vacuum's grace window — an OLD
            # unreferenced object (e.g. from a dropped version) this
            # commit is about to re-reference would otherwise be
            # collectable right up to the manifest publish (r8
            # review finding)
            task_store.touch(obj_key)
        else:
            task_store.set(obj_key, data)
            n_new_b += 1
        entries[key] = sha
    # the block manifest is itself a content object: an unchanged key
    # range dedups across versions, and vacuum's grace window
    # protects pre-publish blocks exactly like pre-publish data
    # objects
    blob = json.dumps(entries, sort_keys=True).encode()
    bsha = hashlib.sha256(blob).hexdigest()
    bkey = _object_key(bsha)
    if task_store.exists(bkey):
        task_store.touch(bkey)
    else:
        task_store.set(bkey, blob)
    return (bi, bkeys[0], bsha, len(entries), n_new_b)


def _snapshot_distributed(
    spark, path: str, store: Store, block_keys: Optional[int]
) -> List:
    """The fully distributed commit pass: NO driver key list.

    1. the driver reads only the store's TOP-LEVEL entries
       (``Store.list_root`` — one delimiter listing);
    2. tasks list one subtree each (``walk_prefix``);
    3. a distributed sort + ``zipWithIndex`` assigns each key its
       global ordinal — keys shuffle between executors, never
       through the driver;
    4. keys group by ``ordinal div block_keys`` (one more keys-only
       shuffle) and one task per block hashes its objects and writes
       its block manifest via the shared :func:`_snapshot_block`.

    Ordinal-derived boundaries equal the serial path's sorted-slice
    boundaries exactly, so both paths publish bit-identical
    manifests. Driver memory: top-level entries + one summary row
    per block."""
    sc = spark.sparkContext
    groups = [
        (name, is_dir)
        for name, is_dir in store.list_root()
        if name != VERSIONS_PREFIX.rstrip("/")
        and not name.startswith("__stage__")
    ]
    if not groups:
        raise ZarrFormatError(f"commit_version: empty store at {path!r}")

    def list_group(items):
        task_store = open_store(path)
        for name, is_dir in items:
            if is_dir:
                yield from task_store.walk_prefix(name)
            else:
                yield name

    n_g = max(1, min(len(groups), sc.defaultParallelism * 2))
    keys_rdd = sc.parallelize(groups, n_g).mapPartitions(list_group)
    n_parts = max(1, sc.defaultParallelism * 2)
    indexed = keys_rdd.sortBy(
        lambda k: k, numPartitions=n_parts
    ).zipWithIndex()
    indexed = indexed.persist()
    try:
        total = indexed.count()
        if total == 0:
            raise ZarrFormatError(
                f"commit_version: empty store at {path!r}"
            )
        blk = block_keys or _default_block_keys(total)

        def one_block(pair):
            bid, idx_keys = pair
            bkeys = [k for _, k in sorted(idx_keys)]
            return _snapshot_block(open_store(path), bid, bkeys)

        rows = (
            indexed.map(lambda ki: (ki[1] // blk, (ki[1], ki[0])))
            .groupByKey(numPartitions=n_parts)
            .map(one_block)
            .collect()  # one summary row per block
        )
    finally:
        indexed.unpersist()
    return rows


# ---------------------------------------------------------------------------
# Distributed listing machinery for the MAINTENANCE verbs (r10).
#
# commit_version got the three-tier listing in r9; these helpers give
# the same shape to every other verb that walks a keyspace
# (vacuum_versions / scrub / repair / sync / rollback-extras /
# export, and io.replicate_zarr / io.vacuum_zarr): below the cap the
# verb keeps its driver-list form (one Spark job, small-store
# latency); past it the listing itself distributes and the driver
# never holds a key list. The reference has no maintenance surface at
# all (its store access is read-only scanning, config.rs:126-132) —
# this family is original to this engine, so the scale discipline is
# self-imposed: no verb may carry an O(n_objects) driver term.
# ---------------------------------------------------------------------------

#: Key-count cutover for the maintenance verbs' listings — same bound
#: and probe discipline as COMMIT_DRIVER_LIST_MAX, separate name so
#: tests can force each tier independently.
MAINT_DRIVER_LIST_MAX = 1 << 17


def _probe_prefix(store: Store, prefix: str, cap: int):
    """Bounded probe of ONE subtree: the keys under ``prefix`` when
    there are at most ``cap``, else ``None`` (the caller must take a
    distributed path). ``walk_prefix`` is incremental on every
    backend (the r9 ADVICE fix), so the probe's driver cost is capped
    regardless of store size."""
    import itertools

    out = list(itertools.islice(store.walk_prefix(prefix), cap + 1))
    return None if len(out) > cap else out


def _live_keys_rdd(spark, path: str, include_staging: bool = False):
    """Distributed live-key listing — the RDD analog of
    :func:`_live_keys` with NO driver key list: the driver holds only
    the store's top-level entries (``Store.list_root``, one delimiter
    listing); tasks list one subtree each (the _snapshot_distributed
    fan-out, steps 1-2). ``include_staging`` keeps ``__stage__``
    (io.vacuum_zarr hunts staging debris; everything else treats it
    as not-committed state)."""
    sc = spark.sparkContext
    store = open_store(path)
    groups = [
        (name, is_dir)
        for name, is_dir in store.list_root()
        if name != VERSIONS_PREFIX.rstrip("/")
        and (include_staging or not name.startswith("__stage__"))
    ]
    if not groups:
        return sc.parallelize([], 1)

    def list_group(items):
        task_store = open_store(path)
        for name, is_dir in items:
            if is_dir:
                yield from task_store.walk_prefix(name)
            else:
                yield name

    n_g = max(1, min(len(groups), sc.defaultParallelism * 2))
    return sc.parallelize(groups, n_g).mapPartitions(list_group)


def _object_keys_rdd(spark, path: str):
    """Distributed listing of the content-object area: one task per
    hash-prefix shard (``objects/00..ff`` — :func:`_object_key`'s
    2-hex fan-out), so no driver key list however large the
    history and no single-task skew."""
    sc = spark.sparkContext
    prefixes = [f"{_OBJECTS_DIR}{i:02x}" for i in range(256)]

    def list_shard(items):
        task_store = open_store(path)
        for p in items:
            yield from task_store.walk_prefix(p)

    n = max(1, min(256, sc.defaultParallelism * 2))
    return sc.parallelize(prefixes, n).mapPartitions(list_shard)


def _manifest_entries_rdd(spark, path: str, root: Dict):
    """One manifest's (key, sha) pairs as an RDD — O(n_blocks) driver
    memory: tasks read the content-addressed block objects (format 2).
    format-1 roots carry ``objects`` inline (legacy small commits —
    the serial tier's class), parallelized as-is."""
    sc = spark.sparkContext
    if root.get("format") == 1:
        items = list(root["objects"].items())
        n = max(1, min(len(items) or 1, sc.defaultParallelism * 2))
        return sc.parallelize(items, n)
    blocks = list(root["blocks"])
    if not blocks:
        return sc.parallelize([], 1)

    def read_blocks(shas):
        task_store = open_store(path)
        for sha in shas:
            yield from _manifest_block(task_store, sha).items()

    n = max(1, min(len(blocks), sc.defaultParallelism * 2))
    return sc.parallelize(blocks, n).mapPartitions(read_blocks)


def _manifest_shas_rdd(spark, path: str, roots: List[Dict]):
    """Every content sha the given manifest ROOTS pin — data shas AND
    (format 2) the block shas themselves, the exact set
    :func:`_manifest_all_shas` returns — as an RDD. Driver memory:
    the roots' block lists (O(n_blocks))."""
    sc = spark.sparkContext
    inline: List[str] = []
    blocks: List[str] = []
    for root in roots:
        if root.get("format") == 1:
            inline.extend(root["objects"].values())
        else:
            inline.extend(root["blocks"])
            blocks.extend(root["blocks"])

    def read_blocks(shas):
        task_store = open_store(path)
        for sha in shas:
            yield from _manifest_block(task_store, sha).values()

    n_i = max(1, min(len(inline) or 1, sc.defaultParallelism * 2))
    rdd = sc.parallelize(inline, n_i)
    if blocks:
        n_b = max(1, min(len(blocks), sc.defaultParallelism * 2))
        rdd = rdd.union(
            sc.parallelize(blocks, n_b).mapPartitions(read_blocks)
        )
    return rdd


def _is_meta_key(key: str) -> bool:
    """Zarr metadata documents publish AFTER data objects in every
    restore/copy protocol (readers mid-operation must never see
    metadata advertising absent chunks). ONE definition for rollback
    / sync / repair / export."""
    leaf = key.rsplit("/", 1)[-1]
    return leaf in (
        "zarr.json", ".zarray", ".zattrs", ".zgroup", ".zmetadata",
    )


def _root_n_objects(root: Dict) -> int:
    return (
        len(root["objects"])
        if root.get("format") == 1
        else int(root["n_objects"])
    )


def commit_version(
    spark,
    path: str,
    message: str = "",
    expected_head: Optional[int] = None,
    block_keys: Optional[int] = None,
) -> Dict:
    """Snapshot the live store state as the next version. Returns
    ``{"version", "n_objects", "n_new_objects", "message"}``.

    One distributed pass: every live key is hashed and its bytes
    copied to ``.versions/objects/<sha[:2]>/<sha256>`` unless that
    content object already exists (dedup across versions — an
    append-only history of an N-object store costs N + sum(deltas)
    objects, not N * versions). The manifest and HEAD publish
    driver-side, last.

    Concurrency: the manifest is published with an EXCLUSIVE create
    (``Store.set_exclusive`` — atomic link(2) on LocalStore), so two
    racing committers can never both land the same version number:
    the loser gets :class:`VersionConflictError` and must retry.
    Pass ``expected_head`` (the version this writer based its changes
    on; 0 for a store with no versions yet) to ALSO reject when
    anyone committed since that base — the compare-and-swap that
    turns last-writer-wins into first-writer-wins. Content objects
    are safe either way: they are content-addressed, so concurrent
    writers converge on identical bytes.

    Manifest layout (format 2, r9): the sorted key list is sliced
    into contiguous blocks of ``block_keys`` keys (default: ≤64
    blocks until that would exceed :data:`MANIFEST_BLOCK_KEYS` keys
    per block — deterministic in the key count, so identical stores
    commit identical blocks and cross-version dedup applies to
    unchanged key ranges). Each TASK writes its blocks' key->sha maps
    as content-addressed objects and returns one summary row per
    block, so the driver never materializes the (key, sha) mapping —
    O(n_blocks) driver memory, not O(n_objects) — and CAS stays on
    the tiny root document alone.

    With ``spark`` the LISTING is distributed too (r9, second pass):
    the driver holds only the store's top-level entries; tasks list
    one subtree each, a distributed sort + zipWithIndex assigns
    global ordinals (keys shuffle, never the driver), and one task
    per ``idx div block_keys`` block hashes its objects and writes
    its block — end-to-end O(n_blocks) driver memory, no driver key
    list. Block boundaries come from the global ordinal, so the
    distributed and serial paths publish BIT-IDENTICAL manifests
    (test-pinned) and cross-version block dedup is preserved.
    """
    store = open_store(path)
    existing = _manifest_versions(store)
    head = existing[-1] if existing else 0
    if expected_head is not None and head != int(expected_head):
        raise VersionConflictError(
            f"commit_version: expected HEAD {int(expected_head)} but "
            f"found {head} at {path!r} — another writer committed; "
            f"re-read, rebase the update onto version {head}, and retry"
        )
    version = head + 1
    if spark is None:
        # serial fallback (tools, tests, non-Spark callers) — same
        # per-key and per-block code paths, just undistributed
        keys = _live_keys(store)
        if not keys:
            raise ZarrFormatError(
                f"commit_version: empty store at {path!r}"
            )
        blk = block_keys or _default_block_keys(len(keys))
        rows = [
            _snapshot_block(store, bi, keys[i : i + blk])
            for bi, i in enumerate(range(0, len(keys), blk))
        ]
    else:
        # bounded probe picks the tier: the driver-list path is ONE
        # Spark job (right for small commits); the fully distributed
        # path never materializes a key list anywhere (right past the
        # cap). Both slice by the same sorted-ordinal rule, so all
        # three paths publish bit-identical manifests. probe_keys is
        # the Store-level bounded walk — every backend's walk_keys is
        # incremental (fsspec included, via per-directory delimiter
        # listings: the r9 ADVICE fix), so the probe's driver cost is
        # capped regardless of store size.
        probe = store.probe_keys(
            COMMIT_DRIVER_LIST_MAX,
            skip_prefixes=(VERSIONS_PREFIX, "__stage__"),
        )
        if probe is not None:
            keys = sorted(probe)
            if not keys:
                raise ZarrFormatError(
                    f"commit_version: empty store at {path!r}"
                )
            blk = block_keys or _default_block_keys(len(keys))
            work = [
                (bi, keys[i : i + blk])
                for bi, i in enumerate(range(0, len(keys), blk))
            ]
            sc = spark.sparkContext
            n_parts = max(1, min(len(work), sc.defaultParallelism * 2))

            def snap(items):
                task_store = open_store(path)
                for bi, bkeys in items:
                    yield _snapshot_block(task_store, bi, bkeys)

            rows = (
                sc.parallelize(work, n_parts)
                .mapPartitions(snap)
                .collect()
            )
        else:
            rows = _snapshot_distributed(spark, path, store, block_keys)
    rows.sort(key=lambda r: r[0])
    n_objects = sum(r[3] for r in rows)
    n_new = sum(r[4] for r in rows)
    manifest = {
        "format": 2,
        "version": version,
        "message": str(message),
        "created_unix": int(time.time()),
        "n_objects": n_objects,
        "block_starts": [r[1] for r in rows],
        "blocks": [r[2] for r in rows],
    }
    try:
        store.set_exclusive(
            _manifest_key(version),
            json.dumps(manifest, sort_keys=True).encode(),
        )
    except FileExistsError:
        raise VersionConflictError(
            f"commit_version: version {version} was published by "
            f"another writer during this commit at {path!r} — "
            f"re-read, rebase, and retry (no partial state was made "
            f"visible; this writer's content objects are "
            f"content-addressed and reusable)"
        ) from None
    store.set(_HEAD_KEY, json.dumps({"latest": version}).encode())
    return {
        "version": version,
        "n_objects": n_objects,
        "n_new_objects": n_new,
        "message": str(message),
    }


def version_log(path: str) -> List[Dict]:
    """All committed versions, oldest first:
    ``[{"version", "message", "created_unix", "n_objects"}, ...]``.
    Metadata-only (one GET per manifest)."""
    store = open_store(path)
    out = []
    for v in _manifest_versions(store):
        # root-only read: the log of a billion-object history must
        # not download every version's blocks
        doc = _read_manifest_root(store, v)
        out.append(
            {
                "version": doc["version"],
                "message": doc.get("message", ""),
                "created_unix": doc.get("created_unix"),
                "n_objects": (
                    doc["n_objects"]
                    if doc.get("format") == 2
                    else len(doc["objects"])
                ),
            }
        )
    return out


class VersionStoreView(Store):
    """Read-only view of a store pinned at a committed version: every
    logical key resolves through the manifest to its content object.

    Pickles as (base store, version) ONLY — the manifest is O(n_objects)
    and shipping it inside every task closure would dominate dispatch on
    large stores (1M objects ≈ 10⁸ bytes per task). Instead each task
    lazily re-reads the ROOT manifest on first access and resolves
    keys through their COVERING block only (format 2, r9): one small
    root GET plus one block GET per touched key range — a pinned-scan
    task over a billion-object store downloads kilobytes of manifest,
    not the whole mapping. format-1 manifests (objects inline)
    resolve from the root document directly. Ranged/suffix reads pass
    through to the base store's partial-read support (shard indexes
    stay cheap)."""

    def __init__(
        self,
        base: Store,
        manifest: Optional[Dict[str, str]],
        version: int,
    ):
        self.base = base
        self.version = version
        self._manifest = dict(manifest) if manifest is not None else None
        self._root: Optional[Dict] = None
        self._blocks: Dict[int, Dict[str, str]] = {}

    @property
    def manifest(self) -> Dict[str, str]:
        """The FULL mapping — whole-manifest consumers (walk_keys,
        rollback extras) only; per-key reads go through _sha()."""
        if self._manifest is None:
            self._manifest = _read_manifest(self.base, self.version)[
                "objects"
            ]
        return self._manifest

    def _root_doc(self) -> Dict:
        if self._root is None:
            self._root = _read_manifest_root(self.base, self.version)
        return self._root

    def _sha(self, key: str) -> Optional[str]:
        if self._manifest is not None:
            return self._manifest.get(key)
        doc = self._root_doc()
        if doc.get("format") == 1:
            self._manifest = doc["objects"]
            return self._manifest.get(key)
        import bisect

        starts = doc["block_starts"]
        i = bisect.bisect_right(starts, key) - 1
        if i < 0:
            return None
        blk = self._blocks.get(i)
        if blk is None:
            blk = _manifest_block(self.base, doc["blocks"][i])
            self._blocks[i] = blk
        return blk.get(key)

    def __getstate__(self):
        return {"base": self.base, "version": self.version}

    def __setstate__(self, state):
        self.base = state["base"]
        self.version = state["version"]
        self._manifest = None
        self._root = None
        self._blocks = {}

    def _resolve(self, key: str) -> Optional[str]:
        sha = self._sha(key)
        return None if sha is None else _object_key(sha)

    def get(self, key: str) -> Optional[bytes]:
        obj = self._resolve(key)
        return None if obj is None else self.base.get(obj)

    def get_range(self, key: str, offset: int, length: int):
        obj = self._resolve(key)
        return (
            None if obj is None else self.base.get_range(obj, offset, length)
        )

    def get_suffix(self, key: str, length: int):
        obj = self._resolve(key)
        return None if obj is None else self.base.get_suffix(obj, length)

    def exists(self, key: str) -> bool:
        return self._sha(key) is not None

    def walk_keys(self) -> Iterator[str]:
        yield from sorted(self.manifest)

    def set(self, key: str, value: bytes) -> None:
        raise ZarrFormatError(
            f"version {self.version} view is read-only (set {key!r})"
        )

    def delete(self, key: str) -> None:
        raise ZarrFormatError(
            f"version {self.version} view is read-only (delete {key!r})"
        )

    def move(self, src: str, dst: str) -> None:
        raise ZarrFormatError(
            f"version {self.version} view is read-only (move {src!r})"
        )


def open_version(path: str, version: int) -> VersionStoreView:
    """Open a committed version for reading (the ``version`` reader
    option routes here)."""
    store = open_store(path)
    # validate existence/shape only — per-key reads resolve through
    # covering blocks, so the driver does not materialize the mapping
    _read_manifest_root(store, int(version))
    return VersionStoreView(store, None, int(version))


def latest_version(path: str) -> int:
    """The newest committed version — the ``version='latest'`` reader
    option. One GET against the HEAD pointer; falls back to the
    manifest prefix listing when HEAD is missing or provably stale (a
    crash landed a manifest but not the pointer — HEAD+1 exists)."""
    store = open_store(path)
    raw = store.get(_HEAD_KEY)
    if raw is not None:
        try:
            head = int(json.loads(raw)["latest"])
        except (KeyError, TypeError, ValueError):
            head = None
        if (
            head is not None
            and store.exists(_manifest_key(head))
            and not store.exists(_manifest_key(head + 1))
        ):
            return head
    versions = _manifest_versions(store)
    if not versions:
        raise ZarrFormatError(f"No versions committed at {path!r}")
    return versions[-1]


def resolve_as_of(path: str, as_of_unix: int) -> int:
    """The newest committed version whose commit time is at or before
    ``as_of_unix`` (the reference's Icechunk reads are pinned to
    (branch "main", now) with no user-facing knob, config.rs:186-196;
    this is the ``as_of`` option SURVEY §2 A17 planned). Raises when
    nothing was committed that early. Metadata-only: one GET per
    manifest."""
    store = open_store(path)
    best = None
    for v in _manifest_versions(store):
        doc = _read_manifest_root(store, v)  # root-only: no blocks
        created = doc.get("created_unix")
        if created is not None and created <= int(as_of_unix):
            best = v
    if best is None:
        raise ZarrFormatError(
            f"No version at or before unix time {as_of_unix} at {path!r}"
        )
    return best


def rollback_zarr(spark, path: str, version: int) -> Dict:
    """Restore the LIVE store to a committed version. Returns
    ``{"restored", "deleted"}`` key counts.

    Restore order keeps mid-flight readers consistent: chunk/data
    objects first (distributed copy from the content store), metadata
    documents (``zarr.json`` & co.) after — old metadata never
    advertises rows whose objects aren't in place yet — and stray
    live keys not in the manifest are deleted last. The rollback does
    NOT create a commit; snapshot again after if the restored state
    should be a version of its own.

    Tiers (r10): up to MAINT_DRIVER_LIST_MAX manifest entries the
    driver materializes the mapping and fans out one restore job
    (small-store latency); past it the entries, the restore pass, and
    the stray-key sweep all run as Spark jobs — the driver holds the
    root's block list and the per-array metadata documents only."""
    store = open_store(path)
    root = _read_manifest_root(store, int(version))
    if spark is not None and _root_n_objects(root) > MAINT_DRIVER_LIST_MAX:
        return _rollback_distributed(spark, path, store, root)
    doc = _read_manifest(store, int(version))
    objects: Dict[str, str] = doc["objects"]

    data_items = [(k, s) for k, s in objects.items() if not _is_meta_key(k)]
    meta_items = [(k, s) for k, s in objects.items() if _is_meta_key(k)]

    def restore(items):
        task_store = open_store(path)
        for key, sha in items:
            data = task_store.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"rollback: content object for {key!r} missing "
                    f"(sha256 {sha}) — was vacuum_versions run with "
                    "this version excluded?"
                )
            task_store.set(key, data)
            yield 1

    if data_items:
        if spark is None:
            list(restore(iter(data_items)))  # serial fallback
        else:
            sc = spark.sparkContext
            n_parts = max(
                1, min(len(data_items), sc.defaultParallelism * 2)
            )
            sc.parallelize(data_items, n_parts).mapPartitions(
                restore
            ).count()
    for key, sha in meta_items:
        data = store.get(_object_key(sha))
        if data is None:
            raise ZarrFormatError(
                f"rollback: content object for {key!r} missing "
                f"(sha256 {sha})"
            )
        store.set(key, data)
    extras = [k for k in _live_keys(store) if k not in objects]
    for k in extras:
        store.delete(k)
    return {"restored": len(objects), "deleted": len(extras)}


def _rollback_distributed(spark, path: str, store: Store, root: Dict):
    """rollback_zarr past the maintenance cap: manifest entries stream
    from their block objects, the restore pass and the stray-key
    sweep run as Spark jobs — no driver key list anywhere. Same
    restore order as the serial tier (data first, metadata after,
    extras deleted last)."""
    entries = _manifest_entries_rdd(spark, path, root).persist()
    try:
        def restore(items):
            task_store = open_store(path)
            for key, sha in items:
                data = task_store.get(_object_key(sha))
                if data is None:
                    raise ZarrFormatError(
                        f"rollback: content object for {key!r} missing "
                        f"(sha256 {sha}) — was vacuum_versions run with "
                        "this version excluded?"
                    )
                task_store.set(key, data)
                yield 1

        n_data = (
            entries.filter(lambda kv: not _is_meta_key(kv[0]))
            .mapPartitions(restore)
            .count()
        )
        # per-array metadata documents: metadata-scale, publish from
        # the driver AFTER every data object is in place
        meta_items = entries.filter(
            lambda kv: _is_meta_key(kv[0])
        ).collect()
        for key, sha in meta_items:
            data = store.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"rollback: content object for {key!r} missing "
                    f"(sha256 {sha})"
                )
            store.set(key, data)

        def sweep(keys):
            task_store = open_store(path)
            for k in keys:
                task_store.delete(k)
                yield 1

        n_deleted = (
            _live_keys_rdd(spark, path)
            .subtract(entries.map(lambda kv: kv[0]))
            .mapPartitions(sweep)
            .count()
        )
    finally:
        entries.unpersist()
    return {"restored": n_data + len(meta_items), "deleted": n_deleted}


def vacuum_versions(
    path: str,
    keep_last: int,
    grace_seconds: float = 3600.0,
    *,
    spark=None,
) -> Dict:
    """Drop all but the newest ``keep_last`` manifests and delete
    content objects no kept manifest references. TAGGED versions are
    always kept regardless of age (a tag is a retention pin — deleting
    "release-1"'s objects out from under its name would orphan the
    handle; drop the tag first if the release really should age out).
    Returns ``{"kept_versions", "dropped_versions", "deleted_objects",
    "skipped_young"}``. Metadata-scale driver work (manifest
    parsing) plus one delete per unreferenced object.

    GC safety under concurrent CAS commits (the git-gc / Iceberg
    expire-snapshots discipline): an in-flight :func:`commit_version`
    writes its content objects FIRST and publishes its manifest last,
    so to a naive vacuum those objects look like garbage and the
    commit would land a manifest referencing GC'd bytes. Three guards
    SHRINK the window (they cannot fully close it without a
    conditional delete, which no portable store API offers — the
    residual race is the interval between the final mtime re-check
    and the delete itself, microseconds on a quiet store):

    - objects younger than ``grace_seconds`` (or of UNKNOWN age —
      backends without mtimes) are never collected, so any commit
      that finishes within the grace window is safe;
    - the manifest list is re-read AFTER the drop phase and every
      manifest that appeared mid-vacuum contributes its references,
      so a commit that PUBLISHED during the vacuum is also safe (its
      old objects are referenced, its new ones are young);
    - each candidate's mtime is re-checked immediately before its
      delete, so a dedup-hit ``touch()`` from an in-flight commit
      that lands after the first age check still rescues the object.

    ``grace_seconds`` must exceed the longest plausible commit
    duration; objects skipped as young are collected by the next
    aged vacuum. ``grace_seconds=0`` restores the unguarded behavior
    (quiesced-store maintenance).

    Tiers (r10): with ``spark`` and a content-object area past
    MAINT_DRIVER_LIST_MAX keys (bounded probe), the referenced-sha
    set, the object listing (one task per ``objects/00..ff`` shard),
    and the guarded sweep all run as Spark jobs — the driver holds
    the kept roots' block lists and two counters. All three
    concurrency guards apply unchanged inside the tasks."""
    if keep_last < 1:
        raise ZarrFormatError("vacuum_versions: keep_last must be >= 1")
    store = open_store(path)
    versions = _manifest_versions(store)
    pinned = set(list_tags(path).values())
    kept = sorted(set(versions[-keep_last:]) | (pinned & set(versions)))
    dropped = [v for v in versions if v not in set(kept)]
    roots = [_read_manifest_root(store, v) for v in kept]
    # manifests go FIRST: a crash mid-vacuum must leave unreferenced
    # objects (harmless garbage a re-run collects), never a readable
    # manifest whose objects are already gone (a version that opens
    # but fails mid-scan)
    for v in dropped:
        store.delete(_manifest_key(v))
    if kept:
        store.set(_HEAD_KEY, json.dumps({"latest": kept[-1]}).encode())
    # concurrent-commit guard 2: manifests published since the first
    # listing pin their objects (missing-manifest races here are
    # fine: ignore and let the objects age into the next vacuum)
    for v in _manifest_versions(store):
        if v not in kept and v not in dropped:
            try:
                roots.append(_read_manifest_root(store, v))
            except ZarrFormatError:
                pass
    if (
        spark is not None
        and _probe_prefix(store, _OBJECTS_DIR, MAINT_DRIVER_LIST_MAX)
        is None
    ):
        deleted, skipped_young = _vacuum_sweep_distributed(
            spark, path, roots, float(grace_seconds)
        )
        return {
            "kept_versions": kept,
            "dropped_versions": dropped,
            "deleted_objects": deleted,
            "skipped_young": skipped_young,
        }
    referenced = set()
    for root in roots:
        referenced.update(_manifest_all_shas(store, root))
    now = time.time()
    deleted = 0
    skipped_young = 0
    for k in list(store.walk_prefix(_OBJECTS_DIR)):
        if k.rsplit("/", 1)[-1] in referenced:
            continue
        if grace_seconds > 0:
            age = store.mtime(k)
            if age is None or now - age < grace_seconds:
                # concurrent-commit guard 1: unknown or young = an
                # in-flight commit's pre-publish objects, never GC'd
                skipped_young += 1
                continue
            # concurrent-commit guard 3: re-check IMMEDIATELY before
            # the delete — commit_version's dedup-hit touch() can
            # land between the first mtime read and here, and a
            # freshened mtime means a commit is about to publish a
            # manifest referencing this key
            age = store.mtime(k)
            if age is None or time.time() - age < grace_seconds:
                skipped_young += 1
                continue
        store.delete(k)
        deleted += 1
    return {
        "kept_versions": kept,
        "dropped_versions": dropped,
        "deleted_objects": deleted,
        "skipped_young": skipped_young,
    }


def _vacuum_sweep_distributed(
    spark, path: str, roots: List[Dict], grace_seconds: float
):
    """vacuum_versions' guarded object sweep past the maintenance
    cap: referenced shas stream from the kept roots' block objects,
    candidates come from a per-shard object listing minus the
    referenced set (one keys-only shuffle), and each task applies the
    grace-window guards (1 and 3) before its deletes — the driver
    sees two counters. Returns ``(deleted, skipped_young)``."""
    ref = _manifest_shas_rdd(spark, path, roots).map(lambda s: (s, None))
    objs = _object_keys_rdd(spark, path).map(
        lambda k: (k.rsplit("/", 1)[-1], k)
    )
    candidates = objs.subtractByKey(ref).values()

    def sweep(keys):
        task_store = open_store(path)
        now = time.time()
        deleted = 0
        skipped_young = 0
        for k in keys:
            if grace_seconds > 0:
                # guard 1: unknown or young age = an in-flight
                # commit's pre-publish objects, never GC'd
                age = task_store.mtime(k)
                if age is None or now - age < grace_seconds:
                    skipped_young += 1
                    continue
                # guard 3: re-check IMMEDIATELY before the delete —
                # a dedup-hit touch() from an in-flight commit can
                # land between the first mtime read and here
                age = task_store.mtime(k)
                if age is None or time.time() - age < grace_seconds:
                    skipped_young += 1
                    continue
            task_store.delete(k)
            deleted += 1
        yield (deleted, skipped_young)

    rows = candidates.mapPartitions(sweep).collect()
    return (sum(r[0] for r in rows), sum(r[1] for r in rows))


def tag_version(path: str, tag: str, version: Optional[int] = None) -> Dict:
    """Pin a committed version under an immutable NAME — the release
    handle (Icechunk's tag concept, the third leg of its
    snapshot/branch/tag model; the reference opens repos at a branch
    head, config.rs:186-196, and tags are the immutable counterpart).
    ``version=None`` tags the latest commit. Returns
    ``{"tag", "version"}``.

    Tags are IMMUTABLE: re-tagging an existing name raises — delete
    first if the pin really must move (the audit trail is the point).
    A tag also PINS its version against :func:`vacuum_versions`."""
    if not _TAG_NAME_RE.match(tag or ""):
        raise ZarrFormatError(
            f"tag_version: invalid tag name {tag!r} (want "
            "[A-Za-z0-9][A-Za-z0-9._-]*, max 128 chars)"
        )
    store = open_store(path)
    if version is None:
        version = latest_version(path)
    else:
        _read_manifest_root(store, int(version))  # must exist
    key = _tag_key(tag)
    if store.exists(key):
        raise ZarrFormatError(
            f"tag_version: tag {tag!r} already exists (tags are "
            "immutable; delete_tag first if it must move)"
        )
    store.set(
        key,
        json.dumps(
            {"version": int(version), "created_unix": int(time.time())},
            sort_keys=True,
        ).encode(),
    )
    return {"tag": tag, "version": int(version)}


def delete_tag(path: str, tag: str) -> None:
    """Remove a tag (the version it pinned stays committed; the next
    :func:`vacuum_versions` may collect it if out of retention)."""
    store = open_store(path)
    key = _tag_key(tag)
    if not store.exists(key):
        raise ZarrFormatError(f"delete_tag: no tag {tag!r} at {path!r}")
    store.delete(key)


def list_tags(path: str) -> Dict[str, int]:
    """All tags as ``{name: version}`` — one prefix listing plus one
    GET per tag (metadata-scale)."""
    store = open_store(path)
    out: Dict[str, int] = {}
    for k in store.walk_prefix(_TAGS_DIR):
        if not k.endswith(".json"):
            continue
        name = k[len(_TAGS_DIR) : -len(".json")]
        raw = store.get(k)
        if raw is None:
            continue  # listed-then-deleted race: tag is gone, skip
        try:
            out[name] = int(json.loads(raw)["version"])
        except (KeyError, TypeError, ValueError):
            raise ZarrFormatError(f"Malformed tag document {k!r}")
    return out


def resolve_tag(path: str, tag: str) -> int:
    """Tag name -> version number, verifying the manifest is still
    readable (a tag orphaned by a version-excluding GC gets a named
    error, not a downstream manifest miss)."""
    store = open_store(path)
    raw = store.get(_tag_key(tag))
    if raw is None:
        known = sorted(list_tags(path))
        raise ZarrFormatError(
            f"No tag {tag!r} at {path!r} (known tags: {known})"
        )
    try:
        version = int(json.loads(raw)["version"])
    except (KeyError, TypeError, ValueError):
        raise ZarrFormatError(f"Malformed tag document for {tag!r}")
    _read_manifest_root(store, version)
    return version


def export_version(
    spark,
    path: str,
    dest: str,
    version: Optional[int] = None,
    tag: Optional[str] = None,
    mode: str = "error",
) -> Dict:
    """Materialize a committed version as a standalone LIVE store at
    ``dest`` — the checkout/clone verb: publish tag "release-1" of the
    curation store to the serving bucket without the history riding
    along. Returns ``{"version", "n_objects", "dest"}``.

    Pick the snapshot by ``version`` or ``tag`` (exactly one;
    neither = latest). The copy is one distributed pass over the
    manifest's objects (content object read from the source history,
    logical key written at ``dest``), data objects first and metadata
    documents after (the writers' metadata-last protocol: a reader of
    a half-exported store finds no zarr.json rather than metadata
    advertising absent chunks). The export carries NO ``.versions/``
    area — the clone starts its own history.

    ``mode``: ``error`` (default) refuses a non-empty ``dest``;
    ``overwrite`` clears it first.

    Tiers (r10): past MAINT_DRIVER_LIST_MAX manifest entries (with
    ``spark``) the entries stream from their block objects and the
    copy runs without any driver key list — the driver holds the
    root's block list and the per-array metadata documents only; the
    overwrite-clear distributes the same way."""
    if tag is not None and version is not None:
        raise ZarrFormatError(
            "export_version: pass either version or tag, not both"
        )
    if tag is not None:
        version = resolve_tag(path, tag)
    elif version is None:
        version = latest_version(path)
    store = open_store(path)
    root = _read_manifest_root(store, int(version))
    n_objects = _root_n_objects(root)
    big = spark is not None and n_objects > MAINT_DRIVER_LIST_MAX

    dest_store = open_store(dest)
    if mode not in ("error", "overwrite"):
        raise ZarrFormatError(
            f"export_version: unknown mode {mode!r} "
            "(want 'error' or 'overwrite')"
        )
    existing = next(iter(dest_store.walk_keys()), None)
    if existing is not None:
        if mode == "error":
            raise ZarrFormatError(
                f"export_version: destination {dest!r} is not empty "
                "(pass mode='overwrite' to replace it)"
            )
        dest_probe = dest_store.probe_keys(MAINT_DRIVER_LIST_MAX)
        if dest_probe is not None or spark is None:
            for k in (
                dest_probe
                if dest_probe is not None
                else list(dest_store.walk_keys())
            ):
                dest_store.delete(k)
        else:

            def clear(keys):
                d = open_store(dest)
                for k in keys:
                    d.delete(k)
                    yield 1

            sc0 = spark.sparkContext
            groups = dest_store.list_root()

            def list_all(items):
                d = open_store(dest)
                for name, is_dir in items:
                    if is_dir:
                        yield from d.walk_prefix(name)
                    else:
                        yield name

            sc0.parallelize(
                groups, max(1, min(len(groups), sc0.defaultParallelism))
            ).mapPartitions(list_all).mapPartitions(clear).count()

    def copy(items):
        src = open_store(path)
        dst = open_store(dest)
        for key, sha in items:
            data = src.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"export_version: content object for {key!r} "
                    f"missing (sha256 {sha}) — was vacuum_versions "
                    "run with this version excluded?"
                )
            dst.set(key, data)
            yield 1

    if big:
        entries = _manifest_entries_rdd(spark, path, root).persist()
        try:
            entries.filter(
                lambda kv: not _is_meta_key(kv[0])
            ).mapPartitions(copy).count()
            meta_items = entries.filter(
                lambda kv: _is_meta_key(kv[0])
            ).collect()
        finally:
            entries.unpersist()
        list(copy(iter(meta_items)))
        return {
            "version": int(version),
            "n_objects": n_objects,
            "dest": dest,
        }

    objects: Dict[str, str] = (
        root["objects"]
        if root.get("format") == 1
        else _manifest_objects(store, root)
    )
    data_items = [(k, s) for k, s in objects.items() if not _is_meta_key(k)]
    meta_items = [(k, s) for k, s in objects.items() if _is_meta_key(k)]

    if data_items:
        if spark is None:
            list(copy(iter(data_items)))  # serial fallback
        else:
            sc = spark.sparkContext
            n_parts = max(
                1, min(len(data_items), sc.defaultParallelism * 2)
            )
            sc.parallelize(data_items, n_parts).mapPartitions(
                copy
            ).count()
    list(copy(iter(meta_items)))
    return {
        "version": int(version),
        "n_objects": len(objects),
        "dest": dest,
    }


def _cdc_chunk_work(name, meta_a, meta_b, man_a, man_b):
    """Pure delta work-list builder for :func:`version_cdc` —
    the chunks (in the UNION grid of the two shapes) that can contain
    a differing position, decided from manifest content hashes and
    shape metadata ALONE (no data read):

    - the chunk's content hash differs between the manifests (either
      side missing = fill-valued), or
    - the chunk's in-bounds region differs (a shape change exposed or
      retired positions inside it, object bytes notwithstanding).

    Everything else is provably identical (same bytes, same coverage)
    and is never decoded — the delta-proportional-cost claim.
    Returns (union_shape, [chunk_idx, ...])."""
    import itertools

    union_shape = tuple(
        max(sa, sb) for sa, sb in zip(meta_a.shape, meta_b.shape)
    )
    chunk = tuple(meta_b.chunk_shape)
    union_grid = tuple(
        -(-s // c) for s, c in zip(union_shape, chunk)
    )
    grid_a = meta_a.chunk_grid_shape
    grid_b = meta_b.chunk_grid_shape
    work = []
    for idx in itertools.product(*(range(g) for g in union_grid)):
        in_a = all(i < g for i, g in zip(idx, grid_a))
        in_b = all(i < g for i, g in zip(idx, grid_b))
        key = f"{name}/{meta_b.chunk_key(idx)}"
        ha = man_a.get(key) if in_a else None
        hb = man_b.get(key) if in_b else None
        valid_a = meta_a.valid_chunk_shape(idx) if in_a else None
        valid_b = meta_b.valid_chunk_shape(idx) if in_b else None
        if ha != hb or valid_a != valid_b:
            work.append(idx)
    return union_shape, work


def _cdc_changed_rdd(
    spark, path: str, va: int, vb: int, comparable: Dict,
    n_partitions=None,
):
    """:func:`_cdc_chunk_work`'s decision, distributed (r10): one
    global ordinal range over the arrays' union grids; tasks decode
    ordinal -> chunk index (mixed-radix), resolve both versions' shas
    through COVERING manifest blocks (cached per task; a contiguous
    ordinal range maps to lexicographically clustered keys, so each
    task touches few blocks), and emit only the (name, idx) pairs
    whose hash or in-bounds coverage differs — the full (key, sha)
    mappings never materialize anywhere. ``comparable``:
    ``{name: (meta_a, meta_b, union_shape)}``."""
    sc = spark.sparkContext
    metas_b = sc.broadcast(comparable)
    per = []
    total = 0
    for n in sorted(comparable):
        _ma, mb, union_shape = comparable[n]
        chunk = tuple(mb.chunk_shape)
        ugrid = tuple(-(-s // c) for s, c in zip(union_shape, chunk))
        cells = 1
        for g in ugrid:
            cells *= g
        per.append((n, total, ugrid))
        total += cells
    if total == 0:
        return sc.parallelize([], 1)
    bounds_b = sc.broadcast(per)
    p = path

    def find_changed(ordinals):
        import bisect

        base = open_store(p)
        view_a = VersionStoreView(base, None, va)
        view_b = VersionStoreView(base, None, vb)
        starts = [st for _, st, _ in bounds_b.value]
        for o in ordinals:
            i = bisect.bisect_right(starts, o) - 1
            name, st, ugrid = bounds_b.value[i]
            rel = int(o - st)
            idx_rev = []
            for g in reversed(ugrid):
                idx_rev.append(rel % g)
                rel //= g
            idx = tuple(reversed(idx_rev))
            ma, mb, _us = metas_b.value[name]
            in_a = all(j < g for j, g in zip(idx, ma.chunk_grid_shape))
            in_b = all(j < g for j, g in zip(idx, mb.chunk_grid_shape))
            key = f"{name}/{mb.chunk_key(idx)}"
            ha = view_a._sha(key) if in_a else None
            hb = view_b._sha(key) if in_b else None
            valid_a = ma.valid_chunk_shape(idx) if in_a else None
            valid_b = mb.valid_chunk_shape(idx) if in_b else None
            if ha != hb or valid_a != valid_b:
                yield (name, idx)

    n_slices = max(
        1, min(total, int(n_partitions or sc.defaultParallelism * 2))
    )
    return sc.range(0, total, numSlices=n_slices).mapPartitions(
        find_changed
    )


def _grid_work_rdd(spark, metas: Dict, names=None):
    """(array, chunk_idx) pairs for the FULL chunk grids of the named
    arrays as an RDD — ``sc.range`` over a global ordinal, decoded
    mixed-radix in the tasks, so a billion-chunk grid never
    enumerates on the driver. Metadata-only input (grid shapes)."""
    sc = spark.sparkContext
    per = []
    total = 0
    for n in sorted(names if names is not None else metas):
        g = tuple(metas[n].chunk_grid_shape)
        cells = 1
        for x in g:
            cells *= x
        per.append((n, total, g))
        total += cells
    if total == 0:
        return sc.parallelize([], 1)
    bounds = sc.broadcast(per)

    def decode(ordinals):
        import bisect

        starts = [st for _, st, _ in bounds.value]
        for o in ordinals:
            i = bisect.bisect_right(starts, o) - 1
            name, st, g = bounds.value[i]
            rel = int(o - st)
            idx_rev = []
            for x in reversed(g):
                idx_rev.append(rel % x)
                rel //= x
            yield (name, tuple(reversed(idx_rev)))

    n_slices = max(1, min(total, sc.defaultParallelism * 2))
    return sc.range(0, total, numSlices=n_slices).mapPartitions(decode)


def version_cdc(
    spark,
    path: str,
    version_a: int,
    version_b: Optional[int] = None,
    columns=None,
    n_partitions: Optional[int] = None,
):
    """Row-level change-data-capture between two COMMITTED versions of
    one store — the incremental-refresh primitive: a consumer that
    materialized release ``version_a`` pulls exactly the positions
    that changed by ``version_b`` (default: latest) instead of
    re-reading the corpus.

    Output, one row per changed position (plus array-level findings):

    - ``(array, pos, coords, 'modified', old, new)`` — position exists
      in both versions with different values;
    - ``'added'`` (old NULL) / ``'removed'`` (new NULL) — position
      exists in only one version's shape (append / shrink);
    - ``(array, NULL, NULL, 'array_added'|'array_removed'|
      'dtype_differs'|'layout_differs', NULL, NULL)`` — not
      comparable position-wise (for a rechunked history use
      ``diff_zarr``, which windows over unequal layouts).

    ``pos`` is the C-order flat index under the union shape (the
    scan's row order for 1-D tables); ``coords`` is the
    '/'-joined N-D index. Values are rendered as strings (one uniform
    schema across dtypes); NaN/NaT compare equal to themselves, like
    ``diff_zarr``.

    Scale: the work list comes from :func:`_cdc_chunk_work` —
    manifest-hash comparison, metadata-sized, NO data I/O — so cost is
    proportional to the DELTA (changed chunks decode on executors, two
    versions each), not the store. ``diff_zarr`` by contrast reads the
    full common grid; use it when there are no commits to compare.
    Output volume is one row per changed element: a fully rewritten
    store degenerates to corpus-sized output by construction (CDC is
    the wrong tool there — that is a new release, not a delta)."""
    import numpy as np

    from .array import ZarrArray, infer_store_arrays_authoritative

    store = open_store(path)
    if version_b is None:
        version_b = latest_version(path)
    va, vb = int(version_a), int(version_b)
    root_a = _read_manifest_root(store, va)
    root_b = _read_manifest_root(store, vb)
    # r10: past the maintenance cap the WORK-LIST build distributes
    # too — chunk ordinals fan out over the union grids and tasks
    # resolve both shas through covering manifest blocks, so the full
    # (key, sha) mappings never materialize on the driver and the
    # changed-chunk stream chains straight into the compare stage (no
    # driver work list of any size, delta-proportional output)
    big = (
        max(_root_n_objects(root_a), _root_n_objects(root_b))
        > MAINT_DRIVER_LIST_MAX
    )
    man_a: Dict[str, str] = {} if big else _manifest_objects(store, root_a)
    man_b: Dict[str, str] = {} if big else _manifest_objects(store, root_b)

    def _metas(version):
        return {
            a.meta.name: a.meta
            for a in infer_store_arrays_authoritative(
                VersionStoreView(store, None, version)
            )
        }

    metas_a, metas_b = _metas(va), _metas(vb)
    if columns:
        wanted = set(columns)
        unknown = wanted - (set(metas_a) | set(metas_b))
        if unknown:
            raise ZarrFormatError(
                f"version_cdc: no such arrays {sorted(unknown)} in "
                f"either version"
            )
        metas_a = {n: m for n, m in metas_a.items() if n in wanted}
        metas_b = {n: m for n, m in metas_b.items() if n in wanted}

    findings = []
    work = []  # (name, chunk_idx, union_shape)
    comparable = {}
    for n in sorted(set(metas_a) | set(metas_b)):
        if n not in metas_b:
            findings.append((n, None, None, "array_removed", None, None))
            continue
        if n not in metas_a:
            findings.append((n, None, None, "array_added", None, None))
            continue
        ma, mb = metas_a[n], metas_b[n]
        if ma.zarr_dtype != mb.zarr_dtype:
            findings.append((n, None, None, "dtype_differs", None, None))
        elif len(ma.shape) != len(mb.shape) or tuple(
            ma.chunk_shape
        ) != tuple(mb.chunk_shape):
            findings.append((n, None, None, "layout_differs", None, None))
        elif big:
            union_shape = tuple(
                max(sa, sb) for sa, sb in zip(ma.shape, mb.shape)
            )
            comparable[n] = (ma, mb, union_shape)
        else:
            union_shape, idxs = _cdc_chunk_work(n, ma, mb, man_a, man_b)
            comparable[n] = (ma, mb, union_shape)
            work.extend((n, idx) for idx in idxs)

    sc = spark.sparkContext
    metas_bcast = sc.broadcast(comparable)
    p = path

    def compare(items):
        base = open_store(p)
        view_a = VersionStoreView(base, None, va)
        view_b = VersionStoreView(base, None, vb)
        for name, idx in items:
            ma, mb, union_shape = metas_bcast.value[name]
            chunk = tuple(mb.chunk_shape)
            origin = tuple(i * c for i, c in zip(idx, chunk))
            ext = tuple(
                min(us - o, c)
                for us, o, c in zip(union_shape, origin, chunk)
            )
            in_a = np.ones(ext, dtype=bool)
            in_b = np.ones(ext, dtype=bool)
            grids = np.indices(ext)
            for d in range(len(ext)):
                g = origin[d] + grids[d]
                in_a &= g < ma.shape[d]
                in_b &= g < mb.shape[d]
            A = np.zeros(ext, dtype=ma.dtype)
            B = np.zeros(ext, dtype=mb.dtype)
            if in_a.any():
                blk = ZarrArray(view_a, ma).read_chunk(idx)
                A[tuple(slice(0, v) for v in blk.shape)] = blk
            if in_b.any():
                blk = ZarrArray(view_b, mb).read_chunk(idx)
                B[tuple(slice(0, v) for v in blk.shape)] = blk
            if A.dtype.kind in ("f", "c"):
                eq = (A == B) | (np.isnan(A) & np.isnan(B))
            elif A.dtype.kind in ("M", "m"):
                eq = (A == B) | (np.isnat(A) & np.isnat(B))
            else:
                eq = A == B
            for mask, change, with_old, with_new in (
                (in_a & in_b & ~eq, "modified", True, True),
                (in_b & ~in_a, "added", False, True),
                (in_a & ~in_b, "removed", True, False),
            ):
                if not mask.any():
                    continue
                locs = np.nonzero(mask)
                glob = tuple(
                    o + loc for o, loc in zip(origin, locs)
                )
                pos = np.ravel_multi_index(glob, union_shape)
                olds = A[locs].astype(str) if with_old else None
                news = B[locs].astype(str) if with_new else None
                for j in range(len(pos)):
                    yield (
                        name,
                        int(pos[j]),
                        "/".join(str(int(g[j])) for g in glob),
                        change,
                        None if olds is None else str(olds[j]),
                        None if news is None else str(news[j]),
                    )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("array", T.StringType(), False),
            T.StructField("pos", T.LongType(), True),
            T.StructField("coords", T.StringType(), True),
            T.StructField("change", T.StringType(), False),
            T.StructField("old_value", T.StringType(), True),
            T.StructField("new_value", T.StringType(), True),
        ]
    )
    if n_partitions is None:
        n_partitions = sc.defaultParallelism * 2
    parts = []
    if big and comparable:
        # distributed work-list tier: chunk ordinals fan out over the
        # union grids, tasks resolve both shas through covering
        # manifest blocks, and the changed-chunk stream chains
        # straight into compare — no driver work list of any size
        parts.append(
            spark.createDataFrame(
                _cdc_changed_rdd(
                    spark, path, va, vb, comparable, n_partitions
                ).mapPartitions(compare),
                schema,
            )
        )
    elif work:
        n_slices = max(1, min(len(work), int(n_partitions)))
        parts.append(
            spark.createDataFrame(
                sc.parallelize(work, n_slices).mapPartitions(compare),
                schema,
            )
        )
    if findings:
        parts.append(spark.createDataFrame(findings, schema))
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def sync_zarr(spark, src: str, dst: str) -> Dict:
    """Incremental replication — bring a replica up to the source's
    latest committed version at DELTA cost (the rsync of the version
    store; :func:`arrow_zarr_spark.io.replicate_zarr` is the full
    seed, this is every pull after it). The destination must carry
    the version history (seed with ``replicate_zarr(...,
    include_versions=True)`` or a previous sync).

    Content addressing is what makes the delta exact: the work list
    is the set of sha256 objects referenced by manifests the replica
    does not yet have, minus objects already present — unchanged
    chunks are never re-read, re-sent, or re-written, however many
    versions elapsed. Every copied object is re-hashed on arrival
    and must equal its address (transport corruption cannot land).

    Live keys then update from the LOCAL object store: only keys
    whose manifest hash changed between the replica's version and the
    source's rewrite (data keys distributed first, metadata documents
    after, stray keys deleted last — the rollback protocol at delta
    size). A reader of the replica mid-sync sees a consistent store.

    Returns ``{"from_version", "to_version", "n_objects_copied",
    "n_bytes_copied", "n_live_updated", "n_live_deleted",
    "n_manifests_copied"}``; ``to_version == from_version`` means the
    replica was already current (no-op)."""
    src_store = open_store(src)
    dst_store = open_store(dst)
    src_versions = _manifest_versions(src_store)
    if not src_versions:
        raise ZarrFormatError(
            f"sync_zarr: source {src!r} has no committed versions"
        )
    dst_versions = _manifest_versions(dst_store)
    if not dst_versions:
        raise ZarrFormatError(
            f"sync_zarr: destination {dst!r} carries no version "
            f"history — seed it with replicate_zarr(src, dst, "
            f"include_versions=True) first"
        )
    v_src, v_dst = src_versions[-1], dst_versions[-1]
    if v_dst > v_src:
        raise ZarrFormatError(
            f"sync_zarr: destination is AHEAD of source "
            f"(dst version {v_dst} > src {v_src}) — refusing to "
            f"rewind; use rollback_zarr on the destination explicitly"
        )
    receipt = {
        "from_version": v_dst,
        "to_version": v_dst,
        "n_objects_copied": 0,
        "n_bytes_copied": 0,
        "n_live_updated": 0,
        "n_live_deleted": 0,
        "n_manifests_copied": 0,
    }
    if v_dst == v_src:
        return receipt

    new_versions = [v for v in src_versions if v > v_dst]
    roots = {v: _read_manifest_root(src_store, v) for v in new_versions}
    root_old = _read_manifest_root(dst_store, v_dst)
    if (
        spark is not None
        and max(_root_n_objects(roots[v_src]), _root_n_objects(root_old))
        > MAINT_DRIVER_LIST_MAX
    ):
        # r10 distributed tier: the object delta, the changed-key
        # restore, and the stray-key sweep all run as Spark jobs —
        # manifest entries stream from their block objects, the
        # driver holds block lists, counters, and the per-array
        # metadata documents only
        _sync_delta_distributed(
            spark, src, dst, receipt, roots, root_old, v_src
        )
        return _sync_publish_history(
            src_store, dst_store, src, new_versions, receipt, v_src
        )
    m_old: Dict[str, str] = _manifest_objects(dst_store, root_old)
    m_new: Dict[str, str] = _manifest_objects(src_store, roots[v_src])

    # object delta: shas referenced by the new manifests that the
    # replica can't already have (anything in its latest manifest it
    # must hold) and doesn't hold on disk. _manifest_all_shas also
    # carries the format-2 BLOCK objects — a replica whose root
    # manifests reference blocks it never received would be unreadable
    known = set(m_old.values())
    candidates = sorted(
        {
            sha
            for doc in roots.values()
            for sha in _manifest_all_shas(src_store, doc)
            if sha not in known
        }
    )

    def copy_objects(shas: Iterator[str]):
        s_store = open_store(src)
        d_store = open_store(dst)
        for sha in shas:
            okey = _object_key(sha)
            if d_store.exists(okey):
                continue
            data = s_store.get(okey)
            if data is None:
                raise ZarrFormatError(
                    f"sync_zarr: source content object {sha} missing — "
                    f"was vacuum_versions run on the source past the "
                    f"replica's version?"
                )
            if hashlib.sha256(data).hexdigest() != sha:
                raise ZarrFormatError(
                    f"sync_zarr: object {sha} failed its content "
                    f"address on transfer — refusing to store "
                    f"corrupted bytes"
                )
            d_store.set(okey, data)
            yield (1, len(data))

    if spark is None or not candidates:
        rows = list(copy_objects(iter(candidates)))
    else:
        sc = spark.sparkContext
        n_parts = max(1, min(len(candidates), sc.defaultParallelism * 2))
        rows = (
            sc.parallelize(candidates, n_parts)
            .mapPartitions(copy_objects)
            .collect()
        )
    receipt["n_objects_copied"] = sum(r[0] for r in rows)
    receipt["n_bytes_copied"] = sum(r[1] for r in rows)

    # live delta: only keys whose hash changed; data first, metadata
    # after, deletions last (the rollback protocol at delta size)
    changed = [
        (k, sha) for k, sha in m_new.items() if m_old.get(k) != sha
    ]

    def is_meta(key: str) -> bool:
        leaf = key.rsplit("/", 1)[-1]
        return leaf in (
            "zarr.json", ".zarray", ".zattrs", ".zgroup", ".zmetadata",
        )

    data_items = [(k, s) for k, s in changed if not is_meta(k)]
    meta_items = [(k, s) for k, s in changed if is_meta(k)]

    def restore(items):
        d_store = open_store(dst)
        for key, sha in items:
            data = d_store.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"sync_zarr: content object for {key!r} missing "
                    f"after the object pass (sha256 {sha})"
                )
            d_store.set(key, data)
            yield 1

    if data_items:
        if spark is None:
            list(restore(iter(data_items)))
        else:
            sc = spark.sparkContext
            n_parts = max(1, min(len(data_items), sc.defaultParallelism * 2))
            sc.parallelize(data_items, n_parts).mapPartitions(
                restore
            ).count()
    for key, sha in sorted(
        meta_items, key=lambda t: (-t[0].count("/"), t[0])
    ):
        data = dst_store.get(_object_key(sha))
        if data is None:
            raise ZarrFormatError(
                f"sync_zarr: content object for {key!r} missing "
                f"after the object pass (sha256 {sha})"
            )
        dst_store.set(key, data)
    extras = [k for k in _live_keys(dst_store) if k not in m_new]
    for k in extras:
        dst_store.delete(k)
    receipt["n_live_updated"] = len(changed)
    receipt["n_live_deleted"] = len(extras)
    return _sync_publish_history(
        src_store, dst_store, src, new_versions, receipt, v_src
    )


def _sync_publish_history(
    src_store: Store,
    dst_store: Store,
    src: str,
    new_versions: List[int],
    receipt: Dict,
    v_src: int,
) -> Dict:
    """sync_zarr's final phase, shared by both tiers. The
    manifests/tags/HEAD publish LAST: a crash anywhere before this
    leaves dst at the OLD version, so the next sync_zarr recomputes
    the same (idempotent, content-addressed) delta and finishes the
    job — publishing history first would make a crashed sync look
    complete and permanently no-op every retry."""
    for v in new_versions:
        # copy the ROOT bytes verbatim (a re-serialized materialized
        # doc would silently flatten a format-2 manifest back to the
        # monolithic shape)
        raw = src_store.get(_manifest_key(v))
        if raw is None:
            raise ZarrFormatError(
                f"sync_zarr: source manifest {v} vanished mid-sync"
            )
        dst_store.set(_manifest_key(v), raw)
    receipt["n_manifests_copied"] = len(new_versions)
    src_tags = {
        k: src_store.get(k)
        for k in src_store.walk_prefix(VERSIONS_PREFIX + "tags/")
    }
    for k, data in src_tags.items():
        if data is not None:
            dst_store.set(k, data)
    # tags converge, not accumulate: a tag deleted at the source
    # (possibly vacuumed past) must not keep resolving on the replica
    for k in list(dst_store.walk_prefix(VERSIONS_PREFIX + "tags/")):
        if k not in src_tags:
            dst_store.delete(k)
    head = src_store.get(_HEAD_KEY)
    if head is not None:
        dst_store.set(_HEAD_KEY, head)
    receipt["to_version"] = v_src
    return receipt


def _sync_delta_distributed(
    spark,
    src: str,
    dst: str,
    receipt: Dict,
    roots: Dict[int, Dict],
    root_old: Dict,
    v_src: int,
) -> None:
    """sync_zarr's object + live delta past the maintenance cap.

    Object delta: shas pinned by the NEW roots (data + block shas)
    minus shas the replica's latest manifest already pins, one
    keys-only shuffle; each task copies its partition's objects with
    the same content-address verification as the serial tier and
    yields one summary row. Live delta: the src/dst latest manifests
    join by key (entries stream from their block objects), changed
    keys restore executor-parallel (data first, metadata documents
    after, from the driver), and the stray-key sweep is a distributed
    anti-join against the new manifest's keys."""
    known = (
        _manifest_shas_rdd(spark, dst, [root_old])
        .distinct()
        .map(lambda s: (s, None))
    )
    want = _manifest_shas_rdd(spark, src, list(roots.values())).distinct()

    def copy_objects(shas):
        s_store = open_store(src)
        d_store = open_store(dst)
        n = b = 0
        for sha in shas:
            okey = _object_key(sha)
            if d_store.exists(okey):
                continue
            data = s_store.get(okey)
            if data is None:
                raise ZarrFormatError(
                    f"sync_zarr: source content object {sha} missing — "
                    f"was vacuum_versions run on the source past the "
                    f"replica's version?"
                )
            if hashlib.sha256(data).hexdigest() != sha:
                raise ZarrFormatError(
                    f"sync_zarr: object {sha} failed its content "
                    f"address on transfer — refusing to store "
                    f"corrupted bytes"
                )
            d_store.set(okey, data)
            n += 1
            b += len(data)
        yield (n, b)

    rows = (
        want.map(lambda s: (s, None))
        .subtractByKey(known)
        .keys()
        .mapPartitions(copy_objects)
        .collect()  # one summary row per partition
    )
    receipt["n_objects_copied"] = sum(r[0] for r in rows)
    receipt["n_bytes_copied"] = sum(r[1] for r in rows)

    new_e = _manifest_entries_rdd(spark, src, roots[v_src]).persist()
    try:
        old_e = _manifest_entries_rdd(spark, dst, root_old)
        changed = (
            new_e.leftOuterJoin(old_e)
            .filter(lambda kv: kv[1][1] != kv[1][0])
            .map(lambda kv: (kv[0], kv[1][0]))
            .persist()
        )
        try:
            def restore(items):
                d_store = open_store(dst)
                for key, sha in items:
                    data = d_store.get(_object_key(sha))
                    if data is None:
                        raise ZarrFormatError(
                            f"sync_zarr: content object for {key!r} "
                            f"missing after the object pass "
                            f"(sha256 {sha})"
                        )
                    d_store.set(key, data)
                    yield 1

            n_data = (
                changed.filter(lambda kv: not _is_meta_key(kv[0]))
                .mapPartitions(restore)
                .count()
            )
            meta_items = changed.filter(
                lambda kv: _is_meta_key(kv[0])
            ).collect()
        finally:
            changed.unpersist()
        dst_store = open_store(dst)
        for key, sha in sorted(
            meta_items, key=lambda t: (-t[0].count("/"), t[0])
        ):
            data = dst_store.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"sync_zarr: content object for {key!r} missing "
                    f"after the object pass (sha256 {sha})"
                )
            dst_store.set(key, data)

        def sweep(keys):
            d_store = open_store(dst)
            for k in keys:
                d_store.delete(k)
                yield 1

        n_extras = (
            _live_keys_rdd(spark, dst)
            .subtract(new_e.map(lambda kv: kv[0]))
            .mapPartitions(sweep)
            .count()
        )
    finally:
        new_e.unpersist()
    receipt["n_live_updated"] = n_data + len(meta_items)
    receipt["n_live_deleted"] = n_extras


_CHUNK_STAT_SCHEMA = (
    "array string, chunk_pos string, n_values long, value_sum double"
)


def _numeric_metas(store: Store, version: int, columns) -> Dict:
    from .array import infer_store_arrays_authoritative

    metas = {
        a.meta.name: a.meta
        for a in infer_store_arrays_authoritative(
            VersionStoreView(store, None, int(version))
        )
    }
    if columns:
        unknown = set(columns) - set(metas)
        if unknown:
            raise ZarrFormatError(
                f"chunk stats: no such arrays {sorted(unknown)}"
            )
        metas = {n: m for n, m in metas.items() if n in set(columns)}
    return {n: m for n, m in metas.items() if m.dtype.kind in "iuf"}


def _chunk_stats_rows(spark, path: str, version: int, work, metas):
    """Decode the listed (array, chunk_idx) cells of a committed
    version and emit one stats row per chunk."""
    import numpy as np

    from .array import ZarrArray

    sc = spark.sparkContext
    metas_b = sc.broadcast(metas)
    p, v = path, int(version)

    def kernel(items):
        base = open_store(p)
        view = VersionStoreView(base, None, v)
        for name, idx in items:
            meta = metas_b.value[name]
            blk = ZarrArray(view, meta).read_chunk(tuple(idx))
            s = float(np.round(blk.astype(np.float64).sum(), 6))
            yield (
                name,
                "/".join(str(i) for i in idx),
                int(blk.size),
                s,
            )

    if hasattr(work, "mapPartitions"):  # already an RDD (r10 tiers)
        return spark.createDataFrame(
            work.mapPartitions(kernel), _CHUNK_STAT_SCHEMA
        )
    if not work:
        return spark.createDataFrame([], _CHUNK_STAT_SCHEMA)
    n_parts = max(1, min(len(work), sc.defaultParallelism * 2))
    return spark.createDataFrame(
        sc.parallelize(sorted(work), n_parts).mapPartitions(kernel),
        _CHUNK_STAT_SCHEMA,
    )


def chunk_stat_view(spark, path: str, version: int, columns=None):
    """Chunk-granular materialized statistics of a committed version:
    one row (array, chunk_pos, n_values, value_sum) per chunk of every
    numeric array — the base relation of the incremental-refresh pair
    (:func:`refresh_chunk_stat_view` advances it at delta cost).
    Decodes each chunk exactly once, executor-parallel; in-bounds
    cells only; missing chunks contribute their fill values (the scan
    semantics, A13)."""
    import itertools

    store = open_store(path)
    metas = _numeric_metas(store, version, columns)
    total = 0
    for m in metas.values():
        cells = 1
        for g in m.chunk_grid_shape:
            cells *= g
        total += cells
    if total > MAINT_DRIVER_LIST_MAX:
        # r10: a full-view build over a huge grid enumerates its work
        # list in the tasks (sc.range + mixed-radix decode), never on
        # the driver
        work = _grid_work_rdd(spark, metas)
    else:
        work = [
            (n, idx)
            for n, m in metas.items()
            for idx in itertools.product(
                *(range(g) for g in m.chunk_grid_shape)
            )
        ]
    return _chunk_stats_rows(spark, path, version, work, metas)


def refresh_chunk_stat_view(
    spark,
    path: str,
    base_view,
    version_a: int,
    version_b: Optional[int] = None,
    columns=None,
):
    """Advance a :func:`chunk_stat_view` from ``version_a`` to
    ``version_b`` at DELTA cost — the incremental materialized-view
    maintenance the version store exists for: the work list comes
    from manifest-hash + coverage comparison alone
    (:func:`_cdc_chunk_work` — metadata-sized, no data I/O), so only
    chunks whose bytes or in-bounds region actually changed decode;
    byte-identical chunks ride through from ``base_view`` untouched,
    however large the store. Added arrays compute fresh, removed
    arrays' rows drop, dtype/layout changes recompute that array in
    full (the honest fallback — positional stats don't survive a
    rechunk). The result is row-for-row equal to computing
    ``chunk_stat_view(version_b)`` from scratch (test-pinned)."""
    import itertools

    from pyspark.sql import functions as F

    store = open_store(path)
    if version_b is None:
        version_b = latest_version(path)
    va, vb = int(version_a), int(version_b)
    root_a = _read_manifest_root(store, va)
    root_b = _read_manifest_root(store, vb)
    # r10 tier: past the maintenance cap the changed-chunk decision
    # distributes (covering-block sha resolution, _cdc_changed_rdd)
    # and only the DELTA comes back to the driver — the full (key,
    # sha) mappings never materialize; full-grid recomputes (added /
    # relaid-out arrays) enumerate their work in the tasks too
    big = (
        max(_root_n_objects(root_a), _root_n_objects(root_b))
        > MAINT_DRIVER_LIST_MAX
    )
    man_a: Dict[str, str] = {} if big else _manifest_objects(store, root_a)
    man_b: Dict[str, str] = {} if big else _manifest_objects(store, root_b)
    metas_a = _numeric_metas(store, va, columns)
    metas_b = _numeric_metas(store, vb, columns)

    recompute = []  # (name, idx) to decode on version_b
    drop_pairs = []  # (name, chunk_pos) rows to remove from the base
    drop_arrays = []  # arrays whose every base row is stale
    full_names = []  # arrays recomputing their WHOLE grid
    comparable = {}  # big tier: chunk-level decision deferred to tasks
    for n in sorted(set(metas_a) | set(metas_b)):
        if n not in metas_b:
            drop_arrays.append(n)
            continue
        mb = metas_b[n]
        if n not in metas_a:
            full_names.append(n)
            continue
        ma = metas_a[n]
        if ma.zarr_dtype != mb.zarr_dtype or len(ma.shape) != len(
            mb.shape
        ) or tuple(ma.chunk_shape) != tuple(mb.chunk_shape):
            drop_arrays.append(n)
            full_names.append(n)
            continue
        if big:
            comparable[n] = (
                ma,
                mb,
                tuple(max(sa, sb) for sa, sb in zip(ma.shape, mb.shape)),
            )
            continue
        _, idxs = _cdc_chunk_work(n, ma, mb, man_a, man_b)
        grid_b = mb.chunk_grid_shape
        for idx in idxs:
            key = "/".join(str(i) for i in idx)
            if all(i < g for i, g in zip(idx, grid_b)):
                recompute.append((n, idx))
            drop_pairs.append((n, key))
        # chunks beyond b's grid entirely (a shrink) only appear in
        # idxs when coverage changed — which a shrink guarantees

    if comparable:
        # delta-proportional collect: exactly the changed chunks
        for n, idx in _cdc_changed_rdd(
            spark, path, va, vb, comparable
        ).collect():
            key = "/".join(str(i) for i in idx)
            if all(
                i < g for i, g in zip(idx, metas_b[n].chunk_grid_shape)
            ):
                recompute.append((n, idx))
            drop_pairs.append((n, key))

    full_cells = 0
    for n in full_names:
        cells = 1
        for g in metas_b[n].chunk_grid_shape:
            cells *= g
        full_cells += cells
    if full_cells > MAINT_DRIVER_LIST_MAX:
        sc = spark.sparkContext
        work = sc.parallelize(
            sorted(recompute),
            max(1, min(len(recompute) or 1, sc.defaultParallelism * 2)),
        ).union(_grid_work_rdd(spark, metas_b, full_names))
    else:
        for n in full_names:
            recompute.extend(
                (n, idx)
                for idx in itertools.product(
                    *(range(g) for g in metas_b[n].chunk_grid_shape)
                )
            )
        work = recompute

    fresh = _chunk_stats_rows(spark, path, vb, work, metas_b)
    keep = base_view
    if drop_arrays:
        keep = keep.filter(~F.col("array").isin(drop_arrays))
    if drop_pairs:
        stale = spark.createDataFrame(
            drop_pairs, "array string, chunk_pos string"
        )
        keep = keep.join(
            F.broadcast(stale), ["array", "chunk_pos"], "left_anti"
        )
    return keep.unionByName(fresh)


def scrub_zarr(spark, path: str, version: Optional[int] = None):
    """Drift/bit-rot detection against a committed baseline — the
    scrub pass a 100-TB archive schedules between commits:
    re-hash every LIVE key and compare to the version's manifest.
    :func:`arrow_zarr_spark.io.audit_zarr` answers "does the store
    DECODE" (codec/crc integrity); this answers "is the store still
    the bytes we COMMITTED" — silent storage corruption, out-of-band
    edits, and half-landed writes all surface, without decoding
    anything.

    Returns one row per discrepancy plus per-clean-key confirmations:
    (key, status) with status in ``ok`` (hash matches), ``modified``
    (live bytes differ from the manifest), ``missing`` (committed key
    with no live object), ``extra`` (live key the manifest never
    committed — debris or an uncommitted write).

    Scale shape (r10): up to MAINT_DRIVER_LIST_MAX manifest entries
    the driver builds the work list and fans out the hashing (one
    Spark job); past it the live listing, the manifest entries, and
    the status derivation all run as Spark jobs — a full-outer join
    of live keys against manifest entries, one GET + sha256 per
    present key inside the tasks, and the result DataFrame is never
    materialized on the driver."""
    store = open_store(path)
    if version is None:
        version = latest_version(path)
    root = _read_manifest_root(store, int(version))
    if _root_n_objects(root) <= MAINT_DRIVER_LIST_MAX:
        return spark.createDataFrame(
            _scrub_rows(spark, path, int(version)),
            "key string, status string",
        )
    live = _live_keys_rdd(spark, path).map(lambda k: (k, True))
    entries = _manifest_entries_rdd(spark, path, root)

    def status(items):
        task_store = open_store(path)
        for key, (alive, sha) in items:
            if sha is None:
                yield (key, "extra")
                continue
            if alive is None:
                yield (key, "missing")
                continue
            data = task_store.get(key)
            if data is None:
                yield (key, "missing")  # vanished between list and GET
            elif hashlib.sha256(data).hexdigest() == sha:
                yield (key, "ok")
            else:
                yield (key, "modified")

    rows = live.fullOuterJoin(entries).mapPartitions(status)
    return spark.createDataFrame(rows, "key string, status string")


def _scrub_rows(spark, path: str, version: Optional[int] = None):
    """The scrub pass as plain (key, status) tuples. ``spark=None``
    runs the hashing serially on the driver — the path repair_zarr's
    documented spark-None mode uses (previously dead code: it called
    the DataFrame face, which dereferenced spark unconditionally)."""
    store = open_store(path)
    if version is None:
        version = latest_version(path)
    manifest: Dict[str, str] = _read_manifest(store, int(version))[
        "objects"
    ]
    live = set(_live_keys(store))
    committed = set(manifest)
    work = sorted(live & committed)
    p = path

    def check(keys: Iterator[str], lookup: Dict[str, str]):
        task_store = open_store(p)
        for key in keys:
            data = task_store.get(key)
            if data is None:
                yield (key, "missing")  # vanished between list and GET
                continue
            sha = hashlib.sha256(data).hexdigest()
            yield (key, "ok" if sha == lookup[key] else "modified")

    rows = []
    if work:
        if spark is None:
            rows = list(check(iter(work), manifest))
        else:
            sc = spark.sparkContext
            manifest_b = sc.broadcast(manifest)
            n_parts = max(1, min(len(work), sc.defaultParallelism * 2))
            rows = (
                sc.parallelize(work, n_parts)
                .mapPartitions(lambda it: check(it, manifest_b.value))
                .collect()
            )
    rows += [(k, "missing") for k in sorted(committed - live)]
    rows += [(k, "extra") for k in sorted(live - committed)]
    return rows


def repair_zarr(spark, path: str, version: Optional[int] = None) -> Dict:
    """Targeted self-heal — :func:`scrub_zarr`'s other half: restore
    ONLY the keys whose live bytes drifted from the committed
    baseline (modified or missing), from the content store, at
    damage-proportional cost. :func:`rollback_zarr` rewrites the
    whole store; after a scrub flags 3 bit-rotted chunks in a
    million-object archive, this copies 3 objects.

    ``extra`` keys (live keys the manifest never committed) are NOT
    deleted — they may be a concurrent writer's in-flight work;
    rollback_zarr is the explicit full-restore that prunes them.

    Restore order is the rollback protocol's: damaged data objects
    first (distributed), damaged metadata documents after — a reader
    mid-repair never sees metadata advertising objects that are still
    broken. Returns ``{"version", "n_scanned", "n_repaired",
    "repaired": [keys...]}`` (keys capped at 100 in the receipt).

    Past MAINT_DRIVER_LIST_MAX manifest entries (r10) the scrub runs
    on its distributed tier and only the DAMAGED rows come back to
    the driver; their shas resolve through covering manifest blocks —
    everything driver-side is damage-proportional."""
    store = open_store(path)
    if version is None:
        version = latest_version(path)
    root = _read_manifest_root(store, int(version))
    n_scanned = _root_n_objects(root)
    if spark is not None and n_scanned > MAINT_DRIVER_LIST_MAX:
        bad = [
            (r["key"], r["status"])
            for r in scrub_zarr(spark, path, int(version))
            .where("status IN ('modified', 'missing')")
            .collect()  # damage-proportional
        ]
    else:
        bad = [
            (key, status)
            for key, status in _scrub_rows(
                spark, path, version=int(version)
            )
            if status in ("modified", "missing")
        ]
    # resolve shas through covering blocks only — 'extra' rows never
    # reach here and 'missing' rows outside the manifest cannot occur
    view = VersionStoreView(store, None, int(version))
    damaged = [
        (key, sha)
        for key, _status in bad
        if (sha := view._sha(key)) is not None
    ]

    data_items = [(k, s) for k, s in damaged if not _is_meta_key(k)]
    meta_items = [(k, s) for k, s in damaged if _is_meta_key(k)]

    # validate driver-side BEFORE moving anything: the clean error
    # beats a half-repaired store plus an executor stack trace
    # (damage-proportional — one exists() per damaged key)
    for key, sha in damaged:
        if not store.exists(_object_key(sha)):
            raise ZarrFormatError(
                f"repair_zarr: content object for {key!r} missing "
                f"(sha256 {sha}) — the damage predates the retained "
                f"history; restore from a replica (sync_zarr) instead"
            )

    def restore(items):
        task_store = open_store(path)
        for key, sha in items:
            data = task_store.get(_object_key(sha))
            if data is None:
                raise ZarrFormatError(
                    f"repair_zarr: content object for {key!r} "
                    f"vanished mid-repair (sha256 {sha})"
                )
            task_store.set(key, data)
            yield 1

    if data_items:
        if spark is None:
            list(restore(iter(data_items)))
        else:
            sc = spark.sparkContext
            n_parts = max(1, min(len(data_items), sc.defaultParallelism * 2))
            sc.parallelize(data_items, n_parts).mapPartitions(
                restore
            ).count()
    for key, sha in sorted(
        meta_items, key=lambda t: (-t[0].count("/"), t[0])
    ):
        data = store.get(_object_key(sha))
        if data is None:
            raise ZarrFormatError(
                f"repair_zarr: content object for {key!r} missing "
                f"(sha256 {sha})"
            )
        store.set(key, data)
    return {
        "version": int(version),
        "n_scanned": n_scanned,
        "n_repaired": len(damaged),
        "repaired": sorted(k for k, _ in damaged)[:100],
    }
