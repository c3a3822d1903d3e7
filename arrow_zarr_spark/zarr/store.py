"""Store abstraction: key→bytes access to a Zarr v3 store.

Mirrors the reference's backend matrix (``table/config.rs:103-199``):
local filesystem (``file://`` / bare paths) fully supported; ``s3://``
NATIVE since r13 (stdlib SigV4 client, :mod:`.s3` — the reference's
primary backend, ``config.rs:126-132``/``s3_bench.rs``, no fsspec
required); other remote schemes via fsspec when available (not
installed in this environment — gated behind an import-try); Icechunk
repos gated the same way.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional
from urllib.parse import urlparse

from .meta import ZarrFormatError

__all__ = ["Store", "LocalStore", "HttpStore", "FsspecStore", "open_store"]


class Store:
    """Minimal key-value store interface over a Zarr store root."""

    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def get_range(self, key: str, offset: int, length: int) -> Optional[bytes]:
        """Bytes ``[offset, offset+length)`` of a key, or None if the
        key is missing. May return fewer bytes near the object's end —
        callers validate length. Default reads the whole object and
        slices; backends with real partial reads (file seek, HTTP
        Range) override — that is what makes partial-shard reads an
        I/O saving rather than just a decode saving."""
        raw = self.get(key)
        if raw is None:
            return None
        return raw[offset : offset + length]

    def get_suffix(self, key: str, length: int) -> Optional[bytes]:
        """The last ``length`` bytes of a key (shard indexes with
        ``index_location: end`` live there), or None if missing."""
        raw = self.get(key)
        if raw is None:
            return None
        return raw[-length:] if length < len(raw) else raw

    def set(self, key: str, value: bytes) -> None:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        return self.get(key) is not None

    def mtime(self, key: str) -> Optional[float]:
        """Last-modified time of a key (unix seconds), or None when
        the backend cannot say. Used by vacuum_versions' GC grace
        window: an object of UNKNOWN age is never collected, so a
        backend without mtimes degrades to keeping unreferenced
        objects rather than racing an in-flight commit."""
        return None

    def touch(self, key: str) -> None:
        """Freshen a key's mtime (git's loose-object freshening): a
        commit that DEDUP-hits an existing content object must pull
        it back inside vacuum's grace window, or a racing vacuum
        could collect an old unreferenced object the in-flight
        manifest is about to reference. Default no-op is SOUND paired
        with the default ``mtime() -> None`` (unknown age is never
        collected); backends that report mtimes must freshen."""
        return None

    def set_exclusive(self, key: str, value: bytes) -> None:
        """Create ``key`` only if it does not exist; raise
        ``FileExistsError`` otherwise. The primitive optimistic
        concurrency is built on (a version manifest may be published
        by exactly one writer). Default is check-then-set —
        best-effort on backends without a conditional put (the window
        is one round-trip; S3 closes it with If-None-Match, GCS with
        ifGenerationMatch=0 — wire those in the backend override).
        LocalStore overrides with a truly atomic hard-link publish."""
        if self.exists(key):
            raise FileExistsError(key)
        self.set(key, value)

    def delete(self, key: str) -> None:
        """Remove a key; missing keys are a no-op."""
        raise NotImplementedError

    def move(self, src: str, dst: str) -> None:
        """Move a key. Default is read+write; backends with renames
        override (LocalStore uses os.replace — no byte copy)."""
        data = self.get(src)
        if data is None:
            raise ZarrFormatError(f"move: missing source key {src!r}")
        self.set(dst, data)
        self.delete(src)

    def walk_keys(self) -> Iterator[str]:
        """Yield every key under the root (relative, '/'-separated)."""
        raise NotImplementedError

    def walk_prefix(self, prefix: str) -> Iterator[str]:
        """All keys under ``prefix``. Default filters the full
        listing; backends with real prefix listings (LocalStore
        subtree walk, an object store's list(prefix=...)) override so
        metadata-area scans stay metadata-scale on huge stores."""
        p = prefix if prefix.endswith("/") else prefix + "/"
        for key in self.walk_keys():
            if key.startswith(p):
                yield key

    def list_root(self):
        """Top-level entries as ``[(name, is_dir), ...]`` — the
        metadata-scale work list a DISTRIBUTED store walk fans out
        over (one task lists one subtree). Default derives it from
        the full listing (driver O(n) — no worse than walk_keys);
        LocalStore overrides with one scandir, and an object-store
        backend would use a delimiter listing."""
        dirs, files = set(), set()
        for key in self.walk_keys():
            head, sep, _ = key.partition("/")
            (dirs if sep else files).add(head)
        return sorted(
            [(d, True) for d in dirs] + [(f, False) for f in files]
        )

    def probe_keys(self, cap: int, skip_prefixes=()):
        """Bounded tier probe: the full key list (excluding
        ``skip_prefixes``) when the store holds at most ``cap`` such
        keys, else ``None`` after seeing ``cap + 1`` — the caller must
        then take a distributed path. The laziness contract is on
        ``walk_keys``: every backend's walk must be INCREMENTAL
        (LocalStore: os.walk; HttpStore: per-index-page recursion;
        FsspecStore: per-directory delimiter listings) so deciding the
        tier never materializes a huge store's listing on the driver
        (r9 ADVICE: fsspec's eager ``fs.find`` made the islice probe
        O(n_keys) in driver time and memory on exactly the stores the
        distributed tier exists for)."""
        out = []
        for k in self.walk_keys():
            if any(k.startswith(p) for p in skip_prefixes):
                continue
            out.append(k)
            if len(out) > cap:
                return None
        return out

    def list_array_names(self) -> list:
        """Immediate array nodes: keys ``<name>/zarr.json`` (v3) or
        ``<name>/.zarray`` (v2) one level down.

        Column discovery mirrors ``config.rs:207-255``: walk the listing
        for metadata documents and take the parent directory name as the
        field name. Sorted for a deterministic schema order. (v2
        discovery is extra surface — the reference rejects v2.)
        """
        names = set()
        for key in self.walk_keys():
            parts = key.split("/")
            if len(parts) == 2 and parts[1] in ("zarr.json", ".zarray"):
                names.add(parts[0])
        return sorted(names)


class LocalStore(Store):
    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def get(self, key: str) -> Optional[bytes]:
        p = self._path(key)
        try:
            with open(p, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None
        except IsADirectoryError:
            return None

    def get_range(self, key: str, offset: int, length: int) -> Optional[bytes]:
        try:
            with open(self._path(key), "rb") as f:
                f.seek(offset)
                return f.read(length)
        except (FileNotFoundError, IsADirectoryError):
            return None

    def get_suffix(self, key: str, length: int) -> Optional[bytes]:
        try:
            with open(self._path(key), "rb") as f:
                f.seek(0, os.SEEK_END)
                size = f.tell()
                f.seek(max(0, size - length))
                return f.read(length)
        except (FileNotFoundError, IsADirectoryError):
            return None

    def set(self, key: str, value: bytes) -> None:
        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # unique temp name, same discipline as set_exclusive: a FIXED
        # "<p>.tmp" made concurrent same-key writers clobber each
        # other's temp file and the loser's os.replace threw
        # FileNotFoundError (found by the r8 commit/vacuum storm test
        # — committer and vacuum both republish HEAD.json)
        import uuid

        tmp = f"{p}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(value)
        os.replace(tmp, p)

    def mtime(self, key: str) -> Optional[float]:
        try:
            return os.path.getmtime(self._path(key))
        except OSError:
            return None

    def touch(self, key: str) -> None:
        try:
            os.utime(self._path(key), None)
        except OSError:
            pass  # vanished/perm: the caller's exists() race handles it

    def set_exclusive(self, key: str, value: bytes) -> None:
        # full content lands in a private temp file first, then one
        # atomic link(2) publishes it — fails with FileExistsError if
        # ANY writer (this or another process) got there first, and a
        # racer can never observe a half-written value
        import uuid

        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # pid alone is not enough: two THREADS of one process racing
        # the same key would clobber each other's temp file and the
        # winner could publish the loser's bytes
        tmp = f"{p}.{os.getpid()}.{uuid.uuid4().hex}.xtmp"
        with open(tmp, "wb") as f:
            f.write(value)
        try:
            os.link(tmp, p)
        finally:
            os.remove(tmp)

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def move(self, src: str, dst: str) -> None:
        dst_path = self._path(dst)
        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        try:
            os.replace(self._path(src), dst_path)
        except FileNotFoundError:
            raise ZarrFormatError(f"move: missing source key {src!r}")

    def walk_keys(self) -> Iterator[str]:
        for dirpath, _dirnames, filenames in os.walk(self.root):
            rel = os.path.relpath(dirpath, self.root)
            for fn in filenames:
                if rel == ".":
                    yield fn
                else:
                    yield "/".join(rel.split(os.sep) + [fn])

    def list_root(self):
        try:
            with os.scandir(self.root) as it:
                return sorted(
                    (e.name, e.is_dir(follow_symlinks=False))
                    for e in it
                )
        except FileNotFoundError:
            return []

    def walk_prefix(self, prefix: str) -> Iterator[str]:
        # walk only the prefix subtree — a manifest listing on a
        # million-object store must not stat every chunk file
        sub = os.path.join(self.root, *prefix.strip("/").split("/"))
        if not os.path.isdir(sub):
            return
        for dirpath, _dirnames, filenames in os.walk(sub):
            rel = os.path.relpath(dirpath, self.root)
            for fn in filenames:
                yield "/".join(rel.split(os.sep) + [fn])


class HttpStore(Store):
    """Read-only store over plain HTTP(S) using only the stdlib —
    chunk objects are fetched with one GET per key, exactly the access
    pattern the reference's object-store scan makes
    (``config.rs:126-132`` builds an S3 object store; a GET per chunk
    either way). Executors construct this store from the URL, so chunk
    fetches run worker-parallel.

    Listing (needed once, for schema inference) uses the server's HTML
    auto-index (``http.server``, nginx ``autoindex``, Apache). Servers
    without an index can't be walked — pass explicit column metadata
    or serve an index. Writes are refused: HTTP stores are scan-only.
    """

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url.rstrip("/")
        self.timeout = timeout

    def _fetch(self, url: str) -> Optional[bytes]:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            # ONLY 404 means "missing key" (zarr fill-value semantics);
            # treating auth failures (401/403) as missing would silently
            # materialize fill values for the whole store
            if e.code == 404:
                return None
            raise ZarrFormatError(f"HTTP {e.code} fetching {url!r}") from e
        except urllib.error.URLError as e:
            raise ZarrFormatError(f"Cannot reach {url!r}: {e.reason}") from e

    def get(self, key: str) -> Optional[bytes]:
        return self._fetch(f"{self.url}/{key}")

    def exists(self, key: str) -> bool:
        """HEAD, not GET — the base class probes presence by fetching
        the whole object, which doubles the bytes moved for callers
        (like audit_zarr) that check presence before reading."""
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.url}/{key}", method="HEAD"
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            if e.code == 405:  # server refuses HEAD: fall back to GET
                return self.get(key) is not None
            raise ZarrFormatError(
                f"HTTP {e.code} probing {self.url}/{key}"
            ) from e
        except urllib.error.URLError as e:
            raise ZarrFormatError(
                f"Cannot reach {self.url}/{key}: {e.reason}"
            ) from e

    def _fetch_range(self, key: str, range_header: str) -> Optional[bytes]:
        """GET with a Range header — the object-store access pattern
        for partial shards (the reference's S3 path does ranged GETs
        through object_store). A server that ignores Range returns 200
        with the full body; slicing is then the caller's job, so this
        returns (status, body)-normalized bytes plus a full-body flag
        via exceptions-free logic below."""
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.url}/{key}", headers={"Range": range_header}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                body = r.read()
                # 206 = server honored the range; 200 = full object
                return (body, r.status == 206)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            if e.code == 416:  # unsatisfiable range: treat as empty
                return (b"", True)
            raise ZarrFormatError(
                f"HTTP {e.code} fetching range {range_header!r} of "
                f"{self.url}/{key}"
            ) from e
        except urllib.error.URLError as e:
            raise ZarrFormatError(
                f"Cannot reach {self.url}/{key}: {e.reason}"
            ) from e

    def get_range(self, key: str, offset: int, length: int) -> Optional[bytes]:
        if length <= 0:
            return b""
        got = self._fetch_range(key, f"bytes={offset}-{offset + length - 1}")
        if got is None:
            return None
        body, partial = got
        return body if partial else body[offset : offset + length]

    def get_suffix(self, key: str, length: int) -> Optional[bytes]:
        if length <= 0:
            return b""
        got = self._fetch_range(key, f"bytes=-{length}")
        if got is None:
            return None
        body, partial = got
        if partial:
            return body
        return body[-length:] if length < len(body) else body

    def set(self, key: str, value: bytes) -> None:
        raise ZarrFormatError("HTTP stores are read-only (scan-only backend)")

    def delete(self, key: str) -> None:
        raise ZarrFormatError("HTTP stores are read-only (scan-only backend)")

    def _page_entries(self, prefix: str):
        """ONE directory-index page, parsed: ``(files, dirs)`` as
        root-relative paths (dirs keep their trailing '/'). This is
        the HTTP analogue of an object store's delimiter listing —
        list_root and the bounded tier probe must cost one page, not
        a full-store walk."""
        from html.parser import HTMLParser

        class _Links(HTMLParser):
            def __init__(self):
                super().__init__()
                self.hrefs = []

            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    for k, v in attrs:
                        if k == "href" and v:
                            self.hrefs.append(v)

        from urllib.parse import unquote, urljoin, urlsplit

        root = urlsplit(f"{self.url}/")
        root_path = unquote(root.path)
        page = self._fetch(f"{self.url}/{prefix}" if prefix else self.url)
        files, dirs = [], []
        if page is None:
            return files, dirs
        parser = _Links()
        try:
            parser.feed(page.decode("utf-8", "replace"))
        except Exception as e:
            raise ZarrFormatError(
                f"HTTP store listing at {self.url}/{prefix} is not an "
                f"HTML index: {e}"
            ) from e
        base = f"{self.url}/{prefix}"
        for href in parser.hrefs:
            # Resolve against the page URL: auto-index pages emit
            # relative names (http.server), absolute paths
            # (common Apache/nginx setups), or full URLs — all are
            # equivalent; only the resolved location matters.
            res = urlsplit(urljoin(base, href.split("#")[0]))
            if (res.scheme, res.netloc) != (root.scheme, root.netloc):
                continue  # different host/scheme
            path = unquote(res.path)
            if any(seg in (".", "..") for seg in path.split("/")):
                continue  # unnormalized traversal survived urljoin
            if not path.startswith(root_path):
                continue  # parent links / outside the store root
            rel = path[len(root_path):]
            if len(rel) <= len(prefix) or not rel.startswith(prefix):
                continue  # self links, sort links (?C=N), ancestors
                # (plain dotfiles like .zarray must NOT be skipped)
            (dirs if rel.endswith("/") else files).append(rel)
        return files, dirs

    def walk_keys(self) -> Iterator[str]:
        seen_dirs = set()

        def walk(prefix: str) -> Iterator[str]:
            files, dirs = self._page_entries(prefix)
            yield from files
            for rel in dirs:
                if rel not in seen_dirs:
                    seen_dirs.add(rel)
                    yield from walk(rel)

        yield from walk("")

    def list_root(self):
        """ONE index page — never the base class's full walk (the
        r9 ADVICE finding's HTTP analogue): the distributed store
        walk fans out from this, so it must stay O(top-level)."""
        files, dirs = self._page_entries("")
        return sorted(
            [(d.rstrip("/"), True) for d in dirs]
            + [(f, False) for f in files]
        )

    def walk_prefix(self, prefix: str) -> Iterator[str]:
        # subtree pages only — the base default would walk the WHOLE
        # store and filter, defeating the per-subtree task fan-out
        p = prefix if prefix.endswith("/") else prefix + "/"
        seen_dirs = set()

        def walk(pre: str) -> Iterator[str]:
            files, dirs = self._page_entries(pre)
            yield from files
            for rel in dirs:
                if rel not in seen_dirs:
                    seen_dirs.add(rel)
                    yield from walk(rel)

        yield from walk(p)


class FsspecStore(Store):
    """Remote object-store backend via fsspec (s3://, gs://, ...).

    fsspec/s3fs are not installed in this environment; constructing this
    store without them raises a clear error. Credentials come from the
    environment, as in the reference (``AmazonS3Builder::from_env``,
    ``config.rs:126-132``).
    """

    def __init__(self, url: str):
        try:
            import fsspec  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ZarrFormatError(
                f"Remote store {url!r} requires fsspec (not installed)"
            ) from e
        self.fs, self.root = fsspec.core.url_to_fs(url)  # pragma: no cover

    def get(self, key: str) -> Optional[bytes]:  # pragma: no cover
        path = f"{self.root}/{key}"
        try:
            with self.fs.open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def set(self, key: str, value: bytes) -> None:  # pragma: no cover
        with self.fs.open(f"{self.root}/{key}", "wb") as f:
            f.write(value)

    def exists(self, key: str) -> bool:  # pragma: no cover
        return self.fs.exists(f"{self.root}/{key}")

    def delete(self, key: str) -> None:  # pragma: no cover
        try:
            self.fs.rm(f"{self.root}/{key}")
        except FileNotFoundError:
            pass

    def _ls(self, path: str):
        """One delimiter listing (``fs.ls(detail=True)``) — the unit
        of incremental walking. Returns ``[(full_path, is_dir)]``."""
        try:
            infos = self.fs.ls(path, detail=True)
        except FileNotFoundError:
            return []
        out = []
        for info in infos:
            name = info["name"] if isinstance(info, dict) else str(info)
            is_dir = (
                info.get("type") == "directory"
                if isinstance(info, dict)
                else False
            )
            if name.rstrip("/") == path.rstrip("/"):
                continue  # some backends echo the listed path itself
            out.append((name.rstrip("/"), is_dir))
        return out

    def _walk_ls(self, sub: str) -> Iterator[str]:
        """Lazy per-directory DFS over delimiter listings. fsspec's
        ``fs.find`` eagerly materializes the FULL subtree before
        returning (r9 ADVICE finding: it made the bounded commit-tier
        probe O(n_keys) on the driver); walking one ``fs.ls`` page at
        a time keeps early-stopping consumers (``probe_keys``,
        ``next(iter(...))`` presence checks) bounded by directories
        actually visited. Residual: a single flat directory larger
        than the cap still costs that one directory's listing — only
        a raw paginated LIST in a backend-specific subclass can do
        better."""
        from collections import deque

        queue = deque([sub.rstrip("/")])
        while queue:
            d = queue.popleft()
            for name, is_dir in self._ls(d):
                if is_dir:
                    queue.append(name)
                else:
                    yield name

    def walk_keys(self) -> Iterator[str]:  # pragma: no cover
        for path in self._walk_ls(self.root):
            yield path[len(self.root) :].lstrip("/")

    def walk_prefix(self, prefix: str) -> Iterator[str]:  # pragma: no cover
        # prefix-scoped listing: the base default filters a FULL
        # store listing, which turns per-column sidecar maintenance
        # (delete_sidecar runs per microbatch in the streaming sink's
        # steady state) into an O(total keys) walk on object stores
        sub = f"{self.root}/{prefix.strip('/')}"
        for path in self._walk_ls(sub):
            yield path[len(self.root) :].lstrip("/")

    def list_root(self):  # pragma: no cover
        """ONE delimiter listing (the r9 ADVICE fix): the distributed
        store walk and the commit-tier probe fan out from this, so it
        must never inherit the base class's full-walk default."""
        n = len(self.root.rstrip("/")) + 1
        return sorted(
            (name[n:], is_dir)
            for name, is_dir in self._ls(self.root)
            if name[n:]
        )

    def set_exclusive(self, key: str, value: bytes) -> None:  # pragma: no cover
        """Refused LOUDLY: fsspec has no portable conditional put.

        The base-class default is check-then-set — a one-round-trip
        race window that would silently break commit_version's
        multi-writer guarantee (two racing commits could both pass
        the existence probe and one manifest would be lost). fsspec's
        generic ``open(path, "xb")`` is NOT a fix: on most backends
        the AbstractFileSystem layer emulates ``x`` with a
        client-side ``exists()`` probe before a plain write — exactly
        the racy pattern, dressed up as an atomic create — and the
        value streams in place, so a concurrent reader could observe
        a torn manifest (r8 review finding). Until a real conditional
        put is wired per backend (S3 ``If-None-Match: *``, GCS
        ``ifGenerationMatch=0``), a loud error beats a silent lost
        update."""
        raise NotImplementedError(
            f"{type(self.fs).__name__}: exclusive create (version-"
            "manifest publish) needs a REAL conditional put — S3 "
            "If-None-Match:*, GCS ifGenerationMatch=0 — in a Store "
            "subclass for this backend; fsspec's generic 'xb' mode is "
            "a client-side exists() emulation, i.e. the racy "
            "check-then-set this method exists to prevent."
        )


def open_store(path: str, *, icechunk: bool = False) -> Store:
    """Resolve a table URL to a Store (reference: ``config.rs:103-199``).

    Unknown schemes error out, matching ``config.rs:133-136, 179-184``.
    """
    if icechunk:
        # Icechunk pinned to (branch "main", now) in the reference
        # (``config.rs:186-196``); icechunk-python is not installed here.
        raise ZarrFormatError(
            "Icechunk repos require the icechunk package (not installed)"
        )
    parsed = urlparse(path)
    scheme = parsed.scheme
    if scheme in ("", "file"):
        local = parsed.path if scheme == "file" else path
        return LocalStore(local)
    if scheme in ("http", "https"):
        return HttpStore(path)
    if scheme in ("s3", "s3+http", "s3+https"):
        # native stdlib SigV4 client (r13) — fsspec no longer needed
        # for S3; s3+http(s):// pins a custom endpoint in the URL
        # (MinIO / emulator), which is how executors — who rebuild
        # the store from the URL string alone — learn the endpoint
        from .s3 import S3Store

        return S3Store(path)
    if scheme in ("gs", "gcs", "abfs", "az"):
        return FsspecStore(path)
    raise ZarrFormatError(f"Unsupported store scheme {scheme!r} for {path!r}")
