"""Bounded remote listings (the r10 ADVICE fix).

The commit-tier probe and the distributed store walk must never
materialize a full store listing on the driver:

- ``Store.probe_keys`` walks at most cap+1 keys through the backend's
  INCREMENTAL ``walk_keys``;
- ``FsspecStore`` walks one ``fs.ls`` delimiter page at a time (never
  fsspec's eager ``fs.find``) and lists the root with ONE page;
- ``HttpStore`` lists the root from ONE index page and scopes
  ``walk_prefix`` to subtree pages.

fsspec is absent from this environment, so the fsspec tests drive the
store's walking logic against a fake filesystem object — the point is
the listing CONTRACT (call pattern + early stop), which is exactly
what the fake can observe.
"""

import numpy as np
import pytest

from arrow_zarr_spark.zarr.store import FsspecStore, HttpStore, LocalStore
from arrow_zarr_spark.zarr.writer import write_store


class FakeFS:
    """Directory-tree fake of fsspec's AbstractFileSystem.ls —
    records every listing call so tests can pin the call pattern."""

    def __init__(self, tree):
        # tree: {"dir": {"sub": {"f": b""}}, "top_file": b""}
        self.tree = tree
        self.ls_calls = []
        self.find_calls = []

    def _node(self, path):
        node = {"root": self.tree}
        for part in path.strip("/").split("/"):
            if not isinstance(node, dict) or part not in node:
                raise FileNotFoundError(path)
            node = node[part]
        return node

    def ls(self, path, detail=False):
        self.ls_calls.append(path)
        node = self._node(path)
        if not isinstance(node, dict):  # a file: echo it back
            return [{"name": path, "type": "file"}]
        out = []
        for name in sorted(node):
            full = f"{path.rstrip('/')}/{name}"
            is_dir = isinstance(node[name], dict)
            out.append(
                {"name": full, "type": "directory" if is_dir else "file"}
            )
        return out

    def find(self, path):  # the eager API the store must NOT use
        self.find_calls.append(path)
        raise AssertionError(
            "FsspecStore used fs.find — the eager full-subtree "
            "listing the bounded-walk contract forbids"
        )


def fake_store(tree):
    store = FsspecStore.__new__(FsspecStore)  # skip the import gate
    store.fs = FakeFS(tree)
    store.root = "root"
    return store


class TestFsspecBoundedListing:
    def tree(self):
        return {
            "a": {f"f{i:02d}": b"" for i in range(10)},
            "b": {"nested": {f"g{i}": b"" for i in range(3)}},
            "c": {"h0": b""},
            "zarr.json": b"",
        }

    def test_walk_keys_full(self):
        store = fake_store(self.tree())
        keys = sorted(store.walk_keys())
        assert len(keys) == 15
        assert "zarr.json" in keys and "b/nested/g0" in keys
        assert not store.fs.find_calls

    def test_list_root_is_one_ls_call(self):
        store = fake_store(self.tree())
        assert store.list_root() == [
            ("a", True),
            ("b", True),
            ("c", True),
            ("zarr.json", False),
        ]
        assert store.fs.ls_calls == ["root"]

    def test_walk_prefix_scoped_to_subtree(self):
        store = fake_store(self.tree())
        assert sorted(store.walk_prefix("b")) == [
            "b/nested/g0",
            "b/nested/g1",
            "b/nested/g2",
        ]
        assert all(c.startswith("root/b") for c in store.fs.ls_calls)

    def test_walk_prefix_missing_is_empty(self):
        store = fake_store(self.tree())
        assert list(store.walk_prefix("nope")) == []

    def test_probe_stops_before_listing_whole_store(self):
        """cap=5: directory 'a' alone overflows it, so the walk must
        never list b's subtree or c — the probe's driver cost is
        bounded by directories visited, not store size."""
        store = fake_store(self.tree())
        assert store.probe_keys(5) is None
        assert not any(
            c.startswith("root/b/") or c.startswith("root/c")
            for c in store.fs.ls_calls
        )

    def test_probe_under_cap_returns_all_keys(self):
        store = fake_store(self.tree())
        keys = store.probe_keys(100)
        assert sorted(keys) == sorted(store.walk_keys())

    def test_probe_skip_prefixes(self):
        store = fake_store(self.tree())
        keys = store.probe_keys(100, skip_prefixes=("b/", "zarr"))
        assert sorted(keys) == sorted(
            f"a/f{i:02d}" for i in range(10)
        ) + ["c/h0"]


class TestLocalProbe:
    def test_probe_matches_walk(self, tmp_path):
        write_store(
            str(tmp_path / "s"),
            arrays={"v": np.arange(12.0)},
            chunk_shapes={"v": (5,)},
        )
        store = LocalStore(str(tmp_path / "s"))
        assert sorted(store.probe_keys(100)) == sorted(store.walk_keys())
        assert store.probe_keys(1) is None


@pytest.fixture()
def served_tree(tmp_path):
    import functools
    import http.server
    import threading

    root = tmp_path / "http_root"
    (root / "a").mkdir(parents=True)
    (root / "b" / "nested").mkdir(parents=True)
    for i in range(3):
        (root / "a" / f"f{i}").write_bytes(b"x")
    (root / "b" / "nested" / "g0").write_bytes(b"y")
    (root / "top.json").write_bytes(b"{}")
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(root)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


class TestHttpBoundedListing:
    def test_list_root_one_page(self, served_tree):
        store = HttpStore(served_tree)
        assert store.list_root() == [
            ("a", True),
            ("b", True),
            ("top.json", False),
        ]

    def test_walk_prefix_scoped(self, served_tree):
        store = HttpStore(served_tree)
        assert sorted(store.walk_prefix("b")) == ["b/nested/g0"]

    def test_probe_bounded(self, served_tree):
        store = HttpStore(served_tree)
        assert sorted(store.probe_keys(10)) == [
            "a/f0",
            "a/f1",
            "a/f2",
            "b/nested/g0",
            "top.json",
        ]
        assert store.probe_keys(2) is None
