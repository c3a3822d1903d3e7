"""Consolidated-metadata tests: one-GET planning (root zarr.json
consolidated block / v2 .zmetadata), writer emission, fallback to the
listing walk, and HTTP stores without a directory index."""

import json

import numpy as np
import pytest

from arrow_zarr_spark.zarr import (
    ZarrFormatError,
    consolidate_metadata,
    infer_store_arrays,
    load_consolidated_arrays,
    open_store,
    write_store,
)
from arrow_zarr_spark.zarr.store import LocalStore


class CountingStore(LocalStore):
    """LocalStore that counts metadata-access calls."""

    def __init__(self, root):
        super().__init__(root)
        self.gets = []
        self.walks = 0

    def get(self, key):
        self.gets.append(key)
        return super().get(key)

    def walk_keys(self):
        self.walks += 1
        return super().walk_keys()


def _write(tmp_path, consolidate):
    path = str(tmp_path / ("cons" if consolidate else "plain"))
    write_store(
        path,
        arrays={
            "a": np.arange(24.0).reshape(4, 6),
            "b": np.arange(24, dtype=np.int32).reshape(4, 6),
            "x": np.arange(4.0),
        },
        chunk_shapes={"a": (2, 3), "b": (2, 3), "x": (2,)},
        dimension_names={"a": ("x", "y"), "b": ("x", "y"), "x": ("x",)},
        consolidate=consolidate,
    )
    return path


class TestConsolidatedRead:
    def test_one_get_no_walk(self, tmp_path):
        path = _write(tmp_path, consolidate=True)
        store = CountingStore(path)
        arrays = infer_store_arrays(store)
        assert sorted(a.meta.name for a in arrays) == ["a", "b", "x"]
        assert store.walks == 0, "consolidated planning must not list"
        assert store.gets == ["zarr.json"], (
            "consolidated planning must be exactly one metadata GET, "
            f"got {store.gets}"
        )

    def test_fallback_walks_and_gets_per_array(self, tmp_path):
        path = _write(tmp_path, consolidate=False)
        store = CountingStore(path)
        arrays = infer_store_arrays(store)
        assert sorted(a.meta.name for a in arrays) == ["a", "b", "x"]
        assert store.walks >= 1
        # root probe + .zmetadata probe + one zarr.json per array
        assert len([g for g in store.gets if g.endswith("zarr.json")]) >= 4

    def test_consolidated_matches_walk(self, tmp_path):
        """Same stores, both paths: identical schemas and values."""
        path = _write(tmp_path, consolidate=True)
        store = LocalStore(path)
        via_cons = load_consolidated_arrays(store)
        # strip the consolidated block to force the walk on a copy
        root = json.loads(store.get("zarr.json"))
        root.pop("consolidated_metadata")
        store.set("zarr.json", json.dumps(root).encode())
        assert load_consolidated_arrays(store) is None
        via_walk = infer_store_arrays(store)
        assert [a.meta for a in via_cons] == [a.meta for a in via_walk]
        for a, b in zip(via_cons, via_walk):
            np.testing.assert_array_equal(a.read_all(), b.read_all())

    def test_posthoc_consolidate(self, tmp_path):
        path = _write(tmp_path, consolidate=False)
        store = LocalStore(path)
        assert load_consolidated_arrays(store) is None
        n = consolidate_metadata(store)
        assert n == 3
        arrays = load_consolidated_arrays(store)
        assert arrays is not None
        assert sorted(a.meta.name for a in arrays) == ["a", "b", "x"]

    def test_v2_zmetadata(self, tmp_path):
        """A v2 store with .zmetadata plans without any listing."""
        path = str(tmp_path / "v2")
        store = open_store(path)
        zarray = {
            "zarr_format": 2,
            "shape": [6],
            "chunks": [3],
            "dtype": "<f8",
            "compressor": None,
            "fill_value": 0.0,
            "order": "C",
            "filters": None,
        }
        zattrs = {"_ARRAY_DIMENSIONS": ["t"]}
        store.set(
            ".zmetadata",
            json.dumps(
                {
                    "zarr_consolidated_format": 1,
                    "metadata": {
                        ".zgroup": {"zarr_format": 2},
                        "v/.zarray": zarray,
                        "v/.zattrs": zattrs,
                    },
                }
            ).encode(),
        )
        store.set("v/.zarray", json.dumps(zarray).encode())
        store.set("v/.zattrs", json.dumps(zattrs).encode())
        store.set("v/0", np.arange(3.0).tobytes())
        store.set("v/1", np.arange(3.0, 6.0).tobytes())
        counting = CountingStore(path)
        arrays = infer_store_arrays(counting)
        assert counting.walks == 0
        assert [a.meta.name for a in arrays] == ["v"]
        assert arrays[0].meta.dimension_names == ("t",)
        np.testing.assert_array_equal(arrays[0].read_all(), np.arange(6.0))

    def test_empty_consolidated_block_falls_back(self, tmp_path):
        path = _write(tmp_path, consolidate=False)
        store = LocalStore(path)
        root = json.loads(store.get("zarr.json"))
        root["consolidated_metadata"] = {"kind": "inline", "metadata": {}}
        store.set("zarr.json", json.dumps(root).encode())
        arrays = infer_store_arrays(store)  # walk fallback still works
        assert sorted(a.meta.name for a in arrays) == ["a", "b", "x"]


class TestWriterConsolidates:
    def test_spark_sink_emits_consolidated(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        path = str(tmp_path / "sink")
        df = spark.range(100).selectExpr(
            "id AS k", "CAST(id * 0.5 AS DOUBLE) AS v"
        )
        write_zarr(df, path, chunk_rows=32)
        store = CountingStore(path)
        arrays = infer_store_arrays(store)
        assert sorted(a.meta.name for a in arrays) == ["k", "v"]
        assert store.walks == 0
        assert store.gets == ["zarr.json"]

    def test_append_refreshes_consolidated_shape(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr

        path = str(tmp_path / "appnd")
        df = spark.range(50).selectExpr("id AS k")
        write_zarr(df, path, chunk_rows=32)
        write_zarr(
            spark.range(50, 80).selectExpr("id AS k"),
            path,
            chunk_rows=32,
            mode="append",
        )
        arrays = load_consolidated_arrays(LocalStore(path))
        assert arrays is not None and arrays[0].meta.shape == (80,)

    def test_grid_writer_consolidates(self, spark, tmp_path):
        from arrow_zarr_spark.io import write_zarr_grid

        path = str(tmp_path / "grid")
        df = spark.sql(
            "SELECT x, y, CAST(x * 10 + y AS DOUBLE) AS temp "
            "FROM (SELECT explode(sequence(0, 3)) AS x) "
            "CROSS JOIN (SELECT explode(sequence(0, 4)) AS y)"
        )
        write_zarr_grid(df, path, dims=["x", "y"], chunk_shape=[2, 3])
        store = CountingStore(path)
        arrays = infer_store_arrays(store)
        assert sorted(a.meta.name for a in arrays) == ["temp", "x", "y"]
        assert store.walks == 0


class TestHttpNoIndex:
    def test_http_store_without_directory_index(self, tmp_path):
        """The listing-free payoff: a consolidated store behind an HTTP
        server that returns 404 for directory URLs (no auto-index, the
        common production configuration) still plans and reads."""
        import http.server
        import threading

        path = _write(tmp_path, consolidate=True)

        class NoIndexHandler(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=path, **kw)

            def send_head(self):
                import os

                p = self.translate_path(self.path)
                if os.path.isdir(p):
                    self.send_error(404, "no directory listings")
                    return None
                return super().send_head()

            def log_message(self, *a):
                pass

        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), NoIndexHandler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            store = open_store(url)
            arrays = infer_store_arrays(store)
            assert sorted(a.meta.name for a in arrays) == ["a", "b", "x"]
            np.testing.assert_array_equal(
                arrays[0].read_all(), np.arange(24.0).reshape(4, 6)
            )
        finally:
            httpd.shutdown()
