"""r12: the persisted IVF+SQ8 index (operators/ivf_index.py). The
pinned claims: (1) the indexed query equals a FROM-SCRATCH numpy
replication of the whole pipeline (strided centroids, quantized
assignment, integer scales/codes, ADC within probed cells) — an
independent derivation, not the module's own helpers; (2) the
(cell, id)-sorted layout's writer statistics prune non-probed cells'
chunks at planning; (3) rebuilds are byte-deterministic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arrow_zarr_spark.operators.ivf_index import (
    build_ivf_sq8_index,
    query_ivf_sq8_index,
)

SF_DIR = "/root/testdata/sf0.001"
N_CELLS, NPROBE, K = 16, 2, 5


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def index_path(spark, embs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfsq8") / "idx")
    meta = build_ivf_sq8_index(
        embs, path, n_cells=N_CELLS, chunk_rows=32
    )
    assert meta["dim"] == 64 and meta["n_vectors"] > 0
    return path


def _grid(x):
    y = np.asarray(x, dtype=np.float64) * 32768.0
    return np.sign(y) * np.floor(np.abs(y) + 0.5)  # HALF_UP


def _numpy_pipeline(rows, q_ids):
    """From-scratch replication: returns {qid: [(nid, cosine), ...]}."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = _grid([r[1] for r in rows])
    max_id = ids.max()
    stride = max(1, (int(max_id) + 1) // N_CELLS)
    c_mask = (ids % stride == 0) & (ids // stride < N_CELLS)
    cent_cells = (ids[c_mask] // stride).astype(np.int64)
    cent = V[c_mask]
    cn = np.sqrt(np.einsum("cd,cd->c", cent, cent))

    def probes(v, n):
        cos = (v @ cent.T) / (np.sqrt(v @ v) * cn)
        return cent_cells[np.lexsort((cent_cells, -cos))[:n]]

    cell_of = {
        int(i): int(probes(V[j], 1)[0]) for j, i in enumerate(ids)
    }
    s = np.maximum(
        1, (np.abs(V.astype(np.int64)).max(axis=0) + 126) // 127
    )
    n_int = V.astype(np.int64)
    codes = np.sign(n_int) * ((2 * np.abs(n_int) + s) // (2 * s))
    R = (codes * s).astype(np.float64)
    nr = np.sqrt(np.einsum("nd,nd->n", R, R))
    out = {}
    for qid in q_ids:
        qi = int(np.nonzero(ids == qid)[0][0])
        pc = set(int(c) for c in probes(V[qi], NPROBE))
        qn = np.sqrt(V[qi] @ V[qi])
        cand = []
        for j in range(len(ids)):
            if ids[j] == qid or cell_of[int(ids[j])] not in pc:
                continue
            dot = float(V[qi] @ R[j])
            cos = dot / (
                (qn if qn > 0 else 1.0) * (nr[j] if nr[j] > 0 else 1.0)
            )
            cand.append((cos, int(ids[j])))
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[int(qid)] = [
            (nid, round(c, 6)) for c, nid in cand[:K]
        ]
    return out


class TestIndexedEqualsFromScratch:
    def test_topk_matches_numpy_replication(
        self, spark, embs, index_path
    ):
        got = {}
        res = query_ivf_sq8_index(
            spark,
            index_path,
            embs.filter(F.col("vec_id") < 20),
            k=K,
            nprobe=NPROBE,
        ).collect()
        for r in res:
            got.setdefault(int(r["query_id"]), []).append(
                (int(r["rank"]), int(r["neighbor_id"]), r["cosine"])
            )
        rows = [
            (r["vec_id"], list(r["embedding"]))
            for r in embs.collect()
        ]
        want = _numpy_pipeline(rows, sorted(got.keys()))
        assert sorted(got.keys()) == sorted(
            int(q) for q in want if want[q]
        )
        for qid, lst in got.items():
            lst.sort()
            assert [
                (nid, pytest.approx(c, abs=1e-6))
                for _, nid, c in lst
            ] == [(n, pytest.approx(c, abs=1e-6)) for n, c in want[qid]]

    def test_rebuild_deterministic(
        self, spark, embs, index_path, tmp_path
    ):
        path2 = str(tmp_path / "idx2")
        build_ivf_sq8_index(embs, path2, n_cells=N_CELLS, chunk_rows=32)
        a = sorted(
            tuple(r)
            for r in query_ivf_sq8_index(
                spark, index_path, embs.filter(F.col("vec_id") < 10)
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in query_ivf_sq8_index(
                spark, path2, embs.filter(F.col("vec_id") < 10)
            ).collect()
        )
        assert a == b and len(a) > 0


class TestCellStatsPruneTheScan:
    def test_in_filter_prunes_chunks(self, spark, index_path):
        """The (cell, id)-sorted layout: a cell IN (...) predicate
        must drop chunks at planning through the writer's cell
        statistics — IVF probing AS statistics pruning."""
        from pyspark.sql.datasource import In

        from arrow_zarr_spark.datasource import ZarrDataSource

        def survivors(filters):
            ds = ZarrDataSource({"path": index_path + "/codes"})
            reader = ds.reader(ds.schema())
            list(reader.pushFilters(list(filters)))
            return sum(len(p.cells) for p in reader.partitions())

        full = survivors(())
        pruned = survivors([In(("cell",), (0, 1))])
        assert 0 < pruned < full


class TestDriverRowsWriterByteParity:
    """r13: the metadata-scale centroid/scale stores are written
    driver-side (io._write_zarr_driver_rows, no Spark job). The pinned
    claim: the produced store is BYTE-identical — every key, every
    object — to write_zarr on a single-partition DataFrame of the same
    rows, across chunking regimes (single chunk, multi chunk, edge
    chunk) and dtypes (int/long/double incl. negatives)."""

    @pytest.mark.parametrize("chunk_rows", [64, 7, 5])
    def test_bytes_match_write_zarr(self, spark, tmp_path, chunk_rows):
        from pyspark.sql import types as T

        from arrow_zarr_spark.io import _write_zarr_driver_rows, write_zarr
        from arrow_zarr_spark.zarr.store import open_store

        rng = np.random.RandomState(chunk_rows)
        rows = [
            (
                int(i),
                int(rng.randint(-(2**40), 2**40)),
                float(rng.randn()),
            )
            for i in range(17)
        ]
        schema = T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("g0", T.LongType()),
                T.StructField("x", T.DoubleType()),
            ]
        )
        ref = str(tmp_path / f"ref{chunk_rows}")
        got = str(tmp_path / f"got{chunk_rows}")
        write_zarr(
            spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1), schema
            ),
            ref,
            chunk_rows=chunk_rows,
        )
        n = _write_zarr_driver_rows(schema, rows, got, chunk_rows=chunk_rows)
        assert n == len(rows)
        sref, sgot = open_store(ref), open_store(got)
        kref = sorted(sref.walk_keys())
        assert kref == sorted(sgot.walk_keys())
        for key in kref:
            assert sref.get(key) == sgot.get(key), key

    def test_mode_error_and_overwrite(self, tmp_path):
        from pyspark.sql import types as T

        from arrow_zarr_spark.io import _write_zarr_driver_rows
        from arrow_zarr_spark.zarr import ZarrFormatError

        schema = T.StructType([T.StructField("d", T.IntegerType())])
        path = str(tmp_path / "ow")
        _write_zarr_driver_rows(schema, [(1,), (2,)], path)
        with pytest.raises(ZarrFormatError, match="already exists"):
            _write_zarr_driver_rows(schema, [(3,)], path)
        _write_zarr_driver_rows(schema, [(3,)], path, mode="overwrite")
        from arrow_zarr_spark.zarr.array import infer_store_arrays
        from arrow_zarr_spark.zarr.store import open_store

        arrs = {
            a.meta.name: a for a in infer_store_arrays(open_store(path))
        }
        assert list(arrs["d"].read_all()) == [3]
