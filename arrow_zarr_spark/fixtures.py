"""Deterministic test fixtures reproducing the reference's synthetic
stores (see /root/repo/FIXTURES.md; writers at
``/root/reference/crates/arrow-zarr/src/lib.rs:287-448``).

Used by the unit tests and by the correctness-harness zarr queries
(which verify the scan against DuckDB-generated equivalents).
"""

from __future__ import annotations

import os

import numpy as np

from .zarr.writer import write_store

__all__ = [
    "write_lat_lon_store",
    "write_lat_lon_store_shifted",
    "write_lat_lon_missing_store",
    "write_no_coords_store",
    "write_mixed_dims_store",
    "write_bench_store",
    "write_wide_bench_store",
    "write_sharded_bench_store",
    "write_sharded_store",
    "write_string_store",
    "write_v2_store",
    "fixture_dir",
    "serve_s3_store",
]

_FIXTURE_ROOT = os.environ.get(
    "ARROW_ZARR_SPARK_FIXTURES", "/tmp/arrow_zarr_spark_fixtures"
)


def fixture_dir(name: str) -> str:
    return os.path.join(_FIXTURE_ROOT, name)


def _done(path: str) -> bool:
    return os.path.isfile(os.path.join(path, ".complete"))


def _mark_done(path: str) -> None:
    with open(os.path.join(path, ".complete"), "w") as f:
        f.write("ok")


def write_lat_lon_store(path: str | None = None) -> str:
    """F1 — lat f64[8]/3 coord 35..42, lon f64[8]/3 coord -120..-113,
    data f64[8,8]/3x3 = 0..63 row-major (``lib.rs:287-333``)."""
    path = path or fixture_dir("lat_lon")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "lat": np.arange(35.0, 43.0),
            "lon": np.arange(-120.0, -112.0),
            "data": np.arange(64.0).reshape(8, 8),
        },
        chunk_shapes={"lat": (3,), "lon": (3,), "data": (3, 3)},
        dimension_names={
            "lat": ("lat",),
            "lon": ("lon",),
            "data": ("lat", "lon"),
        },
    )
    _mark_done(path)
    return path


def write_lat_lon_store_shifted(path: str | None = None) -> str:
    """F1b — F1's grid with data shifted by +100 (100..163): the
    second "day" of a store-per-day layout, for the multi-store
    union scan (read_zarr_many / z19)."""
    path = path or fixture_dir("lat_lon_shifted")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "lat": np.arange(35.0, 43.0),
            "lon": np.arange(-120.0, -112.0),
            "data": np.arange(100.0, 164.0).reshape(8, 8),
        },
        chunk_shapes={"lat": (3,), "lon": (3,), "data": (3, 3)},
        dimension_names={
            "lat": ("lat",),
            "lon": ("lon",),
            "data": ("lat", "lon"),
        },
    )
    _mark_done(path)
    return path


def write_3d_store(path: str | None = None) -> str:
    """F7 — a 3-D store (the reference's max dimensionality,
    zarr_data_stream.rs:784-804, with broadcast arms for 3-D dims
    0/1/2): time f64[4]/2, lat f64[6]/3, lon f64[8]/3 coords,
    data f64[4,6,8]/2x3x3 = 0..191 C-order. Edge chunks on lon
    (8 % 3 != 0)."""
    path = path or fixture_dir("three_d")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "time": np.arange(0.0, 4.0),
            "lat": np.arange(35.0, 41.0),
            "lon": np.arange(-120.0, -112.0),
            "data": np.arange(192.0).reshape(4, 6, 8),
        },
        chunk_shapes={
            "time": (2,),
            "lat": (3,),
            "lon": (3,),
            "data": (2, 3, 3),
        },
        dimension_names={
            "time": ("time",),
            "lat": ("lat",),
            "lon": ("lon",),
            "data": ("time", "lat", "lon"),
        },
    )
    _mark_done(path)
    return path


def write_lat_lon_missing_store(path: str | None = None) -> str:
    """F2 — same as F1 but no data chunks written, fill 1234.0
    (``lib.rs:318-332`` with write_data=false)."""
    path = path or fixture_dir("lat_lon_missing")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "lat": np.arange(35.0, 43.0),
            "lon": np.arange(-120.0, -112.0),
            "data": np.zeros((8, 8)),
        },
        chunk_shapes={"lat": (3,), "lon": (3,), "data": (3, 3)},
        dimension_names={
            "lat": ("lat",),
            "lon": ("lon",),
            "data": ("lat", "lon"),
        },
        fill_values={"data": 1234.0},
        skip_data=("data",),
    )
    _mark_done(path)
    return path


def write_no_coords_store(path: str | None = None) -> str:
    """F3 — data_1 f64[8]/3 = 0..7, data_2 f64[8]/3 = 100..107, no
    dimension names (``lib.rs:335-344``)."""
    path = path or fixture_dir("no_coords")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "data_1": np.arange(8.0),
            "data_2": np.arange(100.0, 108.0),
        },
        chunk_shapes={"data_1": (3,), "data_2": (3,)},
    )
    _mark_done(path)
    return path


def write_mixed_dims_store(path: str | None = None) -> str:
    """F4 — lat stored pre-broadcast as 2-D (rows constant 35..42),
    lon 1-D coord, data 2-D (``lib.rs:346-397``). Output must equal F1."""
    path = path or fixture_dir("mixed_dims")
    if _done(path):
        return path
    lat2d = np.repeat(np.arange(35.0, 43.0), 8).reshape(8, 8)
    write_store(
        path,
        arrays={
            "lat": lat2d,
            "lon": np.arange(-120.0, -112.0),
            "data": np.arange(64.0).reshape(8, 8),
        },
        chunk_shapes={"lat": (3, 3), "lon": (3,), "data": (3, 3)},
        dimension_names={
            "lat": ("lat", "lon"),
            "lon": ("lon",),
            "data": ("lat", "lon"),
        },
    )
    _mark_done(path)
    return path


def write_typed_store(path: str | None = None, n: int = 24) -> str:
    """All supported primitive types in one store (values i = 0..n-1,
    chunk 7 so edge chunks are exercised). Verifies the full type map of
    SURVEY §1.3 (reference ``config.rs:261-282``) including the unsigned
    widening divergence."""
    path = path or fixture_dir(f"typed_{n}")
    if _done(path):
        return path
    i = np.arange(n)
    write_store(
        path,
        arrays={
            "t_bool": (i % 2 == 0),
            "t_i8": i.astype(np.int8),
            "t_i16": i.astype(np.int16),
            "t_i32": i.astype(np.int32),
            "t_i64": i.astype(np.int64),
            "t_u8": i.astype(np.uint8),
            "t_u16": i.astype(np.uint16),
            "t_u32": i.astype(np.uint32),
            "t_u64": i.astype(np.uint64),
            "t_f32": i.astype(np.float32),
            "t_f64": i.astype(np.float64),
        },
        chunk_shapes={
            k: (7,)
            for k in [
                "t_bool", "t_i8", "t_i16", "t_i32", "t_i64",
                "t_u8", "t_u16", "t_u32", "t_u64", "t_f32", "t_f64",
            ]
        },
    )
    _mark_done(path)
    return path


def write_bench_store(
    path: str | None = None, side: int = 512, chunk: int = 32, n_vars: int = 8
) -> str:
    """F6-shaped bench store — var1..var8 int64 [side,side], values
    0..side²-1 row-major (``benches/s3_bench.rs:70-109``; the reference
    uses chunk 8x8 on S3 — locally we default to 32x32 to keep object
    counts sane; pass chunk=8 for the exact reference layout).

    Chunks are blosc-LZ4, matching the compressor the reference's bench
    writes (``s3_bench.rs:59-68``), so bench scans exercise the same
    decode path a real arrow-zarr store would."""
    path = path or fixture_dir(f"bench_{side}_{chunk}_{n_vars}_blosc")
    if _done(path):
        return path
    base = np.arange(side * side, dtype=np.int64).reshape(side, side)
    write_store(
        path,
        arrays={f"var{i}": base for i in range(1, n_vars + 1)},
        chunk_shapes={f"var{i}": (chunk, chunk) for i in range(1, n_vars + 1)},
        compression="blosc-lz4",
    )
    _mark_done(path)
    return path


def write_wide_bench_store(
    path: str | None = None, side: int = 1024, chunk: int = 256,
    n_vars: int = 64,
) -> str:
    """WIDE store for the projection-pruning cost pair (SURVEY §2 A4;
    reference behavior ``config.rs:67-90`` — DataFusion projects into
    the scan). 64 int64 [side,side] arrays of INCOMPRESSIBLE values
    (splitmix-style multiplicative hash of the index — blosc-LZ4
    stores them near-raw), so an unpruned narrow query decodes ~64x
    the bytes of the pruned one and the ``zarr_narrow_*`` bench pair
    measures decode work, not task overhead. The original 8-array
    arange store hid the gap under the noise floor: arange compresses
    ~50x, so all 8 arrays decoded in less time than one task launch."""
    path = path or fixture_dir(f"wide_bench_{side}_{chunk}_{n_vars}")
    if _done(path):
        return path
    i = np.arange(side * side, dtype=np.uint64)
    arrays = {}
    for v in range(1, n_vars + 1):
        h = (i * np.uint64(0x9E3779B97F4A7C15) + np.uint64(v)) ^ (
            i >> np.uint64(31)
        )
        arrays[f"var{v}"] = h.view(np.int64).reshape(side, side)
    write_store(
        path,
        arrays=arrays,
        chunk_shapes={f"var{v}": (chunk, chunk) for v in range(1, n_vars + 1)},
        compression="blosc-lz4",
    )
    _mark_done(path)
    return path


def write_sharded_bench_store(
    path: str | None = None, side: int = 512, shard: int = 128, inner: int = 32
) -> str:
    """Bench-store twin written SHARDED: same 512x512 int64 data, but
    16 shard objects of 4x4 inner chunks each instead of 256 chunk
    objects — the object-count layout a 100-TB store would use."""
    import json as _json

    from .zarr.meta import ArrayMeta, numpy_to_zarr_dtype
    from .zarr.store import open_store
    from .zarr.writer import write_array_data, write_root_group

    path = path or fixture_dir(f"bench_sharded_{side}_{shard}_{inner}")
    if _done(path):
        return path
    store = open_store(path)
    write_root_group(store)
    base = np.arange(side * side, dtype=np.int64).reshape(side, side)
    for name in ("var1", "var2"):
        meta = ArrayMeta(
            name=name,
            shape=(side, side),
            chunk_shape=(shard, shard),
            zarr_dtype=numpy_to_zarr_dtype(np.dtype(np.int64)),
            fill_value=0,
            codecs=[
                {
                    "name": "sharding_indexed",
                    "configuration": {
                        "chunk_shape": [inner, inner],
                        "codecs": [
                            {"name": "bytes", "configuration": {"endian": "little"}},
                            {"name": "blosc", "configuration": {"cname": "lz4"}},
                        ],
                        "index_codecs": [
                            {"name": "bytes", "configuration": {"endian": "little"}},
                            {"name": "crc32c"},
                        ],
                        "index_location": "end",
                    },
                }
            ],
        )
        store.set(f"{name}/zarr.json", _json.dumps(meta.to_json()).encode())
        write_array_data(store, meta, base)
    _mark_done(path)
    return path


def write_sharded_store(path: str | None = None) -> str:
    """1-D sharded array (sharding_indexed): 64 int64 values in 4
    shards of 16, inner chunks of 4, blosc-LZ4 inner chain — the
    sharded layout zarrs-written stores use at scale."""
    import json as _json

    from .zarr.meta import ArrayMeta, numpy_to_zarr_dtype
    from .zarr.store import open_store
    from .zarr.writer import write_array_data, write_root_group

    path = path or fixture_dir("sharded_64")
    if _done(path):
        return path
    store = open_store(path)
    write_root_group(store)
    meta = ArrayMeta(
        name="v",
        shape=(64,),
        chunk_shape=(16,),
        zarr_dtype=numpy_to_zarr_dtype(np.dtype("int64")),
        fill_value=0,
        codecs=[
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [4],
                    "codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "blosc", "configuration": {"cname": "lz4"}},
                    ],
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }
        ],
    )
    store.set("v/zarr.json", _json.dumps(meta.to_json()).encode())
    write_array_data(store, meta, np.arange(64, dtype=np.int64))
    _mark_done(path)
    return path


def write_string_store(path: str | None = None) -> str:
    """String (vlen-utf8) variable over a numeric axis — the layout an
    xarray-written store with string labels has. The reference rejects
    string arrays; this fixture proves we scan them."""
    path = path or fixture_dir("strings_16")
    if _done(path):
        return path
    write_store(
        path,
        arrays={
            "label": np.array([f"n{i}" for i in range(16)], dtype=object),
            "x": np.arange(16.0),
        },
        chunk_shapes={"label": (5,), "x": (5,)},
        dimension_names={"label": ("x",), "x": ("x",)},
    )
    _mark_done(path)
    return path


def write_v2_store(path: str | None = None) -> str:
    """Hand-built Zarr v2 store (xarray-style _ARRAY_DIMENSIONS,
    numcodecs zlib chunks, '.'-separated chunk keys): 2x4 data grid
    with lat/lon coords — the reference rejects v2; we scan it."""
    import json as _json
    import zlib as _zlib

    from .zarr.store import open_store

    path = path or fixture_dir("v2_2x4")
    if _done(path):
        return path
    store = open_store(path)
    store.set(".zgroup", _json.dumps({"zarr_format": 2}).encode())

    def zarray(shape, chunks):
        return _json.dumps(
            {
                "zarr_format": 2, "shape": list(shape),
                "chunks": list(chunks), "dtype": "<f8",
                "compressor": {"id": "zlib", "level": 1},
                "fill_value": 0, "order": "C", "filters": None,
            }
        ).encode()

    def pack(a):
        return _zlib.compress(np.ascontiguousarray(a, dtype="<f8").tobytes(), 1)

    data = np.arange(8.0).reshape(2, 4)
    store.set("data/.zarray", zarray((2, 4), (1, 2)))
    store.set(
        "data/.zattrs",
        _json.dumps({"_ARRAY_DIMENSIONS": ["lat", "lon"]}).encode(),
    )
    for i in range(2):
        for j in range(2):
            store.set(f"data/{i}.{j}", pack(data[i : i + 1, 2 * j : 2 * j + 2]))
    store.set("lat/.zarray", zarray((2,), (1,)))
    store.set("lat/.zattrs", _json.dumps({"_ARRAY_DIMENSIONS": ["lat"]}).encode())
    store.set("lat/0", pack(np.array([10.0])))
    store.set("lat/1", pack(np.array([20.0])))
    store.set("lon/.zarray", zarray((4,), (2,)))
    store.set("lon/.zattrs", _json.dumps({"_ARRAY_DIMENSIONS": ["lon"]}).encode())
    store.set("lon/0", pack(np.array([1.0, 2.0])))
    store.set("lon/1", pack(np.array([3.0, 4.0])))
    _mark_done(path)
    return path


def write_time_series_store(path: str | None = None) -> str:
    """FT — a time axis: time datetime64[ns][24]/7 hourly from
    2024-01-01T00, val f64[24]/7 = 0..23. Exercises the datetime64
    read path (v3 extension dtype), TimestampNTZ mapping, edge chunks
    (24 % 7 != 0), and timestamp chunk pruning."""
    path = path or fixture_dir("time_series")
    if _done(path):
        return path
    times = np.arange(
        "2024-01-01T00", "2024-01-02T00", np.timedelta64(1, "h"),
        dtype="M8[ns]",
    )
    write_store(
        path,
        arrays={"time": times, "val": np.arange(24.0)},
        chunk_shapes={"time": (7,), "val": (7,)},
        dimension_names={"time": ("time",), "val": ("time",)},
    )
    _mark_done(path)
    return path


def write_geo_bench_store(
    path: str | None = None, side: int = 2048, chunk: int = 64
) -> str:
    """Coordinate-pruning bench store: a scaled-up F1 — lat/lon f64
    coordinates of length ``side`` and a [side, side] f64 data array
    ((side/chunk)^2 grid cells) — the layout where planning-time
    coordinate pruning pays: a one-chunk-band predicate keeps
    side/chunk of the (side/chunk)^2 cells."""
    path = path or fixture_dir(f"geo_bench_{side}_{chunk}")
    if _done(path):
        return path
    data = (
        np.arange(side * side, dtype=np.float64).reshape(side, side)
    )
    write_store(
        path,
        arrays={
            "lat": np.arange(side, dtype=np.float64),
            "lon": np.arange(side, dtype=np.float64) * -1.0,
            "data": data,
        },
        chunk_shapes={
            "lat": (chunk,),
            "lon": (chunk,),
            "data": (chunk, chunk),
        },
        dimension_names={
            "lat": ("lat",),
            "lon": ("lon",),
            "data": ("lat", "lon"),
        },
    )
    _mark_done(path)
    return path


def write_declared_span_store(n_declared: int = 16_777_216) -> str:
    """A metadata-DECLARED huge 1-D store for pricing span PLANNING:
    4 real rows written at chunk_rows=1, then the shape grown to
    ``n_declared`` (absent chunks are fill — the
    test_span_partitions.py trick). Planning it enumerates nothing:
    the bench entry times ``partitions()`` alone, the O(n_partitions)
    claim as a recorded number."""
    import json

    from .zarr.store import open_store

    path = fixture_dir(f"declared_span_{n_declared}")
    if _done(path):
        return path
    from .io import write_zarr
    from .session import get_spark

    spark = get_spark()
    df = spark.range(0, 4, 1, 1).selectExpr("id AS k")
    write_zarr(df, path, chunk_rows=1, stats=False)
    store = open_store(path)
    doc = json.loads(store.get("k/zarr.json"))
    doc["shape"] = [n_declared]
    store.set("k/zarr.json", json.dumps(doc).encode())
    root = json.loads(store.get("zarr.json"))
    root["consolidated_metadata"]["metadata"]["k"]["shape"] = [
        n_declared
    ]
    store.set("zarr.json", json.dumps(root).encode())
    _mark_done(path)
    return path


_S3_FACADES: dict = {}


def serve_s3_store(path: str, store_name: str = "store") -> str:
    """Serve an existing LOCAL store directory through a minimal
    PUBLIC-READ S3 facade (unsigned GET/HEAD/ListObjectsV2, writes
    rejected 403 — the public-bucket ACL shape) and return its
    ``s3+http://host:port/bucket/...`` URL. Lets the correctness
    harness scan through the real :class:`~.zarr.s3.S3Store` wire
    path — anonymous ranged GETs per chunk from executor workers,
    paginated XML listings for schema inference — without
    credentials in the environment. The full SIGNED protocol
    (SigV4 verification, conditional put, server-side copy) is
    exercised by tests/test_s3_store.py's stricter emulator; this
    facade is the read-only fixture twin, cached per served path
    for the life of the process."""
    import http.server
    import threading
    import urllib.parse
    import xml.sax.saxutils as _sx

    key = os.path.abspath(path)
    hit = _S3_FACADES.get(key)
    if hit:
        return hit

    root = key
    bucket = "public"

    class _Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _send(self, code, body=b"", headers=()):
            self.send_response(code)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def _rel(self):
            p = urllib.parse.unquote(self.path.partition("?")[0])
            pre = f"/{bucket}/{store_name}/"
            if p == f"/{bucket}":
                return ""
            if not p.startswith(pre):
                return None
            return p[len(pre):]

        def _file(self, rel):
            full = os.path.join(root, *rel.split("/"))
            if not os.path.isfile(full):
                return None
            with open(full, "rb") as f:
                return f.read()

        def do_GET(self):
            qs = dict(
                urllib.parse.parse_qsl(
                    self.path.partition("?")[2], keep_blank_values=True
                )
            )
            if qs.get("list-type") == "2":
                return self._list(qs)
            rel = self._rel()
            data = self._file(rel) if rel else None
            if data is None:
                return self._send(404, b"NoSuchKey")
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                spec = rng[len("bytes="):]
                if spec.startswith("-"):
                    n = int(spec[1:])
                    part = data[-n:] if n < len(data) else data
                else:
                    a, _, b = spec.partition("-")
                    part = data[int(a): int(b) + 1 if b else None]
                return self._send(206, part)
            self._send(200, data)

        do_HEAD = do_GET

        def do_PUT(self):
            self._send(403, b"AccessDenied: public-read bucket")

        do_DELETE = do_PUT

        def _list(self, qs):
            prefix = qs.get("prefix", "")
            delim = qs.get("delimiter")
            after = qs.get("continuation-token", "")
            pre = f"{store_name}/"
            keys = []
            for dirpath, _dirs, files in os.walk(root):
                reld = os.path.relpath(dirpath, root)
                for f in files:
                    rel = f if reld == "." else f"{reld}/{f}"
                    k = pre + rel.replace(os.sep, "/")
                    if k.startswith(prefix):
                        keys.append(k)
            keys.sort()
            if after:
                keys = [k for k in keys if k > after]
            page = 1000
            contents, prefixes, last = [], [], None
            for k in keys:
                if len(contents) >= page:
                    break
                last = k
                if delim:
                    rest = k[len(prefix):]
                    if delim in rest:
                        p = prefix + rest.split(delim, 1)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                contents.append(k)
            truncated = bool(keys) and last != keys[-1]
            xml = ['<?xml version="1.0"?><ListBucketResult>']
            for k in contents:
                xml.append(
                    f"<Contents><Key>{_sx.escape(k)}</Key></Contents>"
                )
            for p in prefixes:
                xml.append(
                    "<CommonPrefixes><Prefix>"
                    f"{_sx.escape(p)}</Prefix></CommonPrefixes>"
                )
            xml.append(
                "<IsTruncated>"
                + ("true" if truncated else "false")
                + "</IsTruncated>"
            )
            if truncated:
                xml.append(
                    "<NextContinuationToken>"
                    + _sx.escape(last)
                    + "</NextContinuationToken>"
                )
            xml.append("</ListBucketResult>")
            self._send(200, "".join(xml).encode())

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"s3+http://127.0.0.1:{port}/{bucket}/{store_name}"
    _S3_FACADES[key] = url
    return url
