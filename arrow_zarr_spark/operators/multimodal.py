"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction / resize / frame-sampling as Arrow-batched
mapInPandas operators.

The image/audio libraries are not in this container, so the *decode
kernels* are stubbed — either a clearly-marked NotImplementedError (real
codecs) or a deterministic fake (byte-level features). The Spark-side
plumbing is real and tested: schema shape, binary columns, batch
iteration, partitioning, and UDF signatures are exactly what a
Pillow/torchaudio-backed kernel would drop into.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "with_binary_payload",
    "byte_features",
    "decode_image",
    "decode_audio",
    "resize_pixels",
    "resize_images",
    "sample_frames",
    "crossmodal_alignment",
    "perceptual_hash",
    "perceptual_hash64",
    "phash_near_dup_pairs",
    "phash64_near_dup_pairs",
    "build_phash64_index",
    "phash64_near_dup_pairs_indexed",
]

#: Canonical multimodal column group: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image/audio/video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def with_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a media-shaped frame from the documents table (payload =
    UTF-8 bytes of the text; a deterministic stand-in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("first_byte", IntegerType(), True),
        StructField("last_byte", IntegerType(), True),
        StructField("byte_sum_mod", LongType(), True),
    ]
)


def byte_features(df: DataFrame) -> DataFrame:
    """Deterministic fake "decoder": byte-level features via mapInPandas.

    This is the real plumbing for a decode step — Arrow batches in,
    numpy kernel, Arrow batches out, no driver involvement, partition-
    parallel. Swap the kernel body for Pillow/librosa when available."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            n_bytes = np.zeros(n, dtype=np.int64)
            first = np.zeros(n, dtype=np.int32)
            last = np.zeros(n, dtype=np.int32)
            bsum = np.zeros(n, dtype=np.int64)
            for i, p in enumerate(payloads):
                if p is None:
                    continue
                buf = np.frombuffer(p, dtype=np.uint8)
                n_bytes[i] = buf.size
                if buf.size:
                    first[i] = int(buf[0])
                    last[i] = int(buf[-1])
                    bsum[i] = int(buf.sum()) % 1000003
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "last_byte": last,
                    "byte_sum_mod": bsum,
                }
            )

    return df.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("pixels", ArrayType(DoubleType()), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def decode_image(
    df: DataFrame, fake: bool = True, thumb: tuple = (4, 4)
) -> DataFrame:
    """Decode image payloads to pixel arrays.

    ``fake=True`` produces a deterministic ``thumb=(width, height)``
    grayscale thumbnail from the byte stream (so the downstream
    plumbing — schema, batching, joins on media_id — is exercised
    end-to-end); pixels are row-major span means rounded to 6
    decimals, the m02 px_micro replay convention. ``fake=False`` is
    the real-codec path: STUB, raises NotImplementedError (no Pillow
    in this environment).

    The kernel is batch-vectorized: all payloads of an Arrow batch
    concatenate into one uint8 buffer, the ``np.array_split`` span
    boundaries (``n % k`` longer spans first) are rebuilt
    arithmetically, and span means come from one prefix-sum pass.
    Byte sums are exact integers in float64 (< 2^53 per batch), so
    each span mean is the same exact-sum / size IEEE divide the
    per-row ``np.mean`` computed — bit-identical pixels."""
    w, h = int(thumb[0]), int(thumb[1])
    n_spans = w * h

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires Pillow; install it and "
                    "replace this kernel (see module docstring)"
                )
            mids = pdf["media_id"].to_numpy()
            payloads = pdf["payload"]
            lens = np.array(
                [0 if p is None else len(p) for p in payloads],
                dtype=np.int64,
            )
            live = np.nonzero(lens > 0)[0]
            pix_col = [None] * len(pdf)
            if len(live):
                buf = np.frombuffer(
                    b"".join(payloads.iloc[i] for i in live), dtype=np.uint8
                )
                # prefix sums of exact small ints: c[e]-c[s] is the
                # exact span sum for any [s, e)
                csum = np.zeros(buf.size + 1, dtype=np.float64)
                np.cumsum(buf, dtype=np.float64, out=csum[1:])
                n = lens[live]
                div, mod = n // n_spans, n % n_spans
                # array_split boundary j of a length-n row:
                #   j*div + min(j, mod)
                j = np.arange(n_spans + 1, dtype=np.int64)
                bounds = div[:, None] * j[None, :] + np.minimum(
                    j[None, :], mod[:, None]
                )
                row_off = np.zeros(len(live), dtype=np.int64)
                np.cumsum(n[:-1], out=row_off[1:])
                starts = (bounds[:, :-1] + row_off[:, None]).ravel()
                ends = (bounds[:, 1:] + row_off[:, None]).ravel()
                sizes = ends - starts
                sums = csum[ends] - csum[starts]
                means = np.divide(
                    sums,
                    sizes,
                    out=np.zeros_like(sums),
                    where=sizes > 0,
                )
                pix = np.round(means, 6).reshape(len(live), n_spans)
                for k_i, row_i in enumerate(live):
                    pix_col[row_i] = pix[k_i].tolist()
            w_col = np.where(lens > 0, w, 0).astype(object)
            h_col = np.where(lens > 0, h, 0).astype(object)
            w_col[lens == 0] = None
            h_col[lens == 0] = None
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "pixels": pix_col,
                    "width": w_col,
                    "height": h_col,
                }
            )

    return df.mapInPandas(decode, schema=_DECODE_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("energy", DoubleType(), True),
    ]
)


def decode_audio(
    df: DataFrame, window_bytes: int = 32, fake: bool = True
) -> DataFrame:
    """Decode audio payloads into fixed windows of sample energy — the
    audio member of the multimodal triad (images: :func:`decode_image`,
    video: :func:`sample_frames`).

    ``fake=True`` treats the payload as 8-bit PCM: window ``i`` covers
    bytes ``[i*window_bytes, (i+1)*window_bytes)`` (trailing partial
    window included), energy = mean sample value rounded to 6 places —
    deterministic, so the oracle replays it with substr/ascii
    arithmetic. ``fake=False`` is the real-codec path: STUB, raises
    NotImplementedError (no librosa/torchaudio in this environment);
    a real kernel drops into the same Arrow-batched signature. One
    input row expands to its window rows; empty payloads yield none."""
    if window_bytes < 1:
        raise ValueError(f"window_bytes must be >= 1, got {window_bytes}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires librosa/torchaudio; "
                    "install one and replace this kernel (see module "
                    "docstring)"
                )
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                buf = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                for w in range(-(-buf.size // window_bytes)):
                    seg = buf[w * window_bytes : (w + 1) * window_bytes]
                    rows.append(
                        (
                            mid,
                            w,
                            int(seg.size),
                            float(np.round(seg.mean(), 6)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "n_samples", "energy"],
            )

    return df.mapInPandas(kernel, schema=_AUDIO_SCHEMA)


def resize_pixels(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resample decoded pixel grids to ``out_w`` x ``out_h`` — REAL
    math, not a stub: resampling a float grid needs numpy, not an image
    codec (only payload→pixels decoding does). Input is the
    :func:`decode_image` schema (media_id, pixels, width, height).

    Integer downscale factors use a block mean accumulated in fixed
    row-major order, so the arithmetic is replayable by the SQL oracle;
    non-integer ratios use nearest-neighbor (deterministic, but
    registered without an oracle — document the path you rely on).
    Arrow-batched mapInPandas, one output row per input row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, pix, w, h in zip(
                pdf["media_id"], pdf["pixels"], pdf["width"], pdf["height"]
            ):
                if pix is None:
                    rows.append((mid, None, None, None))
                    continue
                grid = np.asarray(pix, dtype=np.float64).reshape(
                    int(h), int(w)
                )
                if int(h) % out_h == 0 and int(w) % out_w == 0:
                    fh, fw = int(h) // out_h, int(w) // out_w
                    out = np.zeros((out_h, out_w), dtype=np.float64)
                    # fixed row-major accumulation (see docstring)
                    for rr in range(fh):
                        for cc in range(fw):
                            out += grid[rr::fh, cc::fw]
                    out = np.round(out / (fh * fw), 6)
                else:
                    ys = (np.arange(out_h) * int(h)) // out_h
                    xs = (np.arange(out_w) * int(w)) // out_w
                    out = grid[np.ix_(ys, xs)]
                rows.append((mid, [float(v) for v in out.ravel()], out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["media_id", "pixels", "width", "height"]
            )

    return df.mapInPandas(kernel, schema=_DECODE_SCHEMA)


#: kept under the old name for callers that used the stub's signature
resize_images = resize_pixels


def crossmodal_alignment(
    docs: DataFrame,
    embs: DataFrame,
    threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """CLIP-score-style cross-modal alignment gate (m06): keep items
    whose image-tower and text-tower representations agree.

    A curation pipeline over image+caption (or audio+transcript) pairs
    drops pairs whose modalities disagree — the standard filter is a
    cosine threshold between the two modality embeddings projected
    into a shared space. Here the image tower is the deterministic
    fake decode (:func:`decode_image` 16-span byte means, exported as
    the exact integer micro-pixels m02 established), and the text
    tower is the 64-d ``embeddings`` vector pooled to 16-d by 4-block
    mean (the "projection head"); alignment = ROUND(cosine, 6),
    gated at ``threshold``. Swap the fake decode for a real image
    encoder and the pooling for a learned head — the plan shape is
    unchanged.

    100-TB shape: one Arrow-batched decode pass over the media table,
    JVM-side ``transform`` pooling on the embedding side, a single
    id equi-join (AQE-planned; broadcastable when one tower's output
    is small), and a built-in cosine — no crossJoin, no collect, no
    per-row Python. Both towers and the cosine are exactly replayed
    by the SQL oracle (micro-pixels are integers; pooling is fixed
    left-to-right double addition)."""
    media = with_binary_payload(docs, id_col=id_col, text_col=text_col)
    decoded = decode_image(media, fake=True)
    img = decoded.filter(F.col("pixels").isNotNull()).select(
        "media_id",
        F.transform(
            "pixels",
            lambda p: F.round(p * F.lit(1000000.0)).cast("double"),
        ).alias("img_vec"),
    )
    emb_d = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    pooled = embs.select(
        F.col(emb_id_col).alias("media_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (
                F.element_at(emb_d, i * 4 + 1)
                + F.element_at(emb_d, i * 4 + 2)
                + F.element_at(emb_d, i * 4 + 3)
                + F.element_at(emb_d, i * 4 + 4)
            )
            / F.lit(4.0),
        ).alias("txt_vec"),
    )
    from .similarity import cosine_expr

    return (
        img.join(pooled, "media_id")
        .select(
            "media_id",
            F.round(cosine_expr("img_vec", "txt_vec"), 6).alias(
                "alignment"
            ),
        )
        .filter(F.col("alignment") >= F.lit(threshold))
    )


def sample_frames(
    df: DataFrame,
    stride: int = 4,
    frame_bytes: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from each payload —
    one input row expands to many frame rows (the shape a video
    pipeline needs; frame extraction parallelizes per payload batch).

    ``fake=True`` treats the payload as a raw byte stream: frame ``i``
    is bytes ``[i*frame_bytes, (i+1)*frame_bytes)`` and frames with
    ``i % stride == 0`` are emitted (trailing partial frame included) —
    deterministic, so the oracle replays it with substr arithmetic.
    ``fake=False`` is the real-codec path: STUB, raises
    NotImplementedError (no pyav/ffmpeg in this environment)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video frame sampling requires pyav/ffmpeg; not in "
                    "this environment"
                )
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for i in range(0, -(-len(p) // frame_bytes), stride):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        bytes(p[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def perceptual_hash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """24-bit dHash over the deterministic 4x4 thumbnail — the
    image-dedup signature (difference hash: Krawetz's dHash, the
    public pHash family's simplest member). Bits 0-11 compare
    row-adjacent pixels (r*3+c: pix[r,c] < pix[r,c+1]), bits 12-23
    column-adjacent (12+c*3+r: pix[r,c] < pix[r+1,c]) — brightness
    GRADIENTS, so the hash survives uniform exposure shifts, the
    property that makes dHash a near-dup signature rather than a
    checksum. All comparisons run JVM-side over decode_image's
    rounded pixel means; the real-codec decode stays honestly gated
    (fake thumbnail here), and the m02 oracle convention makes every
    bit SQL-replayable (rounded-micro pixel comparisons agree with
    the rounded-double ones: the 1e-6 grid is exactly representable
    at pixel magnitudes).

    Returns (media_id, phash long)."""
    pix = decode_image(with_binary_payload(df, id_col, text_col)).filter(
        F.col("pixels").isNotNull()
    )

    def p(i):
        return F.element_at(F.col("pixels"), i + 1)

    terms = []
    bi = 0
    for r in range(4):
        for c in range(3):
            terms.append(
                F.when(p(r * 4 + c) < p(r * 4 + c + 1), F.lit(1 << bi))
                .otherwise(F.lit(0))
            )
            bi += 1
    for c in range(4):
        for r in range(3):
            terms.append(
                F.when(p(r * 4 + c) < p((r + 1) * 4 + c), F.lit(1 << bi))
                .otherwise(F.lit(0))
            )
            bi += 1
    h = terms[0]
    for t in terms[1:]:
        h = h + t
    return pix.select("media_id", h.cast("long").alias("phash"))


def phash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perceptual near-duplicate image pairs — banded hamming LSH
    over :func:`perceptual_hash`, never an all-pairs scan: the 24-bit
    hash splits into three 8-bit bands; two hashes within hamming
    ``max_hamming`` <= 2 differ in at most 2 bands, so AT LEAST ONE
    band matches exactly (pigeonhole) and the pair surfaces from a
    band equi-join. Each pair is emitted from its FIRST matching band
    only (later joins require earlier bands to differ — j06's
    no-distinct dedup trick), then verified with the exact hamming
    distance (bit_count of xor, JVM-side).

    Recall is EXACT for hamming <= 2 by construction; precision is
    exact because every candidate is verified. Scale note: band
    cardinality is 2^8 here (a toy 4x4/24-bit hash) — a production
    64-bit pHash wants 16-bit bands (65k buckets) to keep per-bucket
    occupancy, the usual LSH bucket-sizing lever; the plan shape
    (equi-join per band, first-band dedup, exact verify) is unchanged.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    if not (0 <= max_hamming <= 2):
        raise ValueError(
            f"phash_near_dup_pairs: 3 bands guarantee recall only for "
            f"max_hamming <= 2, got {max_hamming}"
        )
    ph = perceptual_hash(df, id_col, text_col).select(
        "media_id",
        "phash",
        (F.col("phash") % 256).alias("b0"),
        F.shiftright("phash", 8).bitwiseAND(F.lit(255)).alias("b1"),
        F.shiftright("phash", 16).bitwiseAND(F.lit(255)).alias("b2"),
    )
    # six self-join arms would re-run the decode+hash pipeline six
    # times; the hash table is 5 small columns per doc — materialize
    # it once (the d14/d16 localCheckpoint convention)
    ph = ph.localCheckpoint()
    a = ph.select(*[F.col(c).alias(f"{c}_a") for c in ph.columns])
    b = ph.select(*[F.col(c).alias(f"{c}_b") for c in ph.columns])
    lt = F.col("media_id_a") < F.col("media_id_b")
    cands = (
        a.join(b, (F.col("b0_a") == F.col("b0_b")) & lt)
        .unionAll(
            a.join(
                b,
                (F.col("b1_a") == F.col("b1_b"))
                & (F.col("b0_a") != F.col("b0_b"))
                & lt,
            )
        )
        .unionAll(
            a.join(
                b,
                (F.col("b2_a") == F.col("b2_b"))
                & (F.col("b0_a") != F.col("b0_b"))
                & (F.col("b1_a") != F.col("b1_b"))
                & lt,
            )
        )
    )
    hamming = F.bit_count(
        F.col("phash_a").bitwiseXOR(F.col("phash_b"))
    ).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("media_id_a").alias("id_a"),
            F.col("media_id_b").alias("id_b"),
            "hamming",
        )
    )


def perceptual_hash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Production-width 64-bit dHash over the deterministic 9x8
    thumbnail — the scale path the 24-bit :func:`perceptual_hash`'s
    docstring promises (its 8-bit bands saturate at ~10^4 images;
    reference context: none — the reference has no similarity
    surface, this is north-star scope).

    Classic dHash (Krawetz): a width-9 x height-8 grayscale
    thumbnail yields 8 row-adjacent brightness comparisons per row x
    8 rows = 64 gradient bits (bit r*8+c set iff
    pix[r,c] < pix[r,c+1]) — gradients, not levels, so the hash
    survives uniform exposure shifts.

    The hash is carried as TWO non-negative 32-bit halves
    ``(ph_lo, ph_hi)`` rather than one signed 64-bit value: bit 63
    would wrap a BIGINT negative, and the two-halves form keeps every
    build/band/bit_count expression in non-negative integer
    arithmetic that Spark and the DuckDB oracle replay identically.
    Hamming distance is bit_count(xor(lo)) + bit_count(xor(hi)).

    All comparisons run JVM-side over decode_image's rounded pixel
    means (the m02 px_micro replay convention: round(mean, 6) * 1e6
    is exactly the integer the oracle rebuilds). Returns
    (media_id, ph_lo long, ph_hi long)."""
    pix = decode_image(
        with_binary_payload(df, id_col, text_col), thumb=(9, 8)
    ).filter(F.col("pixels").isNotNull())

    # one F.expr per half instead of 32 WHEN/otherwise Column chains:
    # the identical IF(pix[i] < pix[i+1], 2^b, 0) sum, built as a SQL
    # string so plan construction is one parse instead of ~200 py4j
    # round trips (r13 optimization; null conditions = false, same as
    # the WHEN form)
    lo_terms, hi_terms = [], []
    for r in range(8):
        for c in range(8):
            bi = r * 8 + c
            term = (
                f"IF(pixels[{r * 9 + c}] < pixels[{r * 9 + c + 1}], "
                f"{1 << (bi % 32)}L, 0L)"
            )
            (lo_terms if bi < 32 else hi_terms).append(term)

    return pix.select(
        "media_id",
        F.expr(" + ".join(lo_terms)).alias("ph_lo"),
        F.expr(" + ".join(hi_terms)).alias("ph_hi"),
    )


def phash64_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perceptual near-duplicate image pairs at production width —
    banded hamming LSH over :func:`perceptual_hash64`, never an
    all-pairs scan: the 64-bit hash splits into FOUR 16-bit bands
    (b0/b1 from ph_lo, b2/b3 from ph_hi); two hashes within hamming
    ``max_hamming`` <= 3 differ in at most 3 bands, so at least one
    band matches exactly (pigeonhole) and the pair surfaces from a
    band equi-join. Each pair is emitted from its FIRST matching band
    only (later arms require every earlier band to differ — the
    no-distinct dedup trick), then verified with the exact hamming
    distance (bit_count of xor per half, JVM-side).

    Recall is EXACT for hamming <= 3 by construction; precision is
    exact because every candidate is verified. Band cardinality is
    2^16 (65k buckets per band) — the occupancy that keeps the band
    joins sub-quadratic at 10^5-10^6 images
    (tests/test_operators.py pins occupancy at 10^5); past that, the
    standard LSH levers apply unchanged (more/wider bands over a
    128-bit hash, same plan shape).

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    ph = _phash64_with_bands(perceptual_hash64(df, id_col, text_col))
    return _phash64_band_join_pairs(ph, max_hamming)


def _phash64_with_bands(ph: DataFrame) -> DataFrame:
    """(media_id, ph_lo, ph_hi) -> + the four 16-bit band columns
    b0..b3 — ONE definition shared by the inline pipeline and the
    persisted index build (their bytes must not drift: the shared
    tail is what lets the m08 oracle replay the indexed query)."""
    return ph.select(
        "media_id",
        "ph_lo",
        "ph_hi",
        (F.col("ph_lo") % 65536).alias("b0"),
        F.shiftright("ph_lo", 16).alias("b1"),
        (F.col("ph_hi") % 65536).alias("b2"),
        F.shiftright("ph_hi", 16).alias("b3"),
    )


def _phash64_band_join_pairs(ph: DataFrame, max_hamming: int) -> DataFrame:
    """The banded near-dup tail over a (media_id, ph_lo, ph_hi,
    b0..b3) frame — shared by :func:`phash64_near_dup_pairs` (inline
    decode+hash) and :func:`phash64_near_dup_pairs_indexed` (persisted
    code store)."""
    if not (0 <= max_hamming <= 3):
        raise ValueError(
            f"phash64_near_dup_pairs: 4 bands guarantee recall only "
            f"for max_hamming <= 3, got {max_hamming}"
        )
    # four self-join arms would re-run the upstream pipeline four
    # times; the hash table is 7 small columns per doc — materialize
    # it once (the d14/d16 localCheckpoint convention)
    ph = ph.localCheckpoint()
    a = ph.select(*[F.col(c).alias(f"{c}_a") for c in ph.columns])
    b = ph.select(*[F.col(c).alias(f"{c}_b") for c in ph.columns])
    lt = F.col("media_id_a") < F.col("media_id_b")
    arms = []
    for i in range(4):
        cond = (F.col(f"b{i}_a") == F.col(f"b{i}_b")) & lt
        for j in range(i):
            cond = cond & (F.col(f"b{j}_a") != F.col(f"b{j}_b"))
        arms.append(a.join(b, cond))
    cands = arms[0]
    for arm in arms[1:]:
        cands = cands.unionAll(arm)
    hamming = (
        F.bit_count(F.col("ph_lo_a").bitwiseXOR(F.col("ph_lo_b")))
        + F.bit_count(F.col("ph_hi_a").bitwiseXOR(F.col("ph_hi_b")))
    ).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("media_id_a").alias("id_a"),
            F.col("media_id_b").alias("id_b"),
            "hamming",
        )
    )


def build_phash64_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_rows: int = 65536,
    mode: str = "overwrite",
) -> dict:
    """Persist the corpus's 64-bit perceptual hashes (+ the four
    16-bit band columns) as a zarr table store — the x05
    (vector_index.build_binary_index) pattern applied to the image
    near-dup path: the Arrow decode + dHash pass that dominates
    :func:`phash64_near_dup_pairs`' wall time runs ONCE as a batch
    index build; every near-dup query after scans 7 small integer
    columns through the engine's own reader (statistics, audit,
    replication, and versioning all apply to the index store).

    Codes are deterministic JVM expressions over decode_image's
    rounded pixel means, so a rebuilt index is byte-identical and the
    m08 full-pipeline SQL replay remains the oracle for queries
    against it. Returns ``{"path", "n_images"}``."""
    from ..io import write_zarr

    codes = _phash64_with_bands(
        perceptual_hash64(df, id_col, text_col)
    ).orderBy("media_id")
    n = write_zarr(codes, path, chunk_rows=chunk_rows, mode=mode)
    return {"path": path, "n_images": int(n)}


def phash64_near_dup_pairs_indexed(
    spark, index_path: str, max_hamming: int = 3
) -> DataFrame:
    """Perceptual near-duplicate pairs from a PERSISTED phash64 index
    (:func:`build_phash64_index`): identical rows to
    :func:`phash64_near_dup_pairs` over the same corpus — the decode
    pipeline never runs, the four band equi-joins read the code store
    (one ~56-byte row per image) through the zarr scan. Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    codes = spark.read.format("zarr").load(index_path)
    want = {"media_id", "ph_lo", "ph_hi", "b0", "b1", "b2", "b3"}
    if not want.issubset(set(codes.columns)):
        raise ValueError(
            f"phash64_near_dup_pairs_indexed: {index_path!r} is not a "
            f"phash64 index store (want columns {sorted(want)}, got "
            f"{codes.columns})"
        )
    return _phash64_band_join_pairs(
        codes.select(
            "media_id", "ph_lo", "ph_hi", "b0", "b1", "b2", "b3"
        ),
        max_hamming,
    )
