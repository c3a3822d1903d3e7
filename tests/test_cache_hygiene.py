"""Cache hygiene: operators must not leave entries pinned in the
cache manager after their results are consumed.

Round-1 review found ``minhash_lsh_pairs`` persisting its candidate
set with no unpersist and ``connected_components`` returning a
persisted frame — both accumulate storage across repeated suite/bench
runs until LRU eviction. Both now use eager localCheckpoint, whose
blocks the ContextCleaner reclaims once the frame is dropped, and
leave the cache manager empty.
"""

import gc
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _persistent_rdd_count(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def test_minhash_verify_leaves_no_cache_entry(spark):
    from arrow_zarr_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = minhash_lsh_pairs(docs, verify_jaccard=True, jaccard_threshold=0.5)
    out.collect()
    assert _cache_manager_empty(spark), (
        "minhash_lsh_pairs left a frame pinned in the cache manager"
    )


def test_connected_components_leaves_no_cache_entry(spark):
    from arrow_zarr_spark.operators.dedup import connected_components

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = connected_components(docs, pairs)
    n = comp.count()
    assert n > 0
    assert _cache_manager_empty(spark), (
        "connected_components left a frame pinned in the cache manager"
    )


def test_checkpoint_storage_bounded_across_runs(spark):
    """Repeated dedup runs must not ACCUMULATE storage — the round-1
    failure mode was one orphaned cache entry per run. localCheckpoint
    blocks are ContextCleaner-reclaimed on GC (timing is the JVM's),
    so the invariant to pin down is boundedness: after several runs the
    persistent-RDD count stays at the single live checkpoint, not one
    per run."""
    from arrow_zarr_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counts = []
    for _ in range(4):
        out = minhash_lsh_pairs(
            docs, verify_jaccard=True, jaccard_threshold=0.5
        )
        out.collect()
        del out
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        counts.append(_persistent_rdd_count(spark))
    # Each run makes 2 checkpoints (banded signatures + candidate
    # pairs); a leak means linear growth (baseline + 8 after 4 runs).
    # Reclamation rides JVM GC, so give the cleaner time to catch up
    # before judging: bounded = final settles within one run's worth of
    # checkpoints above the baseline (which itself absorbs leftovers
    # from earlier tests in this session).
    final = counts[-1]
    deadline = time.time() + 30
    while time.time() < deadline and final > counts[0] + 2:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        final = _persistent_rdd_count(spark)
    assert final <= counts[0] + 2, (
        f"persistent RDD counts grew across runs: {counts} -> {final} — "
        "checkpoint blocks are accumulating instead of being reclaimed"
    )
