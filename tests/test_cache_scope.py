"""cache.scope(): per-query release of tracked persists (storage memory
stays flat across repeated query invocations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_prisma_api_data_ingestion_spark import cache


def test_scope_releases_inner_persists_only(spark):
    outer = cache.tracked_persist(spark.range(10).withColumn("x", F.lit(1)))
    outer.count()
    with cache.scope(blocking=True):
        inner = cache.tracked_persist(spark.range(20))
        assert inner.count() == 20
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory   # released by scope exit
    assert outer.storageLevel.useMemory       # outer untouched
    cache.release_all(blocking=True)
    assert not outer.storageLevel.useMemory


def test_scope_releases_on_exception(spark):
    try:
        with cache.scope(blocking=True):
            df = cache.tracked_persist(spark.range(5))
            df.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not df.storageLevel.useMemory


def test_repeated_scoped_runs_stay_flat(spark):
    """The bench-loop property: N scoped invocations leave no residue."""
    for _ in range(5):
        with cache.scope(blocking=True):
            cache.tracked_persist(spark.range(100)).count()
    assert len(cache._TRACKED) == 0
