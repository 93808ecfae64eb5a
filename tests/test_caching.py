"""Staging-lifecycle tests (round-2 ADVICE: staged queries leaked caches
across back-to-back registry runs, skewing later bench legs 2-3x; round-6:
stage_view switched from persist to localCheckpoint backing because CTE
consumers miss the persist cache — so the lifecycle check now tracks the
checkpoint RDD blocks themselves)."""

from cloudtile_spark import caching
from cloudtile_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _staged_rdd_ids() -> list[int]:
    ids = []
    for entry in caching._STAGED:
        if entry[0] == "checkpoint":
            ids.append(
                entry[1]._jdf.queryExecution().analyzed().rdd().id())
    return ids


def _stored_rdd_ids(spark) -> set[int]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {i.id() for i in infos}


def test_staged_query_releases_on_next_entry(spark):
    caching.release_staged()
    spark.catalog.clearCache()
    # a staged query checkpoints its expensive stage(s)...
    REGISTRY["dedup_minhash_lsh"].spark_fn(spark, SF_DIR).count()
    assert len(caching._STAGED) == 3  # hashed + band rows + shingle sets
    ids = _staged_rdd_ids()
    assert len(ids) == 3
    stored = _stored_rdd_ids(spark)
    assert all(i in stored for i in ids)  # blocks live after the action
    # ...and the NEXT registry query's entry releases them; dedup_exact
    # stages nothing of its own
    REGISTRY["dedup_exact"].spark_fn(spark, SF_DIR).count()
    assert _cache_empty(spark)
    stored = _stored_rdd_ids(spark)
    assert all(i not in stored for i in ids)  # blocks freed, views dropped
    # repeated staged runs don't accumulate (the bench REPEATS pattern)
    for _ in range(3):
        REGISTRY["dedup_simhash"].spark_fn(spark, SF_DIR).count()
    assert len(caching._STAGED) == 1  # only the live run's stage
    last = _staged_rdd_ids()
    assert caching.release_staged() == 1
    assert all(i not in _stored_rdd_ids(spark) for i in last)
    assert _cache_empty(spark)


def test_release_staged_idempotent(spark):
    assert caching.release_staged() == 0
    df = caching.stage(spark.range(10))
    assert df.count() == 10
    assert caching.release_staged() == 1
    assert caching.release_staged() == 0
