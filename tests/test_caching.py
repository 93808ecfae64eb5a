"""Persist-lifecycle tests (round-2 ADVICE: staged queries leaked caches
across back-to-back registry runs, skewing later bench legs 2-3x)."""

from cloudtile_spark import caching
from cloudtile_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_staged_query_releases_on_next_entry(spark):
    caching.release_staged()
    spark.catalog.clearCache()
    # a staged query persists its expensive stage(s)...
    REGISTRY["dedup_minhash_lsh"].spark_fn(spark, SF_DIR).count()
    assert not _cache_empty(spark)
    assert len(caching._STAGED) == 3  # hashed + band rows + shingle sets
    # ...and the NEXT registry query's entry releases them; dedup_exact
    # stages nothing of its own, so the cache manager drains fully
    REGISTRY["dedup_exact"].spark_fn(spark, SF_DIR).count()
    assert _cache_empty(spark)
    # repeated staged runs don't accumulate (the bench REPEATS pattern)
    for _ in range(3):
        REGISTRY["dedup_simhash"].spark_fn(spark, SF_DIR).count()
    assert len(caching._STAGED) == 1  # only the live run's stage
    assert caching.release_staged() == 1
    assert _cache_empty(spark)


def test_release_staged_idempotent(spark):
    assert caching.release_staged() == 0
    df = caching.stage(spark.range(10))
    assert df.count() == 10
    assert caching.release_staged() == 1
    assert caching.release_staged() == 0
