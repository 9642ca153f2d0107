"""Session-scoped persisted-subtree cache behavior."""

from pyspark.sql import functions as F

from skills_vectors_spark.cache import _CACHE, cached_df


def test_cached_df_reuses_same_dataframe(spark, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).withColumn("x", F.col("id") * 2)

    a = cached_df("test_stage_reuse", spark, sf_dir, build)
    b = cached_df("test_stage_reuse", spark, sf_dir, build)
    assert a is b, "second call must return the same persisted DataFrame"
    assert len(calls) == 1, "build must run once"
    assert a.storageLevel.useMemory or a.storageLevel.useDisk


def test_cached_df_keys_by_stage_and_dir(spark, sf_dir):
    a = cached_df("test_stage_k1", spark, sf_dir, lambda: spark.range(5))
    b = cached_df("test_stage_k2", spark, sf_dir, lambda: spark.range(5))
    c = cached_df("test_stage_k1", spark, sf_dir + "/other", lambda: spark.range(5))
    assert a is not b and a is not c
    app_id = spark.sparkContext.applicationId
    assert (app_id, sf_dir, "test_stage_k1") in _CACHE
