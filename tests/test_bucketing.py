"""Bucketed join must plan with zero Exchanges (the pre-shuffled path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.plans.explain import num_shuffles
from spark_skew_join_spark.sources.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_no_shuffle(spark):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("p")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "bk_left", "k", n_buckets=8)
        write_bucketed(right, "bk_right", "k", n_buckets=8)
        j = read_bucketed(spark, "bk_left").join(read_bucketed(spark, "bk_right"), "k")
        assert num_shuffles(j) == 0, "bucketed equi-join must not re-shuffle"
        assert j.count() == 5_000
        # contrast: the same join on plain (unbucketed) frames shuffles
        assert num_shuffles(left.join(right, "k")) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
