"""Bucketed co-located joins: two tables bucketed on the same key
must sort-merge join with NO shuffle exchange on either side — the
write-time layout that removes the dominant cost of repeated big-big
joins at 100 TB (SCALING.md; engine/api.write_gold_partitioned uses
the same mechanism for the per-player tables)."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def bucketed_pair(spark):
    tag = uuid.uuid4().hex[:8]
    left_name, right_name = f"bkt_left_{tag}", f"bkt_right_{tag}"
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for df, name in ((left, left_name), (right, right_name)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    yield left_name, right_name
    for name in (left_name, right_name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left_name, right_name = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left_name).join(spark.table(right_name), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, plan     # co-located: zero shuffle
        # and the result is right
        n = joined.count()
        assert n == 5000
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the layout: no
    exchange before the final agg."""
    left_name, _ = bucketed_pair
    agg = spark.table(left_name).groupBy("k").agg(F.sum("a").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 5000
