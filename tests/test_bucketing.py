"""Bucketed co-located joins: pre-shuffling both fact tables into the
same bucket layout makes the repeated orderkey join SHUFFLE-FREE -- the
100 TB answer to "lineitem joins orders in every query". The reference
has no storage layer at all; this is the scale-out design the engine
adds (SURVEY section 7 phase 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Write orders+lineitem bucketed by the join key into a managed
    warehouse table pair (16 buckets, sorted within buckets)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(16, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(16, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_is_shuffle_free_and_correct(self, warehouse, sf_dir):
        spark = warehouse
        # at test scale AQE would broadcast the small side; disable so the
        # plan shows what bucketing buys on two BIG sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # the join itself must not exchange either side: bucket layout IS
        # the partitioning. (The final small groupBy agg may exchange.)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness vs the unbucketed join
        want = {
            (r["o_orderpriority"], r["n"])
            for r in (
                spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                .join(
                    spark.read.parquet(f"{sf_dir}/orders.parquet"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        }
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        assert got == want
