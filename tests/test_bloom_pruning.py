"""Runtime Bloom-filter join pruning: the mechanism, proven locally.

At 100 TB a selective dim-side filter should prune the fact-side
SHUFFLE, not just the join: Spark's runtime bloom filter (on by
default, spark.sql.optimizer.runtime.bloomFilter.enabled) builds a
bloom filter from the filtered creation side and injects
might_contain() into the fact scan/shuffle. Its size thresholds are
cluster-tuned (application side must scan >= 10GB by default), so the
injection never fires on local fixtures; this test lowers the
thresholds to prove the mechanism and the result-equivalence, then
restores them. The engine needs no code for this -- expressing joins
declaratively is what lets Catalyst inject the filter -- but the test
pins that our join shapes stay ELIGIBLE (equi-join on a scannable
column with a selective creation side), which a refactor to UDF keys
or pre-shuffled frames would silently break.
"""

from __future__ import annotations


BLOOM_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def test_selective_dim_filter_injects_bloom_prune(spark):
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def revenue():
        return (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )

    baseline = {(r["o_orderpriority"], r["rev"]) for r in revenue().collect()}

    saved = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = revenue()
        rows = {(r["o_orderpriority"], r["rev"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # the fact side must be probed by the runtime bloom filter...
    assert "might_contain" in plan.lower(), plan[:2000]
    # ...and pruning must not change the result
    assert rows == baseline
