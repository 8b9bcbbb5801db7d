"""SparkSession factory + canonical table loading.

Scale notes:
  - AQE on everywhere (runtime shuffle coalescing, skew-join splitting,
    dynamic broadcast conversion) -- at 100 TB the static plan is never
    exactly right; AQE re-plans from real partition sizes.
  - ``spark.sql.shuffle.partitions`` defaults to the local core count for
    local runs; on a real cluster set it to ~2-3x total executor cores
    (or leave AQE's coalescing to shrink an intentionally-high number).
  - Session time zone pinned to UTC so wall-clock semantics match the
    parquet TIMESTAMP_NTZ test tables (and the DuckDB oracle). The
    reference pins America/Toronto (SyncTickets.php:38); pipelines that
    need reference-parity formatting pass an explicit zone instead of
    relying on the session default.
  - The driver-generated ``events`` table stores TIMESTAMP(NANOS) which
    Spark's vectorized parquet reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and
    convert to TIMESTAMP_NTZ at microsecond precision (truncation --
    identical to DuckDB's ns->us cast).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(
    app_name: str = "groove2hs-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or int(cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Python Data Source pushdown (sources/pyds.py page pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # ContextCleaner deletes checkpoint files when their RDD is GC'd
        # (read once at context startup -- must be set here, not later).
        # Long-lived drivers calling connected_components repeatedly would
        # otherwise accumulate checkpoint dirs unboundedly.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create.

    The correctness driver owns its own SparkSession; every catalog query
    funnels through here so results do not depend on who built the session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf on some builds; get_session sets it at build time
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalizing the events nanos-as-long column."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> SimpleNamespace:
    """Load the test tables as attributes (t.orders, t.lineitem, ...)."""
    configure(spark)
    names = names or TABLES
    return SimpleNamespace(**{n: load_table(spark, sf_dir, n) for n in names})
