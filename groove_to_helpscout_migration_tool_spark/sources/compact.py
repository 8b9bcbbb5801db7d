"""Output compaction: size-aware file counts for parquet sinks.

At 100 TB the silent killer is the OTHER direction from big files:
thousands of tasks each writing kilobyte files (the reference's
per-page publish would produce one file per page). A downstream scan
then pays per-file open/footer costs and the driver pays listing.
``write_compacted`` sizes the file count from the plan's estimated
bytes so output files land near a target size regardless of the
upstream partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan output (upper-bound-ish;
    good enough to pick a file count)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def write_compacted(
    df: DataFrame,
    path: str,
    target_mb: float = 128,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> int:
    """Write ``df`` with ceil(estimated_bytes / target_mb) output files
    (minimum 1). Returns the file count used. Uses repartition (round-
    robin) so files are even-sized; partition-key-preserving layouts
    should bucket/partitionBy instead."""
    n = max(1, math.ceil(estimated_bytes(df) / (target_mb * 1024 * 1024)))
    df.repartition(n).write.mode(mode).format(fmt).save(path)
    return n


def release_frame(
    df: DataFrame,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> DataFrame:
    """The exact frame ``write_release`` writes: ``df`` repartitioned on
    the partition columns (plus a deterministic row-hash salt when
    ``files_per_partition > 1``) so each output leaf is owned by its own
    task(s). Exposed separately so ``tools/explain_audit.py`` can assert
    the pre-repartition exists in the PLAN (``Exchange hashpartitioning``
    on the partition columns, never round-robin or range) -- the
    ``q_release_layout`` oracle pins n_files = 1 per leaf after the
    fact; the plan audit catches a regression at review time."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        return df.repartition(*(cols + [salt]))
    return df.repartition(*cols)


def write_release(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned release writer (the sink side of
    ``llm_train_val_test_split``): ``partitionBy(*partition_cols)`` for
    the directory layout, but REPARTITIONED on those columns first so
    each output partition is written by the task(s) that own it. The
    naive ``df.write.partitionBy(...)`` has every upstream task open a
    writer for every partition value it sees -- at 100 TB with a
    32-way (split, shard) layout that is tasks x partitions small
    files plus as many open writer buffers; the pre-shuffle makes file
    count ~``files_per_partition`` per leaf and writer memory O(1) per
    task. ``files_per_partition > 1`` salts the repartition key with a
    deterministic row hash so large leaves still parallelize."""
    rep = release_frame(df, partition_cols, files_per_partition)
    rep.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)
