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
