"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's full catalog
(groove_to_helpscout_migration_tool_spark/catalog/): every implemented operator from
SURVEY.md section 2 plus the LLM-data-pipeline extensions, each paired
with a DuckDB oracle when ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from groove_to_helpscout_migration_tool_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    return catalog.oracle_sql()
