"""Query registry: name -> (spark callable, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md section 2) registers here with
a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB SQL string run by
the correctness driver over the same parquet tables. Column names are
aliased identically on both sides (the driver sorts columns by name and
hash-compares values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
