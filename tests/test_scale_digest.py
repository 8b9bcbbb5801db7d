"""Bounded-output certification forms for the full-window sorts
(tools/minidriver.py SCALE_DIGEST, VERDICT r12 task 4).

At sf10 q10/w01-w03's engines finish in seconds but the mirror's
canonicalizer (collect + python sort/sha256 of 15M rows per engine)
costs ~10min/query, which is why those four kept riding stale sf10
certs. MINIDRIVER_DIGEST=1 certifies the three full-output window
queries through a bucketed integer digest computed inside each engine.
These tests pin the contract that makes a digest cert trustworthy:

 1. EQUIVALENCE: at the smoke SFs the digest of the Spark plan equals
    the digest of the DuckDB oracle exactly (same canonicalizer the
    mirror uses), for every SCALE_DIGEST query.
 2. SENSITIVITY: the digest is not a checksum theater -- a single +1 on
    one value flips it, and a cross-row VALUE SWAP that preserves every
    plain column sum (the blind spot of naive sum digests) still flips
    the weight-mixed sums.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.minidriver import (  # noqa: E402
    SCALE_DIGEST,
    digest_spark,
    digest_sql,
    table_hash,
)

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _hash_spark(df):
    rows = [tuple(r) for r in df.collect()]
    return table_hash(rows, df.columns), len(rows)


def _hash_duck(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    return table_hash(rows, cols), len(rows)


@pytest.mark.parametrize("name", sorted(SCALE_DIGEST))
def test_digest_equivalence_at_smoke_sf(spark, name):
    from groove_to_helpscout_migration_tool_spark.catalog import QUERIES

    spec = QUERIES[name]
    dspec = SCALE_DIGEST[name]
    sh, sn = _hash_spark(digest_spark(spec.fn(spark, SF_DIR), dspec))
    oh, on = _hash_duck(_duck(), digest_sql(spec.oracle, dspec))
    assert sn == on and sn > 0
    assert sh == oh, name


def test_digest_flips_on_single_value_change():
    # +1 on one rn value in one row: n and every other column unchanged
    con = _duck()
    dspec = SCALE_DIGEST["w03_top3_orders_per_customer"]
    from groove_to_helpscout_migration_tool_spark.catalog import QUERIES

    base = QUERIES["w03_top3_orders_per_customer"].oracle
    clean, _ = _hash_duck(con, digest_sql(base, dspec))
    low = con.execute(
        f"SELECT min(orderkey) FROM ({base})"
    ).fetchone()[0]
    corrupt = (
        f"SELECT custkey, orderkey,"
        f" CASE WHEN orderkey = {low} THEN rn + 1 ELSE rn END AS rn"
        f" FROM ({base})"
    )
    dirty, _ = _hash_duck(con, digest_sql(corrupt, dspec))
    assert dirty != clean


def test_mixed_sums_catch_sum_preserving_swaps():
    """Swap the rn values of two rows of the SAME customer (same digest
    bucket): count and plain sum of every column are untouched, so a
    naive sum digest passes the corruption; the weight-mixed sums
    (value * f(orderkey)) must flip."""
    con = _duck()
    con.execute(
        "CREATE TABLE w AS SELECT * FROM (VALUES"
        " (7, 100, 1), (7, 205, 2), (7, 310, 3)) AS t(custkey, orderkey, rn)"
    )
    dspec = SCALE_DIGEST["w03_top3_orders_per_customer"]
    clean, _ = _hash_duck(con, digest_sql("SELECT * FROM w", dspec))
    swapped = (
        "SELECT custkey, orderkey,"
        " CASE orderkey WHEN 100 THEN 2 WHEN 205 THEN 1 ELSE rn END AS rn"
        " FROM w"
    )
    # sanity: the swap preserves the naive aggregates entirely
    a = con.execute(
        "SELECT count(*), sum(rn), sum(orderkey) FROM w"
    ).fetchone()
    b = con.execute(
        f"SELECT count(*), sum(rn), sum(orderkey) FROM ({swapped})"
    ).fetchone()
    assert a == b
    dirty, _ = _hash_duck(con, digest_sql(swapped, dspec))
    assert dirty != clean
