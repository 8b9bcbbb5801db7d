"""Relational query catalog: TPC-H-style analytics on the test tables.

These are the "free tier" the reference lacks entirely (SURVEY.md section
2.9) plus the headline bench queries. Everything is declarative DataFrame
API so Catalyst handles pushdown/pruning/join-strategy; broadcast hints
mark the small dimensions explicitly (region/nation/supplier are tiny at
every scale factor -- at 100 TB the fact tables grow but these dims stay
broadcast-able).

Float policy: every floating aggregate is rounded on BOTH sides (Spark and
the DuckDB oracle) so SMALL partition-order summation differences cannot
flip the value hash. Rounding alone is NOT sufficient for large-group
money sums: the r9 margin audit (tools/float_margins.py) measured the
engines' float sums differing by ~15 ulps relative on sf1 lineitem
aggregates while the pre-rounded values sat only ~12x that from a
rounding boundary -- certification was surviving on accumulation-order
dice. Queries whose sums aggregate millions of rows into few groups
(q01, q05, q06, q17, q19, g01, g04) therefore sum EXACT INTEGER money
units (``_cents``: 2-decimal doubles -> integers via scale-0 round,
which is cross-engine tie-safe because scale-0 ties are dyadic and
HALF_UP == half-away-from-zero on them) and derive display values by
integer half-up division (the llm_dataset_card idiom), making the hash
deterministic by construction. Small-group sums (per-order revenue and
similar) keep plain rounded float sums: their wobble is ~sqrt(group
size) ulps and the audit shows >= 1000x margin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_tables


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _cents(col, scale: int = 100):
    """Exact integer money/rate units from a 2-decimal double column.

    BIGINT, not DECIMAL: per-row unit products stay in whole-stage
    codegen (a DECIMAL(38,0) pipeline measured ~10x slower at sf1).
    The oracle mirrors with CAST(round(x * scale) AS HUGEINT)."""
    return F.round(col * scale).cast("long")


def _disc_units():
    """Discounted revenue in exact 1e-4 units: cents * (100 - d100)."""
    return _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))


# Oracle twin of _disc_units(); summed then half-up divided to cents.
_DISC_UNITS_SQL = (
    "CAST(round(l_extendedprice * 100) AS HUGEINT)"
    " * (100 - CAST(round(l_discount * 100) AS HUGEINT))"
)

# Split-sum radix: unit columns are summed as (col % 1e6, col div 1e6)
# long pairs so the aggregation keeps whole-stage codegen (BIGINT sum)
# yet cannot overflow at warehouse scale -- the lo sum is exact to
# ~9e12 rows per group, the hi sum to 9.2e18/(col_max/1e6) rows. The
# oracle needs no split (DuckDB HUGEINT sums are native 128-bit).
_SPLIT = 1_000_000


def _split_sums(name: str):
    """Two overflow-safe BIGINT partial sums of exact-integer column
    ``name``: recombine with _recombined()."""
    return [
        F.expr(f"sum({name} % {_SPLIT})").alias(f"{name}_lo"),
        F.expr(f"sum({name} div {_SPLIT})").alias(f"{name}_hi"),
    ]


def _recombined(name: str) -> str:
    """SQL for the exact 128-bit total of a _split_sums pair."""
    return f"(CAST({name}_hi AS DECIMAL(38,0)) * {_SPLIT} + {name}_lo)"


def _units_to_money(sum_sql: str, unit: int):
    """Display column: exact integer half-up from 1/(100*unit) units to
    cents, then one deterministic /100.0 -- never round(double)."""
    return (
        F.expr(f"(2 * {sum_sql} + {unit}) DIV (2 * {unit})").cast("double")
        / 100.0
    )


# ---------------------------------------------------------------------------
# q01 pricing summary (TPC-H Q1 shape) -- the flagship query
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS HUGEINT)            AS qty,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS cents,
         CAST(round(l_discount * 100) AS HUGEINT)      AS d100,
         CAST(round(l_tax * 100) AS HUGEINT)           AS t100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
), s AS (
  SELECT l_returnflag, l_linestatus,
         sum(qty) AS qs, sum(cents) AS cs,
         sum(cents * (100 - d100)) AS ds4,
         sum(cents * (100 - d100) * (100 + t100)) AS cg6,
         sum(d100) AS d1s, count(*) AS n
  FROM li GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       qs::DOUBLE                                   AS sum_qty,
       cs::DOUBLE / 100.0                           AS sum_base_price,
       ((2 * ds4 + 100) // 200)::DOUBLE / 100.0     AS sum_disc_price,
       ((2 * cg6 + 10000) // 20000)::DOUBLE / 100.0 AS sum_charge,
       ((2 * 10000 * qs + n) // (2 * n))::DOUBLE / 1e4  AS avg_qty,
       ((2 * 100 * cs + n) // (2 * n))::DOUBLE / 1e4    AS avg_price,
       ((2 * 10000 * d1s + n) // (2 * n))::DOUBLE / 1e6 AS avg_disc,
       n                                            AS count_order
FROM s
""",
    doc=(
        "TPC-H Q1: one scan, map-side partial agg, 6-group output."
        " Money/rate columns are summed as EXACT integer units (cents,"
        " discount/tax percent) with half-up integer division for the"
        " 2/4/6-decimal displays -- six-group sums over the whole fact"
        " table are exactly where float accumulation order wobbles past"
        " the rounding margin (measured by tools/float_margins.py), so"
        " the hash is made order-free by construction, not by rounding."
    ),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = (
        t.lineitem.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .select(
            "l_returnflag",
            "l_linestatus",
            _cents(F.col("l_quantity"), 1).alias("qty"),
            _cents(F.col("l_extendedprice")).alias("cents"),
            _cents(F.col("l_discount")).alias("d100"),
            _cents(F.col("l_tax")).alias("t100"),
        )
        # per-row unit products in BIGINT codegen: disc4 <= ~1e9,
        # cg6 <= ~1.2e11 -- summed via the overflow-safe split pairs
        .withColumn("disc4", F.col("cents") * (100 - F.col("d100")))
        .withColumn("chg6", F.col("disc4") * (100 + F.col("t100")))
    )
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("qs"),
        F.sum("cents").alias("cs"),
        *_split_sums("disc4"),
        *_split_sums("chg6"),
        F.sum("d100").alias("d1s"),
        F.count(F.lit(1)).alias("n"),
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.col("qs").cast("double").alias("sum_qty"),
        (F.col("cs").cast("double") / 100.0).alias("sum_base_price"),
        _units_to_money(_recombined("disc4"), 100).alias("sum_disc_price"),
        _units_to_money(_recombined("chg6"), 10000).alias("sum_charge"),
        # displays promote to DECIMAL(38,0) before the scale-up multiply
        # (2*10000*sum overflows BIGINT at warehouse scale; these run on
        # the 6 output rows, so the decimal cost is nil)
        (
            F.expr(
                "(2 * 10000 * CAST(qs AS DECIMAL(38,0)) + n) DIV (2 * n)"
            ).cast("double")
            / 1e4
        ).alias("avg_qty"),
        (
            F.expr(
                "(2 * 100 * CAST(cs AS DECIMAL(38,0)) + n) DIV (2 * n)"
            ).cast("double")
            / 1e4
        ).alias("avg_price"),
        (
            F.expr(
                "(2 * 10000 * CAST(d1s AS DECIMAL(38,0)) + n) DIV (2 * n)"
            ).cast("double")
            / 1e6
        ).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q03 shipping priority (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
SELECT o_orderkey AS orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
    doc="TPC-H Q3: selective dim filter -> fact join -> top-k. Deterministic tiebreak on orderkey.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t.lineitem.filter(F.col("l_shipdate") > _ts("1998-03-15"))
        .join(
            t.orders.filter(F.col("o_orderdate") < _ts("1998-03-15")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            "revenue",
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q05 local supplier volume (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register(
    "q05_region_revenue",
    oracle=f"""
WITH s AS (
  SELECT n_name AS nation, sum({_DISC_UNITS_SQL}) AS ru
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY n_name
)
SELECT nation, ((2 * ru + 100) // 200)::DOUBLE / 100.0 AS revenue FROM s
""",
    doc=(
        "TPC-H Q5: 6-way join; nation/region/supplier broadcast,"
        " fact-fact shuffle on orderkey. Nation-level revenue sums exact"
        " integer discount units (few groups x ~1/5 of the fact table"
        " each -- the accumulation-order wobble class, see module"
        " docstring)."
    ),
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(
            t.orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("ru", _disc_units())
        .groupBy(F.col("n_name").alias("nation"))
        .agg(*_split_sums("ru"))
        .select("nation", _units_to_money(_recombined("ru"), 100).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q06 forecast revenue (TPC-H Q6 shape)
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle="""
WITH s AS (
  SELECT sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(round(l_discount * 100) AS HUGEINT)) AS ru,
         count(*) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND l_discount BETWEEN 0.05 AND 0.07
    AND l_quantity < 24
)
SELECT ((2 * ru + 100) // 200)::DOUBLE / 100.0 AS revenue, n_items FROM s
""",
    doc=(
        "TPC-H Q6: pure scan+filter+scalar agg; all predicates push to"
        " parquet. Single-group whole-table sum = the accumulation-order"
        " wobble class -> exact integer units (module docstring)."
    ),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .withColumn(
            "ru", _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount"))
        )
        .agg(
            *_split_sums("ru"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(_units_to_money(_recombined("ru"), 100).alias("revenue"), "n_items")
    )


# ---------------------------------------------------------------------------
# q10 returned items (TPC-H Q10 shape)
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey AS custkey, c_name AS name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name AS nation
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue per customer, top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= _ts("1997-01-01"))
                & (F.col("o_orderdate") < _ts("1997-07-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY 2.9: no reference counterpart; Spark builtins)
# ---------------------------------------------------------------------------
@register(
    "w01_order_rank_lag",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       lag(o_orderkey)  OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="row_number/rank/lag/lead over per-customer order history.",
)
def w01_order_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "w02_running_customer_spend",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend
FROM orders
""",
    doc="Running (cumulative) sum window per customer.",
)
def w02_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "w03_top3_orders_per_customer",
    oracle="""
SELECT custkey, orderkey, rn FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    doc="Top-k-per-group via ranked window (the scalable top-k pattern).",
)
def w03_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t.orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@register(
    "s01_union_all",
    oracle="""
SELECT o_orderkey AS orderkey, o_orderstatus AS status FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 300000
""",
    doc="UNION ALL (reference: array_merge page accumulation, APIHelper.php:60,96).",
)
def s01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    a = t.orders.filter(F.col("o_orderstatus") == "F")
    b = t.orders.filter(F.col("o_totalprice") > 300000)
    return a.unionByName(b).select(
        F.col("o_orderkey").alias("orderkey"), F.col("o_orderstatus").alias("status")
    )


@register(
    "s02_intersect_except",
    oracle="""
SELECT 'both' AS side, c_custkey AS custkey FROM (
  SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'customer_only' AS side, c_custkey FROM (
  SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders
)
""",
    doc="INTERSECT / EXCEPT distinct-set semantics.",
)
def s02_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t.customer.select("c_custkey")
    ocust = t.orders.select(F.col("o_custkey").alias("c_custkey"))
    both = cust.intersect(ocust).select(F.lit("both").alias("side"), F.col("c_custkey").alias("custkey"))
    only = cust.exceptAll(ocust.distinct()).distinct().select(
        F.lit("customer_only").alias("side"), F.col("c_custkey").alias("custkey")
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# ---------------------------------------------------------------------------
@register(
    "g01_rollup_status_priority",
    oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS HUGEINT))::DOUBLE / 100.0 AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc=(
        "ROLLUP hierarchy totals; the grand-total row sums the whole"
        " orders table -> exact cents (module docstring)."
    ),
)
def g01_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t.orders.withColumn("tc", _cents(F.col("o_totalprice")))
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *_split_sums("tc"),
        )
        .withColumn(
            "total", F.expr(f"CAST({_recombined('tc')} AS DOUBLE) / 100.0")
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n_orders",
            "total",
        )
    )


@register(
    "g02_cube_returnflag_linestatus",
    oracle="""
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE over two low-cardinality dims.",
)
def g02_cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "sum_qty",
        )
    )


@register(
    "g03_pivot_status_by_segment",
    oracle="""
SELECT c_mktsegment AS segment,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="PIVOT expressed as conditional aggregation in the oracle.",
)
def g03_pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    joined = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "segment",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
        )
    )


# ---------------------------------------------------------------------------
# JSON functions (SURVEY 2.9) over events.props
# ---------------------------------------------------------------------------
@register(
    "j01_json_extract_events",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
""",
    doc="JSON field extraction + group (props is a JSON string column).",
)
def j01_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t.events.withColumn(
            "k_value", F.get_json_object("props", "$.k").cast("bigint")
        )
        .groupBy("k_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time tumbling window (batch form of the streaming agg, SURVEY 2.7)
# ---------------------------------------------------------------------------
@register(
    "t01_tumbling_window_events",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="1-hour tumbling event-time window; same agg runs under Structured Streaming (streaming/events.py).",
)
def t01_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# As-of join (no Spark builtin): last signup before each purchase, per user.
# Implemented scalably as union + last(ignorenulls) over an event-time
# window -- one shuffle on user_id, no range explosion.
# ---------------------------------------------------------------------------
@register(
    "a01_asof_join_purchase_signup",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id  AS user_id,
       s.event_id AS signup_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    doc="As-of join via union + last() window; DuckDB oracle uses native ASOF JOIN.",
)
def a01_asof_join_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t.events.select("event_id", "ts", "user_id", "event_type").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    # Tag rows; signups sort before purchases at identical ts so ties
    # (p.ts >= s.ts) match ASOF semantics.
    tagged = ev.withColumn(
        "is_signup", (F.col("event_type") == "signup").cast("int")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_signup").desc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = tagged.withColumn(
        "signup_id",
        F.last(
            F.when(F.col("is_signup") == 1, F.col("event_id")), ignorenulls=True
        ).over(w),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("signup_id"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based windows) -- streaming-shaped, batch-checkable
# ---------------------------------------------------------------------------
@register(
    "a02_sessionize_events",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sessions GROUP BY user_id, session_id
""",
    doc="Gap-based sessionization (30-min inactivity) via lag + running sum.",
)
def a02_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    # TIMESTAMP_NTZ has no direct double cast; go via instant (session TZ
    # is pinned UTC in configure(), so this stays wall-clock deterministic).
    secs = F.col("ts").cast("timestamp").cast("double")
    prev_secs = F.lag(F.col("ts")).over(w_order).cast("timestamp").cast("double")
    gap = secs - prev_secs
    marked = t.events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        marked.withColumn("session_id", F.sum("is_new").over(w_run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


# ---------------------------------------------------------------------------
# q04 -- EXISTS semi-join on late-shipped lineitems (TPC-H Q4 shape)
# ---------------------------------------------------------------------------
@register(
    "q04_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    doc=(
        "TPC-H Q4 shape (shipdate-lag EXISTS; the test tables lack "
        "commit/receipt dates): EXISTS plans as LEFT SEMI join -- the "
        "probe side never duplicates order rows however many lineitems match."
    ),
)
def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t.orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q07 -- bilateral nation volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------
@register(
    "q07_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name < cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
    doc=(
        "TPC-H Q7 shape: big fact-fact join (lineitem x orders) shuffles on "
        "orderkey; every dim (supplier/customer/nation x2) broadcasts. "
        "Grouping keys are low-cardinality -> map-side partial agg collapses "
        "the shuffle. Revenue summed in exact integer 1/100-cents: with 2090 "
        "output groups, double-summation order noise WILL flip a cent "
        "somewhere -- integer sums are order-independent."
    ),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier", "customer", "nation"])
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
                )
                / 10000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q08 -- market share via conditional aggregation (TPC-H Q8 shape)
# ---------------------------------------------------------------------------
@register(
    "q08_market_share",
    oracle="""
WITH rev AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN region  ON sn.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'CHINA' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM rev GROUP BY o_year
""",
    doc=(
        "TPC-H Q8 shape: market share = conditional-sum / sum in ONE "
        "aggregation pass -- no second join or self-union to compute the "
        "numerator."
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier", "nation", "region"])
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "CHINA", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q09 -- product profit by nation/year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------
@register(
    "q09_product_profit",
    oracle="""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
           - 6 * CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(l_shipdate)
""",
    doc=(
        "TPC-H Q9 shape (no partsupp table: supplycost modeled as "
        "0.6*p_retailprice): part/supplier/nation all broadcast; the only "
        "shuffle is the final low-cardinality group-by. Profit summed in "
        "exact integer 1/100-cents (order-independent across engines)."
    ),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    profit_e4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    ) - 6 * F.round(F.col("p_retailprice") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("p_name").like("%a%"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg((F.sum(profit_e4) / 10000.0).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q14 -- promo revenue share (TPC-H Q14 shape)
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
""",
    doc="TPC-H Q14 shape: broadcast part join + single conditional-agg pass.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-02-01"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q18 -- large-quantity orders via agg-then-semi-join (TPC-H Q18 shape)
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_name, o_orderkey AS orderkey, o_orderdate AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON lineitem.l_orderkey = o_orderkey
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
""",
    doc=(
        "TPC-H Q18 shape: HAVING pre-aggregation shrinks the key set "
        "BEFORE the joins (semi-join on the aggregated ids), so the wide "
        "join only sees qualifying orders."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer", "lineitem"])
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("big_key"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "orderkey", "orderdate",
            F.round("o_totalprice", 2).alias("totalprice"), "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# q19 -- disjunctive pushdown predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_predicates",
    oracle=f"""
WITH s AS (
  SELECT sum({_DISC_UNITS_SQL}) AS ru
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
     OR (p_brand = 'Brand#5'  AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15)
     OR (p_type  = 'PROMO'    AND l_quantity >= 30)
)
SELECT ((2 * ru + 100) // 200)::DOUBLE / 100.0 AS revenue FROM s
""",
    doc=(
        "TPC-H Q19 shape: disjunctive mixed-table predicates -- Catalyst "
        "still pushes the part-only disjuncts below the join as a "
        "partial filter. Single-group revenue sums exact integer "
        "discount units (module docstring)."
    ),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = (
        ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 15))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 30))
    )
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .withColumn("ru", _disc_units())
        .agg(*_split_sums("ru"))
        .select(_units_to_money(_recombined("ru"), 100).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q22 -- scalar subquery + anti join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment AS segment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
""",
    doc=(
        "TPC-H Q22 shape: scalar-subquery threshold (computed once, "
        "broadcast as a literal-ish 1-row plan) + LEFT ANTI join for "
        "customers with no orders."
    ),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        t.customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            t.orders.filter(F.col("o_orderdate") >= _ts("2000-01-01")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# a03 -- range join: events inside each order's 7-day window
# ---------------------------------------------------------------------------
@register(
    "a03_range_join_order_events",
    oracle="""
WITH anchored AS (
  SELECT o_orderkey, o_custkey,
         TIMESTAMP '2024-01-01' + INTERVAL 1 DAY * (o_orderkey % 24) AS w_start
  FROM orders
)
SELECT o_orderkey AS orderkey,
       count(*) AS n_events,
       round(sum(value), 2) AS event_value
FROM anchored
JOIN events ON user_id = o_custkey % 150
           AND ts >= w_start
           AND ts < w_start + INTERVAL 3 DAY
GROUP BY o_orderkey
""",
    doc=(
        "Range join (equi key + time interval) via DAY-BUCKETING with"
        " AGGREGATE PUSHDOWN and WINDOW CANONICALIZATION. Two levels:"
        " (1) the event side pre-aggregates to (user, day) partials --"
        " legal because every window starts at midnight and spans whole"
        " days, so day-bucket membership IS the range predicate (windows"
        " not day-aligned would keep the two boundary days row-level and"
        " pre-aggregate only the interior). (2) The order side's window"
        " is a pure function of o_orderkey % 24, so only 24 DISTINCT"
        " windows exist: the day partials roll up once per (window"
        " offset, user) -- a |windows| x |users| table -- and orders"
        " probe it with a broadcast hash join. The probe returns at most"
        " one row per order, so there is NO per-order aggregate and the"
        " fact table (orders) is NEVER shuffled: the only exchanges in"
        " the plan are the two tiny partial-aggregate shuffles on the"
        " event side. At 100 TB that is the interval-join layout that"
        " survives: events collapse once, windows canonicalize"
        " (daily/weekly windows repeat massively in real workloads), and"
        " the scan-heavy side stays map-only."
    ),
)
def a03_range_join_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "events"])
    base = F.lit("2024-01-01").cast("timestamp_ntz")
    # (user, day) partials: count + value sum re-aggregate losslessly
    day_agg = t.events.groupBy(
        F.col("user_id"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv"))
    # 24 distinct windows x 3 covered days each -> roll the day partials
    # up to (offset, user) window totals; rounding here equals rounding
    # per order because each order owns exactly one window
    offsets = spark.range(24).select(
        F.col("id").alias("offset"),
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("d"),
    )
    win_agg = (
        offsets.join(
            F.broadcast(day_agg),
            day_agg["day"]
            == F.to_date(base + (F.col("offset") + F.col("d")) * F.expr("INTERVAL 1 DAY")),
        )
        .groupBy("offset", "user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("event_value"),
        )
    )
    return t.orders.select("o_orderkey", "o_custkey").join(
        F.broadcast(win_agg),
        (F.col("o_orderkey") % 24 == F.col("offset"))
        & (F.col("o_custkey") % 150 == F.col("user_id")),
    ).select(
        F.col("o_orderkey").alias("orderkey"),
        "n_events",
        "event_value",
    )


# ---------------------------------------------------------------------------
# g04 -- GROUPING SETS with grouping_id (SQL surface passthrough)
# ---------------------------------------------------------------------------
@register(
    "g04_grouping_sets",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS HUGEINT))::DOUBLE / 100.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc=(
        "GROUPING SETS via the engine's SQL passthrough (SURVEY section 2.9"
        " free tier): three groupings in ONE shuffle pass (Spark expands"
        " sets map-side), not three scans unioned. The () set sums the"
        " whole orders table -> exact cents (module docstring)."
    ),
)
def g04_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    t.orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        f"""
        SELECT status, priority, n_orders,
               CAST(CAST(tc_hi AS DECIMAL(38,0)) * {_SPLIT} + tc_lo
                    AS DOUBLE) / 100.0 AS total
        FROM (
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 count(*) AS n_orders,
                 sum(tc % {_SPLIT}) AS tc_lo,
                 sum(tc div {_SPLIT}) AS tc_hi
          FROM (SELECT o_orderstatus, o_orderpriority,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS tc
                FROM orders_v)
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        )
        """
    )


# ---------------------------------------------------------------------------
# s03 -- INTERSECT ALL / EXCEPT ALL (bag semantics)
# ---------------------------------------------------------------------------
@register(
    "s03_bag_set_ops",
    oracle="""
WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
     b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
     i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
     e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
SELECT 'intersect_all' AS op, count(*) AS n, count(DISTINCT k) AS n_distinct FROM i
UNION ALL
SELECT 'except_all', count(*), count(DISTINCT k) FROM e
""",
    doc=(
        "INTERSECT ALL / EXCEPT ALL: bag (multiplicity-aware) set ops --"
        " Spark plans these as aggregate-count + generate, one shuffle each,"
        " never a row-by-row comparison."
    ),
)
def s03_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    a = t.orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    i = a.intersectAll(b).agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("k").alias("n_distinct")
    ).select(F.lit("intersect_all").alias("op"), "n", "n_distinct")
    e = a.exceptAll(b).agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("k").alias("n_distinct")
    ).select(F.lit("except_all").alias("op"), "n", "n_distinct")
    return i.unionByName(e)


# ---------------------------------------------------------------------------
# w04 -- RANGE window frame over event time (30-day trailing spend)
# ---------------------------------------------------------------------------
@register(
    "w04_trailing_spend_range_frame",
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
         AS trailing_30d_spend
FROM orders
""",
    doc=(
        "RANGE window frame keyed on event time (not rows): 30-day trailing"
        " spend per customer. One shuffle on the partition key; the frame is"
        " evaluated with a sliding aggregate inside the sorted partition."
    ),
)
def w04_trailing_spend_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    # orders timestamps are midnight-aligned, so an epoch-DAY ordering key
    # makes the 30-day RANGE frame identical to the SQL INTERVAL frame
    epoch_days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = W.partitionBy("o_custkey").orderBy(epoch_days).rangeBetween(-30, 0)
    return t.orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------------------
# p01 -- exact percentiles (+ approx twin is rows-only below)
# ---------------------------------------------------------------------------
@register(
    "p01_percentiles_exact",
    oracle="""
SELECT o_orderpriority AS priority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95
FROM orders GROUP BY o_orderpriority
""",
    doc=(
        "Exact percentiles per group (percentile_cont interpolation --"
        " identical definition in Spark and DuckDB). Exact percentile needs"
        " the group sorted; the approx twin below is the 100 TB path."
    ),
)
def p01_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    return t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
    )


@register(
    "p02_percentiles_approx",
    oracle="""
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       TRUE AS sketch_ok
FROM orders GROUP BY o_orderpriority
""",
    doc=(
        "approx_percentile (KLL-style sketch): mergeable, bounded-memory --"
        " the percentile that scales, and the plan that is BENCHED. The"
        " sketch values differ per engine, so they cannot be hash-compared"
        " directly; this entry checks the deterministic invariants instead"
        " (approx_percentile returns a member of the group, so p50/p95 lie"
        " in [min, max] and p50 <= p95 -- min/max are mergeable aggs, fine"
        " at 100 TB) while the 5%-epsilon check against the exact"
        " percentile lives in p02_percentiles_approx_check, which is NOT"
        " benched (its exact percentile() needs the full group sort that"
        " does not exist at the 100 TB design point). One array-percentile"
        " call builds a single sketch for both quantiles."
    ),
)
def p02_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    agg = t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5D, 0.95D), 10000)"
        ).alias("_ap"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("_lo"),
        F.max("o_totalprice").alias("_hi"),
    )
    p50, p95 = F.col("_ap")[0], F.col("_ap")[1]
    return agg.select(
        "priority",
        "n_orders",
        (
            (p50 >= F.col("_lo")) & (p95 <= F.col("_hi")) & (p50 <= p95)
        ).alias("sketch_ok"),
    )


@register(
    "p02_percentiles_approx_check",
    oracle="""
SELECT o_orderpriority AS priority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95_exact,
       CAST(0 AS BIGINT) AS err_over_bound,
       TRUE AS within_bounds
FROM orders GROUP BY o_orderpriority
""",
    doc=(
        "Epsilon-check twin of p02_percentiles_approx: one agg produces"
        " sketch and exact side by side and asserts both percentile errors"
        " <= 5% relative (accuracy=10000 keeps true error far below that)."
        " err_over_bound = 0 when rel_err <= 0.05 else floor(rel_err /"
        " 0.05): 0 everywhere within bounds, and the multiple of the bound"
        " on a breach, so the diff shows the magnitude. Both columns"
        " derive from the SAME <= comparison, so a boundary-exact error"
        " (rel_err == 0.05 gives floor = 1 but within_bounds TRUE) cannot"
        " split them (ADVICE r5; r4: a finer rounding would silently"
        " re-tighten the tolerance). Exists for falsifiability only; NOT"
        " benched -- the exact percentile() full-sort path is exactly what"
        " the approx entry removes at 100 TB."
    ),
)
def p02_percentiles_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    agg = t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("_p50_ex"),
        F.expr("percentile(o_totalprice, 0.95)").alias("_p95_ex"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.5D, 0.95D), 10000)"
        ).alias("_ap"),
    )
    agg = agg.select(
        "priority", "_p50_ex", "_p95_ex",
        F.col("_ap")[0].alias("_p50_ap"), F.col("_ap")[1].alias("_p95_ap"),
    )
    rel_err = lambda ap, ex: F.abs(F.col(ap) - F.col(ex)) / F.abs(F.col(ex))
    max_err = F.greatest(
        rel_err("_p50_ap", "_p50_ex"), rel_err("_p95_ap", "_p95_ex")
    )
    return agg.select(
        "priority",
        F.round(F.col("_p50_ex"), 4).alias("p50_exact"),
        F.round(F.col("_p95_ex"), 4).alias("p95_exact"),
        # derived from the SAME comparison as within_bounds (<=), not a
        # bare floor(err/bound): floor alone reads 1 at a boundary-exact
        # rel_err == 0.05 while within_bounds reads TRUE, and the oracle
        # pins the in-bounds pair to exactly (0, TRUE)
        F.when(max_err <= 0.05, F.lit(0))
        .otherwise(F.floor(max_err / 0.05))
        .cast("bigint")
        .alias("err_over_bound"),
        (max_err <= 0.05).alias("within_bounds"),
    )


# ---------------------------------------------------------------------------
# t02 -- multi-resolution rollup (continuous-aggregate / hypertable pattern)
# ---------------------------------------------------------------------------
@register(
    "t02_multires_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', h) AS DATE) AS day, event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(v), 2) AS total_value
FROM hourly GROUP BY 1, 2
""",
    doc=(
        "Multi-resolution rollup (the hypertable / continuous-aggregate"
        " pattern): daily aggregates REAGGREGATED from hourly partials, not"
        " recomputed from raw -- count/sum are mergeable, so the day level"
        " reads ~24x fewer rows. At 100 TB the hourly table is the"
        " materialized continuous aggregate the day/week/month levels fold."
    ),
)
def t02_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    hourly = t.events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    return (
        hourly.groupBy(F.date_trunc("day", "h").cast("date").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(F.sum("v"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# a04 -- funnel analysis: signup -> purchase conversion within 7 days
# ---------------------------------------------------------------------------
@register(
    "a04_funnel_conversion",
    oracle="""
WITH first_signup AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), converted AS (
  SELECT s.user_id, s.signup_ts,
         min(p.ts) AS first_purchase_ts
  FROM first_signup s
  LEFT JOIN events p ON p.user_id = s.user_id
    AND p.event_type = 'purchase'
    AND p.ts > s.signup_ts
    AND p.ts <= s.signup_ts + INTERVAL 7 DAY
  GROUP BY s.user_id, s.signup_ts
)
SELECT CAST(date_trunc('day', signup_ts) AS DATE) AS cohort_day,
       count(*) AS n_users,
       count(first_purchase_ts) AS n_converted,
       round(count(first_purchase_ts)::DOUBLE / count(*), 6) AS conversion
FROM converted GROUP BY 1
""",
    doc=(
        "Funnel analysis (signup -> purchase within 7 days, by signup-day"
        " cohort): first-touch agg, then an equi+range join back to the"
        " event stream, then cohort rollup. The event-sequence pattern"
        " every product-analytics engine ships; the per-user first-touch"
        " agg shrinks the join probe side to one row per user."
    ),
)
def a04_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    first_signup = (
        t.events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_signup.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAY")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return (
        converted.groupBy(
            F.date_trunc("day", "signup_ts").cast("date").alias("cohort_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("first_purchase_ts").alias("n_converted"),
            F.round(
                F.count("first_purchase_ts").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion"),
        )
    )


# ---------------------------------------------------------------------------
# q12 shipping modes vs priority (TPC-H Q12 shape, shipmode synthesized)
# ---------------------------------------------------------------------------
@register(
    "q12_shipmode_priority",
    oracle="""
WITH l AS (
  SELECT l_orderkey,
         ['MAIL', 'SHIP', 'TRUCK'][CAST(l_suppkey % 3 AS INTEGER) + 1] AS shipmode,
         l_shipdate
  FROM lineitem
)
SELECT shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM l JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY shipmode
""",
    doc=(
        "TPC-H Q12 shape: late-shipment counts by ship mode split into"
        " high/low priority (conditional aggregation after a fact-fact"
        " join). The testdata carries no shipmode column, so it is"
        " synthesized deterministically from l_suppkey on both engines."
        " Scale: the orders join is key-partitioned; the CASE aggregation"
        " is map-side partial."
    ),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    modes = F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("TRUCK"))
    l = t.lineitem.select(
        "l_orderkey",
        F.element_at(modes, (F.col("l_suppkey") % 3).cast("int") + 1).alias("shipmode"),
        "l_shipdate",
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13 customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
""",
    doc=(
        "TPC-H Q13 shape: order-count-per-customer histogram via LEFT"
        " OUTER join with an ON-clause filter (customers with zero"
        " qualifying orders land in bucket 0 -- the outer join semantics"
        " the inner-join formulation silently loses). Two aggregations,"
        " both map-side partial; the second input is one row per customer."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c_orders = (
        t.customer.join(
            t.orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q15 top supplier by quarterly revenue (TPC-H Q15 shape)
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc=(
        "TPC-H Q15 shape: revenue view over a date window, then the"
        " supplier(s) hitting the global max (scalar subquery against the"
        " same aggregate -- Catalyst reuses the exchange rather than"
        " recomputing the view). Rounding before the max comparison keeps"
        " the float tie exact across engines."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        t.supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q17 small-quantity-order revenue (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey, 0.2 * avg(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
), s AS (
  SELECT sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS cs
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN avg_qty ON ap_partkey = l_partkey
  WHERE p_brand = 'Brand#23' AND l_quantity < threshold
)
SELECT ((2 * cs + 7) // 14)::DOUBLE / 100.0 AS avg_yearly FROM s
""",
    doc=(
        "TPC-H Q17 shape: per-part average-quantity threshold (correlated"
        " subquery rewritten as an aggregate join -- the form Catalyst"
        " plans as one shuffle on l_partkey reused by both sides), then"
        " revenue of below-threshold lines for one brand. The brand filter"
        " pushes to the part scan and broadcasts. The threshold avg stays"
        " float (integer-valued quantity sums are EXACT in doubles, so it"
        " is bit-identical cross-engine); the money sum is the wobble"
        " class and uses exact cents (module docstring)."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    avg_qty = t.lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    brand = t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("cs"))
        .select(
            (F.expr("(2 * cs + 7) DIV 14").cast("double") / 100.0).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# q21 suppliers who kept orders waiting (TPC-H Q21 shape)
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 75 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
""",
    doc=(
        "TPC-H Q21 shape: the sole late supplier on multi-supplier"
        " finished orders -- one semi join (another supplier exists) plus"
        " one anti join (no OTHER late supplier), the classic"
        " EXISTS/NOT-EXISTS pair. Lateness is derived from"
        " l_shipdate - o_orderdate (the testdata has no commit/receipt"
        " dates). Both correlated subqueries plan as joins on l_orderkey,"
        " co-partitioned with the probe."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    l = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 75)).alias("late"),
        )
    )
    l1 = l.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    other = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = l.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        l1.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "anti",
        )
    )
    return (
        waiting.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "a05_retention_cohorts",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, c.cohort_day, e.day - c.cohort_day AS offset_days
  FROM e JOIN cohort c USING (user_id)
), csize AS (
  SELECT cohort_day, count(*) AS n_cohort FROM cohort GROUP BY cohort_day
)
SELECT a.cohort_day, a.offset_days,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(s.n_cohort AS BIGINT) AS n_cohort,
       CAST((1000 * count(*)) // s.n_cohort AS BIGINT) AS retention_milli
FROM act a JOIN csize s USING (cohort_day)
GROUP BY a.cohort_day, a.offset_days, s.n_cohort
""",
    doc=(
        "Retention cohort matrix (the other half of product analytics"
        " next to a04's conversion funnel): users cohorted by FIRST-seen"
        " epoch day; for every (cohort_day, day-offset) cell, the count"
        " of distinct cohort members active that day and the per-mille"
        " retention vs the cohort size (integer division -- cross-engine"
        " float-free). Day 0 retention is 1000 by construction. Plan:"
        " per-user first-touch is one hash aggregation; the join back to"
        " the event stream is user-keyed (the first-touch side is one"
        " row per user -- no fanout); per-cell distinct collapses"
        " (user, cohort, offset) map-side before the cell count; cohort"
        " sizes (rows = number of days) broadcast back. Every stage is a"
        " hash agg or a user-keyed shuffle join -- corpus-linear; no"
        " window, no global sort. At 100 TB the user-keyed join is the"
        " only real shuffle and AQE handles hot users."
    ),
)
def a05_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    day = (
        F.floor(F.col("ts").cast("timestamp").cast("double") / F.lit(86400.0))
        .cast("bigint")
        .alias("day")
    )
    e = t.events.select("user_id", day)
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("offset_days"),
        )
        .distinct()
    )
    csize = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        act.groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(csize), "cohort_day")
        .select(
            "cohort_day",
            "offset_days",
            "n_active",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.expr("CAST((1000 * n_active) DIV n_cohort AS BIGINT)").alias(
                "retention_milli"
            ),
        )
    )


@register(
    "d01_scd2_customer_merge",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
), upd AS (
  SELECT c_custkey, 'MOVED-' || c_mktsegment AS c_mktsegment,
         c_acctbal + 100.0 AS c_acctbal
  FROM dim WHERE c_custkey % 7 = 3
), ins AS (
  SELECT c_custkey + 1000000 AS c_custkey, 'NEW' AS c_mktsegment,
         0.0 AS c_acctbal
  FROM dim WHERE c_custkey % 13 = 1
), unchanged AS (
  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
         CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
         true AS is_current
  FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM upd)
), closed AS (
  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
         CAST(0 AS BIGINT), CAST(1 AS BIGINT), false
  FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM upd)
), fresh AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(1 AS BIGINT), CAST(NULL AS BIGINT), true
  FROM upd
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(1 AS BIGINT), CAST(NULL AS BIGINT), true
  FROM ins
)
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
       valid_from, valid_to, is_current
FROM (SELECT * FROM unchanged UNION ALL SELECT * FROM closed
      UNION ALL SELECT * FROM fresh)
""",
    doc=(
        "SCD Type-2 dimension merge (the warehouse MERGE the reference's"
        " one-row-at-a-time upsert loop approximates -- APIHelper.php"
        " create-or-update): apply a deterministic update batch (segment"
        " moves, balance adjustments) plus an insert batch to the"
        " customer dimension, producing validity-interval history rows --"
        " changed keys close their old row (valid_to = batch day) and"
        " open a current one, unchanged keys pass through, inserts open"
        " at the batch day. Plan: the update-key set is tiny next to the"
        " dimension, so change detection is a BROADCAST semi/anti join"
        " pair against the one dim scan + a unionByName of the three"
        " legs -- zero shuffles of the dimension itself. At 100 TB this"
        " is exactly how a Delta/Iceberg MERGE plans its matched/"
        "not-matched branches; the engine expresses it in pure"
        " DataFrame ops with the history contract oracle-checked."
    ),
)
def d01_scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    dim = t.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    upd = dim.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey",
        F.concat(F.lit("MOVED-"), F.col("c_mktsegment")).alias("c_mktsegment"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
    )
    ins = dim.filter(F.col("c_custkey") % 13 == 1).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    ukeys = F.broadcast(upd.select("c_custkey"))
    vf0 = F.lit(0).cast("bigint").alias("valid_from")
    vnull = F.lit(None).cast("bigint").alias("valid_to")
    unchanged = dim.join(ukeys, "c_custkey", "left_anti").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        vf0, vnull, F.lit(True).alias("is_current"),
    )
    closed = dim.join(ukeys, "c_custkey", "left_semi").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        vf0, F.lit(1).cast("bigint").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    fresh = upd.unionByName(ins).select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit(1).cast("bigint").alias("valid_from"), vnull,
        F.lit(True).alias("is_current"),
    )
    return (
        unchanged.unionByName(closed)
        .unionByName(fresh)
        .select(
            "c_custkey", "c_mktsegment",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "valid_from", "valid_to", "is_current",
        )
    )


_PROF_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
_PROF_STR = ["l_returnflag", "l_linestatus"]


def _prof_leg_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"round(min({col}), 6)", f"round(max({col}), 6)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "day":
        mn = f"CAST(floor(epoch(min({col})) / 86400) AS DOUBLE)"
        mx = f"CAST(floor(epoch(max({col})) / 86400) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms, xs = f"min({col})", f"max({col})"
    return f"""
  SELECT '{col}' AS col_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({col}) AS BIGINT) AS n_null,
         CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         {ms} AS min_str, {xs} AS max_str
  FROM lineitem"""


@register(
    "p03_profile_lineitem",
    oracle=" UNION ALL ".join(
        [_prof_leg_sql(c, "num") for c in _PROF_NUM]
        + [_prof_leg_sql(c, "str") for c in _PROF_STR]
        + [_prof_leg_sql("l_shipdate", "day")]
    ),
    doc=(
        "One-row-per-column data profile of the fact table (the Deequ/"
        "dbt-style quality gate a pipeline runs before trusting a"
        " snapshot): row count, null count, EXACT distinct count, and"
        " type-appropriate min/max (numerics rounded, strings"
        " lexicographic, timestamps as epoch day). Plan: one leg per"
        " column, each a column-PRUNED scan feeding groupBy(col) then a"
        " 1-row rollup -- the two-hash-agg exact-distinct shape, NEVER"
        " the Expand-based multi-count(DISTINCT) single pass (the r1"
        " TF-IDF trap: Expand multiplies the scan by the column count in"
        " one shuffle). Legs union to a 6-row frame. At 100 TB each leg"
        " is an independent column-linear pass over one column's pages"
        " -- parquet column pruning makes the whole profile cost ~one"
        " full-table scan; the HLL-sketch variant is the cheaper"
        " scale path but is engine-specific, so the certified profile"
        " is exact."
    ),
)
def p03_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])

    def leg(col: str, kind: str) -> DataFrame:
        src = t.lineitem
        if kind == "day":
            src = src.select(
                F.floor(
                    F.col(col).cast("timestamp").cast("double") / F.lit(86400.0)
                ).alias(col)
            )
        g = src.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        isnum = kind in ("num", "day")
        rounded = (
            F.round(F.min(col), 6) if kind == "num" else F.min(col).cast("double")
        )
        rounded_max = (
            F.round(F.max(col), 6) if kind == "num" else F.max(col).cast("double")
        )
        return g.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col(col).isNull(), F.col("cnt"))), F.lit(0)
            ).cast("bigint").alias("n_null"),
            F.count(F.when(F.col(col).isNotNull(), 1)).cast("bigint").alias(
                "n_distinct"
            ),
            (rounded if isnum else F.lit(None).cast("double")).alias("min_num"),
            (rounded_max if isnum else F.lit(None).cast("double")).alias("max_num"),
            (F.min(col) if not isnum else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.max(col) if not isnum else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        ).select(F.lit(col).alias("col_name"), "*")

    legs = (
        [leg(c, "num") for c in _PROF_NUM]
        + [leg(c, "str") for c in _PROF_STR]
        + [leg("l_shipdate", "day")]
    )
    out = legs[0]
    for other in legs[1:]:
        out = out.unionByName(other)
    return out


@register(
    "p03_profile_approx_check",
    oracle=" UNION ALL ".join(
        f"""
  SELECT '{c}' AS col_name,
         CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct_exact,
         CAST(0 AS BIGINT) AS err_over_bound,
         TRUE AS within_bounds
  FROM lineitem"""
        for c in _PROF_NUM + _PROF_STR
    ),
    doc=(
        "Epsilon-check twin of p03_profile_lineitem's scale path: per"
        " column, HLL++ approx_count_distinct (rsd=0.02) next to the"
        " exact distinct, certified within the 8% envelope (4x rsd, the"
        " q_distinct_users_approx_check tolerance). The profiler a 100 TB"
        " snapshot actually runs swaps the exact two-hash-agg legs for"
        " these mergeable sketches -- this entry exists to keep that swap"
        " falsifiable. err_over_bound derives from the SAME <= comparison"
        " as within_bounds, so a boundary-exact error cannot split the"
        " pair. Per-column pruned legs as in the exact profile; NOT"
        " benched (the exact twin's distinct shuffle is what the sketch"
        " removes at scale)."
    ),
)
def p03_profile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])

    def leg(col: str) -> DataFrame:
        agg = t.lineitem.agg(
            F.countDistinct(col).alias("n_distinct_exact"),
            F.approx_count_distinct(col, rsd=0.02).alias("_n_ap"),
        )
        rel_err = F.abs(F.col("_n_ap") - F.col("n_distinct_exact")) / F.col(
            "n_distinct_exact"
        )
        return agg.select(
            F.lit(col).alias("col_name"),
            F.col("n_distinct_exact").cast("bigint").alias("n_distinct_exact"),
            F.when(rel_err <= 0.08, F.lit(0))
            .otherwise(F.floor(rel_err / 0.08))
            .cast("bigint")
            .alias("err_over_bound"),
            (rel_err <= 0.08).alias("within_bounds"),
        )

    legs = [leg(c) for c in _PROF_NUM + _PROF_STR]
    out = legs[0]
    for other in legs[1:]:
        out = out.unionByName(other)
    return out


@register(
    "s04_full_outer_ship_reconciliation",
    oracle="""
WITH o AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         count(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS day,
         count(*) AS n_ship_lines
  FROM lineitem GROUP BY 1
)
SELECT coalesce(o.day, l.day) AS day,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(l.n_ship_lines, 0) AS BIGINT) AS n_ship_lines,
       CASE WHEN o.day IS NOT NULL AND l.day IS NOT NULL THEN 'both'
            WHEN o.day IS NOT NULL THEN 'orders_only'
            ELSE 'ship_only' END AS status
FROM o FULL OUTER JOIN l ON o.day = l.day
""",
    doc=(
        "FULL OUTER reconciliation (the join type the rest of the"
        " catalog's inner/left/semi/anti surface lacks): per epoch-day"
        " order intake vs shipped lines, keeping days present on EITHER"
        " side with zero-coalesced counts and a both/orders_only/"
        "ship_only status -- the daily ops-reconciliation report shape."
        " Plan: BOTH sides collapse to per-day partials BEFORE the join"
        " (agg-then-join -- the scale form: a full outer of two raw fact"
        " tables would shuffle both in full; aggregated sides are"
        " day-cardinality), then one full-outer hash join on the day"
        " key. At 100 TB each side is one map-side-combining pass and"
        " the join input is rows-per-day, not rows-per-fact."
    ),
)
def s04_full_outer_ship_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])

    def day(col: str) -> F.Column:
        return (
            F.floor(F.col(col).cast("timestamp").cast("double") / F.lit(86400.0))
            .cast("bigint")
        )

    o = (
        t.orders.select(day("o_orderdate").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumnRenamed("day", "o_day")
    )
    l = (
        t.lineitem.select(day("l_shipdate").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_ship_lines"))
        .withColumnRenamed("day", "l_day")
    )
    j = o.join(l, o.o_day == l.l_day, "full_outer")
    return j.select(
        F.coalesce("o_day", "l_day").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("n_ship_lines", F.lit(0)).cast("bigint").alias("n_ship_lines"),
        F.when(
            F.col("o_day").isNotNull() & F.col("l_day").isNotNull(), F.lit("both")
        )
        .when(F.col("o_day").isNotNull(), F.lit("orders_only"))
        .otherwise(F.lit("ship_only"))
        .alias("status"),
    )


@register(
    "t03_hopping_window_events",
    oracle="""
SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         - k.k * INTERVAL '15 minutes' AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events, (SELECT unnest(range(4)) AS k) k
GROUP BY 1, 2
""",
    doc=(
        "1-hour HOPPING window sliding every 15 minutes (the overlapping-"
        "window family t01's tumbling windows lack): every event lands in"
        " exactly duration/slide = 4 windows, the moving-aggregate shape"
        " dashboards and rate monitors consume. Spark's window(ts, '1"
        " hour', '15 minutes') expands the 4 memberships map-side (an"
        " Expand of factor 4 -- bounded by the ratio, NOT by data) before"
        " one hash aggregation; the DuckDB oracle generates the same 4"
        " bucket starts per event arithmetically. Same agg runs under"
        " Structured Streaming with a watermark. At 100 TB the cost is"
        " exactly 4x the tumbling aggregation's shuffle -- a constant"
        " chosen by the slide ratio, never a blowup."
    ),
)
def t03_hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t.events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
