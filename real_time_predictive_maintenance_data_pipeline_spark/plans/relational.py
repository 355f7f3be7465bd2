"""Relational query catalog (SURVEY.md §2.2 surface).

The reference implements no relational operators (its only SQL is
``SELECT *`` at phase2-iot-kinesis.yaml:61); this module is the engine's
general query surface, expressed 100 % in idiomatic DataFrame API so
Catalyst gets full pushdown / pruning / join-reordering freedom. Every
query here has a DuckDB oracle and follows the parity conventions in
``registry.py`` (identical aliases, 4-decimal rounds, dates as strings,
timestamps as Unix micros).

Scale stance (100 TB): fact-fact joins (lineitem⋈orders) shuffle on the
join key and rely on AQE for skew; fixed-cardinality dims (region,
nation) are explicitly broadcast; top-k is expressed as orderBy+limit so
Spark plans TakeOrderedAndProject (no global sort materialization);
grouped top-k uses a single window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_seconds, epoch_us
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dstr(col: str):
    """Date column → 'yyyy-MM-dd' string (oracle-stable projection)."""
    return F.date_format(F.col(col), "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    bench=True,
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash agg.

    Scale: partial aggregation is map-side (4 group keys total), so the
    shuffle moves only |groups|×|partitions| rows; the shipdate filter
    pushes to the parquet scan.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "rel_agg_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(MIN(l_quantity), 4)          AS min_qty,
       ROUND(MAX(l_quantity), 4)          AS max_qty,
       ROUND(AVG(l_quantity), 4)          AS avg_qty,
       ROUND(STDDEV_SAMP(l_quantity), 4)  AS std_qty,
       COUNT(*)                           AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg",),
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev aggregates — all map-side-partial built-ins."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_quantity"), 4).alias("min_qty"),
            F.round(F.max("l_quantity"), 4).alias("max_qty"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "rel_agg_distinct",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey)  AS n_customers,
       COUNT(*)                   AS n_orders,
       SUM(ROUND(o_totalprice * 100)) / 100 AS revenue
FROM orders GROUP BY o_orderstatus
""",
    tags=("agg",),
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct alongside plain aggs (Spark expands to two-phase).

    Revenue sums exact integer cents (prices are 2-dp): at 1e10+ total
    magnitude a raw double sum's order-dependent error exceeds the 4-dp
    round, so the usual ROUND convention stops hash-matching — integral
    doubles sum exactly in any order and need no rounding at all."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100)) / 100).alias("revenue"),
        )
    )


@register(
    "rel_having",
    oracle="""
SELECT c_nationkey, ROUND(SUM(c_acctbal), 4) AS total_bal, COUNT(*) AS n
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 20
""",
    tags=("agg",),
)
def rel_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + post-aggregation filter (HAVING)."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 20)
    )


@register(
    "rel_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS rev
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("rev"),
        )
    )


@register(
    "rel_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rel_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("agg",),
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL path — DataFrame API has no direct op)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "rel_pivot_status",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg",),
)
def rel_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (one shuffle, no pivot pass)."""
    o = _t(spark, sf_dir, "orders")
    cnt = lambda s: F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))  # noqa: E731
    return o.groupBy("o_orderpriority").agg(
        cnt("O").alias("status_o"),
        cnt("F").alias("status_f"),
        cnt("P").alias("status_p"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    bench=True,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filter → 3-way join → agg → top-10.

    Scale: both filters push to the scans; customer⋈orders and
    orders⋈lineitem shuffle on their keys; final top-10 is
    TakeOrderedAndProject (no global sort).
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            _dstr("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    bench=True,
    tags=("join", "agg"),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table join, local-supplier constraint.

    Scale: region/nation are fixed-cardinality → explicit broadcast;
    supplier is small relative to facts → broadcast too (AQE would demote
    if it ever grew); the fact-fact join shuffles on orderkey.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "rel_join_inner",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 4) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("join",),
)
def rel_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with broadcast dim (nation: 25 rows, always)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@register(
    "rel_join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    tags=("join",),
)
def rel_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "rel_join_full",
    oracle="""
SELECT COALESCE(a.k, b.k) AS k, a.n_cust, b.n_ord
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
FULL OUTER JOIN
     (SELECT CAST(o_custkey % 30 AS INTEGER) AS k, COUNT(*) AS n_ord FROM orders GROUP BY 1) b
ON a.k = b.k
""",
    tags=("join",),
)
def rel_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nulls on both sides)."""
    a = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .groupBy((F.col("o_custkey") % 30).cast("int").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    return a.join(b, a.k == b.k, "full").select(
        F.coalesce(a.k, b.k).alias("k"), "n_cust", "n_ord"
    )


@register(
    "rel_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
    tags=("join",),
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — no row multiplication, build side deduped."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "rel_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
    tags=("join",),
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no large orders.

    (Filtered build side keeps the result non-empty at every sf — at
    sf0.01+ every customer has at least one order.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "rel_join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    tags=("join",),
)
def rel_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two broadcast-size dims (5 × 25 rows)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@register(
    "rel_range_join",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       COUNT(*) AS n_fast_ship
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
GROUP BY 1
""",
    tags=("join",),
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range predicate (BETWEEN on event-time columns)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate").between(
                F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            )
        )
        .groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_fast_ship"))
    )


@register(
    "rel_scalar_subquery",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""",
    tags=("join", "subquery"),
)
def rel_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (Catalyst plans a broadcast of 1 row)."""
    o = _t(spark, sf_dir, "orders")
    avg_price = o.select(F.avg("o_totalprice").alias("a"))
    return (
        o.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "rel_window_rank",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 4) AS acctbal,
         ROW_NUMBER()  OVER w AS rn,
         RANK()        OVER w AS rnk,
         DENSE_RANK()  OVER w AS drnk,
         NTILE(4)      OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
) WHERE rn <= 5
""",
    tags=("window",),
)
def rel_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one partition shuffle: top-5 customers/nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 4).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "rel_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
       ROUND(LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS prev_price,
       ROUND(LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS next_price
FROM orders
""",
    bench=True,
    tags=("window",),
)
def rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead — one shuffle on o_custkey serves all three."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            4,
        ).alias("running_spend"),
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
    )


@register(
    "rel_window_moving_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM events
""",
    tags=("window",),
)
def rel_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (4-row moving average) per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    )


@register(
    "rel_topk_global",
    oracle="""
SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
    tags=("topk",),
)
def rel_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heap, no sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


@register(
    "rel_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 4) AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("topk", "window"),
)
def rel_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number — single shuffle, rank pushdown-able."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "rel_union",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def rel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered scans."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "rel_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both open and finished orders."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "rel_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with open orders but no finished ones."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # EXCEPT (set/distinct semantics, like the SQL)


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@register(
    "rel_string_funcs",
    oracle="""
SELECT p_partkey,
       LOWER(p_name)                              AS name_lower,
       UPPER(p_type)                              AS type_upper,
       SUBSTRING(p_name, 1, 4)                    AS name_prefix,
       CAST(LENGTH(p_name) AS INTEGER)            AS name_len,
       CONCAT(p_brand, ':', p_type)               AS brand_type,
       regexp_extract(p_brand, '([0-9]+)', 1)     AS brand_num
FROM part
""",
    tags=("scalar",),
)
def rel_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function library (incl. format parity with O27-style output)."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "rel_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate)    AS INTEGER) AS order_year,
       CAST(month(o_orderdate)   AS INTEGER) AS order_month,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002
FROM orders
""",
    tags=("scalar",),
)
def rel_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function library (timestamp_seconds parity lives in
    telemetry queries; here: extraction, truncation, differencing)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
    )


@register(
    "rel_case_when",
    oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders GROUP BY 1
""",
    tags=("scalar",),
)
def rel_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing (when/otherwise — O3/O27 parity family)."""
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@register(
    "rel_json_funcs",
    oracle="""
SELECT CAST(props->>'$.k' AS INTEGER) AS k_val, COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1
""",
    tags=("scalar", "json"),
)
def rel_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (O24 parity family: from_json/get_json_object)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("k_val")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "rel_null_safe_eq",
    oracle="""
SELECT COUNT(*) AS n_matching
FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS s1,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS s2
      FROM orders)
WHERE s1 IS NOT DISTINCT FROM s2
""",
    tags=("scalar",),
)
def rel_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>) — SURVEY §2.2 predicate surface."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("s1"),
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("s2"),
    )
    return o.filter(F.col("s1").eqNullSafe(F.col("s2"))).agg(
        F.count(F.lit(1)).alias("n_matching")
    )


# ---------------------------------------------------------------------------
# Event-time queries (batch shape of the streaming surface)
# ---------------------------------------------------------------------------


@register(
    "rel_events_hourly",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1, 2
""",
    bench=True,
    tags=("events", "agg"),
)
def rel_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch twin of the
    Structured Streaming windowed agg (SURVEY §2.3 event-time row)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            epoch_us(F.date_trunc("hour", F.col("ts"))).alias("hour_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "rel_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
    bench=True,
    tags=("events", "window"),
)
def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — lag + running sum
    (the batch twin of a session-window streaming agg). One shuffle on
    user_id serves both window passes."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events")
    gap_us = 30 * 60 * 1_000_000
    with_flag = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_us("ts") - epoch_us(F.lag("ts").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_session = with_flag.select(
        "user_id",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "rel_asof_join",
    oracle="""
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       epoch_us(s.ts) AS signup_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    bench=True,
    tags=("events", "join", "asof"),
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the latest signup
    at-or-before it, per user. Implemented via the union+window
    composition in ``operators.asof`` — a single shuffle on the key, no
    nested-loop join, scales to arbitrarily large sides."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="s_ts",
        payload_cols=["s_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("purchase_ts_us"),
        epoch_us("s_ts").alias("signup_ts_us"),
    )


@register(
    "rel_distinct_rows",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    tags=("setop",),
)
def rel_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash aggregate, map-side partial)."""
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "rel_approx_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
""",
    tags=("agg", "approx"),
)
def rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++), ε-GATED hash-green (r15 verdict
    task 4, the ``lake_replay_audit_approx`` pattern): the sketch VALUE
    differs from DuckDB's by construction, so the driver-checked claim
    is the accuracy GUARANTEE itself — ``approx_ok`` asserts in-plan
    that the rsd-0.02 estimate lands within 5 % of exact, and the
    oracle expects literal TRUE (HLL++ is deterministic for fixed
    input, so this is a stable assertion, not a flaky tolerance). The
    exact count anchors the hash; production runs the approx side
    alone — one map-side-mergeable pass vs the exact path's per-group
    distinct shuffle."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("__approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


@register(
    "rel_approx_quantile",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def rel_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna mergeable sketch,
    accuracy=1000) — the scale path for percentiles: single pass,
    map-side partial sketches merged at reduce, O(sketch) memory per
    group vs rel_percentiles' exact per-group sort.

    ε-GATED hash-green (r15 verdict task 4): the sketch value is
    engine-specific, but its RANK-ERROR GUARANTEE (≤ 1/accuracy) is
    not — so the gate brackets each estimate between the exact
    percentiles at q ∓ 1.5/accuracy (1.5× margin absorbs interpolation
    at the bracket ranks) and the oracle expects literal TRUE. The gate
    holds for ANY merge order of the partial sketches — asserting the
    guarantee, not the value, is what makes an approx result
    driver-checkable. Exact group counts anchor the hash."""
    eps = 1.5 / 1000.0
    qs = [0.5 - eps, 0.5 + eps, 0.95 - eps, 0.95 + eps]
    g = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)
            ).alias("__a"),
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(q) for q in qs])
            ).alias("__e"),
        )
    )
    return g.select(
        "l_returnflag",
        "n_rows",
        (
            (F.col("__a")[0] >= F.col("__e")[0])
            & (F.col("__a")[0] <= F.col("__e")[1])
        ).alias("p50_ok"),
        (
            (F.col("__a")[1] >= F.col("__e")[2])
            & (F.col("__a")[1] <= F.col("__e")[3])
        ).alias("p95_ok"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style headline queries (widened bench surface)
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    bench=True,
    tags=("agg", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style revenue forecast: the pure pushdown showcase.

    All four predicates reach the parquet scan (PushedFilters) and only
    3 columns are read (ReadSchema) — at 100 TB this is the difference
    between scanning ~4 % of bytes and all of them."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    bench=True,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: who returned the most revenue.

    Plan shape: aggregate-before-join. Lineitem's R-flag filter pushes
    to the scan, then revenue partial-aggregates on l_orderkey BEFORE
    any join — the order⋈lineitem grain is orderkey, so the rollup is
    lossless and the shuffles downstream carry one row per order
    instead of every line item (~4× fewer rows, and no wide customer
    columns ride through the fact shuffle). Re-aggregate on custkey
    after the orders join, then join the small per-customer result to
    customer; nation (25 rows) broadcast; final top-20 is
    TakeOrderedAndProject — no global sort. Tie-break on c_custkey
    keeps the LIMIT deterministic across engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    per_cust = (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("__rev"), 4).alias("revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       ROUND(o.o_totalprice, 4) AS o_totalprice,
       ROUND(SUM(l.l_quantity), 4) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    bench=True,
    tags=("join", "agg", "subquery", "topk"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: self-referential semi-join.

    Plan shape: the HAVING subquery IS the aggregate the outer query
    recomputes — the output grain is o_orderkey, so one groupBy on
    lineitem produces both the >150 filter and sum_qty. The surviving
    keys are a tiny fraction of orders, so AQE broadcasts them into
    the orders scan (map-side filter, no orders shuffle) and the
    then-small result broadcasts again into customer. The naive shape
    (3-way join, re-aggregate every lineitem row after the join) pays
    two full fact shuffles that this plan never takes — the difference
    between O(|lineitem|) and O(|big orders|) shuffle bytes at 100 TB."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _dstr("o_orderdate").alias("o_orderdate_s"),
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            F.round(F.col("__q"), 4).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Array / higher-order functions, percentiles, multiset ops, file sources
# ---------------------------------------------------------------------------


@register(
    "rel_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(SQRT(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
       ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS max_val
FROM embeddings
""",
    tags=("functions", "array"),
)
def rel_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/aggregate/array_max) over
    the embedding column — pure JVM expressions, no UDF, no shuffle."""
    e = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    max_val = F.array_max(F.transform("embedding", lambda x: x.cast("double")))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(max_val, 4).alias("max_val"),
    )


@register(
    "rel_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg",),
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). Scale note: exact percentile sorts per
    group in memory — at 100 TB swap to ``approx_percentile`` (t-digest,
    mergeable map-side) and accept the epsilon."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "rel_except_all",
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
EXCEPT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'purchase')
""",
    tags=("setop",),
)
def rel_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics — duplicates preserved by
    count difference), vs rel_except's set semantics."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.exceptAll(buys)


@register(
    "rel_intersect_all",
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
INTERSECT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'cart')
""",
    tags=("setop",),
)
def rel_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (min of per-side multiplicities)."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    carts = ev.filter(F.col("event_type") == "cart").select("user_id")
    return views.intersectAll(carts)


@register(
    "src_csv_roundtrip",
    oracle="""
SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
FROM nation GROUP BY n_regionkey
""",
    tags=("source", "eager-io"),
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source (O21 parity surface): write nation to CSV with
    header, read it back with an explicit schema, aggregate. Proves the
    csv connector round-trips values losslessly."""
    from ..sources.scratch import scratch_dir

    n = _t(spark, sf_dir, "nation")
    path = scratch_dir(prefix="rtpmdp_csv_")
    n.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .csv(path)
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name")
    )


@register(
    "src_partitioned_pruned",
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
       o_orderpriority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 4) AS total
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
GROUP BY 1, 2
""",
    tags=("source", "partitioning", "eager-io"),
)
def src_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned dataset write + partition-pruned read: the
    lake layout that makes time-range queries cheap at 100 TB. orders is
    written ``partitionBy(order_year)``; the year filter on the read
    side never touches non-matching directories (PartitionFilters in the
    scan, asserted in tests/test_scale_plans.py) — pruning happens at
    planning time from the file listing, zero data IO for other years."""
    from ..sources.scratch import scratch_dir

    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = scratch_dir(prefix="rtpmdp_part_")
    o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    return back.groupBy(
        F.col("order_year").cast("bigint").alias("order_year"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@register(
    "src_json_roundtrip",
    oracle="""
SELECT r_regionkey, r_name FROM region
""",
    tags=("source", "eager-io"),
)
def src_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source with gzip (O6/O14 batch surface): write
    region as gzipped JSON, read it back schema-first."""
    from ..sources.scratch import scratch_dir

    r = _t(spark, sf_dir, "region")
    path = scratch_dir(prefix="rtpmdp_json_")
    r.write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema("r_regionkey BIGINT, r_name STRING").json(path)
    return back.select("r_regionkey", "r_name")


@register(
    "rel_exists_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey
""",
    tags=("subquery", "join"),
)
def rel_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join (one shuffle on
    custkey; Catalyst decorrelates automatically in SQL form, and the
    DataFrame form expresses the semi-join directly)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "rel_not_in_subquery",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
ORDER BY p_partkey
""",
    tags=("subquery", "join"),
)
def rel_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null subquery — left-anti join. (With nullable
    keys NOT IN needs null-aware anti join semantics; l_partkey is
    non-null here, matching the anti join exactly.)"""
    p = _t(spark, sf_dir, "part")
    hot = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        "l_partkey"
    )
    return (
        p.join(hot, p.p_partkey == hot.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "rel_sql_api",
    oracle="""
SELECT n.n_name, COUNT(*) AS n_customers, ROUND(AVG(c.c_acctbal), 4) AS avg_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
    tags=("sql", "join", "agg"),
)
def rel_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's `spark.sql` surface: identical ANSI text runs on
    Spark (temp views over the fixture scans) and on the DuckDB oracle —
    same Catalyst plan as the DataFrame form, same pushdown."""
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers,
               ROUND(AVG(c.c_acctbal), 4) AS avg_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
        """
    )


@register(
    "rel_salted_join",
    oracle="""
SELECT l.l_orderkey, o.o_orderstatus,
       ROUND(SUM(l.l_extendedprice), 4) AS sum_price, COUNT(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_orderkey, o.o_orderstatus
ORDER BY sum_price DESC, l_orderkey LIMIT 50
""",
    tags=("join", "skew"),
)
def rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): semantics identical to the
    plain equi-join — the oracle IS the unsalted SQL — while the shuffle
    spreads each hot key over n_salts partitions."""
    from ..operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    )
    j = salted_join(l, o, on="l_orderkey", n_salts=8)
    return (
        j.groupBy("l_orderkey", "o_orderstatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("sum_price").desc(), F.col("l_orderkey"))
        .limit(50)
    )


@register(
    "rel_window_distribution",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 4) AS cume,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 4) AS first_price,
       ROUND(o_totalprice, 4) AS price
FROM (SELECT * FROM orders WHERE o_orderkey <= 2000) t
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window",),
)
def rel_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value distribution windows."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
        F.round("o_totalprice", 4).alias("price"),
    )


@register(
    "rel_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS price,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 4) AS near_sum
FROM orders WHERE o_custkey <= 100
""",
    tags=("window",),
)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): sum of orders within 10k below
    the current price — rangeBetween, not rowsBetween."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 4).alias("price"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("near_sum"),
    )


@register(
    "rel_interval_arith",
    oracle="""
SELECT o_orderkey,
       STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')   AS due_date,
       STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')  AS quarter_later,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
FROM orders WHERE o_orderkey <= 1000
""",
    tags=("functions", "datetime"),
)
def rel_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: date_add / add_months / datediff."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("quarter_later"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "rel_levenshtein",
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       levenshtein(a.s_name, b.s_name) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
""",
    tags=("functions", "fuzzy"),
)
def rel_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: supplier-name pairs within edit distance 2
    (small-table self-join; at scale, block on a name prefix/soundex
    key first so the cross product stays bounded)."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    a = s.select(F.col("s_suppkey").alias("supp_a"), F.col("s_name").alias("__na"))
    b = s.select(F.col("s_suppkey").alias("supp_b"), F.col("s_name").alias("__nb"))
    return (
        a.join(b, F.col("supp_a") < F.col("supp_b"))
        .select(
            "supp_a",
            "supp_b",
            F.levenshtein("__na", "__nb").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
    )


@register(
    "rel_grouped_regression",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       ROUND(regr_slope(value, epoch(ts)), 6)     AS slope,
       ROUND(regr_intercept(value, epoch(ts)), 6) AS intercept
FROM events GROUP BY event_type
""",
    tags=("udf", "agg"),
)
def rel_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas operator (numpy OLS per group) checked
    against ANSI regr_slope/regr_intercept — proves the Pandas-UDF path
    end-to-end through the DuckDB oracle."""
    from ..operators.grouped import per_group_trend

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        # fractional epoch seconds (micros precision), matching DuckDB's
        # epoch(); unix_timestamp() would truncate to seconds and reject NTZ
        epoch_seconds("ts").alias("x"),
        F.col("value").alias("y"),
    )
    out = per_group_trend(ev, group_col="event_type", x_col="x", y_col="y")
    return out.select(
        "event_type",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    )


@register(
    "rel_map_funcs",
    oracle="""
SELECT l_returnflag AS flag,
       ROUND(mn, 4) AS lo, ROUND(mx, 4) AS hi, ROUND(mx - mn, 4) AS spread,
       2 AS n_keys
FROM (SELECT l_returnflag, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
      FROM lineitem GROUP BY l_returnflag)
""",
    tags=("functions", "map"),
)
def rel_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build map<string,double> per group, then
    element_at / map_keys / map-difference projections. The oracle is
    the map-free equivalent (same values) — what's being checked is
    that the map round-trip is lossless."""
    l = _t(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("mn"), F.max("l_quantity").alias("mx")
    )
    m = F.create_map(
        F.lit("lo"), F.col("mn"), F.lit("hi"), F.col("mx")
    ).alias("__m")
    with_map = g.select(F.col("l_returnflag").alias("flag"), m)
    return with_map.select(
        "flag",
        F.round(F.element_at("__m", "lo"), 4).alias("lo"),
        F.round(F.element_at("__m", "hi"), 4).alias("hi"),
        F.round(
            F.element_at("__m", "hi") - F.element_at("__m", "lo"), 4
        ).alias("spread"),
        F.size(F.map_keys("__m")).alias("n_keys"),
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01'
""",
    bench=True,
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: conditional aggregation over
    a fact⋈dim join. part is broadcast (bounded dimension); the month
    filter pushes to the lineitem scan, so the join probes ~1/80 of the
    fact table."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_pct")
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 45)
""",
    bench=True,
    tags=("join", "agg"),
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate join. The three OR-branches
    stay INSIDE the equi-join as a post-join filter (Catalyst keeps the
    partkey equi-condition for the hash join; the disjunction never
    degrades it to a nested-loop join)."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)

    def branch(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        branch("Brand#1", 1, 15, 1, 20)
        | branch("Brand#12", 10, 30, 10, 30)
        | branch("Brand#24", 20, 50, 20, 45)
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "src_orc_roundtrip",
    oracle="""
SELECT s_nationkey, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 4) AS total_bal
FROM supplier GROUP BY s_nationkey
""",
    tags=("source", "eager-io"),
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (columnar alternative to parquet, zlib-
    compressed): write supplier to ORC, read it back, aggregate —
    proves lossless round-trip through the second columnar format."""
    from ..sources.scratch import scratch_dir

    s = _t(spark, sf_dir, "supplier")
    path = scratch_dir(prefix="rtpmdp_orc_")
    s.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 4).alias("total_bal"),
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name < cn.n_name
GROUP BY sn.n_name, cn.n_name
ORDER BY supp_nation, cust_nation
""",
    tags=("join", "agg"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation trade volume: five-way join. The two
    nation copies broadcast; the three fact/dim shuffles are on
    suppkey/orderkey/custkey respectively — Catalyst orders them; AQE
    re-plans if a side turns out tiny."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style order-count histogram: left join (customers with
    zero orders count as 0 — COUNT over a null key skips it), then a
    second tiny aggregation over the distribution."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly, COUNT(*) AS n
FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < a.half_avg
""",
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated-average filter. The per-part average
    is a pre-aggregation joined back on partkey — both shuffles share
    the same key, so at scale the exchange is reusable (and bucketing
    lineitem by partkey removes it entirely)."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = l.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    j = l.join(avg_q, "l_partkey").filter(F.col("l_quantity") < F.col("half_avg"))
    return j.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rel_profile_columns",
    oracle="""
SELECT 'l_quantity' AS col, COUNT(*) AS n,
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
       ROUND(MIN(l_quantity), 4) AS min_v, ROUND(MAX(l_quantity), 4) AS max_v,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*),
       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
       ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4),
       CAST(COUNT(DISTINCT l_discount) AS BIGINT)
FROM lineitem
""",
    tags=("agg", "profiling"),
)
def rel_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (training-data pipeline hygiene): per-column
    count / nulls / min / max / distinct in ONE scan via a unioned
    aggregate (Spark executes both branches over the same cached scan;
    at 100 TB use approx_count_distinct to avoid the exact-distinct
    shuffles)."""
    l = _t(spark, sf_dir, "lineitem")

    def profile(col: str):
        return l.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.round(F.min(col), 4).alias("min_v"),
            F.round(F.max(col), 4).alias("max_v"),
            F.countDistinct(col).alias("n_distinct"),
        )

    return profile("l_quantity").unionAll(profile("l_discount"))


@register(
    "rel_rollup_reuse",
    oracle="""
SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       CAST(SUM(1) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY day, event_type
""",
    tags=("agg", "rollup", "eager-io"),
)
def rel_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern (hypertable-style rollup): daily
    stats served FROM a materialized hourly rollup, not the raw table.

    sum/count compose across time buckets, so re-aggregating the hourly
    rollup equals aggregating raw events — which is exactly what the
    oracle computes. At 100 TB the hourly rollup is a streaming-updated
    table ~3-4 orders of magnitude smaller than raw events; every
    coarser query (day/week/month) reads it instead of the fact table.
    """
    from ..sources.scratch import scratch_dir

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    # materialize the rollup (the "continuous aggregate" table)
    path = scratch_dir(prefix="rtpmdp_rollup_")
    hourly.write.mode("overwrite").parquet(path)
    rolled = spark.read.parquet(path)

    return (
        rolled.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 4).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "ts_gap_fill_hourly",
    oracle="""
WITH obs AS (
  SELECT event_type AS key,
         to_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600) AS bucket_ts,
         AVG(ROUND(value * 100)) AS obs_cents
  FROM events GROUP BY 1, 2
),
spans AS (SELECT key, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM obs GROUP BY key),
grid AS (
  SELECT key, UNNEST(range(lo, hi + INTERVAL 1 SECOND, INTERVAL 3600 SECOND)) AS bucket_ts
  FROM spans
)
SELECT g.key, STRFTIME(g.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_s,
       o.obs_cents / 100 AS obs_avg,
       last_value(o.obs_cents IGNORE NULLS) OVER (
         PARTITION BY g.key ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100 AS filled_avg,
       o.obs_cents IS NULL AS is_gap
FROM grid g LEFT JOIN obs o ON g.key = o.key AND g.bucket_ts = o.bucket_ts
""",
    tags=("timeseries", "window"),
)
def ts_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-series regularization: hourly grid per event_type with
    LOCF gap fill (operators/timeseries.resample_locf). The irregular
    events table becomes a dense, model-ready series.

    ``value`` carries 2-decimal readings, so the bucket mean is taken
    over exact integer cents: integral doubles sum exactly (< 2^53)
    in ANY partial-aggregation order, so both engines produce
    bit-identical binary averages and NO rounding is needed (a raw
    double AVG differs by 1 ulp between engines on 98 of the sf0.1
    buckets; and any 4-dp ROUND of an exact .xxxx5 diverges because
    Spark rounds the shortest-decimal string HALF_UP while DuckDB
    rounds the binary value)."""
    from ..operators.timeseries import resample_locf

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100)
    )
    out = resample_locf(ev, key_col="event_type", ts_col="ts",
                        value_col="value_cents", step_seconds=3600)
    return out.select(
        "key",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        (F.col("obs_avg") / 100).alias("obs_avg"),
        (F.col("filled_avg") / 100).alias("filled_avg"),
        "is_gap",
    )


@register(
    "rel_null_funcs",
    oracle="""
SELECT e.event_id,
       COALESCE(CAST(NULLIF(e.event_type, 'view') AS VARCHAR), 'filtered') AS et,
       CASE WHEN e.value IS NULL THEN -1.0 ELSE ROUND(e.value, 4) END AS v,
       (e.event_type IS NOT DISTINCT FROM 'purchase') AS is_purchase
FROM events e WHERE e.event_id <= 500
""",
    tags=("functions", "null"),
)
def rel_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling function family: coalesce / nullif / null-safe
    equality (<=>) / conditional null defaulting."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("filtered")).alias("et"),
        F.when(F.col("value").isNull(), -1.0).otherwise(F.round("value", 4)).alias("v"),
        F.col("event_type").eqNullSafe("purchase").alias("is_purchase"),
    )


# ---------------------------------------------------------------------------
# Ordered-set / argument aggregates, reshaping, try-arithmetic, text source
# ---------------------------------------------------------------------------


@register(
    "rel_string_agg",
    oracle="""
SELECT r.r_name, STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""",
    tags=("agg", "string"),
)
def rel_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg semantics) as
    array_sort ∘ collect_list ∘ array_join — deterministic regardless of
    partial-aggregation arrival order, which raw listagg is not."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@register(
    "rel_arg_minmax",
    oracle="""
SELECT l_returnflag,
       ARG_MAX(l_orderkey, l_extendedprice * 10000000 + l_orderkey) AS top_order,
       ARG_MIN(l_orderkey, l_extendedprice * 10000000 + l_orderkey) AS bottom_order,
       ROUND(MAX(l_extendedprice), 4) AS max_price,
       ROUND(MIN(l_extendedprice), 4) AS min_price
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg",),
)
def rel_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument aggregates (max_by/min_by = DuckDB arg_max/arg_min).
    The ordering expression folds the tie-break key into the score
    (price step 0.01 × 1e7 ≫ max orderkey, and the sum stays < 2^53 so
    the double arithmetic is exact) — max_by/arg_max tie behavior is
    engine-defined, so ties must be impossible for hash parity."""
    l = _t(spark, sf_dir, "lineitem")
    ordexpr = F.col("l_extendedprice") * 10000000 + F.col("l_orderkey")
    return l.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", ordexpr).alias("top_order"),
        F.min_by("l_orderkey", ordexpr).alias("bottom_order"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
    )


@register(
    "rel_corr_covar",
    oracle="""
SELECT l_returnflag,
       CASE WHEN STDDEV_POP(l_extendedprice) > 0 AND STDDEV_POP(l_quantity) > 0
            THEN ROUND(COVAR_POP(l_extendedprice, l_quantity)
                       / (STDDEV_POP(l_extendedprice)
                          * STDDEV_POP(l_quantity)), 4)
       END AS price_qty_corr,
       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4) AS price_qty_covar,
       ROUND(COVAR_POP(l_extendedprice, l_discount), 4)  AS price_disc_covar_pop
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def rel_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (corr / covar_samp / covar_pop)
    — single-pass map-side-partial built-ins (Welford-style merge), no
    extra shuffle beyond the groupBy. Pearson r is undefined when
    either side has zero variance, and the BUILTIN corr cannot be
    guarded: its final evaluation divides by sqrt(varx*vary)
    unconditionally, an ANSI DIVIDE_BY_ZERO job kill on a constant
    column that a wrapping CASE evaluates too late to stop (the r11
    constant-input audit). r is therefore assembled from the safe
    builtins — covar_pop / (stddev_pop * stddev_pop), the identical
    formula and op sequence on both engines — with the zero-variance
    guard emitting NULL. Still one aggregation pass: the extra
    partials merge in the same hash aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    sx = F.stddev_pop("l_extendedprice")
    sy = F.stddev_pop("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.when(
            (sx > 0) & (sy > 0),
            F.round(F.covar_pop("l_extendedprice", "l_quantity") / (sx * sy), 4),
        ).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        F.round(F.covar_pop("l_extendedprice", "l_discount"), 4).alias(
            "price_disc_covar_pop"
        ),
    )


@register(
    "rel_unpivot",
    oracle="""
SELECT p_partkey, measure, ROUND(value, 4) AS value FROM (
  UNPIVOT (SELECT p_partkey,
                  CAST(p_retailprice AS DOUBLE) AS retailprice,
                  CAST(p_size AS DOUBLE) AS psize
           FROM part WHERE p_partkey <= 200)
  ON retailprice, psize INTO NAME measure VALUE value)
""",
    tags=("reshape",),
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via the native unpivot operator (inverse of
    pivot) — a narrow per-row explode, no shuffle at any scale."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("retailprice"),
            F.col("p_size").cast("double").alias("psize"),
        )
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "psize"],
        variableColumnName="measure",
        valueColumnName="val",
    ).select("p_partkey", "measure", F.round("val", 4).alias("value"))


@register(
    "rel_histogram",
    oracle="""
SELECT LEAST(CAST(FLOOR(l_extendedprice / 5000) AS BIGINT), 10) AS bucket,
       COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 4) AS revenue
FROM lineitem GROUP BY 1
""",
    tags=("agg", "profiling"),
)
def rel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (width_bucket-style, clamped top
    bucket) — the binning is a pure projection so the whole histogram is
    one partial-aggregated groupBy on a small integer key; IEEE-754
    division/floor is bit-identical across engines."""
    l = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / 5000).cast("bigint"), F.lit(10)
    )
    return l.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
    )


@register(
    "rel_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / NULLIF(l_quantity - 25, 0) AS per_unit_off25,
       TRY_CAST(l_returnflag AS INT) AS rf_int,
       TRY_CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS INT) AS qty_int
FROM lineitem WHERE l_orderkey <= 1000
""",
    tags=("functions", "null"),
)
def rel_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant arithmetic: try_divide (null on /0, matching SQL
    NULLIF guards) and try_cast (null on malformed input instead of
    ANSI cast errors) — the declarative version of the reference's
    per-record drop-on-parse-failure semantics
    (realtime_inference.py:110-113)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # no ROUND here (unlike the aggregate convention): scalar IEEE
        # division is bit-identical across engines, while a 4-dp round
        # can land on exact .5 boundaries where Spark (HALF_UP) and
        # DuckDB disagree
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "per_unit_off25"
        ),
        F.col("l_returnflag").try_cast("int").alias("rf_int"),
        # integral-valued double → bigint → string so both engines see a
        # clean integer literal ('25', not '25.0' — Spark's ANSI try_cast
        # rejects the decimal point where DuckDB would round)
        F.col("l_quantity").cast("bigint").cast("string").try_cast("int").alias(
            "qty_int"
        ),
    )


@register(
    "rel_join_right",
    oracle="""
SELECT n.n_name, COUNT(c.c_custkey) AS n_rich,
       ROUND(COALESCE(SUM(c.c_acctbal), 0), 4) AS rich_bal
FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join",),
)
def rel_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving unmatched right rows (nations with no
    high-balance customers survive as zero-count rows) — completes the
    inner/left/right/full/semi/anti/cross join matrix. The 25-row right
    side stays the broadcast *build* side; right-outer requires the
    preserved side to stream, which Spark handles by flipping to a
    BroadcastHashJoin(leftouter) with sides swapped."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_rich"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 4).alias("rich_bal"),
        )
    )


@register(
    "rel_explode",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE doc_id <= 20)
SELECT doc_id, UNNEST(range(len(words))) AS pos, UNNEST(words) AS word
FROM w
""",
    tags=("reshape", "array"),
)
def rel_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explosion with ordinality (posexplode = UNNEST WITH
    position). Generate-style operators are narrow — each input row
    expands in place with no shuffle, so the explode itself costs only
    output volume at any scale."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")


@register(
    "rel_latest_by_key",
    oracle="""
SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    tags=("window", "cdc"),
)
def rel_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins compaction (CDC/upsert materialization): one
    row per key, newest by (ts, event_id). The canonical change-log →
    snapshot operator for incrementally-maintained 100 TB tables — one
    shuffle on the key; with the log stored bucketed by key it is
    shuffle-free. row_number (not max-struct) keeps the full row without
    a self-join."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("value"))
    )


@register(
    "src_text_roundtrip",
    oracle="""
SELECT COUNT(*) AS n, MIN(n_name) AS first_name, MAX(LENGTH(n_name)) AS max_len
FROM nation
""",
    tags=("source", "eager-io"),
)
def src_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + source: write one name per line, read
    back as the bare `value` column, aggregate. The text connector is
    the degenerate schema case (single string column) — completes the
    csv/json/orc/parquet source matrix."""
    from ..sources.scratch import scratch_dir

    n = _t(spark, sf_dir, "nation")
    path = scratch_dir(prefix="rtpmdp_text_")
    n.select(F.col("n_name").alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("first_name"),
        F.max(F.length("value")).alias("max_len"),
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-style variants: q4, q12, q22
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
    tags=("join", "agg", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one slow line item (shipped
    > 60 days after order date — the fixture schema's stand-in for
    commit < receipt).

    The correlated EXISTS becomes a left-semi join whose condition
    mixes an equi conjunct (orderkey — drives the hash join) with a
    non-equi date conjunct evaluated as a join residual. Semi joins
    short-circuit per key: no fan-out, no downstream dedup. The date
    range pushes to the orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == l.l_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY l.l_linestatus
""",
    tags=("join", "agg"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: returned-shipment counts by line status and
    priority bucket (the fixture schema has no shipmode/receipt dates;
    returnflag + shipdate stand in). Conditional aggregation
    (when/otherwise inside SUM) turns a would-be pivot into one pass;
    both line-item predicates push to the scan before the orderkey
    shuffle, and the output key is 2 values — the shuffle after the
    join carries partial sums only."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_returnflag") == "R")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT AVG(ROUND(c_acctbal * 100)) / 100 AS a
  FROM customer WHERE c_acctbal > 0.0
    AND SUBSTRING(c_name, 1, 9) = 'Customer#'
),
eligible AS (
  SELECT SUBSTRING(CAST(c_custkey AS VARCHAR), 1, 1) AS cntrycode, c_acctbal, c_custkey
  FROM customer WHERE c_acctbal > (SELECT a FROM avg_bal)
)
SELECT e.cntrycode, COUNT(*) AS numcust,
       SUM(ROUND(e.c_acctbal * 100)) / 100 AS totacctbal
FROM eligible e
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-09-01')
GROUP BY e.cntrycode
""",
    tags=("join", "agg", "subquery"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: high-balance customers who never ordered,
    bucketed by a code prefix — here "never ordered" is "no order since
    2000-09" so the result is non-degenerate on the fixture (orders
    span 1995-2001). The scalar
    AVG subquery is computed once and injected as a literal-free
    crossJoin-broadcast (one row); NOT EXISTS is a left-anti join on
    custkey with the date filter pushed to the orders scan. Balance aggregates use
    exact integer cents (see registry conventions). The country-code
    stand-in is the leading custkey digit (fixture customers share one
    name prefix)."""
    c = _t(spark, sf_dir, "customer")
    base = c.filter(
        (F.col("c_acctbal") > 0.0)
        & (F.substring("c_name", 1, 9) == "Customer#")
    )
    avg_bal = base.agg(
        (F.avg(F.round(F.col("c_acctbal") * 100)) / 100).alias("a")
    )
    eligible = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select(
            F.substring(F.col("c_custkey").cast("string"), 1, 1).alias("cntrycode"),
            "c_acctbal",
            "c_custkey",
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-09-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.round(F.col("c_acctbal") * 100)) / 100).alias("totacctbal"),
        )
    )


@register(
    "rel_grouped_median_pandas",
    oracle="""
SELECT l_returnflag, MEDIAN(l_extendedprice) AS med_price
FROM lineitem GROUP BY l_returnflag
""",
    tags=("udf", "agg"),
)
def rel_grouped_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf surface (exact per-group median via
    numpy) checked against ANSI MEDIAN — completes the Python UDF
    matrix (scalar exprs / grouped-map applyInPandas /
    grouped-agg pandas_udf / mapInPandas). Median is selection-based,
    so no float-order divergence; see operators.grouped for the
    100 TB guidance (approx_percentile sketch)."""
    from ..operators.grouped import grouped_median_udf

    med = grouped_median_udf()
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        # a GROUPED_AGG pandas UDF cannot share an agg() with JVM
        # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — single-column agg
        .agg(med("l_extendedprice").alias("med_price"))
    )


@register(
    "rel_interval_join_banded",
    oracle="""
WITH days AS (
  SELECT UNNEST(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01',
                      INTERVAL 1 DAY)) AS d
),
win AS (
  SELECT d, d + INTERVAL 9 HOUR AS s, d + INTERVAL 11 HOUR AS e FROM days
)
SELECT STRFTIME(w.d, '%Y-%m-%d') AS day, COUNT(ev.event_id) AS n_in_window
FROM win w LEFT JOIN events ev ON ev.ts >= w.s AND ev.ts < w.e
GROUP BY 1
""",
    tags=("join", "timeseries"),
)
def rel_interval_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (NO equi key: events × daily 09:00-11:00
    maintenance windows) executed as a BANDED equi join — the 100 TB
    technique for range/interval joins that would otherwise plan as a
    nested-loop cross product.

    Both sides map to fixed-width hour bands: an event belongs to its
    hour; a window expands to the hours it covers (narrow explode,
    bounded by window span / band width = 2 rows here). The join is
    then a plain hash equi join on the band key, with the exact
    interval predicate as a residual filter — O(n) shuffle instead of
    O(n × windows) nested-loop compares. The left join that keeps
    empty windows re-joins the matched counts onto the window spine
    (tiny, broadcast)."""
    ev = _t(spark, sf_dir, "events")
    days = spark.sql(
        "SELECT explode(sequence(timestamp'2024-01-01', "
        "timestamp'2024-01-31', interval 1 day)) AS d"
    )
    win = days.select(
        "d",
        (F.col("d") + F.expr("INTERVAL 9 HOURS")).alias("s"),
        (F.col("d") + F.expr("INTERVAL 11 HOURS")).alias("e"),
    )
    # band expansion: every hour bucket the window overlaps
    win_b = win.select(
        "d", "s", "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s"),
                F.date_trunc("hour", F.col("e") - F.expr("INTERVAL 1 SECOND")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("band"),
    )
    ev_b = ev.select("event_id", "ts", F.date_trunc("hour", "ts").alias("band"))
    matched = (
        ev_b.join(win_b, "band")
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_in_window"))
    )
    return (
        win.select("d")
        .join(matched, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_in_window"), F.lit(0)).alias("n_in_window"),
        )
    )


@register(
    "rel_rolling_zscore",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, ts, value,
         AVG(value) OVER win AS mu,
         STDDEV_SAMP(value) OVER win AS sigma,
         COUNT(*) OVER win AS n_win
  FROM events
  WHERE value IS NOT NULL
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id,
       ROUND(value, 4) AS value,
       ROUND((value - mu) / sigma, 2) + 0.0 AS zscore,
       ABS((value - mu) / sigma) > 3.0 AS is_outlier
FROM w WHERE n_win >= 10 AND sigma > 0
""",
    tags=("window", "timeseries", "ml"),
)
def rel_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection — the classic
    predictive-maintenance batch analytic: each reading scored against
    the trailing 20 observations of ITS OWN series (frame excludes the
    current row, so the score is out-of-sample). One shuffle on the
    series key; the frame is ROWS-bounded so state per row is O(20) at
    any scale. The z-score is rounded to 2 dp (a ratio of two
    noise-accumulating floats supports ~2 stable digits across
    engines, and + 0.0 normalizes signed zeros per registry
    conventions); the 3-sigma outlier flag mirrors the reference's
    threshold-alert semantics (realtime_inference.py:126-139) without
    a trained model."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    n_win = F.count(F.lit(1)).over(win)
    z = (F.col("value") - mu) / sigma
    return (
        e.select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            (F.round(z, 2) + 0.0).alias("zscore"),
            (F.abs(z) > 3.0).alias("is_outlier"),
            n_win.alias("__n"),
            sigma.alias("__s"),
        )
        .filter((F.col("__n") >= 10) & (F.col("__s") > 0))
        .drop("__n", "__s")
    )


@register(
    "rel_skew_kurtosis",
    oracle="""
SELECT l_returnflag, n,
       ROUND(skew_samp * (n - 2) / sqrt(n * (n - 1.0)), 4) AS skew_pop,
       ROUND((kurt_samp * (n - 2.0) * (n - 3) / (n - 1) - 6) / (n + 1), 4)
         AS kurt_excess_pop
FROM (
  SELECT l_returnflag, COUNT(*) AS n,
         skewness(l_extendedprice) AS skew_samp,
         kurtosis(l_extendedprice) AS kurt_samp
  FROM lineitem GROUP BY l_returnflag
)
""",
    tags=("agg", "stats"),
)
def rel_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates (3rd/4th standardized moments) —
    single-pass mergeable built-ins. Spark reports POPULATION skewness
    and EXCESS population kurtosis; DuckDB reports the sample-adjusted
    (g1→G1, g2→G2) forms, so the oracle applies the exact rational
    bias-correction inverse — a worked example of reconciling moment
    conventions across engines rather than avoiding the functions."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_pop"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_excess_pop"),
    )


# ---------------------------------------------------------------------------
# TPC-H variants, second wave (no partsupp table in the fixtures; each
# query adapts the classic's PLAN SHAPE to the available columns)
# ---------------------------------------------------------------------------


def _extprice_e4():
    """l_extendedprice*(1-l_discount) as an exact integer in 1e-4 dollar
    units: cents x (100 - discount-hundredths). Both factors are exact
    integers recovered from 2-dp doubles, so partial sums are
    order-independent and hash-match without rounding."""
    return F.round(F.col("l_extendedprice") * 100) * (
        100 - F.round(F.col("l_discount") * 100)
    )


_EXTPRICE_E4_SQL = "ROUND(l_extendedprice*100) * (100 - ROUND(l_discount*100))"


@register(
    "q2_best_supplier",
    oracle=f"""
WITH link AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
best AS (
  SELECT l_partkey, MAX(s_acctbal) AS best_bal
  FROM link JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_name, s_acctbal
FROM part
JOIN link ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN best ON best.l_partkey = p_partkey AND s_acctbal = best_bal
WHERE p_type = 'ECONOMY' AND p_size <= 15
""",
    tags=("join", "subquery", "topk"),
)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part) adapted: for each
    small ECONOMY part, the supplier(s) with the highest account balance
    among suppliers who actually shipped it. The classic correlated MAX
    subquery is decorrelated by hand into aggregate-then-rejoin — the
    same rewrite Catalyst/DuckDB do internally — so the plan is two hash
    joins plus one small agg instead of a per-row subplan.

    Scale: the part->supplier link is DISTINCT over two int keys of the
    fact table (map-side partial distinct collapses it to |parts| x
    |suppliers-per-part| rows); supplier and the aggregated best-balance
    table are both dim-sized, so every join after the distinct is a
    broadcast. Equality on s_acctbal is safe: both sides compare the
    SAME parquet double, no arithmetic."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 15)
    )
    link = l.select("l_partkey", "l_suppkey").distinct()
    linked = link.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    best = linked.groupBy("l_partkey").agg(F.max("s_acctbal").alias("best_bal"))
    return (
        linked.join(
            F.broadcast(best.withColumnRenamed("l_partkey", "b_partkey")),
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("s_acctbal") == F.col("best_bal")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )


@register(
    "q9_nation_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       SUM({_EXTPRICE_E4_SQL}
           - ROUND(p_retailprice*100) * l_quantity * 60) / 10000.0 AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
    bench=True,
    tags=("join", "agg"),
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted: five-way join, profit per
    supplier nation per order year. With no ps_supplycost column, cost
    is modeled as 60% of the part's retail price per unit.

    Scale: the only fact-fact edge is lineitem⋈orders on l_orderkey —
    one shuffle. part/supplier/nation are dim-sized and broadcast, and
    the p_name filter prunes lineitem rows BEFORE the shuffle (filter
    through the broadcast join first, then exchange). Profit is summed
    in exact 1e-4-dollar integer units (prices are 2-dp, quantity is
    integral), so partial-agg order never changes the hash."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = _extprice_e4() - F.round(
        F.col("p_retailprice") * 100
    ) * F.col("l_quantity") * 60
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(amount) / 10000.0).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, SUM(ROUND(l_extendedprice*100)) AS value_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_cents / 100 AS part_value
FROM pv
WHERE value_cents > (SELECT 1.2 * AVG(value_cents) FROM pv)
""",
    tags=("agg", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identified by a global-share
    threshold): per-part shipped value, kept only when it exceeds 1.2x
    the mean part value — a scalar aggregate over the aggregate itself.
    The mean-relative threshold (unlike Q11's fixed fraction) is scale
    invariant, so the query returns rows at every sf.

    Scale: one shuffle for the per-part agg; the scalar is a one-row
    broadcast (cross join) against the dim-sized aggregate, not a
    second pass over the fact. Values are exact integer cents so the
    threshold double (same sum, same division, same 1.2 multiply) is
    bit-identical in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100)).alias("value_cents")
    )
    thr = pv.agg((F.avg("value_cents") * 1.2).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("value_cents") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100).alias("part_value"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_EXTPRICE_E4_SQL}) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_e4 / 10000.0 AS total_revenue
FROM supplier JOIN rev ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT MAX(rev_e4) FROM rev)
""",
    tags=("agg", "subquery", "topk"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier by quarterly revenue — the classic
    view + MAX-of-aggregate query). Ties are all returned, exactly as
    the spec demands; the tie comparison is between exact integer
    revenue units so it can never be lost to float noise.

    Scale: the quarter filter pushes to the parquet scan; one shuffle
    to aggregate by supplier; the MAX scalar and the supplier dim are
    broadcasts against the supplier-sized aggregate."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_extprice_e4()).alias("rev_e4"))
    mx = rev.agg(F.max("rev_e4").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("rev_e4") / 10000.0).alias("total_revenue")
        )
    )


@register(
    "q16_supplier_part_count",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
""",
    tags=("agg", "join", "subquery"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part class, with an
    excluded-supplier NOT IN): distinct supplier count per
    (brand, type, size) over shipped parts, excluding low-balance
    suppliers. NOT IN over a provably non-null key column is planned as
    a left-anti join (no null-semantics nested loop).

    Scale: the anti join's build side is the filtered supplier dim
    (broadcast); the part filter prunes before the distinct-agg
    shuffle; COUNT(DISTINCT) runs as Spark's two-phase expand."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000)
    return (
        l.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_suppliers",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    WITH sp AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey FROM sp WHERE qty > (SELECT 2.0 * AVG(qty) FROM sp)
  )
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
  )
""",
    tags=("join", "subquery", "agg"),
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of a part family):
    two nested IN subqueries — one aggregated over the fact (suppliers
    who shipped >2x the mean quantity of some 'small%' part), one
    dim-only (Asian nations) — both planned as semi joins. Q20's fixed
    absolute threshold is replaced by a mean-relative one so the query
    selects at every scale factor (per-group quantity shrinks as the
    part/supplier space grows).

    Scale: the part-name filter broadcasts into lineitem before the
    (l_suppkey, l_partkey) agg shuffle — the only fact shuffle; the
    threshold scalar and the HAVING output are dim-sized, so the
    remaining joins are broadcasts. Quantity is integral, so the
    threshold double (same exact sum, same divide, same 2x) is
    bit-identical in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sp = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = sp.agg((F.avg("qty") * 2.0).alias("thr"))
    heavy = (
        sp.join(F.broadcast(thr))
        .filter(F.col("qty") > F.col("thr"))
        .select("l_suppkey")
    )
    asian = n.join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    ).select("n_nationkey")
    return (
        s.join(
            F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(asian),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_sole_returner",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
""",
    bench=True,
    tags=("join", "subquery", "agg"),
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for each
    finalized multi-supplier order, count lines whose supplier is the
    ONLY one with returned ('R') lines in that order. The classic plan
    is EXISTS + NOT EXISTS correlated self-joins on the fact table
    (the oracle states it that way); the Spark plan replaces both
    self-joins AND the candidate rejoin with one aggregate to the
    (order, supplier) grain plus window counts over the order:
      EXISTS(other supplier)          == n_supp >= 2
      NOT EXISTS(other 'R' supplier)  == n_r_supp = 1  (l1 itself is 'R')
    and each surviving (order, supplier) row already carries its own
    R-line count, so numwait is a sum — no second pass over the fact.

    Scale: the fact is scanned once and shuffled ONCE — an explicit
    repartition on l_orderkey that the (l_orderkey, l_suppkey) grain
    aggregate, the orders join, and the order window ALL reuse
    (HashPartitioning on a subset of the grouping keys satisfies the
    aggregate's ClusteredDistribution, and at cluster scale a
    sort-merge orders join re-sorts by l_orderkey, which is exactly
    the window's requirement). The r16 shape paid TWO full-grain
    exchanges (pair-key groupBy, then orderkey for the window) because
    TPC-H lineitem has ~1 line per (order, supplier), so the pair
    groupBy's map-side partial aggregation collapsed almost nothing —
    shuffling the 3-column raw rows once by orderkey is strictly
    fewer bytes. The 'F'-status join moved BELOW the windows: the
    window partitions by l_orderkey, so dropping whole non-F orders
    before it cannot change any surviving row's counts, and ~half the
    grain skips the window sort. Measured (interleaved best-of-7,
    sf0.1): 0.76-0.87 s -> 0.47-0.53 s with bit-identical output.
    A naive countDistinct formulation additionally expands the fact 2x
    through the shuffle (one projection per distinct agg); the window
    shape measured ~2x faster at sf0.1."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    grain = (
        l.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count_if(F.col("l_returnflag") == "R").alias("n_r_lines"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .drop("o_orderkey")
    )
    w = Window.partitionBy("l_orderkey")
    return (
        grain.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_r_supp", F.count_if(F.col("n_r_lines") > 0).over(w))
        .filter(
            (F.col("n_r_lines") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_r_supp") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").alias("numwait"))
    )


@register(
    "rel_agg_bool_bit",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity >= 1)               AS all_qty_pos,
       bool_or(l_discount > 0.09)              AS any_big_disc,
       CAST(count_if(l_quantity > 45) AS BIGINT) AS n_heavy,
       bit_and(CAST(l_linenumber AS BIGINT))   AS ln_and,
       bit_or(CAST(l_linenumber AS BIGINT))    AS ln_or,
       bit_xor(CAST(l_linenumber AS BIGINT))   AS ln_xor,
       median(l_quantity)                      AS med_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "functions"),
)
def rel_agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean / bitwise / conditional-count / median aggregate
    built-ins — the long tail of the aggregate function surface, all
    single-pass mergeable JVM aggs. median() is selection-based (no
    summation), so it hash-matches across engines without rounding
    (see registry conventions on preferring selection stats).

    Oracle note: DuckDB ``count_if`` returns HUGEINT, which pandas
    materializes as float64 while Spark emits int64 — the r03 driver
    hash failed on exactly this dtype-class drift even though all
    values were identical. The oracle casts it to BIGINT per the
    registry HUGEINT convention."""
    l = _t(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.count_if(F.col("l_quantity") > 45).alias("n_heavy"),
        F.bit_and(ln).alias("ln_and"),
        F.bit_or(ln).alias("ln_or"),
        F.bit_xor(ln).alias("ln_xor"),
        F.median("l_quantity").alias("med_qty"),
    )


@register(
    "rel_variant_semistructured",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k
FROM events
WHERE CAST(props->>'$.k' AS INTEGER) >= 10
GROUP BY event_type
""",
    tags=("json", "functions", "agg"),
)
def rel_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` extraction — the modern engine path for open-schema
    JSON columns (vs rel_json_funcs' per-call string parsing with
    ``get_json_object``, which re-tokenizes the JSON text at every
    extraction site). At 100 TB the variant column parses each value
    exactly once however many fields are read, and the binary encoding
    is columnar-shreddable by the parquet writer."""
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
SELECT YEAR(o.o_orderdate) AS o_year,
       SUM(CASE WHEN sn.n_name = 'NATION_3'
                THEN ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                ELSE 0 END)
         / SUM(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000))
         AS mkt_share,
       COUNT(*) AS n
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE p.p_type = 'ECONOMY'
  AND r.r_name = 'AMERICA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
""",
    bench=True,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: of the volume sold into
    one region's market for one part type over two years, what share
    came from the target supplier nation, per year. The widest TPC-H
    join tree (8 tables).

    Scale plan: every dimension is broadcast — part (type filter),
    customer-nation⋈region (market filter), supplier⋈nation (share
    flag). orders⋈customer runs FIRST, on the dim side (r17): the
    custkey shuffle then moves only the date-filtered orders (~1/13 of
    fact rows, 3 narrow columns) instead of the lineitem⋈orders join
    output (~1/6 of fact rows carrying vol_i/suppkey), and the fact
    path pays ONE shuffle (orderkey) instead of two. At sf0.1 AQE
    broadcast-demotes both joins either way (measured interleaved:
    0.380 vs 0.373 s — noise); the reorder is for the 100 TB shape,
    where the second fact-sized exchange is real. The part-type filter
    broadcasts first and prunes ~5/6 of the fact before the orderkey
    shuffle; the date filter pushes into the orders scan. customer is
    mid-sized but bounded (0.15 × SF rows), within the AQE broadcast
    threshold after the region semi-filter at any realistic cluster
    memory.

    The share is a quotient of two exact integral sums (volume has 4
    decimals → ×10000 integers sum exactly in any order below 2^53),
    so both engines divide bit-identical doubles — no final ROUND,
    per the registry float-parity conventions."""
    vol_i = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", vol_i.alias("vol_i")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    cn = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_year"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_i")).otherwise(0.0))
                / F.sum("vol_i")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_year")
    )


@register(
    "rel_recursive_cte",
    oracle="""
WITH RECURSIVE chain AS (
  SELECT n_nationkey, n_name, n_nationkey AS root_key, 0 AS depth
  FROM nation WHERE n_nationkey < 5
  UNION ALL
  SELECT n.n_nationkey, n.n_name, c.root_key, c.depth + 1
  FROM nation n JOIN chain c ON n.n_nationkey = c.n_nationkey + 5
)
SELECT root_key, COUNT(*) AS chain_len, MAX(depth) AS max_depth,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MAX(n_name) AS deepest_name
FROM chain GROUP BY root_key ORDER BY root_key
""",
    tags=("sql", "recursive"),
)
def rel_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative/hierarchical traversal via ``WITH RECURSIVE`` (new in
    Spark 4): five synthetic parent chains over nation
    (key -> key + 5) walked to their leaves, then rolled up per root.
    The recursion the reference cannot express at all, and the one
    relational form Catalyst executes as an iterative union of
    micro-plans rather than a single DAG.

    Scale: each recursion step is a self-contained equi join of the
    frontier against the base table — the frontier stays tiny (≤ #roots
    per level) while the base side broadcasts, so depth, not data
    volume, bounds the iteration count. For billion-row hierarchies the
    same statement holds; frontier growth is what to watch, not table
    size."""
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT n_nationkey, n_name, n_nationkey AS root_key, 0 AS depth
          FROM nation WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, n.n_name, c.root_key, c.depth + 1
          FROM nation n JOIN chain c ON n.n_nationkey = c.n_nationkey + 5
        )
        SELECT root_key, COUNT(*) AS chain_len, MAX(depth) AS max_depth,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
               MAX(n_name) AS deepest_name
        FROM chain GROUP BY root_key ORDER BY root_key
        """
    )


@register(
    "rel_hll_partial_merge",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
         AS n_months,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
       TRUE AS merge_ok,
       TRUE AS drift_ok
FROM orders GROUP BY 1 ORDER BY yr
""",
    tags=("agg", "approx", "sketch"),
)
def rel_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, new
    in Spark 3.5+/4): build one sketch per month over o_custkey, then
    union the *sketches* up to year level and estimate.

    This is THE 100 TB pattern for distinct counts: per-partition
    (e.g. daily) sketch aggregates are small, precomputable, and
    re-aggregatable to any coarser grain without touching raw data —
    a plain countDistinct must reshuffle the full fact for every new
    grouping.

    ε-GATED hash-green (r15 verdict task 4): DuckDB has no sketch
    algebra, so the driver-checked claims are the two GUARANTEES —
    ``merge_ok`` (merged estimate within 5 % of exact) and ``drift_ok``
    (merged estimate within 2 % of the direct year-level sketch:
    sparse→dense promotion on union costs a few counts at small
    cardinality, the mergeability property itself) — both asserted
    in-plan against oracle literal TRUE, with the exact counts
    anchoring the hash. Bounds match the pins in
    tests/test_properties.py; HLL sketches are deterministic for fixed
    input."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mo")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = monthly.groupBy(F.year("mo").alias("yr")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__merged"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
    )
    direct = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("__direct"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"),
    )
    return (
        merged.join(F.broadcast(direct), "yr")
        .select(
            "yr",
            "n_months",
            "exact_distinct",
            (
                F.abs(F.col("__merged") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("merge_ok"),
            (
                F.abs(F.col("__merged") - F.col("__direct"))
                <= 0.02 * F.col("__direct")
            ).alias("drift_ok"),
        )
        .orderBy("yr")
    )


@register(
    "rel_lateral_topk",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c CROSS JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey <= 100
ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
""",
    tags=("sql", "join", "subquery"),
)
def rel_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-2 orders) — the
    ANSI form of grouped top-k, new SQL surface in Spark 4. The same
    statement text runs on both engines.

    Catalyst decorrelates the per-row subquery into a relational plan
    (rank-style rewrite over the correlation key) rather than
    re-executing it per outer row, so at scale this costs one fact
    shuffle — the same plan class as rel_topk_per_group — not
    #customers probe queries; the tie-break on o_orderkey makes the
    result deterministic for the hash compare."""
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c CROSS JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey <= 100
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@register(
    "src_xml_roundtrip",
    oracle="""
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       ROUND(SUM(ROUND(s_acctbal * 100)) / 100, 2) AS total_bal
FROM supplier GROUP BY s_nationkey
""",
    tags=("source", "eager-io"),
)
def src_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source (built-in connector since Spark 4): write
    supplier rows as <supplier> elements, read them back with an
    explicit schema, aggregate. Exact integer cents for the balance sum
    (registry float conventions)."""
    from ..sources.scratch import scratch_dir

    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    path = scratch_dir(prefix="rtpmdp_xml_")
    s.write.mode("overwrite").format("xml").option("rootTag", "suppliers").option(
        "rowTag", "supplier"
    ).save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE")
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (F.round(F.sum(F.round(F.col("s_acctbal") * 100)) / 100, 2)).alias("total_bal"),
    )


@register(
    "rel_python_udtf",
    oracle="""
WITH w AS (
  SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part
)
SELECT word, COUNT(*) AS n, CAST(MIN(length(word)) AS INT) AS wlen
FROM w GROUP BY word ORDER BY n DESC, word LIMIT 15
""",
    tags=("udf", "udtf"),
)
def rel_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 3.5+ ``@udtf``) — the
    1→many row UDF shape as a SQL-composable relation, completing the
    UDF surface matrix (scalar pandas_udf, grouped-agg, grouped-map,
    mapInPandas, UDTF). Tokenizes part names via LATERAL join, then a
    plain JVM-side aggregation on top. Arrow-optimized when available;
    the hot path stays in the aggregate, not the UDTF."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, wlen: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return  # no words — matches SQL UNNEST(string_split(NULL))
            for w in text.split(" "):
                yield w, len(w)

    spark.udtf.register("rtpmdp_split_words", SplitWords)
    p = _t(spark, sf_dir, "part")
    p.createOrReplaceTempView("rtpmdp_part_v")
    return spark.sql(
        """
        SELECT t.word, COUNT(*) AS n, CAST(MIN(t.wlen) AS INT) AS wlen
        FROM rtpmdp_part_v p, LATERAL rtpmdp_split_words(p.p_name) t
        GROUP BY t.word ORDER BY n DESC, word LIMIT 15
        """
    )


@register(
    "src_binaryfile_ingest",
    oracle="""
SELECT CAST(SUM(octet_length(encode(text)) + 1) AS BIGINT) AS total_bytes
FROM documents WHERE doc_id < 50
""",
    tags=("source", "multimodal", "eager-io"),
)
def src_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source (built-in): ingest opaque files as
    (path, length, content: binary) rows — the entry point a multimodal
    corpus (images/audio) uses at 100 TB. Round-trip: 50 documents
    written as text part-files, re-ingested as raw bytes; the oracle
    checks the partition-layout-independent invariant (total content
    bytes = text bytes + one newline per row)."""
    from ..sources.scratch import scratch_dir

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    path = scratch_dir(prefix="rtpmdp_binf_")
    d.select("text").write.mode("overwrite").text(path)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(path)
    )
    return files.agg(F.sum(F.length("content")).alias("total_bytes"))


@register(
    "rel_merge_upsert",
    oracle="""
WITH src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         (ROUND(o_totalprice * 100) + 100) / 100 AS o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', 100.0
  FROM orders WHERE o_orderkey % 101 = 0
),
merged AS (
  SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
              ELSE t.o_orderstatus END AS o_orderstatus,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
              ELSE t.o_totalprice END AS o_totalprice
  FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders) t
  FULL JOIN src s ON t.o_orderkey = s.o_orderkey
)
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS total_cents
FROM merged GROUP BY o_orderstatus
""",
    tags=("merge", "join"),
)
def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over plain parquet: a deterministic CDC
    batch (price bump + status 'U' for keys % 97, brand-new 'N' rows
    for keys % 101 shifted out of range) applied with
    ``operators.merge.merge_upsert`` (full-outer join, whole-row
    source-wins), then an audit aggregate. Exact integer cents
    throughout (registry float conventions)."""
    from ..operators.merge import merge_upsert

    t = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100)
    updates = t.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        ((cents + 100) / 100).alias("o_totalprice"),
    )
    inserts = t.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
    )
    merged = merge_upsert(t, updates.union(inserts), key_cols=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("total_cents"),
    )


@register(
    "rel_scd2_history",
    oracle="""
WITH hist AS (
  SELECT c_custkey, c_mktsegment, DATE '2024-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to
  FROM customer
),
upd AS (
  SELECT c_custkey, 'UPDATED' AS c_mktsegment, DATE '2024-06-01' AS valid_from
  FROM customer WHERE c_custkey % 53 = 0
),
closed AS (
  SELECT h.c_custkey, h.c_mktsegment, h.valid_from,
         CASE WHEN h.valid_to IS NULL AND u.c_custkey IS NOT NULL
              THEN u.valid_from ELSE h.valid_to END AS valid_to
  FROM hist h LEFT JOIN upd u ON h.c_custkey = u.c_custkey
),
scd AS (
  SELECT * FROM closed
  UNION ALL
  SELECT c_custkey, c_mktsegment, valid_from, CAST(NULL AS DATE) FROM upd
)
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
       CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
FROM scd GROUP BY c_mktsegment
""",
    tags=("merge", "temporal"),
)
def rel_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 historization (operators.merge.scd2_apply): a
    deterministic update batch re-segments every 53rd customer;
    current rows close at the update date, new versions open, history
    passes through. Audit: per-segment current/closed version counts."""
    from ..operators.merge import scd2_apply

    c = _t(spark, sf_dir, "customer")
    hist = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = c.filter(F.col("c_custkey") % 53 == 0).select(
        "c_custkey",
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("2024-06-01").cast("date").alias("valid_from"),
    )
    scd = scd2_apply(hist, upd, key_cols=["c_custkey"])
    return scd.groupBy("c_mktsegment").agg(
        F.sum(F.col("valid_to").isNull().cast("int")).cast("bigint").alias("n_current"),
        F.sum(F.col("valid_to").isNotNull().cast("int")).cast("bigint").alias("n_closed"),
    )


# ---------------------------------------------------------------------------
# Behavioral analytics over events (cohorts, funnels, robust outliers)
# ---------------------------------------------------------------------------


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events
  GROUP BY user_id
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(datediff('day', f.cohort_week, date_trunc('week', e.ts)) / 7
            AS BIGINT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
    tags=("events", "cohort", "agg"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of
    their first event, activity counted per week offset — the classic
    retention triangle.

    Scale: the first-event dimension aggregates on user_id, and the
    activity join shuffles on the same key, so one exchange of the fact
    side serves both; the final (cohort, offset) aggregate has bounded
    cardinality (weeks x offsets). No window function, no broadcast of
    the potentially-billion-row user dimension."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(firsts, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "events_funnel_steps",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchase_after_click
""",
    tags=("events", "funnel", "agg"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion view → click → purchase: each step must
    happen strictly AFTER the user's previous step (set-membership
    funnels overcount; the order predicate is the whole point).

    Scale: three per-user aggregates chained by equi-joins on user_id —
    every stage shuffles on the same key, so AQE reuses the
    partitioning; step filters prune each stage's fact scan before its
    shuffle. The three counts are 1-row aggregates crossed together
    (no driver collect)."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "events_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, median(ABS(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * 1.4826 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MAX(m.med), 4) AS med, ROUND(MAX(d.mad), 4) AS mad
FROM events e JOIN med m USING (event_type) JOIN dev d USING (event_type)
GROUP BY e.event_type
""",
    tags=("events", "stats", "quality"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation
    (3-sigma-equivalent 1.4826 scaling) — the quality gate that survives
    heavy-tailed value distributions where mean/stddev z-scores break.

    Scale: exact medians aggregate per event_type (bounded cardinality),
    so the two median passes and the final count shuffle tiny frames;
    the fact side joins the per-type stats by broadcast and stays
    map-side. The unrounded median/MAD feed the threshold on both
    engines, so the comparison is float-identical."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    stats = F.broadcast(med.join(dev, "event_type"))
    return (
        e.join(stats, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
        )
    )


@register(
    "rel_mode_per_group",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity
)
SELECT l_returnflag,
       (list(l_quantity ORDER BY n DESC, l_quantity ASC))[1] AS mode_qty,
       CAST(MAX(n) AS BIGINT) AS mode_count
FROM c GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def rel_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent l_quantity per
    returnflag, ties broken by the smallest value (Spark's
    ``mode(deterministic=true)`` contract — a bare mode() is
    tie-nondeterministic on BOTH engines, so the oracle pins the same
    tie-break explicitly).

    Scale: a two-level aggregate — (group, value) counts shuffle once,
    then reduce per group. Cardinality is bounded by distinct values per
    group; no window over the raw fact table."""
    l = _t(spark, sf_dir, "lineitem")
    m = l.groupBy("l_returnflag").agg(
        F.mode("l_quantity", True).alias("mode_qty")
    )
    counts = (
        l.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("l_returnflag")
        .agg(F.max("n").cast("bigint").alias("mode_count"))
    )
    return m.join(counts, "l_returnflag")


@register(
    "src_bucketed_join",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(ROUND(o.o_totalprice * 100)) / 100, 4) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("source", "partitioning", "join", "eager-io"),
)
def src_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: orders and customer are both
    written ``bucketBy(8, custkey)`` + sorted, then joined — the scan
    feeds SortMergeJoin with NO shuffle on either side (asserted in
    tests/test_scale_plans.py). At 100 TB this is the difference
    between re-shuffling the fact table on every join and paying the
    partitioning ONCE at write time; any downstream join or aggregate
    on the bucket key reuses the layout for free."""
    from ..sources.scratch import scratch_dir

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # external tables at a fresh per-process path: a MANAGED bucketed
    # table's warehouse directory outlives the in-memory metastore, and
    # the next process dies with LOCATION_ALREADY_EXISTS on create
    base = scratch_dir(prefix="rtpmdp_bucketed_")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .option("path", f"{base}/orders")
        .saveAsTable("rtpmdp_orders_bucketed")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .format("parquet")
        .option("path", f"{base}/customer")
        .saveAsTable("rtpmdp_customer_bucketed")
    )
    ob = spark.table("rtpmdp_orders_bucketed")
    cb = spark.table("rtpmdp_customer_bucketed")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact integer-cent sum (registry convention: fixed-decimal
            # data at large magnitude hash-matches in any partial order)
            (F.sum(F.round(F.col("o_totalprice") * 100)) / 100).alias("total"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            F.round("total", 4).alias("total"),
        )
    )


@register(
    "ts_resample_ohlc",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       ROUND(arg_min(value, ts), 4) AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       ROUND(arg_max(value, ts), 4) AS close,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
    tags=("timeseries", "agg", "events"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (hour, event_type) bar, the first/max/min/
    last value — the classic time-series resample (min_by/max_by keyed
    on the event timestamp; ts is unique per event so the selection is
    deterministic on both engines).

    Scale: a single hash aggregate — open/close are arg-selections
    inside the same partial-agg pass as high/low, so the fact table
    shuffles once on the bounded (hour, type) key and never sorts."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        epoch_us(F.date_trunc("hour", F.col("ts"))).alias("hour_start_us"),
        "event_type",
    ).agg(
        F.round(F.min_by("value", "ts"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", "ts"), 4).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rel_count_distinct_multi",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_part,
       COUNT(DISTINCT l_suppkey) AS nd_supp,
       COUNT(DISTINCT l_orderkey) AS nd_order,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def rel_count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT) over different columns in ONE aggregate —
    Catalyst plans this via Expand (one row replicated per distinct
    set), keeping a single shuffle instead of three self-joined
    aggregates. The plan every analytics dashboard hits.

    Scale: Expand multiplies rows x4 BEFORE the shuffle but each
    replica carries one key — partial aggregation collapses duplicates
    map-side, so the exchange moves near-distinct data, not the fact
    table."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.countDistinct("l_orderkey").alias("nd_order"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rel_observe_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN isfinite(l_extendedprice)
                     THEN ROUND(l_extendedprice * 100) END) AS BIGINT)
         AS price_cents,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discounted
FROM lineitem
""",
    tags=("observability", "agg"),
)
def rel_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API — pipeline observability without a second
    scan: metrics (row count, exact-cent revenue, discounted-line
    count) ride along the SAME job as the main query via
    ``df.observe`` accumulators, the mechanism a production pipeline
    uses for row-count reconciliation and data-quality counters at
    every stage for free.

    The driver-side ``observation.get`` is metric retrieval (a few
    scalars), not a data collect; the observed job here is a count.
    At 100 TB the observe pass costs nothing extra — accumulators
    piggyback the existing task results.

    The metric expressions MUST be total: an ANSI error inside an
    observe metric (e.g. cast of a NaN/Inf sum to bigint) is swallowed
    by the query-execution listener, so the job "succeeds" while the
    observation is never fulfilled and ``observation.get`` blocks the
    DRIVER forever — a hang, not a crash (found by the r11 NaN/Inf
    audit). price_cents therefore sums finite prices only, on both
    sides."""
    from pyspark.sql import Observation

    l = _t(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_profile")
    price = F.col("l_extendedprice")
    finite = ~F.isnan(price) & (F.abs(price) < F.lit(float("inf")))
    observed = l.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(finite, F.round(price * 100))).cast("bigint").alias(
            "price_cents"
        ),
        F.sum((F.col("l_discount") > 0.05).cast("int")).cast("bigint").alias(
            "n_discounted"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["price_cents"], m["n_discounted"])],
        "n_rows bigint, price_cents bigint, n_discounted bigint",
    )


@register(
    "rel_zorder_key",
    oracle="""
WITH z AS (
  SELECT c_custkey,
         list_sum(list_transform(range(0, 16),
           i -> ((c_custkey >> i) & 1) * (1::BIGINT << (2 * i))
              + ((c_nationkey >> i) & 1) * (1::BIGINT << (2 * i + 1))
         )) AS zkey
  FROM customer
)
SELECT CAST(zkey // 4096 AS BIGINT) AS zbucket, COUNT(*) AS n,
       CAST(MIN(zkey) AS BIGINT) AS zmin, CAST(MAX(zkey) AS BIGINT) AS zmax
FROM z GROUP BY 1
""",
    tags=("partitioning", "scalar"),
)
def rel_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order interleave of (custkey, nationkey) as a pure
    codegen expression, bucketed to show the space-filling-curve
    locality a ZORDER BY write exploits (tests/test_scale_plans.py
    demonstrates the actual file-level min/max pruning win vs a
    linear sort). Cross-engine bit-exact: both sides compute the same
    16-bit interleave arithmetic."""
    from ..functions.zorder import zorder_key

    c = _t(spark, sf_dir, "customer")
    z = c.select(zorder_key(F.col("c_custkey"), F.col("c_nationkey")).alias("zkey"))
    return z.groupBy(
        F.floor(F.col("zkey") / 4096).cast("bigint").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("zkey").cast("bigint").alias("zmin"),
        F.max("zkey").cast("bigint").alias("zmax"),
    )


@register(
    "src_compaction",
    oracle="""
SELECT 32 AS n_files_before, 2 AS n_files_after,
       COUNT(*) AS n_rows, CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT)
         AS price_cents
FROM orders
""",
    tags=("source", "maintenance", "eager-io"),
)
def src_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lake maintenance pass that keeps
    100 TB readable: a fragmented write (32 files) is rewritten to 2
    right-sized files via repartition, and the data round-trips
    byte-identically (row count + exact-cent sum pinned against the
    oracle; file counts are part of the contract).

    At scale the same plan runs per partition directory with
    maxRecordsPerFile bounding output size; compaction is a map-only
    shuffle-write, no aggregation."""
    import glob as _glob
    from ..sources.scratch import scratch_dir

    o = _t(spark, sf_dir, "orders")
    base = scratch_dir(prefix="rtpmdp_compact_")
    o.repartition(32).write.mode("overwrite").parquet(f"{base}/frag")
    n_before = len(_glob.glob(f"{base}/frag/part-*.parquet"))
    frag = spark.read.parquet(f"{base}/frag")
    frag.repartition(2).write.mode("overwrite").parquet(f"{base}/compact")
    n_after = len(_glob.glob(f"{base}/compact/part-*.parquet"))
    back = spark.read.parquet(f"{base}/compact")
    return back.agg(
        F.lit(n_before).alias("n_files_before"),
        F.lit(n_after).alias("n_files_after"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias(
            "price_cents"
        ),
    )


@register(
    "rel_session_window_builtin",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    tags=("events", "window", "session"),
)
def rel_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window`` aggregate in BATCH mode (30-min
    gap), checked against the first-principles lag+running-sum
    sessionization in SQL — the two constructions must agree on every
    session boundary. The built-in is one hash aggregate with session
    merging instead of two window passes; at scale that's one shuffle
    on user_id and no sort-based window state.

    Session end = last event + gap (the built-in's definition), so both
    sides project start/end identically."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            epoch_us(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "rel_heavy_hitters",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events WHERE event_type IS NOT NULL
GROUP BY event_type
HAVING COUNT(*) > (SELECT COUNT(*) FROM events
                   WHERE event_type IS NOT NULL) / 20.0
""",
    tags=("agg", "approx", "skew"),
)
def rel_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Values exceeding 1/20 of the events stream, found by distributed
    Misra-Gries (O(k) memory per partition, at most k candidates
    shuffled per partition instead of every distinct value) with an
    exact second pass — so the result is EXACT and the oracle checks it
    with a plain GROUP BY/HAVING. The hot-key detector that decides
    when ``rel_salted_join``'s salting is needed."""
    from ..operators.skew import heavy_hitters

    e = _t(spark, sf_dir, "events")
    return heavy_hitters(e, "event_type", k=20)


@register(
    "ts_ewma_last",
    oracle="""
WITH o AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(SUM(CASE WHEN rn = 1 THEN power(0.7, n - 1) * value
                      ELSE 0.3 * power(0.7, n - rn) * value END), 4) AS ewma
FROM o GROUP BY user_id
""",
    tags=("timeseries", "udf", "stats"),
)
def ts_ewma_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user final EWMA (α=0.3) of the event value series — the
    recursive definition runs as an applyInPandas state fold, while the
    oracle expands the same quantity in closed form
    (Σ α(1-α)^(N-i)·vᵢ + (1-α)^(N-1)·v₁); agreement at 4 dp pins both
    the math and the per-key ordering."""
    from ..operators.timeseries import ewma_last

    e = _t(spark, sf_dir, "events")
    return ewma_last(e, key_col="user_id", ts_col="ts", value_col="value", alpha=0.3)
