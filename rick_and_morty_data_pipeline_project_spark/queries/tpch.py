"""Relational operator inventory over the TPC-H-ish corpus.

One named query per operator family from SURVEY.md §2 (scans/filters/
projections, equi/semi/anti/self joins, hash aggregation + distinct +
rollup/cube, window ranking/analytic/frames, sorts/limits/two-stage
top-k, set ops, scalar string/date/math/json functions, time-bucket
aggregation).  Every query has an exactly-matching DuckDB oracle (see
_util.Q).  Plans are designed for scale: dims broadcast, top-k via
TakeOrderedAndProject, aggregates map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.queries._util import (
    Q,
    davg,
    dec,
    dsum,
    iso_date,
    t,
)


# --------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — scan + filter + hash agg
# --------------------------------------------------------------------------
def q1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + dec("l_tax", 4, 2))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 4, 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q2: filter + projection pushdown — predicate reaches the parquet scan
# --------------------------------------------------------------------------
def q2_scan_filter_project(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-02-01"))
            & (F.col("l_discount") >= 0.09)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            iso_date(F.col("l_shipdate")).alias("ship_date"),
        )
    )


Q2_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-02-01'
  AND l_discount >= 0.09
"""


# --------------------------------------------------------------------------
# q3: shipping-priority join (TPC-H Q3 shape) — fact⋈fact⋈dim + top-k
# --------------------------------------------------------------------------
def q3_top_unshipped_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            iso_date(F.col("o_orderdate")).alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q4: order-priority count with EXISTS — left-semi join
# --------------------------------------------------------------------------
def q4_order_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    late = t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q5: local-supplier volume (TPC-H Q5 shape) — 6-way join, broadcast dims
# --------------------------------------------------------------------------
def q5_nation_volume(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, r_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name, r_name
"""


# --------------------------------------------------------------------------
# q6: forecast revenue — pure scan-aggregate (no join, no group)
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# join family: anti / semi / self
# --------------------------------------------------------------------------
def join_anti_customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_semi_customers_with_open_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_acctbal")
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_self_lineitem_pairs(spark, sf_dir):
    """Self-join (JOIN-2 analog): pairs of line items of the same order."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a = l.alias("a")
    b = l.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_linenumber") < F.col("b.l_linenumber"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


JOIN_SELF_SQL = """
SELECT a.l_orderkey AS l_orderkey, COUNT(*) AS n_pairs
FROM lineitem a
JOIN lineitem b ON a.l_orderkey = b.l_orderkey
WHERE a.l_linenumber < b.l_linenumber
GROUP BY a.l_orderkey
"""


# --------------------------------------------------------------------------
# aggregation family: distinct / rollup / cube
# --------------------------------------------------------------------------
def agg_distinct_suppliers(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def agg_rollup_region_nation(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum("c_acctbal").alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


AGG_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (neither rollup nor cube) + grouping_id
    to label which set each output row belongs to.  Same ANSI text on
    both engines via a registered view."""
    from rick_and_morty_data_pipeline_project_spark.sources.corpus import (
        register_views,
    )

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(AGG_GROUPING_SETS_SQL)


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_percentiles(spark, sf_dir):
    """Exact continuous percentiles (linear interpolation) per group —
    Spark `percentile` ≡ DuckDB `quantile_cont` on the same sorted set.
    Values are quantized to 2 decimals before the percentile so the
    interpolation arithmetic is identical in both engines."""
    l = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)").cast("double")
    return l.groupBy("l_returnflag").agg(
        F.percentile(qty, 0.5).alias("p50_qty"),
        F.percentile(qty, 0.9).alias("p90_qty"),
        F.round(F.percentile(F.col("l_extendedprice").cast("decimal(12,2)").cast("double"), 0.99), 4).alias("p99_price"),
    )


AGG_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 0.5) AS p50_qty,
       quantile_cont(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 0.9) AS p90_qty,
       round(quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE), 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
"""


def agg_cube_flag_status(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_sorted_string(spark, sf_dir):
    """Ordered string aggregation per nation (deterministic collect)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias(
                "suppliers"
            )
        )
    )


AGG_STRING_SQL = """
SELECT n_name, array_to_string(list_sort(list(s_name)), ',') AS suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# window family: ranking / analytic (lag) / frames (running, moving)
# --------------------------------------------------------------------------
def win_rank_top_orders_per_customer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


WIN_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


def win_lag_order_gap(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        iso_date(F.col("o_orderdate")).alias("order_date"),
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


WIN_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       date_diff('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                 o_orderdate)::INT AS days_since_prev
FROM orders
"""


def win_running_total(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


WIN_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def win_moving_avg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    msum = F.sum(dec("o_totalprice")).over(w).cast("double")
    mcnt = F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (msum / mcnt).alias("moving_avg3"),
    )


WIN_MOVING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# sort / limit / two-stage top-k (TOPK-1, the reference's signature operator)
# --------------------------------------------------------------------------
def sort_limit_top_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


def topk_two_stage_parts(spark, sf_dir):
    """TOPK-1 semantics (ipynb:160): top-100 by retailprice desc, then
    top-5 of those by size desc — NOT the same as ORDER BY price,size."""
    from rick_and_morty_data_pipeline_project_spark.operators.topk import two_stage_topk

    p = t(spark, sf_dir, "part")
    return two_stage_topk(
        p, "p_retailprice", "p_size", k1=100, k2=5, tiebreak="p_partkey"
    ).select("p_partkey", "p_name", "p_retailprice", "p_size")


TOPK_TWO_STAGE_SQL = """
SELECT p_partkey, p_name, p_retailprice, p_size
FROM (
  SELECT * FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 100
)
ORDER BY p_size DESC, p_partkey ASC
LIMIT 5
"""


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------
def set_ops_customers(spark, sf_dir):
    """UNION/INTERSECT/EXCEPT over customer-key sets, tagged per op."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    u = building.union(with_orders).distinct().withColumn("op", F.lit("union"))
    i = building.intersect(with_orders).withColumn("op", F.lit("intersect"))
    # subtract() is set-semantics EXCEPT, structurally matching the
    # oracle (exceptAll().distinct() diverges when the left side holds
    # duplicate keys that also appear on the right).
    e = building.subtract(with_orders).withColumn("op", F.lit("except"))
    return u.union(i).union(e)


SET_OPS_SQL = """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM with_orders)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM with_orders)
UNION ALL
SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM with_orders)
"""


# --------------------------------------------------------------------------
# scalar function families
# --------------------------------------------------------------------------
def scalar_string_functions(spark, sf_dir):
    """STR-1..7: lower/capitalize/trim/replace/split-join/contains/concat."""
    from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
        capitalize_col,
        normalize_name_col,
    )

    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.lower(name).alias("lower_name"),
        F.upper(name).alias("upper_name"),
        capitalize_col(name).alias("cap_name"),
        normalize_name_col(name).alias("slug_name"),
        name.contains("blue").cast("int").alias("has_blue"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 5).alias("name_prefix"),
        F.concat_ws("::", F.lit("part"), name).alias("tagged"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       lower(p_name) AS lower_name,
       upper(p_name) AS upper_name,
       upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS cap_name,
       array_to_string(string_split_regex(trim(replace(replace(p_name, ',', ''), ':', '')), '\\s+'), '_') AS slug_name,
       CASE WHEN contains(p_name, 'blue') THEN 1 ELSE 0 END AS has_blue,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_prefix,
       'part' || '::' || p_name AS tagged
FROM part
WHERE p_partkey <= 500
"""


def scalar_datetime_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        (F.dayofweek(d) - 1).alias("dow_sun0"),
        F.quarter(d).alias("order_quarter"),
        iso_ts_col(F.date_trunc("month", d)).alias("month_start"),
        iso_date(F.date_add(d.cast("date"), 30)).alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date")).alias(
            "days_to_1999"
        ),
    )


def iso_ts_col(c):
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


SCALAR_DATETIME_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       dayofweek(o_orderdate) AS dow_sun0,
       quarter(o_orderdate) AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       date_diff('day', o_orderdate::DATE, DATE '1999-01-01') AS days_to_1999
FROM orders
WHERE o_orderkey <= 3000
"""


def scalar_math_functions(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 3000)
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("abs_dev"),
        F.round(p / 1000, 2).alias("price_k"),
        F.ceil(q / 7).cast("long").alias("ceil_weeks"),
        F.floor(q / 7).cast("long").alias("floor_weeks"),
        F.round(F.sqrt(q), 9).alias("sqrt_qty"),
        F.round(F.log(p), 9).alias("ln_price"),
        (q % 5).alias("mod5"),
        F.pow(q, F.lit(2)).alias("qty_sq"),
        F.greatest(q, F.lit(10.0)).alias("clamped"),
        F.least(q, F.lit(40.0)).alias("capped"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25) AS abs_dev,
       round(l_extendedprice / 1000, 2) AS price_k,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_weeks,
       CAST(floor(l_quantity / 7) AS BIGINT) AS floor_weeks,
       round(sqrt(l_quantity), 9) AS sqrt_qty,
       round(ln(l_extendedprice), 9) AS ln_price,
       fmod(l_quantity, 5) AS mod5,
       pow(l_quantity, 2) AS qty_sq,
       greatest(l_quantity, 10.0) AS clamped,
       least(l_quantity, 40.0) AS capped
FROM lineitem
WHERE l_orderkey <= 3000
"""


def scalar_json_functions(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


SCALAR_JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


def scalar_variant_functions(spark, sf_dir):
    """Spark 4 VARIANT path over the semi-structured props column —
    the open-schema complement of ``scalar_json_functions``'s string
    extraction: ``parse_json`` decodes each row into the binary
    variant encoding once, typed fields come out via ``variant_get``
    (no per-access string re-parse — the 100 TB reason VARIANT exists),
    ``schema_of_variant`` audits schema uniformity, and a
    ``to_json → parse_json`` round trip over a nested struct pins the
    encode/decode cycle (doubles survive exactly — shortest-round-trip
    serialization).

    Oracle: DuckDB's JSON functions extract the same VALUES
    (json_extract_string / json_structure) — the variant ENCODING is
    engine-internal, the extracted data is what the hash certifies.
    """
    e = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    nested = F.parse_json(
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.struct(F.col("value").alias("v")).alias("inner"),
            )
        )
    )
    return (
        e.select(
            "event_type",
            F.variant_get(v, "$.k", "int").alias("_k"),
            F.schema_of_variant(v).alias("_sch"),
            F.variant_get(nested, "$.inner.v", "double").alias("_vv"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_k").alias("sum_k"),
            F.count_distinct("_sch").alias("n_schemas"),
            F.round(F.sum("_vv"), 4).alias("sum_value"),
        )
    )


SCALAR_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       CAST(COUNT(DISTINCT json_structure(props)) AS BIGINT) AS n_schemas,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# events: time-bucket (tumbling-window) aggregation + conditional agg
# --------------------------------------------------------------------------
def events_hourly_rollup(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_conditional_agg(spark, sf_dir):
    """Pivot-style conditional aggregation per user (CASE WHEN inside agg)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value", 18, 6))
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .filter((F.col("clicks") > 0) | (F.col("purchases") > 0))
    )


EVENTS_COND_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase_value
FROM events
GROUP BY user_id
HAVING COUNT(CASE WHEN event_type = 'click' THEN 1 END) > 0
    OR COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
"""


QUERIES: dict[str, Q] = {
    "q1_pricing_summary": Q(q1_pricing_summary, Q1_SQL),
    "q2_scan_filter_project": Q(q2_scan_filter_project, Q2_SQL),
    "q3_top_unshipped_orders": Q(q3_top_unshipped_orders, Q3_SQL),
    "q4_order_priority": Q(q4_order_priority, Q4_SQL),
    "q5_nation_volume": Q(q5_nation_volume, Q5_SQL),
    "q6_forecast_revenue": Q(q6_forecast_revenue, Q6_SQL),
    "join_anti_customers_without_orders": Q(
        join_anti_customers_without_orders, JOIN_ANTI_SQL
    ),
    "join_semi_customers_with_open_orders": Q(
        join_semi_customers_with_open_orders, JOIN_SEMI_SQL
    ),
    "join_self_lineitem_pairs": Q(join_self_lineitem_pairs, JOIN_SELF_SQL),
    "agg_distinct_suppliers": Q(agg_distinct_suppliers, AGG_DISTINCT_SQL),
    "agg_rollup_region_nation": Q(agg_rollup_region_nation, AGG_ROLLUP_SQL),
    "agg_cube_flag_status": Q(agg_cube_flag_status, AGG_CUBE_SQL),
    "agg_grouping_sets": Q(agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "agg_percentiles": Q(agg_percentiles, AGG_PERCENTILES_SQL),
    "agg_sorted_string": Q(agg_sorted_string, AGG_STRING_SQL),
    "win_rank_top_orders_per_customer": Q(
        win_rank_top_orders_per_customer, WIN_RANK_SQL
    ),
    "win_lag_order_gap": Q(win_lag_order_gap, WIN_LAG_SQL),
    "win_running_total": Q(win_running_total, WIN_RUNNING_SQL),
    "win_moving_avg": Q(win_moving_avg, WIN_MOVING_SQL),
    "sort_limit_top_orders": Q(sort_limit_top_orders, SORT_LIMIT_SQL),
    "topk_two_stage_parts": Q(topk_two_stage_parts, TOPK_TWO_STAGE_SQL),
    "set_ops_customers": Q(set_ops_customers, SET_OPS_SQL),
    "scalar_string_functions": Q(scalar_string_functions, SCALAR_STRING_SQL),
    "scalar_datetime_functions": Q(
        scalar_datetime_functions, SCALAR_DATETIME_SQL
    ),
    "scalar_math_functions": Q(scalar_math_functions, SCALAR_MATH_SQL),
    "scalar_json_functions": Q(scalar_json_functions, SCALAR_JSON_SQL),
    "scalar_variant_functions": Q(
        scalar_variant_functions, SCALAR_VARIANT_SQL
    ),
    "events_hourly_rollup": Q(events_hourly_rollup, EVENTS_HOURLY_SQL),
    "events_conditional_agg": Q(events_conditional_agg, EVENTS_COND_SQL),
}
