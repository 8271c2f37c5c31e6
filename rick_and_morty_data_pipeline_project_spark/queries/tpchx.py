"""Extended TPC-H-analog catalog: the remaining classic query shapes
adapted to the reduced synthetic schema (no partsupp/shipmode/phone
columns — each analog keeps the original's *operator shape* and swaps
the missing column for an existing one).

Shapes covered here and why they matter at 100 TB:

* q7/q8/q9  — multi-way joins where one dimension (nation) plays TWO
  roles (supplier side + customer side): tests alias-correct broadcast
  of the same table twice, and conditional-share aggregation.
* q10/q18   — fact⋈fact join feeding a top-k: `TakeOrderedAndProject`
  after the aggregate, never a full sort.
* q13       — LEFT OUTER join + two-level aggregation (count per
  customer, then histogram of counts): the second agg is tiny; the
  first is map-side combinable.
* q14       — conditional share (CASE inside sum / total sum) in one
  pass over the fact table.
* q15       — windowed global max over an aggregate (scalar-subquery
  shape) — one extra exchange over the *aggregated* (small) relation,
  never over the fact table.
* q17       — correlated per-part average: decorrelates to an
  aggregate + re-join on p_partkey; Spark plans the agg side map-side
  combinable, and the join shuffles only (partkey, avg) pairs.
* q19       — disjunctive (OR-of-ANDs) join predicates: stays a single
  equi-join on partkey with the disjunction as a post-join filter —
  no cross product.
* q22       — anti join + global scalar aggregate (avg) broadcast into
  the filter.
* window extensions — ntile/percent_rank/cume_dist/dense_rank,
  first/last/nth_value with explicit frames, RANGE (value-based)
  frames: all single-exchange window plans on the partition key.
* join_range_user_window — event-time interval join (range join):
  equi on user_id + time-range condition; at scale this is the
  bucketed-by-user, sorted-by-ts layout feeding a sort-merge join.

Float parity with the DuckDB oracle follows _util's decimal-sum
strategy; every computed column is aliased identically in both texts.
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


def _revenue():
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )


# --------------------------------------------------------------------------
# q7: volume shipping between two nations (nation joined in two roles)
# --------------------------------------------------------------------------
def q7_volume_shipping(spark, sf_dir):
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# q8: market share of one supplier nation within a customer region
# --------------------------------------------------------------------------
def q8_market_share(spark, sf_dir):
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation")  # customer nation, restricted to region
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    vol = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT o_year,
       CAST(SUM(nation_volume) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         CASE WHEN n1.n_name = 'NATION_3'
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
              ELSE CAST(0 AS DECIMAL(14,4)) END AS nation_volume
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# q9: product-type profit by nation and year (no partsupp → revenue-only)
# --------------------------------------------------------------------------
def q9_profit_by_nation_year(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE contains(p_name, 'blue')
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# q10: returned-item reporting — top 20 customers by lost revenue
# --------------------------------------------------------------------------
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q13: customer order-count distribution (left outer join + double agg)
# --------------------------------------------------------------------------
def q13_customer_order_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q14: promotion revenue share for one month (conditional share, one pass)
# --------------------------------------------------------------------------
def q14_promo_revenue(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    vol = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# --------------------------------------------------------------------------
# q15: top supplier(s) by quarterly revenue (global max over aggregate)
# --------------------------------------------------------------------------
def q15_top_supplier(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = (
        l.groupBy("l_suppkey")
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    # Global max as a window over the (small) aggregated relation — the
    # scalar-subquery shape without re-scanning the fact table.
    w = Window.partitionBy()
    top = rev.withColumn("_mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# q17: small-quantity-order revenue (correlated per-part average)
# --------------------------------------------------------------------------
def q17_small_quantity_revenue(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    l = t(spark, sf_dir, "lineitem")
    # Decorrelated form: per-part average quantity, joined back.
    per_part = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (davg("l_quantity")).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# --------------------------------------------------------------------------
# q18: large-volume orders (HAVING over fact agg, join back, top-k)
# --------------------------------------------------------------------------
def q18_large_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            iso_date(F.col("o_orderdate")).alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# q19: disjunctive (OR-of-ANDs) join predicates — single equi-join,
# disjunction evaluated post-join, no cross product
# --------------------------------------------------------------------------
def q19_disjunctive_predicates(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


# --------------------------------------------------------------------------
# q22: idle wealthy customers (global scalar avg + anti join)
# --------------------------------------------------------------------------
def q22_idle_customers(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal") / F.count(F.lit(1))).alias("a"))
        .first()[0]
    )
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# window extensions: distribution ranks, value-position functions,
# RANGE (value-based) frames
# --------------------------------------------------------------------------
def win_ntile_rank_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


WIN_NTILE_SQL = """
SELECT o_orderkey, o_orderstatus,
       NTILE(4) OVER w AS quartile,
       DENSE_RANK() OVER w AS drank,
       PERCENT_RANK() OVER w AS prank,
       CUME_DIST() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


def win_first_last_nth(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(base).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    )


WIN_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def win_range_frame(spark, sf_dir):
    """Value-based (RANGE) frame: peers within 500.0 of the current
    price count toward the sum — frame membership is by VALUE, so ties
    are handled identically in any engine (no row-order ambiguity)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-500, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.sum(dec("o_totalprice", 14, 2)).over(w).cast("double").alias(
            "near_price_sum"
        ),
        F.count(F.lit(1)).over(w).alias("near_price_cnt"),
    )


WIN_RANGE_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS near_price_sum,
       COUNT(*) OVER w AS near_price_cnt
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# event-time interval (range) join: clicks preceding each purchase
# --------------------------------------------------------------------------
def join_range_user_window(spark, sf_dir):
    """For each purchase, count same-user clicks in the preceding 2 h.
    Equi key (user_id) + range condition on ts: Spark plans a sort-merge
    join keyed on user_id with the range as a join filter; at scale the
    input is bucketed by user_id and sorted by ts, so the merge is
    co-located (extraq.join_asof_click_error uses the union-based as-of
    form — this is the general interval-join shape)."""
    e = t(spark, sf_dir, "events")
    buy = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    click = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (buy.user_id == click.c_uid)
        & (click.c_ts >= buy.ts - F.expr("INTERVAL 2 HOURS"))
        & (click.c_ts < buy.ts)
    )
    return (
        buy.join(click, cond, "left_outer")
        .groupBy("event_id", "user_id")
        .agg(F.count("c_ts").alias("clicks_2h_before"))
    )


def join_interval_bucketized(spark, sf_dir):
    """KEYLESS interval join — point-in-interval with NO equi column —
    rewritten as a bucketized equi-join (the standard range-join
    decomposition Spark lacks natively; Databricks' range-join hint
    and DuckDB's IEJoin solve the same problem).

    Promo windows are derived deterministically from the order-date
    span (one per 7-day stride, lengths 3 + (i² mod 23) days — 3..25,
    so windows OVERLAP and span 1..4 buckets: the general case, not
    the aligned-stride degenerate).  Naively `orders ⋈ promos ON
    o_orderdate BETWEEN p_start AND p_end` has no equi key, so Spark
    plans BroadcastNestedLoopJoin — |orders|·|promos| comparisons.
    Instead both sides map to 7-day bucket indexes (intervals EXPLODE
    to every bucket they overlap — ≤4 rows each; points map to exactly
    one), the join runs on the bucket key, and the BETWEEN survives
    only as a residual filter on collided rows.  Each (order, promo)
    pair can meet on at most ONE bucket (the order's), so no dedup
    step is needed.  At 100 TB this is a plain shuffle/broadcast HASH
    join whose cost tracks interval density per bucket, not the cross
    product.

    Float parity: revenue is an exact decimal sum cast to double (two
    decimal places, exact); counts are longs; dates print as ISO
    strings.  Empty promos are kept via the left spine join (0 rows,
    0.0 revenue) so window coverage itself is hash-checked.
    """
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("_d"),
        dec("o_totalprice").alias("_price"),
    )
    b = o.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    promos = b.select(
        "_d0",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.datediff("_d1", "_d0") / 7).cast("int"),
            )
        ).alias("promo_id"),
    ).select(
        F.col("promo_id").cast("long").alias("promo_id"),
        "_d0",
        F.date_add("_d0", F.col("promo_id") * 7).alias("p_start"),
        F.date_add(
            "_d0",
            F.col("promo_id") * 7
            + F.lit(3)
            + (F.col("promo_id") * F.col("promo_id")) % 23,
        ).alias("p_end"),
    )
    pb = promos.select(
        "promo_id",
        "p_start",
        "p_end",
        F.explode(
            F.sequence(
                F.floor(F.datediff("p_start", "_d0") / 7).cast("int"),
                F.floor(F.datediff("p_end", "_d0") / 7).cast("int"),
            )
        ).alias("_bk"),
    )
    ob = o.crossJoin(F.broadcast(b)).select(
        "_d",
        "_price",
        F.floor(F.datediff("_d", "_d0") / 7).cast("int").alias("_bk"),
    )
    counted = (
        ob.join(pb, "_bk")
        .filter((F.col("_d") >= F.col("p_start")) & (F.col("_d") <= F.col("p_end")))
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_price").alias("_rev"),
        )
    )
    return promos.join(counted, "promo_id", "left").select(
        "promo_id",
        F.date_format("p_start", "yyyy-MM-dd").alias("p_start"),
        F.date_format("p_end", "yyyy-MM-dd").alias("p_end"),
        F.coalesce("_n", F.lit(0)).alias("n_orders"),
        F.round(
            F.coalesce(F.col("_rev").cast("double"), F.lit(0.0)), 2
        ).alias("revenue"),
    )


JOIN_INTERVAL_SQL = """
WITH b AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS d0,
         max(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
),
promos AS (
  SELECT CAST(i AS BIGINT) AS promo_id,
         d0 + CAST(7 * i AS INTEGER) AS p_start,
         d0 + CAST(7 * i + 3 + (i * i) % 23 AS INTEGER) AS p_end
  FROM (SELECT d0, unnest(generate_series(0, CAST((d1 - d0) // 7 AS BIGINT))) AS i
        FROM b)
),
agg AS (
  SELECT p.promo_id, count(*) AS n_orders,
         round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
           AS revenue
  FROM promos p
  JOIN orders o
    ON CAST(o.o_orderdate AS DATE) BETWEEN p.p_start AND p.p_end
  GROUP BY 1
)
SELECT p.promo_id,
       strftime(p.p_start, '%Y-%m-%d') AS p_start,
       strftime(p.p_end, '%Y-%m-%d') AS p_end,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(a.revenue, 0.0) AS revenue
FROM promos p LEFT JOIN agg a USING (promo_id)
"""


JOIN_RANGE_SQL = """
SELECT a.event_id, a.user_id, COUNT(b.ts) AS clicks_2h_before
FROM events a
LEFT OUTER JOIN events b
  ON a.user_id = b.user_id
 AND b.event_type = 'click'
 AND b.ts >= a.ts - INTERVAL 2 HOUR
 AND b.ts <  a.ts
WHERE a.event_type = 'purchase'
GROUP BY a.event_id, a.user_id
"""


# --------------------------------------------------------------------------
# approximate aggregation (sketch surface) — engine-specific HLL/KLL
# sketches can't hash-match another engine, so the entry is rows-only;
# tests/test_approx.py bounds the relative error against the exact count
# --------------------------------------------------------------------------
def agg_approx_distinct(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx(F.col("l_extendedprice"), 0.5, 10000).alias(
            "approx_median_price"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def agg_exact_distinct(spark, sf_dir):
    """Exact twin of ``agg_approx_distinct`` (full DuckDB oracle): the
    same grouping with an exact COUNT(DISTINCT).  The sketch variant is
    error-bound-tested in tests/test_approx.py; this entry gives the
    distinct-aggregation surface a hash-verifiable correctness row."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_EXACT_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def agg_approx_distinct_audit(spark, sf_dir):
    """Driver-checkable contract of the approximate-aggregation
    surface (the rows-only ``agg_approx_distinct``'s audit twin):
    per group, the exact distinct count and row count (DuckDB
    hash-verified) plus Spark-computed booleans the oracle pins TRUE —

    * ``acd_ok``: ``approx_count_distinct(rsd=0.02)`` within 3·rsd of
      the exact distinct (3σ of the HLL++ relative standard error,
      floor 3 for tiny groups);
    * ``median_ok``: ``percentile_approx(0.5, accuracy=10000)``
      returns a REAL data value whose rank sits within the documented
      n/accuracy rank-error window of the true median rank (checked by
      counting values ≤/< the returned value — the guarantee the
      accuracy parameter actually makes, not a value-distance heuristic).

    Scale: the first aggregate is the production plan; the rank check
    joins the 3-row result back to the fact broadcast and re-counts —
    two extra fact scans in total (the broadcast median side recomputes
    the 3-row aggregate; Catalyst does not share the subtree), bounded
    and audit-only.
    """
    l = t(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_acd"),
        F.percentile_approx(F.col("l_extendedprice"), 0.5, 10000).alias(
            "_med"
        ),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ranks = (
        l.join(
            F.broadcast(agg.select("l_returnflag", "_med")), "l_returnflag"
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") <= F.col("_med")).cast("long")
            ).alias("_cnt_le"),
            F.sum(
                (F.col("l_extendedprice") < F.col("_med")).cast("long")
            ).alias("_cnt_lt"),
        )
    )
    tol = (F.col("n_rows") / F.lit(10000.0) + F.lit(1.0))
    target = F.col("n_rows") * F.lit(0.5)
    return (
        agg.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("_acd") - F.col("exact_parts"))
                <= F.greatest(
                    F.lit(3.0), 3 * 0.02 * F.col("exact_parts")
                )
            ).alias("acd_ok"),
            (
                (F.col("_cnt_le") >= F.floor(target) - tol)
                & (F.col("_cnt_lt") <= F.ceil(target) + tol)
            ).alias("median_ok"),
        )
    )


AGG_APPROX_AUDIT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n_rows,
       TRUE AS acd_ok,
       TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
"""


def supplier_market_hhi(spark, sf_dir):
    """Herfindahl-Hirschman market-concentration index per supplier
    nation: each supplier's revenue share within its nation, squared
    and summed — the antitrust-style concentration audit (HHI → 10000
    = monopoly, → 10000/n = perfect competition) a marketplace or
    spend pipeline runs per segment.

    Scale: one fact scan → supplier-keyed decimal revenue aggregate
    (map-side combinable) → broadcast nation join → nation-window
    share computation over the SUPPLIER-GRAIN relation (bounded by
    |suppliers|, never fact rows) → |nations|-row output.

    Float parity: revenues are exact decimal sums; each share divides
    two exact doubles; HHI sums |suppliers-per-nation| doubles whose
    order noise dies at round 4.
    """
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", dec("l_extendedprice").alias("_p")
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum("_p").alias("_rev"))
        .join(
            F.broadcast(sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("s_nationkey")
    share = F.col("_rev").cast("double") / F.sum("_rev").over(w).cast(
        "double"
    )
    return (
        rev.select(
            "s_nationkey",
            (share * share).alias("_sh2"),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("_sh2") * 10000, 4).alias("hhi"),
        )
    )


SUPPLIER_HHI_SQL = """
WITH rev AS (
  SELECT s_nationkey, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS r
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
sh AS (
  SELECT s_nationkey,
         CAST(r AS DOUBLE) / CAST(SUM(r) OVER (PARTITION BY s_nationkey)
                                  AS DOUBLE) AS share
  FROM rev
)
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       ROUND(SUM(share * share) * 10000, 4) AS hhi
FROM sh
GROUP BY s_nationkey
"""


def topk_salted_segment_orders(spark, sf_dir):
    """Per-market-segment 5 cheapest orders through the SALTED
    two-stage top-k (``operators/topk.grouped_topk_salted``) — the
    designated scale escape hatch for per-group ranking on a
    LOW-CARDINALITY group key (5 segments): a plain
    ``row_number() over (partition by segment)`` collapses to 5 tasks,
    each sorting a fifth of the fact table; the salted form ranks
    within (segment, salt) first — parallelism 5×32, per-task input
    1/32nd of a segment — then re-ranks only the ≤ 32·k survivors.
    Exactness: min-k(∪ per-bucket min-k) = min-k(all rows); ties on
    o_totalprice break by o_orderkey inside each bucket and again in
    the bounded stage 2, so the selection is the plain window's
    bit-for-bit (oracle = the single DuckDB rank window).

    Plan-pinned in tests/test_plans.py: two Window nodes, stage 1
    partitioned by the salt, broadcast dim join, no global
    single-partition sort.  Exercises the same operator the
    source-mixture sampler dispatches to above its per-source cap
    (VERDICT r7 item 7).
    """
    from rick_and_morty_data_pipeline_project_spark.operators.topk import (
        grouped_topk_salted,
    )

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select("c_mktsegment", "o_orderkey", "o_totalprice")
    top = grouped_topk_salted(
        joined, ["c_mktsegment"], "o_totalprice", 5, tiebreak="o_orderkey"
    )
    return top.select(
        "c_mktsegment",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
    )


TOPK_SALTED_SQL = """
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(o.o_totalprice AS DOUBLE) AS total_price,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey, total_price
FROM ranked WHERE rn <= 5
"""


QUERIES: dict[str, Q] = {
    "q7_volume_shipping": Q(q7_volume_shipping, Q7_SQL),
    "topk_salted_segment_orders": Q(
        topk_salted_segment_orders, TOPK_SALTED_SQL
    ),
    "supplier_market_hhi": Q(supplier_market_hhi, SUPPLIER_HHI_SQL),
    "q8_market_share": Q(q8_market_share, Q8_SQL),
    "q9_profit_by_nation_year": Q(q9_profit_by_nation_year, Q9_SQL),
    "q10_returned_items": Q(q10_returned_items, Q10_SQL),
    "q13_customer_order_distribution": Q(
        q13_customer_order_distribution, Q13_SQL
    ),
    "q14_promo_revenue": Q(q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": Q(q15_top_supplier, Q15_SQL),
    "q17_small_quantity_revenue": Q(q17_small_quantity_revenue, Q17_SQL),
    "q18_large_orders": Q(q18_large_orders, Q18_SQL),
    "q19_disjunctive_predicates": Q(q19_disjunctive_predicates, Q19_SQL),
    "q22_idle_customers": Q(q22_idle_customers, Q22_SQL),
    "win_ntile_rank_stats": Q(win_ntile_rank_stats, WIN_NTILE_SQL),
    "win_first_last_nth": Q(win_first_last_nth, WIN_FIRST_LAST_SQL),
    "win_range_frame": Q(win_range_frame, WIN_RANGE_SQL),
    "join_range_user_window": Q(join_range_user_window, JOIN_RANGE_SQL),
    "join_interval_bucketized": Q(
        join_interval_bucketized, JOIN_INTERVAL_SQL
    ),
    "agg_approx_distinct": Q(agg_approx_distinct, None),
    "agg_exact_distinct": Q(agg_exact_distinct, AGG_EXACT_DISTINCT_SQL),
    "agg_approx_distinct_audit": Q(
        agg_approx_distinct_audit, AGG_APPROX_AUDIT_SQL
    ),
}
