"""Final five TPC-H-analog shapes (q11, q12, q16, q20, q21) — completes
the full 22-query TPC-H-analog set over the reduced synthetic schema
(no partsupp/shipmode/commitdate; each analog keeps the original's
*operator shape* and swaps missing columns for existing ones).

Why each shape matters at 100 TB:

* q11 — grouped aggregate filtered against a scalar aggregate of ITSELF
  (share-of-total threshold).  The total is a window over the already-
  aggregated (small) relation, so the fact table is scanned exactly
  once; the naive form re-scans it for the subquery.
* q12 — fact⋈fact join + conditional counts (CASE-in-sum): one pass,
  fully map-side-combinable, the entire aggregate state is 2 ints/group.
* q16 — NOT IN rewritten as a broadcast anti join BEFORE the aggregate,
  plus COUNT(DISTINCT): the distinct forces a two-phase agg keyed on
  (group, suppkey) then (group); excluding early shrinks that shuffle.
* q20 — chained semi joins over an aggregated subquery: nothing from
  the inner relations is ever materialized wider than the key columns;
  each semi join is a pure filter, no row multiplication anywhere.
* q21 — double-correlated EXISTS / NOT EXISTS on the same fact table:
  decorrelates to one semi + one anti join on (orderkey, suppkey<>).
  Both reuse the orderkey shuffle partitioning; at scale all three
  branches co-partition, so the correlation costs two local probes.

Float parity with the DuckDB oracle follows _util's decimal-sum
strategy; thresholds compare IEEE doubles derived from identical exact
decimals, so both engines take the same branch on every row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.queries._util import Q, dec, t


# --------------------------------------------------------------------------
# q11: important stock — per-part value vs share-of-total threshold
# --------------------------------------------------------------------------
def q11_important_stock(spark, sf_dir):
    """Parts whose inventory value (from suppliers in three nations)
    exceeds 2x the mean per-part value — a scale-free threshold (the
    original's fixed share-of-total fraction empties out as the part
    count grows).  The scalar-subquery threshold is a window sum/count
    over the aggregated relation — one fact-table scan."""
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    val = dec("l_extendedprice", 12, 2) * dec("l_quantity", 12, 2)
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("v"))
    )
    w = Window.partitionBy()
    return (
        pv.withColumn("part_value", F.col("v").cast("double"))
        .withColumn("tot", F.sum("v").over(w).cast("double"))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(
            F.col("part_value") * F.col("cnt").cast("double")
            > F.lit(2.0) * F.col("tot")
        )
        .select("l_partkey", "part_value")
    )


Q11_SQL = """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM (
  SELECT l_partkey,
         CAST(v AS DOUBLE) AS part_value,
         CAST(SUM(v) OVER () AS DOUBLE) AS tot,
         COUNT(*) OVER () AS cnt
  FROM pv
)
WHERE part_value * CAST(cnt AS DOUBLE) > 2.0 * tot
"""


# --------------------------------------------------------------------------
# q12: priority line counts by return flag (shipmode analog)
# --------------------------------------------------------------------------
def q12_priority_lines(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A','R')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q16: supplier count per part attribute, excluding flagged suppliers
# (NOT IN → broadcast anti join before the distinct aggregate)
# --------------------------------------------------------------------------
def q16_supplier_part_counts(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    flagged = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(
            F.broadcast(flagged),
            l.l_suppkey == flagged.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1,5,10,15,20,25,30,35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q20: suppliers with heavy shipments of selected parts (semi-join chain)
# --------------------------------------------------------------------------
def q20_heavy_shippers(spark, sf_dir):
    """Suppliers who shipped >40 total quantity of some 'blue' part in
    1997.  part → (semi) → lineitem agg → (semi) → supplier: only key
    columns cross each boundary, no row multiplication anywhere."""
    blue = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("blue"))
        .select("p_partkey")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    qual = (
        l.join(F.broadcast(blue), l.l_partkey == blue.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("q"))
        .filter(F.col("q") > 40)
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE contains(p_name, 'blue'))
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 40
)
"""


# --------------------------------------------------------------------------
# q21: lone-fault suppliers (EXISTS + NOT EXISTS on the same fact table)
# --------------------------------------------------------------------------
def q21_lone_fault_suppliers(spark, sf_dir):
    """For finished orders, suppliers whose line was returned ('R')
    while some co-supplier's line in the same order was NOT returned —
    and no co-supplier's line was.  EXISTS → semi join, NOT EXISTS →
    anti join, both on (orderkey equi, suppkey <>): all three lineitem
    branches share the orderkey partitioning."""
    l = t(spark, sf_dir, "lineitem")
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    o_f = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    s = t(spark, sf_dir, "supplier")
    base = (
        l1.join(o_f, l1.l_orderkey == o_f.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


QUERIES: dict[str, Q] = {
    "q11_important_stock": Q(q11_important_stock, Q11_SQL),
    "q12_priority_lines": Q(q12_priority_lines, Q12_SQL),
    "q16_supplier_part_counts": Q(q16_supplier_part_counts, Q16_SQL),
    "q20_heavy_shippers": Q(q20_heavy_shippers, Q20_SQL),
    "q21_lone_fault_suppliers": Q(q21_lone_fault_suppliers, Q21_SQL),
}
