"""Dense row-id assignment: equals the single-task row_number
bit-for-bit, with no global window / single-partition sort in the
plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from rick_and_morty_data_pipeline_project_spark.operators.rowid import (
    dense_row_ids,
)
from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table
from tests.conftest import SF_SMALL

# the synthetic lineitem violates TPC-H's (orderkey, linenumber)
# uniqueness (4599 distinct of 6000 at sf0.001); orders' o_orderkey is
# genuinely unique, which the operator's determinism contract requires
KEY = ["o_orderkey"]


def test_dense_row_ids_match_global_row_number(spark):
    li = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    got = {
        r["o_orderkey"]: r["row_id"]
        for r in dense_row_ids(li, KEY).collect()
    }
    from pyspark.sql.window import Window

    want = {
        r["o_orderkey"]: r["rid"]
        for r in li.select(
            "o_orderkey",
            (F.row_number().over(Window.orderBy(*KEY)) - 1).alias("rid"),
        ).collect()
    }
    assert got == want and len(got) == li.count()
    assert min(got.values()) == 0 and max(got.values()) == len(got) - 1


def test_dense_row_ids_plan_has_no_global_window(spark):
    import re

    li = load_table(spark, SF_SMALL, "orders")
    out = dense_row_ids(li, KEY, num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bWindow\b", plan), plan
    # with the width pinned, the work really spreads across partitions
    assert out.rdd.getNumPartitions() > 1
    # and the ids are still the dense 0..n-1 assignment
    n = li.count()
    agg = out.agg(
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
        F.countDistinct("row_id").alias("d"),
    ).collect()[0]
    assert (agg["lo"], agg["hi"], agg["d"]) == (0, n - 1, n)


def test_dense_row_ids_survive_downstream_agg(spark):
    """ids are usable as join/sample keys: selecting a deterministic
    1/8 systematic sample by id yields exactly every 8th row."""
    li = load_table(spark, SF_SMALL, "orders").select("o_orderkey")
    ids = dense_row_ids(li, KEY)
    n = li.count()
    sample = ids.filter(F.col("row_id") % 8 == 0)
    assert sample.count() == (n + 7) // 8


def test_dense_row_ids_empty_input(spark):
    li = load_table(spark, SF_SMALL, "orders").filter(F.lit(False))
    out = dense_row_ids(li, KEY)
    assert out.count() == 0 and "row_id" in out.columns
