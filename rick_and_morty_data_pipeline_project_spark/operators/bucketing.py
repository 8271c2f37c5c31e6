"""Bucketed (pre-partitioned, co-located) joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides.  Bucketing pays that shuffle ONCE at write time: both tables
are hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so every future join on that key is a zero-
exchange sort-merge join (each task reads bucket i of both sides).
This is Spark's equivalent of the co-located/partitioned joins native
MPP engines schedule — asserted, not assumed, in
tests/test_sinks_catalog.py::test_bucketed_join_has_no_exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and sorted)
    by ``bucket_col``.  Sorting within buckets lets the later SMJ skip
    its sort as well."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.
    With matching bucket specs this plans as an exchange-free
    sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key)
