"""Loaders for the driver's TPC-H-ish parquet corpus (TESTDATA.md).

The reference's sources are HTTP scrapes + a SQLite file (SURVEY.md §2.1
SRC-1..9); the engine's canonical source is columnar parquet read through
the DataFrame reader so Catalyst gets predicate pushdown, column pruning,
and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimensions small enough to broadcast at any scale factor.
BROADCAST_DIMS = {"region", "nation"}

# NOTE on single-row-group files: each corpus table is ONE parquet file
# with ONE row group, so every scan decodes on a single core (a parquet
# split cannot cross a row-group boundary).  A loader-level repartition
# was tried and measured a net LOSS for the relational queries at sf0.1
# (vectorized decode + JVM aggregation of 600k rows is fast single-core;
# the balancing shuffle only added cost: q3 0.58→1.31 s, q5 0.66→1.46 s
# warm).  Fan-out pays off only where per-row compute is heavy — the
# text-dedup pipelines do it themselves via operators/dedup.fan_out.


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts arrives in whatever physical type the corpus
        # generator used — TIMESTAMP(NANOS) (Spark's vectorized reader
        # rejects it; read nanos as long and truncate to micros, the
        # value DuckDB produces for its micro-resolution type) or naive
        # TIMESTAMP(MICROS) (Spark infers TIMESTAMP_NTZ).  Normalize to
        # session-local TIMESTAMP either way: the session timezone is
        # pinned to UTC (session.py), so the NTZ→TZ cast is wall-clock
        # preserving and epoch extraction matches DuckDB's epoch_us on
        # the same naive values.
        # The legacy conf is scoped save/set/restore: it is captured into
        # the plan at read/analysis time (the restored value does not
        # affect this df's later execution), so a later parquet read of
        # an unrelated nanos column in the same session is not silently
        # decoded as bigint.  Not thread-safe if the session is shared.
        try:
            prev = spark.conf.get(_NANOS_CONF)
        except Exception:
            prev = None
        spark.conf.set(_NANOS_CONF, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn(
                    "ts", F.expr("timestamp_micros(ts div 1000)")
                )
            elif ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            if prev is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each corpus table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for t in tables or TABLES:
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
