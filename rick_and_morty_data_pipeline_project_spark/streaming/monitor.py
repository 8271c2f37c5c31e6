"""Streaming data-quality monitoring: the chi-square drift statistic
maintained over an event stream.

Batch twin: ``events_chi2_type_dow`` (queries/extraq.py) — association
between event_type and day-of-week.  The streaming form maintains the
CONTINGENCY TABLE (the sufficient statistic) as a durable parquet
table via ``durable_table_sink`` (micro-batch counts merged by group
key — the same retraction-free fold the HLL sketch table uses), and
recomputes the chi-square statistic from that tiny table after each
trigger.  State is bounded by |event types| × 7 whatever the stream
length; every micro-batch shuffles only its own rows once.

This is the monitoring shape a 100 TB ingest runs continuously: the
fact stream never re-scans, the statistic reads |domain| rows, and an
alert is one threshold on ``chi2`` per trigger.

Equivalence contract (tests/test_streaming.py): after draining the
events corpus in any micro-batch slicing, ``chi2_from_contingency``
over the maintained table equals the batch query's chi2/dof/N row
bit-for-bit (same conditional-count arithmetic, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def contingency_stream(
    events: DataFrame, table_dir: str, checkpoint_dir: str
):
    """Maintain the (event_type, dow) → n contingency table under an
    append-only event stream.  Each micro-batch aggregates its own
    rows (map-side combinable) and merges counts into the durable
    table by group key — a crash between batches recovers via the
    checkpoint + atomic table swap (``durable_table_sink``)."""
    from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
        durable_table_sink,
    )

    keyed = events.select(
        "event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow")
    )

    def apply_fn(batch_df: DataFrame, current: DataFrame | None) -> DataFrame:
        delta = batch_df.groupBy("event_type", "dow").agg(
            F.count(F.lit(1)).alias("n")
        )
        if current is None:
            return delta
        return (
            current.unionByName(delta)
            .groupBy("event_type", "dow")
            .agg(F.sum("n").alias("n"))
        )

    return durable_table_sink(keyed, table_dir, checkpoint_dir, apply_fn)


def chi2_from_contingency(spark: SparkSession, table_dir: str) -> DataFrame:
    """The chi-square statistic over a maintained contingency table —
    identical arithmetic to the batch query's post-aggregate phase
    (window marginals over the tiny relation, Σ(o−e)²/e, round 6)."""
    from pyspark.sql.window import Window

    cnt = spark.read.parquet(table_dir).select(
        "event_type", "dow", F.col("n").alias("o")
    )
    cell = cnt.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rn"),
        F.sum("o").over(Window.partitionBy("dow")).alias("cn"),
        F.sum("o").over(Window.partitionBy()).alias("nn"),
    )
    e = (F.col("rn") * F.col("cn")).cast("double") / F.col("nn")
    return cell.agg(
        F.round(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6
        ).alias("chi2"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("dow") - 1)
        ).alias("dof"),
        F.first("nn").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
    )
