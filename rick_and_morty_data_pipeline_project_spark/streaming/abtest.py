"""Streaming A/B experiment monitor: Welch sufficient statistics as an
update-mode aggregate.

The batch ``stats_welch_t`` query (queries/statsq.py) reads the whole
corpus and emits the Welch t readout from one conditional-aggregate row
of exact decimal sufficient statistics.  This module is its Structured
Streaming twin — the continuously-monitored form an experimentation
platform actually runs: purchase events flow into a streaming
``groupBy(arm)`` maintaining (n, Σv, Σv²) per arm in **update** output
mode.  All three statistics are commutative, order-insensitive sums, so
ANY micro-batch slicing converges to the batch numbers exactly — the
aggregation state IS the experiment's evidence, two rows of three
numbers, regardless of stream length.

The t/df closed form is deliberately NOT part of the streaming plan:
``welch_readout`` applies the identical double-op sequence the batch
query uses to whatever the state says right now, so dashboards can
recompute the test at every trigger without touching the stream.

Equivalence contract (asserted in tests/test_streaming.py): after
draining the same purchase rows in any slicing, the latest emission per
arm fed through ``welch_readout`` equals the batch ``stats_welch_t``
row bit-for-bit.

No watermark by design: experiment evidence never expires (update mode
permits an unbounded-lifetime 2-row state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WELCH_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def welch_stats_stream(events: DataFrame) -> DataFrame:
    """Maintain per-arm Welch sufficient statistics over an event
    stream.

    Input rows follow :data:`WELCH_EVENT_SCHEMA`; only purchases
    count, arms are the deterministic ``user_id % 2`` split (the same
    assignment as the batch query and ``events_ab_proportion_z``).

    Returns the streaming aggregate for ``outputMode("update")``: one
    row per arm touched in the micro-batch carrying that arm's CURRENT
    (n, Σv, Σv²) — exact decimals, so the converged state is
    bit-identical to the batch scan.
    """
    v = F.col("value").cast("decimal(10,2)")
    return (
        events.filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("arm"), v.alias("v"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum(F.col("v") * F.col("v")).alias("svv"),
        )
    )


def welch_readout(stats: DataFrame) -> DataFrame:
    """The Welch t readout over a 2-row (arm, n, sv, svv) statistics
    relation — the SAME double-op sequence as the batch
    ``stats_welch_t`` projection, so stream-state and batch-scan
    evidence produce identical rounded outputs.
    """
    agg = stats.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("sv"))).alias("sv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("sv"))).alias("sv_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("svv"))).alias("svv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("svv"))).alias("svv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sva, svb = F.col("sv_a").cast("double"), F.col("sv_b").cast("double")
    svva, svvb = (
        F.col("svv_a").cast("double"),
        F.col("svv_b").cast("double"),
    )
    var_a = (svva - sva * sva / na) / (na - 1)
    var_b = (svvb - svb * svb / nb) / (nb - 1)
    qa, qb = var_a / na, var_b / nb
    return agg.select(
        "n_a",
        "n_b",
        F.round(sva / na, 9).alias("mean_a"),
        F.round(svb / nb, 9).alias("mean_b"),
        F.round((sva / na - svb / nb) / F.sqrt(qa + qb), 6).alias(
            "t_stat"
        ),
        F.round(
            (qa + qb) * (qa + qb)
            / (qa * qa / (na - 1) + qb * qb / (nb - 1)),
            6,
        ).alias("df"),
    )
