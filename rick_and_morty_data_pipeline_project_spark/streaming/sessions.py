"""Native session-window streaming aggregation (§2.8 surface).

``stateful.sessionize_builtin`` exercises ``F.session_window`` in
batch; this module is the genuinely STREAMING form — watermarked
gap-based session aggregation whose state store holds open sessions
and merges them ACROSS micro-batches (an event arriving in batch 2
within the gap of a batch-1 session must extend that session, not
open a new one).  That cross-batch merge is the property the
equivalence test pins against the batch twin.

Scale: state per key is the set of OPEN sessions only; the watermark
finalizes and evicts sessions older than (max event time − delay), so
state is bounded by active users × open sessions, never stream length.

Kept in its own module (not windowed.py) so additive growth never
stales the certification fingerprints of queries that reference the
existing streaming files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked per-user session aggregation over an event stream:
    events within ``gap`` of each other merge into one session, across
    micro-batch boundaries.  Output schema matches
    ``stateful.sessionize_builtin`` (ISO strings for engine-neutral
    comparison; session_end is the last event + gap, the native
    session_window convention)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )
