"""Watermarked stream-stream LEFT OUTER join (unmatched-view funnel).

streaming/joins.py answers "which click came from which view" — an
inner join, so views that never convert simply vanish from the
output.  The funnel question ("which views did NOT convert within the
attribution window?") needs the OUTER variant, and in Structured
Streaming that is a genuinely different machine: the engine must hold
each view in the join state until the CLICK-side watermark has passed
``view_ts + attribution_window`` — only then is "no click arrived"
final, and the null-padded row is emitted.  Emission is therefore
watermark-driven and late by design; the test drives the watermark
forward with sentinel batches and asserts the final output equals the
batch left join bit-for-bit.

Spark requirements encoded here (and asserted by the test rather than
trusted): both sides watermarked, and the join condition contains an
event-time range that upper-bounds state (``click_ts BETWEEN view_ts
AND view_ts + window``).  Without the range the state would grow with
the stream; with it, state per key is bounded by the window span —
the same bound the inner join enjoys, plus one watermark of delay on
the null-padded rows.

Scale: equi-key (user_id) join with a time-range residual — one
shuffle per side on the high-cardinality user key; per-key state is
views-within-window × clicks-within-window, never a cross product of
histories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_outer_stream(
    events: DataFrame,
    attribution_window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Left-outer attribution: EVERY view emits exactly its matching
    clicks within ``attribution_window``, or one null-click row once
    the watermark proves no click can still arrive.

    ``events`` is a (possibly streaming) DataFrame of the events
    table; both sides are event-type filters over it (the filters push
    to the source).  Output columns: user_id, view_id, click_id
    (null ⇔ unconverted view), latency_s (null on unconverted rows).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        F.round(
            (
                F.col("click_ts").cast("double")
                - F.col("view_ts").cast("double")
            ),
            6,
        ).alias("latency_s"),
    )
