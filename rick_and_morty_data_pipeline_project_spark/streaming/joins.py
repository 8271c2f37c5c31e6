"""Stream-stream joins — the remaining §2.8 primitive.

A watermarked stream-stream inner join is how two live event feeds
correlate without unbounded buffers: each side's StateStore holds only
rows younger than its watermark plus the join's time-range slack, so
state is (watermark window × ingest rate) regardless of stream length.
That bounded-state requirement is why the join carries BOTH a key
equality (state shards by user) and an event-time range condition
(lets Spark evict buffered rows once the other side's watermark passes
the reachable range).

At 100 TB/day the same plan holds: both sides shuffle once on the join
key; per-key state is bounded by the range window; late rows beyond
the watermark are dropped (the documented completeness trade —
`view_click_attribution` in batch form over the same inputs is the
backfill path that recovers them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_attribution_stream(
    events: DataFrame,
    attribution_window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Attribute each click to every view by the same user in the
    preceding ``attribution_window`` — the canonical ad-attribution
    stream-stream inner join.

    ``events`` is a (possibly streaming) DataFrame of the events table;
    both sides are event-type filters over it (filters push to the
    source), each with its own watermark.  Output: one row per
    (view, click) pair with the click-to-view latency in seconds.
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
    )
    latency = (
        F.unix_micros("click_ts") - F.unix_micros("view_ts")
    ).cast("double") / F.lit(1_000_000.0)
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        F.round(latency, 6).alias("latency_s"),
    )
