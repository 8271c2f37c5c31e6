"""Stateful streaming: sessionization.

Two forms:

* ``sessionize_builtin`` — Spark's native ``session_window`` (gap-based
  session aggregation).  Works identically over batch and streaming
  input, which is how we test streaming ≡ batch equivalence.
* ``sessionize_custom`` — ``applyInPandasWithState``: the escape hatch
  for session logic the built-in can't express (e.g. cap sessions at N
  events, emit custom per-session features).  State is a per-user
  running session; timeout finalizes idle sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_builtin(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user sessions: events within ``gap`` of each other merge.

    Returns (user_id, session_start, session_end, n_events, sum_value) —
    temporal bounds as ISO strings for engine-neutral comparison.
    """
    agg = (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return agg.select(
        "user_id",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "sum_value",
    )
