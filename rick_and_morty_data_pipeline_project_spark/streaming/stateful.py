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

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)


def sessionize_custom(
    events: DataFrame,
    gap_seconds: float = 600.0,
    max_events: int | None = None,
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState``.

    Expresses what ``session_window`` can't: an optional per-session
    event-count cap (``max_events``) that force-closes runaway sessions.
    State per user = the open session (start, end, count, value sum);
    a session is emitted when a new event breaks the gap or the cap is
    hit.  The final open session per user stays in state (a production
    pipeline closes it via timeout; the test compares closed sessions
    against the batch gaps-and-islands query).
    """
    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            s, e, n, sv = state.get
        else:
            s = None
            e = n = 0
            sv = 0.0
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t, v in zip(ts_us, pdf["value"].astype(float)):
                if s is None:
                    s, e, n, sv = t, t, 1, v
                elif t - e > gap_us or (
                    max_events is not None and n >= max_events
                ):
                    closed.append((user_id, s, e, n, sv))
                    s, e, n, sv = t, t, 1, v
                else:
                    e, n, sv = t, n + 1, sv + v
        if s is not None:
            state.update((int(s), int(e), int(n), float(sv)))
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "sum_value",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


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


ZSCORE_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("n_prev", LongType()),
        StructField("zscore", DoubleType()),
    ]
)


def zscore_stream(
    events: DataFrame, window: int = 20, min_history: int | None = None
) -> DataFrame:
    """Streaming twin of the batch ``events_zscore_outliers`` query:
    flag events whose value deviates > 2 sample standard deviations
    from the same user's preceding ``window`` events, once at least
    ``min_history`` (default ``max(2, window // 2)``) prior events
    exist.

    State-schema note: the tail is stored as ``array<long>`` (scaled
    integers) as of round 3; checkpoints written by the earlier
    ``array<double>`` version are schema-incompatible — restart such a
    query from a fresh checkpoint directory.

    ``applyInPandasWithState`` keeps a BOUNDED per-user tail (the last
    ``window`` values) as state — O(window) per key regardless of
    stream length, the state shape a 100 TB/day stream needs.  Events
    are processed in (ts, event_id) order inside each group, matching
    the batch window's ordering, and flagged rows are emitted
    incrementally (append mode).

    Float parity: values carry ≤ 2 decimals, so the tail is stored as
    EXACT integers scaled by 10^6 (the batch twin's DECIMAL(18,6))
    and the sums/sums-of-squares are exact integer arithmetic; each is
    then converted to the nearest double (``float(Fraction(...))`` is
    correctly rounded) and pushed through the same IEEE double
    expression tree as the batch window — so the z-scores agree
    bit-for-bit at any |z| boundary, on any corpus, instead of
    drifting through a binary-float accumulator.
    """
    from pyspark.sql.types import ArrayType, LongType

    if min_history is None:
        min_history = max(2, window // 2)

    state_schema = StructType(
        [StructField("tail", ArrayType(LongType()))]
    )
    scale, scale2 = 10**6, 10**12

    def fn(key, pdfs: Iterator, state) -> Iterator:
        import math
        from decimal import Decimal
        from fractions import Fraction

        import pandas as pd

        (user_id,) = key
        tail: list[int] = list(state.get[0]) if state.exists else []
        out: list[tuple] = []
        # a group arrives as MULTIPLE Arrow chunks (split at
        # maxRecordsPerBatch) in arbitrary order — concatenate first,
        # sort ONCE, or the rolling tail is built out of order
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            whole = whole.sort_values(["ts", "event_id"])
            for eid, v in zip(
                whole["event_id"].astype("int64"),
                whole["value"].astype(float),
            ):
                n = len(tail)
                if n >= min_history:
                    s = float(Fraction(sum(tail), scale))
                    s2 = float(
                        Fraction(sum(x * x for x in tail), scale2)
                    )
                    mean = s / n
                    var = (s2 - (s * s) / n) / (n - 1)
                    if var > 0:
                        z = (v - mean) / math.sqrt(var)
                        if abs(z) > 2:
                            out.append(
                                (int(eid), int(user_id), float(v), n, z)
                            )
                # shortest-repr → Decimal → scale: exact for ≤6-decimal
                # values, mirroring the batch cast(value AS DECIMAL(18,6))
                tail.append(int(Decimal(repr(v)).scaleb(6)))
                if len(tail) > window:
                    tail.pop(0)
        state.update((tail,))
        yield pd.DataFrame(
            out,
            columns=["event_id", "user_id", "value", "n_prev", "zscore"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ZSCORE_OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


_EWMA_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma_stream(
    events: DataFrame, alpha: float = 0.3, one_minus: float = 0.7
) -> DataFrame:
    """Streaming twin of the batch ``events_ewma`` query: per-user
    exponentially-weighted moving average maintained INCREMENTALLY —
    state is two numbers per key (count, current ewma), O(1) whatever
    the stream length, the canonical shape for a recursive statistic
    on an unbounded stream.

    Each micro-batch's rows are sorted by (ts, event_id) before
    folding (a group arrives as unordered Arrow chunks), and batches
    are assumed time-ordered across triggers (the file source's
    mtime ordering — same contract as the ingest-dedup streams).  The
    fold performs the identical IEEE double sequence as the batch
    query's JVM ``F.aggregate`` (α·x + (1−α)·y, head-seeded), so after
    draining the same data the streamed ewma is bit-equal to the batch
    result — asserted in tests/test_streaming.py.

    Emits the refreshed (user_id, n_events, ewma) row each trigger in
    update mode; downstream keeps the latest per key."""
    state_schema = StructType(
        [StructField("n", LongType()), StructField("y", DoubleType())]
    )

    def fn(key, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        (user_id,) = key
        n, y = (state.get[0], state.get[1]) if state.exists else (0, 0.0)
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            whole = whole.sort_values(["ts", "event_id"])
            for v in whole["value"].astype(float):
                if n == 0:
                    y = v
                else:
                    # one_minus is a SEPARATE literal, not 1.0 - alpha:
                    # IEEE 1.0-0.3 = 0.70000000000000004 ≠ the 0.7 the
                    # batch query folds with — using it would break the
                    # bit-equality contract with events_ewma
                    y = alpha * v + one_minus * y
                n += 1
        state.update((n, y))
        yield pd.DataFrame(
            [(int(user_id), int(n), float(y))],
            columns=["user_id", "n_events", "ewma"],
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_EWMA_OUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
