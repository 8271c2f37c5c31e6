"""Streaming transition-matrix maintenance: per-user last-event state.

The batch ``events_transition_matrix`` (queries/extraq.py:4261) builds
the Markov path model with one lead() window.  A stream cannot lead()
across micro-batches — the transition (last event of batch k → first
event of batch k+1) exists in neither batch alone — so this module
keeps the minimal state that completes it: ONE (ts, type) pair per
user via ``applyInPandasWithState``, and emits each micro-batch's
COMPLETED transition increments (from_type, to_type, n).

Increments are disjoint across batches (every transition is owned by
its source event, which lives in exactly one batch), so summing the
emitted increments per pair converges to the batch lead() counts
exactly for any batch slicing — asserted in tests/test_streaming.py.

Ordering contract: per-user event order is (ts, event_id), the batch
query's sort key; the operator assumes in-order delivery per key (the
replayable-log assumption every keyed-state CEP operator makes — a
production deployment facing reordering puts a watermarked sort buffer
in front, cf. streaming/sessions.py).

Scale: state is one small struct per user — bounded by the key domain,
not stream length; each batch shuffles only its own events on the
user key; emissions are ≤ |types|² rows per user-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_OUT_SCHEMA = StructType(
    [
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)

_LAST_EVENT_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def transition_counts_stream(events: DataFrame) -> DataFrame:
    """Emit per-micro-batch transition-count increments over an event
    stream keyed by ``user_id``.

    State per user = the latest (ts, event_id, type) seen; each batch
    sorts its own rows by the batch query's (ts, event_id) key, folds
    them through the state, and yields the aggregated increments the
    batch completed.  Downstream consumers maintain the matrix with a
    plain ``groupBy(from_type, to_type).sum(n)`` (or the durable-sink
    fold of streaming/_durable.py) and renormalize probabilities
    whenever displayed.
    """

    def fn(key, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        if state.exists:
            last_ts, last_id, last_type = state.get
        else:
            last_ts = last_id = 0
            last_type = None
        inc: dict[tuple[str, str], int] = {}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t_, eid, typ in zip(
                ts_us, pdf["event_id"], pdf["event_type"]
            ):
                if last_type is not None:
                    k = (last_type, typ)
                    inc[k] = inc.get(k, 0) + 1
                last_ts, last_id, last_type = int(t_), int(eid), typ
        if last_type is not None:
            state.update((last_ts, last_id, last_type))
        yield pd.DataFrame(
            [(f, to, n) for (f, to), n in sorted(inc.items())],
            columns=["from_type", "to_type", "n"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_OUT_SCHEMA,
        stateStructType=_LAST_EVENT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
