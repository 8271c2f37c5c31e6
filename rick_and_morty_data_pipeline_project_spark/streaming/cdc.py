"""Streaming CDC apply: last-writer-wins snapshot maintenance.

The batch ``orders_cdc_apply`` query (queries/extraq.py) materializes
the current snapshot from base + ordered change log with one rank
window per key.  This module is its Structured Streaming twin — the
continuously-maintained form a lakehouse ingestion pipeline actually
runs: CDC rows (insert / update / delete, each carrying a monotone
``_seq``) flow into a streaming ``groupBy(key).agg(max_by(...))`` in
**update** output mode, and Spark's aggregation state IS the current
version of every key.  ``max_by(payload, _seq)`` is last-writer-wins
as a commutative, order-insensitive aggregate, so ANY micro-batch
slicing of the log converges to the same snapshot — no foreachBatch,
no custom state store, no merge job.

Scale: state is one (seq, op, status, price) struct per key — bounded
by the KEY domain, not the stream length — and each micro-batch
shuffles only its own change rows on the key.  Deletes stay IN the
state as tombstones (op='D') and are emitted so the serving layer can
drop the key; compaction of tombstones is the sink's policy decision,
exactly as in Delta/Hudi CDC ingestion.  No watermark by design: a
key's current version never expires (update mode permits this).

Equivalence contract (asserted in tests/test_streaming.py): after
draining the SAME derived change log the batch query replays, the
latest emission per key, tombstones dropped and grouped by status,
equals ``orders_cdc_apply``'s output bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDC_CHANGE_SCHEMA = (
    "o_orderkey long, _op string, o_orderstatus string, "
    "o_totalprice double, _seq long"
)


def cdc_apply_stream(changes: DataFrame) -> DataFrame:
    """Maintain the per-key current version over a CDC change stream.

    Input rows follow :data:`CDC_CHANGE_SCHEMA`; ``_op`` ∈ {I, U, D},
    ``_seq`` monotone per key (ties are a log-production bug upstream —
    ``max_by`` would pick one deterministically per batch but the
    contract requires unique sequence numbers per key).

    Returns the streaming aggregate for ``outputMode("update")``: one
    row per key touched in the micro-batch with that key's CURRENT
    (op, status, price, seq).  Consumers keep the max-``_seq`` emission
    per key and treat ``_op = 'D'`` rows as tombstones.
    """
    v = F.max_by(
        F.struct("_op", "o_orderstatus", "o_totalprice"), F.col("_seq")
    )
    return (
        changes.groupBy("o_orderkey")
        .agg(F.max("_seq").alias("_seq"), v.alias("_v"))
        .select(
            "o_orderkey",
            "_seq",
            F.col("_v._op").alias("_op"),
            F.col("_v.o_orderstatus").alias("o_orderstatus"),
            F.col("_v.o_totalprice").alias("o_totalprice"),
        )
    )
