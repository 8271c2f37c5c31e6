"""Streaming materialized-view maintenance.

The batch ``mv_incremental_refresh`` query (queries/lakeq.py) applies a
retraction-style delta to a stored grouped aggregate with explicit
state ⊕ delta algebra.  This module is its Structured Streaming twin:
feed the SAME weighted delta rows (weight −1 retracts, +1 asserts) into
a streaming ``groupBy().agg()`` in **update** output mode and Spark's
own aggregation state IS the maintained view — no foreachBatch, no
custom state store, no merge job.  Each trigger emits refreshed rows
for exactly the groups the micro-batch touched; the serving layer keeps
the latest row per group (the ``ver`` column makes "latest" explicit)
and drops groups whose maintained count reached zero.

This is the 100 TB shape for continuously-maintained aggregates: state
is one (count, decimal sum) pair per group key — bounded by the GROUP
domain, not the stream length — and every micro-batch shuffles only its
own delta rows on the group key.  No watermark is used deliberately:
an MV's groups never expire (update mode permits this; append mode
would require one and is the wrong semantics here).

Equivalence contract (asserted in tests/test_streaming.py): after
draining base+delta through any micro-batch slicing, latest-per-group
equals the batch query's output bit-for-bit — both engines sum the same
exact DECIMAL(14,2)-weighted products, so the final double cast agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MV_DELTA_SCHEMA = (
    "o_orderpriority string, o_orderstatus string, _w int, _p double, "
    "seq long"
)


def mv_maintain_stream(delta: DataFrame) -> DataFrame:
    """Maintain ``orders GROUP BY (o_orderpriority, o_orderstatus) →
    (count, exact decimal revenue)`` over a weighted delta stream.

    Input rows follow :data:`MV_DELTA_SCHEMA`: ``_w`` ∈ {−1, +1}
    (retraction / assertion), ``_p`` the row's price as an exact
    2-decimal double, ``seq`` a monotone batch sequence number used
    only to identify the latest emission per group downstream.

    Returns the streaming aggregate for ``outputMode("update")``:
    (group keys, n_orders, total_price, ver).  Consumers keep the
    max-``ver`` row per group and filter ``n_orders > 0`` — a group
    retracted to zero emits its zero row (so the sink can delete) and
    must not be resurrected by an older positive row.
    """
    return (
        delta.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum("_w").alias("n_orders"),
            F.sum(
                F.col("_w").cast("decimal(14,2)")
                * F.col("_p").cast("decimal(12,2)")
            )
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price"),
            F.max("seq").alias("ver"),
        )
    )
