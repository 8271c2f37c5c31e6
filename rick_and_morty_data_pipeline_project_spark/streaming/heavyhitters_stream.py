"""Streaming Misra-Gries heavy-hitter table maintenance.

The batch form (``operators/heavyhitters.py``) reduces partitions to
k-counter summaries and merges them once.  The streaming form
maintains the merged summary as a durable parquet table under an
append-only stream: each micro-batch's EXACT value counts (a valid
zero-error summary) merge into the stored counters by addition, then
one compression step (subtract the (k+1)-th largest, keep positive)
restores the k-row bound.  By the mergeable-summaries theorem
(Agarwal et al., PODS'12) the maintained table obeys the SAME
invariants as the batch summary at every point in the stream:

    est(v) <= true(v)  and  true(v) - est(v) <= N_so_far/(k+1),

so any item with true frequency > N/(k+1) is guaranteed present.

State is k rows FOREVER (plus the transient batch distinct counts) —
the monitoring shape for "which sources/domains/users dominate the
last-N-days ingest" over a 100 TB stream.  Crash safety: the sink is
``durable_table_sink``, so the summary swaps atomically WITH the
last-applied batch id and at-least-once replays cannot double-count
(the r7 replay guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress_k(merged: DataFrame, k: int) -> DataFrame:
    """One MG compression of a merged-counter relation of ANY size:
    subtract the (k+1)-th largest count (0 when <= k rows survive)
    and keep the strictly positive counters.

    Compression only depends on the top k+1 counters — every row below
    the (k+1)-th largest has est − d <= 0 and is dropped regardless —
    so the relation first reduces through ``orderBy().limit(k+1)``
    (TakeOrderedAndProject: a parallel heap top-k, never a single-task
    global sort even when a micro-batch contributes millions of
    distinct items).  The row_number window then ranks <= k+1 rows.
    Deterministic order (est desc, item asc) — ties cannot reorder the
    subtraction."""
    from pyspark.sql.window import Window

    top = merged.orderBy(F.desc("est"), F.asc("item")).limit(k + 1)
    w = Window.orderBy(F.desc("est"), F.asc("item"))
    ranked = top.withColumn("_rn", F.row_number().over(w))
    dval = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_rn") == k + 1, F.col("est"))), F.lit(0)
        ).alias("_d")
    )
    return (
        ranked.crossJoin(F.broadcast(dval))
        .select("item", (F.col("est") - F.col("_d")).alias("est"))
        .filter(F.col("est") > 0)
    )


def mg_table_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int,
):
    """Maintain the k-counter MG summary of ``col`` at ``table_dir``
    under an append-only stream (availableNow foreachBatch)."""
    from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
        durable_table_sink,
    )

    # NULL is not an item (matches operators/heavyhitters.py, which
    # excludes nulls before counting)
    keyed = stream.select(
        F.col(col).cast("string").alias("item")
    ).filter(F.col("item").isNotNull())

    def apply_fn(batch_df: DataFrame, current: DataFrame | None) -> DataFrame:
        delta = batch_df.groupBy("item").agg(
            F.count(F.lit(1)).alias("est")
        )
        merged = (
            delta
            if current is None
            else current.unionByName(delta)
            .groupBy("item")
            .agg(F.sum("est").alias("est"))
        )
        return _compress_k(merged, k)

    return durable_table_sink(keyed, table_dir, checkpoint_dir, apply_fn)
