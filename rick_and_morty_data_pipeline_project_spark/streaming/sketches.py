"""Streaming maintenance of a persisted HLL sketch table.

The streaming completion of operators/sketches.py: micro-batches of
events fold into per-day HLL sketches and MERGE into a durable parquet
sketch table via ``hll_union_agg`` — so "distinct users per day / week /
lifetime" stays answerable at any moment from kilobytes of state, while
the raw events are only ever read once, as they arrive.

Because HLL union is lossless (estimate(union of parts) ==
estimate(whole) — property-tested in tests/test_sketches.py), the
incrementally-maintained table gives *identical* answers to a batch
rebuild over all events so far; tests/test_streaming.py asserts that
equivalence end to end.

Scale/durability notes:
* Each micro-batch shuffles only fixed-size sketch states (partial agg
  per task), and the merge touches |days-in-table| rows — never raw
  history.
* ``foreachBatch`` bodies run sequentially, and the table update uses
  the temp-write + atomic-rename swap (operators/merge.atomic_overwrite)
  so a crash mid-merge leaves the previous complete table; the
  checkpoint replays the batch and the re-merge is idempotent only at
  the batch boundary — exactly-once for this sink comes from the swap +
  checkpoint pair, the standard foreachBatch contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
    durable_table_sink,
)


def stream_hll_sketch_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    item_col: str = "user_id",
    lg_k: int = 12,
):
    """Maintain a (day, sk binary) parquet sketch table from an event
    stream.  Returns the started query (availableNow trigger); the
    crash-recovery/read/swap sequencing lives in streaming/_durable.py."""

    def _apply(batch_df: DataFrame, current) -> DataFrame:
        batch_sk = batch_df.groupBy(
            F.date_format(ts_col, "yyyy-MM-dd").alias("day")
        ).agg(F.hll_sketch_agg(item_col, F.lit(lg_k)).alias("sk"))
        if current is None:
            return batch_sk
        return (
            current.unionByName(batch_sk)
            .groupBy("day")
            .agg(F.hll_union_agg("sk", F.lit(True)).alias("sk"))
        )

    return durable_table_sink(stream, table_dir, checkpoint_dir, _apply)


def sketch_table_estimates(spark, table_dir: str) -> DataFrame:
    """Read the sketch table back as per-day estimates plus the
    union-of-all TOTAL row — the query side of the pattern: no event
    data is touched, only the kilobyte sketch rows."""
    sk = spark.read.parquet(table_dir)
    per_day = sk.select(
        "day", F.hll_sketch_estimate("sk").alias("est_distinct")
    )
    total = sk.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sk", F.lit(True))
        ).alias("est_distinct")
    ).select(F.lit("TOTAL").alias("day"), "est_distinct")
    return per_day.unionByName(total)
