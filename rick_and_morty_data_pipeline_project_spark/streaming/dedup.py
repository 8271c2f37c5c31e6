"""Streaming deduplication — the §2.10 exact-dedup operator as an
incremental (§2.8) pipeline stage.

A training-data ingest stream dedups as it lands, not in a nightly
batch.  ``dropDuplicatesWithinWatermark`` keys the StateStore on the
content fingerprint and evicts an entry once the watermark passes it,
so state is bounded by (dup-arrival window × ingest rate) instead of
growing with the whole corpus — the only shape that survives an
unbounded stream (plain ``dropDuplicates`` on a stream retains every
key forever).  At scale the state store shards by the same fingerprint
hash the batch dedup shuffles on; no extra shuffle is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    fingerprint_col,
)


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen document per content fingerprint.

    Input is a streaming DataFrame carrying ``text_col`` and an
    event-time ``ts_col``; output carries the original columns plus
    ``fingerprint``.  Duplicates arriving within ``watermark`` of the
    keeper are dropped; a duplicate arriving later than the watermark
    bound may pass (that is the documented state/recall trade —
    lengthen the watermark to widen the dedup window at the cost of
    state).
    """
    fp = stream.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
