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


def stream_ingest_dedup(
    stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming corpus INGEST with full-history dedup: every
    micro-batch of arriving documents is deduped in-batch (lowest id per
    fingerprint wins), anti-joined against the already-curated corpus
    AND against everything previous batches appended, then appended to
    ``out_dir``.  Unlike ``stream_dedup_exact`` (state bounded by a
    watermark, may re-admit late dups), this gives exact corpus-lifetime
    dedup by using the output table itself as the dedup state —
    the durable-storage shape of production ingest, with zero StateStore
    footprint.

    ``foreachBatch`` bodies run sequentially per micro-batch, so the
    read-output/append cycle has no write race.  Scale: the anti-join
    shuffles fingerprints only (the corpus side projects to one column);
    at 100 TB the output is a table bucketed by fingerprint so each
    ingest join is exchange-free on the corpus side, and the Bloom-style
    prefix pre-filter (operators/dedup.incremental_dedup_prefiltered)
    drops the join for definitely-new rows.

    Returns the started StreamingQuery (availableNow trigger); caller
    awaits termination.
    """
    from pyspark.sql.window import Window

    corpus_fp = corpus.select(
        fingerprint_col(F.col(text_col)).alias("fp")
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        fp = batch_df.withColumn("fp", fingerprint_col(F.col(text_col)))
        w = Window.partitionBy("fp").orderBy(F.asc(id_col))
        first = (
            fp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        seen = corpus_fp
        try:
            seen = seen.unionByName(
                sess.read.parquet(out_dir).select("fp")
            )
        except Exception:
            pass  # first batch: nothing appended yet
        first.join(seen, "fp", "left_anti").write.mode("append").parquet(
            out_dir
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
