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


def _output_exists(sess, out_dir: str) -> bool:
    """True iff the append target already holds data.  An explicit
    existence probe, NOT a try/except around the read: a bare except
    would also swallow transient FS errors / corrupt footers on later
    batches and silently shrink the dedup state to corpus-only —
    readmitting duplicates instead of failing the batch."""
    jvm = sess.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = hpath.getFileSystem(sess.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


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
    bloom_m_log2: int | None = None,
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
    ingest join is exchange-free on the corpus side.  Pass
    ``bloom_m_log2`` to route each batch through the k-hash Bloom
    pre-filter (operators/dedup.incremental_dedup_bloom, auto layout:
    literal / broadcast-relation / sharded word-join by m) so
    definitely-new rows skip the exact join entirely — provably the
    same survivors (the operator's anti-join-equivalence contract,
    re-asserted streaming-vs-plain in tests/test_streaming.py).

    Returns the started StreamingQuery (availableNow trigger); caller
    awaits termination.
    """
    from pyspark.sql.window import Window

    corpus_fp = corpus.select(
        fingerprint_col(F.col(text_col)).alias("fp")
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from rick_and_morty_data_pipeline_project_spark.operators.dedup import (
            incremental_dedup_bloom,
        )

        sess = batch_df.sparkSession
        fp = batch_df.withColumn("fp", fingerprint_col(F.col(text_col)))
        w = Window.partitionBy("fp").orderBy(F.asc(id_col))
        first = (
            fp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        seen = corpus_fp
        if _output_exists(sess, out_dir):
            seen = seen.unionByName(
                sess.read.parquet(out_dir).select("fp")
            )
        if bloom_m_log2 is not None:
            new_rows = incremental_dedup_bloom(
                first, seen, "fp", m_log2=bloom_m_log2
            )
        else:
            new_rows = first.join(seen, "fp", "left_anti")
        new_rows.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_neardup(
    stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """Streaming corpus ingest with NEAR-duplicate suppression — the
    §2.10 MinHash-LSH near-dedup operator as an incremental (§2.8)
    pipeline stage, completing the exact/near pair that
    :func:`stream_ingest_dedup` starts.

    Per micro-batch:

    1. cross-set banded LSH (``minhash_lsh_pairs_between``) against the
       curated corpus PLUS everything previous batches appended — batch
       rows with a candidate partner at ``jaccard_est ≥ threshold``
       are near-dups of already-kept documents and drop;
    2. within the remaining batch rows, in-batch LSH pairs →
       connected components → keep the MIN-ID representative per
       cluster (the connected-components min-label policy, transitive
       within the batch; note the batch curation pipeline ranks its
       cluster representatives by quality score instead — an
       incremental stream cannot re-rank against documents it has
       already durably kept, so the simpler first/lowest-id policy is
       the honest streaming semantics).

    State is the durable output table itself (zero StateStore
    footprint), exactly like the exact-ingest twin: steady-state cost
    per batch is |batch| × band-collision rate — batch-batch work never
    touches the corpus beyond the banding join, and the corpus banding
    side shuffles only its band keys.  At 100 TB the corpus signatures
    are precomputed and bucketed by band so each ingest join is
    exchange-free on the corpus side.

    Keeper policy note: a batch row suppressed by a corpus partner is
    dropped even if it would also have claimed in-batch followers —
    those followers are then compared transitively via their own
    corpus/batch candidates, matching the batch pipeline's
    components-then-representative semantics batch-locally (cross-batch
    transitivity through a DROPPED row is not tracked; that is the
    incremental recall trade, same as exact ingest's watermark trade).

    Returns the started StreamingQuery (availableNow trigger); caller
    awaits termination.
    """
    from rick_and_morty_data_pipeline_project_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_lsh_pairs_between,
    )

    lsh_kwargs = dict(
        num_hashes=num_hashes, band_size=band_size, shingle_k=shingle_k
    )
    base = corpus.select(F.col(id_col), F.col(text_col))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        seen = base
        if _output_exists(sess, out_dir):
            seen = seen.unionByName(
                sess.read.parquet(out_dir).select(id_col, text_col)
            )
        batch = batch_df.localCheckpoint()  # freeze: consumed 3×

        cross = minhash_lsh_pairs_between(
            batch, seen, id_col, text_col, **lsh_kwargs
        ).filter(F.col("jaccard_est") >= threshold)
        survivors = batch.join(
            cross.select(F.col("id_left").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        ).localCheckpoint()

        pairs = minhash_lsh_pairs(
            survivors, id_col, text_col, **lsh_kwargs
        ).filter(F.col("jaccard_est") >= threshold)
        losers = (
            connected_components(pairs, "id_a", "id_b")
            .filter(F.col("node") != F.col("cluster_id"))
            .select(F.col("node").alias(id_col))
        )
        survivors.join(losers, id_col, "left_anti").write.mode(
            "append"
        ).parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
