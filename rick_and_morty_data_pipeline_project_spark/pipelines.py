"""End-to-end corpus curation — the operators composed as one pipeline.

`curate_corpus` is the "make training data" path a user of this engine
actually runs: quality filter → exact-dedup keeper → near-dup (LSH +
connected components) keeper → shard + sequence-packing assignment →
partitioned parquet write.  Each stage is the already-tested operator;
this module contributes the composition, the write layout, and the
funnel accounting.

Scale notes: every stage is shuffle-bounded the same way its operator
is (see PERFORMANCE.md); the final write partitions by ``shard`` so
downstream training jobs prune to their shard, and the in-shard
``bucket`` column is the sequence-packing unit.  Nothing in the
pipeline collects corpus-sized data to the driver — the one driver-side
value is the per-stage count report, and that report is FREE: the
raw/quality counts ride as ``DataFrame.observe`` accumulator metrics on
the single action that materializes the deduped corpus, and the final
count rides the write itself — no stage is ever re-executed just to
count it (the round-2 version ran four eager ``count()`` actions, each
replaying the upstream lineage; at 100 TB that multiplied the whole
pipeline cost by ~5×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    fingerprint_col,
)
from rick_and_morty_data_pipeline_project_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 10,
    min_distinct_ratio: float = 0.3,
    capacity: int = 2048,
    n_shards: int = 32,
    remove_boilerplate: bool = False,
    classifier_threshold: float | None = None,
) -> dict[str, int]:
    """Run the full curation funnel over ``{sf_dir}/documents.parquet``
    and write the surviving corpus to ``out_dir`` partitioned by shard.

    Returns per-stage document counts (the funnel report).

    Optional stages (both default off, preserving the classic funnel):

    * ``remove_boilerplate`` — C4-style repeated-span deletion first
      (queries/textq.text_remove_boilerplate semantics): documents are
      rebuilt from spans whose text is corpus-unique, so later
      fingerprints/signatures see the cleaned text.  Adds the two
      span-sized shuffles that operator costs, nothing more.
    * ``classifier_threshold`` — the distilled linear quality
      classifier (queries/textq.QUALITY_CLF_W) as an extra quality
      gate: sigmoid score ≥ threshold.  A narrow expression folded
      into the same filter stage — no extra pass.
    """
    d = load_table(spark, sf_dir, "documents")
    if remove_boilerplate:
        from rick_and_morty_data_pipeline_project_spark.queries.textq import (
            remove_boilerplate_spans,
        )

        d = remove_boilerplate_spans(
            d, ["doc_id", "source", "lang"]
        ).withColumnRenamed("clean_text", "text").drop("n_removed")
    toks = F.split("text", " ")
    staged = d.select(
        "doc_id",
        "text",
        "source",
        "lang",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_dr"),
        fingerprint_col(F.col("text")).alias("_fp"),
    )
    # raw/quality counts are CollectMetrics nodes — collected for free
    # by whichever action first traverses them, never their own jobs
    obs_raw = Observation("curate_raw")
    staged = staged.observe(obs_raw, F.count(F.lit(1)).alias("n"))

    quality_pred = (F.col("n_tokens") >= min_tokens) & (
        F.col("_dr") >= min_distinct_ratio
    )
    if classifier_threshold is not None:
        from rick_and_morty_data_pipeline_project_spark.queries.textq import (
            quality_classifier_score,
        )

        # The query's exact model, one definition: rounded sigmoid vs
        # the threshold — no rounding-boundary drift between "copies".
        # staged already materializes n_tokens/_dr from the identical
        # expressions, so hand them in rather than re-splitting.
        quality_pred = quality_pred & (
            quality_classifier_score(
                "text",
                n_tokens=F.col("n_tokens"),
                distinct_ratio=F.col("_dr"),
            )
            >= F.lit(classifier_threshold)
        )
    quality = staged.filter(quality_pred)
    obs_quality = Observation("curate_quality")
    quality = quality.observe(obs_quality, F.count(F.lit(1)).alias("n"))

    w = Window.partitionBy("_fp").orderBy("doc_id")
    exact_kept = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )
    # the deduped corpus feeds three consumers (LSH banding, the
    # cluster-quality join, the final write) — persist it so the
    # filter+fingerprint-window prefix runs ONCE.  The materializing
    # count is the single accounting action of the whole pipeline; it
    # also completes obs_raw/obs_quality.  At 100 TB use
    # StorageLevel.DISK_ONLY (or a durable checkpoint) — the point is
    # reuse, not residency.
    exact_kept = exact_kept.persist()
    n_exact = exact_kept.count()

    # near-dup stage: LSH candidate pairs → components → keep the
    # HIGHEST-QUALITY member of each cluster (distinct-token ratio,
    # doc_id tiebreak — the dedup_cluster_representatives policy), not
    # merely the lowest id; non-representative members anti-join away
    pairs = minhash_lsh_pairs(
        exact_kept, "doc_id", "text", num_hashes=8, band_size=4, shingle_k=3
    )
    clusters = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    cw = Window.partitionBy("cluster_id").orderBy(
        F.desc("_q"), F.asc("doc_id")
    )
    losers = (
        clusters.join(
            exact_kept.select("doc_id", F.col("_dr").alias("_q")), "doc_id"
        )
        .withColumn("_crn", F.row_number().over(cw))
        .filter(F.col("_crn") > 1)
        .select("doc_id")
    )
    near_kept = exact_kept.join(losers, "doc_id", "left_anti").drop("_dr")

    packed = near_kept.withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("int")
    )
    pw = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = packed.withColumn(
        "bucket",
        F.floor((F.sum("n_tokens").over(pw) - 1) / capacity).cast("long"),
    )
    # the near-dedup count rides the write action itself
    obs_near = Observation("curate_near")
    packed = packed.observe(obs_near, F.count(F.lit(1)).alias("n"))
    packed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    exact_kept.unpersist()

    return {
        "raw": int(obs_raw.get["n"]),
        "quality": int(obs_quality.get["n"]),
        "exact_dedup": n_exact,
        "near_dedup": int(obs_near.get["n"]),
    }
