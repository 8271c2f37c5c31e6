"""Deterministic stand-ins for the reference's external sources, plus
the EP-1 ETL pipeline restated Spark-first.

The reference's ETL (`Scraper.py --source remote`, SURVEY.md §3 EP-1)
fetches two REST APIs and two HTML sites, scores text with an external
emotion API, and row-inserts into SQLite.  None of those hosts are
reachable (or desirable) here, so each source is replaced by a
deterministic generator with the same *shape*:

* episode API  (SRC-2, Scraper.py:218-233)  → `fake_episode_api`
* strain API   (SRC-1, Scraper.py:197-207)  → `fake_strain_api`
* HTML page text (SRC-3/4, Scraper.py:236-244, 338-345) → `page_text_col`
  (md5-seeded token sequence over the corpus vocabulary)
* ParallelDots scoring (SRC-6) → the lexicon scorer
  (functions/emotions.py)

The pipeline itself is two declarative DAGs ending in
``write.mode("overwrite")`` — no row loops, no repeated API fetches
(the reference re-fetched the full strain API once *per strain*,
Scraper.py:405; here every source is read once and cached).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.emotions import (
    EMOTIONS,
    emotion_score_cols,
)
from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    normalize_name_col,
    wiki_url_col,
)

_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def fake_episode_api(spark: SparkSession, n: int = 41) -> DataFrame:
    """Shape of the Rick-and-Morty episode endpoint: (id, name); names
    exercise the ':'/',' normalization branches (Scraper.py:227-229)."""
    from rick_and_morty_data_pipeline_project_spark.sources.reference_fixtures import (
        episode_rows,
    )

    return spark.createDataFrame(
        episode_rows()[:n], "episode_id int, episode_name string"
    )


def fake_strain_api(spark: SparkSession) -> DataFrame:
    """Shape of the strain API payload: name-keyed dict → (id, name)."""
    from rick_and_morty_data_pipeline_project_spark.sources.reference_fixtures import (
        strain_review_rows,
    )

    return spark.createDataFrame(
        [(r[0], r[1]) for r in strain_review_rows()],
        "strain_id int, strain_name string",
    )


def page_text_col(key, n_tokens: int = 40):
    """Deterministic pseudo page text for a key column: n_tokens tokens
    drawn from the corpus vocabulary by chained md5 — the stand-in for
    fetched HTML paragraph slices (soup.find_all('p')[3:]).  Pure
    column expressions: reproducible in any engine, no network."""
    vocab_arr = F.array(*[F.lit(w) for w in _VOCAB])
    key_str = key.cast("string")
    # one flat md5 per token (a chained hash would nest n_tokens deep and
    # blow up codegen); transform() keeps it a single array expression
    idxs = F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda i: (
            F.conv(
                F.substring(F.md5(F.concat(key_str, F.lit(":"), i.cast("string"))), 1, 6),
                16,
                10,
            ).cast("long")
            % len(_VOCAB)
        ).cast("int"),
    )
    return F.array_join(
        F.transform(idxs, lambda ix: F.element_at(vocab_arr, ix + 1)), " "
    )


def etl_pipeline(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """EP-1 restated: build the four reference tables as parquet.

    Stage structure mirrors Scraper.py's main() (SURVEY.md §3 EP-1) but
    each loop-of-INSERTs becomes one distributed write.
    """
    # emotion_dim (emotion_id table, Scraper.py:255-274)
    emotion_dim = spark.createDataFrame(
        [(i + 1, e) for i, e in enumerate(EMOTIONS)],
        "emotion_id int, emotion_name string",
    )

    # episode_dim (Scraper.py:277-304): fetch → normalize → write
    episodes = fake_episode_api(spark)
    episode_dim = episodes.select(
        "episode_id",
        "episode_name",
        normalize_name_col(
            F.col("episode_name"), F.col("episode_id")
        ).alias("episode_slug"),
        wiki_url_col(F.col("episode_name"), F.col("episode_id")).alias(
            "wiki_url"
        ),
    )

    # episode_emotion (Scraper.py:308-330): page text → score → write
    ep_text = episode_dim.withColumn(
        "text", page_text_col(F.col("episode_slug"))
    )
    scores = emotion_score_cols("text")
    episode_emotion = ep_text.select(
        "episode_id", *[scores[e].alias(e) for e in EMOTIONS]
    )

    # strain_review (Scraper.py:350-434): fetch once, single-word filter
    # (FIL-6), normalize, score page text, write
    strains = fake_strain_api(spark).filter(
        F.size(F.split("strain_name", " ")) == 1
    )
    st_text = strains.withColumn(
        "text", page_text_col(F.lower(F.trim(F.col("strain_name"))))
    )
    strain_review = st_text.select(
        "strain_id",
        F.lower(F.trim(F.col("strain_name"))).alias("strain_name"),
        *[scores[e].alias(e) for e in EMOTIONS],
    )

    out = {
        "emotion_dim": emotion_dim,
        "episode_dim": episode_dim,
        "episode_emotion": episode_emotion,
        "strain_review": strain_review,
    }
    for name, df in out.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    return {
        name: spark.read.parquet(f"{out_dir}/{name}.parquet")
        for name in out
    }


def idempotent_append(
    existing: DataFrame, new: DataFrame, key: str
) -> DataFrame:
    """JOIN-4 (Scraper.py:409-412): insert-if-not-exists as a left-anti
    join — the set-oriented form of the reference's per-row existence
    probe."""
    return new.join(existing, on=key, how="left_anti")
