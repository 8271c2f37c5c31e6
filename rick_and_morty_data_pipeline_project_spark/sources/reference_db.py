"""Loader for the reference's shipped SQLite database (read-only).

The reference publishes its actual data in ``510FinalProject.db``
(Scraper.py:9 ``create_connection``).  This module reads it with the
stdlib ``sqlite3`` driver (no extra deps) and restates the two wide
fact tables in the engine's canonical layout, resolving SURVEY.md §1.3's
physical-schema trap:

* the shipped ``strain_review_table`` has NO ``strain_id`` column (the
  Scraper.py:382 DDL does) — row identity is the implicit SQLite
  ``rowid``, which we surface as ``strain_id``;
* the per-row ``*_id`` slots hold INTEGER emotion ids into
  ``emotion_table`` (the notebook-run vintage held name strings), and
  they say which emotion the ADJACENT score column really belongs to —
  the score column NAME is not trustworthy.  We therefore unpivot each
  (id, score) slot pair, broadcast-join the 6-row ``emotion_table`` dim
  (JOIN-1), lowercase the names to the engine's canonical emotion
  vocabulary, and pivot back to one column per emotion.

Data-vintage note (verified empirically, tests/test_reference_golden.py):
``episode_emotion_table`` is the SAME vintage as the notebook's recorded
cell-13 output (all 41 episode top-2 emotions reproduce exactly), while
``strain_review_table`` is a LATER re-scrape (e.g. 'alaska' ranks
sad>fear here but happy>angry in the recorded run), so strain-side
golden rows are not derivable from the shipped inputs by any engine.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_DB = "/root/reference/510FinalProject.db"

_SLOTS = ("happy", "angry", "bored", "fear", "sad", "excited")


def _read(db_path: str, sql: str) -> pd.DataFrame:
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        return pd.read_sql_query(sql, con)
    finally:
        con.close()


def emotion_dim(spark: SparkSession, db_path: str = REFERENCE_DB) -> DataFrame:
    return spark.createDataFrame(
        _read(db_path, "SELECT emotion_id, emotion_name FROM emotion_table")
    )


def episode_names(
    spark: SparkSession, db_path: str = REFERENCE_DB
) -> DataFrame:
    return spark.createDataFrame(
        _read(db_path, "SELECT episode_id, episode_name FROM episode_table")
    )


def _resolve_slots(
    spark: SparkSession, wide: DataFrame, id_col: str, db_path: str
) -> DataFrame:
    """Unpivot the 6 (emotion_id, score) slot pairs, resolve names via
    the broadcast emotion dim, pivot back to lowercase wide columns."""
    stack_args = ", ".join(f"{s}_id, {s}" for s in _SLOTS)
    long = wide.selectExpr(
        id_col,
        f"stack(6, {stack_args}) AS (emotion_id, score)",
    )
    dim = emotion_dim(spark, db_path).withColumn(
        "emotion", F.lower("emotion_name")
    )
    named = long.join(F.broadcast(dim), "emotion_id", "inner")
    return (
        named.groupBy(id_col)
        .pivot("emotion", list(_SLOTS))
        .agg(F.first("score"))
    )


def episode_scores(
    spark: SparkSession, db_path: str = REFERENCE_DB
) -> DataFrame:
    """episode_id, episode_name, happy..excited (name-resolved scores)."""
    wide = spark.createDataFrame(
        _read(db_path, "SELECT * FROM episode_emotion_table")
    )
    scores = _resolve_slots(spark, wide, "episode_id", db_path)
    return scores.join(
        F.broadcast(episode_names(spark, db_path)), "episode_id", "inner"
    )


def strain_scores(
    spark: SparkSession, db_path: str = REFERENCE_DB
) -> DataFrame:
    """strain_id (= sqlite rowid), strain_name, happy..excited."""
    wide = spark.createDataFrame(
        _read(db_path, "SELECT rowid AS strain_id, * FROM strain_review_table")
    )
    scores = _resolve_slots(spark, wide, "strain_id", db_path)
    names = spark.createDataFrame(
        _read(
            db_path,
            "SELECT rowid AS strain_id, strain_name FROM strain_review_table",
        )
    )
    return scores.join(F.broadcast(names), "strain_id", "inner")
