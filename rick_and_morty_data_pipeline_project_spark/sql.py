"""Raw-SQL entry point: the engine as a SQL interface over the corpus.

The reference's only query language is SQL strings against SQLite
(Project_Overview.ipynb cell-12/15, Scraper.py:409); this module gives
a user of this engine the same ergonomics — `sql(spark, sf_dir, "...")`
— with Catalyst planning the statement over the registered corpus
views.  Everything the DataFrame catalog can do is reachable this way
too (Spark SQL and the DataFrame API share the optimizer), so a
SQL-first user of the reference can port queries verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rick_and_morty_data_pipeline_project_spark.sources.corpus import (
    register_views,
)


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run an ANSI SQL statement against the corpus tables.

    Views are (re-)registered on every call — `createOrReplaceTempView`
    over an existing lazy DataFrame is metadata-only, so the cost is
    negligible and switching ``sf_dir`` mid-session just works.
    """
    register_views(spark, sf_dir)
    return spark.sql(statement)
