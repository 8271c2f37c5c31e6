"""Schema-evolution reader: three write generations (missing columns,
int→long widening, a rename) read back as one target-schema frame —
the case plain mergeSchema cannot handle (it raises on int→long and
treats renames as unrelated columns)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from rick_and_morty_data_pipeline_project_spark.sources.evolution import (
    generation_census,
    read_evolved,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _write_generations(spark, tmp_path):
    table = str(tmp_path / "tbl")
    # gen1: int id, old column name, no score
    spark.createDataFrame(
        [(1, "ann"), (2, "bo")],
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("name", T.StringType()),
            ]
        ),
    ).coalesce(1).write.mode("append").parquet(table)
    # gen2: id widened to long, score added, still old name
    spark.createDataFrame(
        [(3, "cy", 0.5)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]
        ),
    ).coalesce(1).write.mode("append").parquet(table)
    # gen3: renamed name -> full_name
    spark.createDataFrame([(4, "dee", 0.9)], TARGET).coalesce(1).write.mode(
        "append"
    ).parquet(table)
    return table


def test_read_evolved_unifies_three_generations(spark, tmp_path):
    table = _write_generations(spark, tmp_path)

    # control: the built-in merge path really cannot read this table
    with pytest.raises(Exception, match="(?i)merge|incompatible"):
        spark.read.option("mergeSchema", "true").parquet(table).collect()

    out = read_evolved(
        spark, table, TARGET, renames={"name": "full_name"}
    )
    assert out.schema == TARGET
    rows = {r["id"]: (r["full_name"], r["score"]) for r in out.collect()}
    assert rows == {
        1: ("ann", None),
        2: ("bo", None),
        3: ("cy", 0.5),
        4: ("dee", 0.9),
    }
    # every id is a bigint after widening
    assert all(isinstance(k, int) for k in rows)

    census = {
        r["sig"]: r["n_files"]
        for r in generation_census(spark, table).collect()
    }
    assert len(census) == 3 and sum(census.values()) == 3


def test_read_evolved_empty_dir(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    out = read_evolved(spark, str(d), TARGET)
    assert out.schema == TARGET and out.count() == 0


def test_read_evolved_pushdown_survives(spark, tmp_path):
    """Each generation is an ordinary parquet scan: a filter on the
    unified frame reaches the scans as a pushed filter (the evolution
    layer must not break pushdown)."""
    table = _write_generations(spark, tmp_path)
    out = read_evolved(
        spark, table, TARGET, renames={"name": "full_name"}
    ).filter(F.col("score") > 0.6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(score), GreaterThan(score,0.6)" in plan
    assert [r["id"] for r in out.collect()] == [4]
