"""Small-file compaction EXECUTOR — the action behind the planner.

``queries/extraq.profile_compaction_plan`` decides "these 200 tiny
date partitions should be 9 files"; this module performs the rewrite:
bin consecutive partitions into ~``target_rows`` merge groups with the
SAME first-fit running-sum rule, rewrite the table partitioned by
merge group (one file per group), and install the result with the
temp-write + double-rename swap so every failure point leaves a
complete table on disk (crash recovery via ``operators/merge``'s
protocol — the paths use the same suffix convention, so
``recover_table`` heals a half-finished compaction too).

Layout contract after compaction:

* directory partitioning by ``grp`` (the merge group) — the file
  count is the PLAN's group count, one file per group, each
  ~``target_rows`` rows (bounded above by ``target_rows`` + the
  largest single input partition, the first-fit guarantee);
* the original partition column survives as a DATA column, and rows
  are sorted by it within each file, so min/max row-group statistics
  keep partition-value pruning effective after the physical partitions
  are gone (the standard coarsen-without-losing-pruning trade).

Row preservation is verified BEFORE the swap via an ``observe`` metric
on the write itself (no second scan): a count mismatch raises and the
original table is never touched.

Scale: the plan is computed over the per-partition count relation
(one row per partition value — bounded by the table's partition
count, kilobytes at 100 TB), broadcast back onto the fact scan; the
rewrite is one shuffle by ``grp``.  The single-partition ordered
window in the planner runs over that tiny relation only, never the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.operators.merge import (
    _hadoop_fs,
    recover_table,
)


def plan_compaction(
    counts: DataFrame, part_col: str, target_rows: int
) -> DataFrame:
    """First-fit merge groups over a (part_col, n_rows) relation: a
    partition joins the group where its FIRST row lands
    (grp = ⌊(cumsum − n_rows) / target⌋), so groups are contiguous in
    partition order and every group except possibly the last reaches
    the target once its final partition is added.  Same rule as the
    oracled ``profile_compaction_plan`` query, generalized to any
    partition column."""
    w_cum = Window.orderBy(part_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return counts.select(
        part_col,
        "n_rows",
        F.floor(
            (F.sum("n_rows").over(w_cum) - F.col("n_rows"))
            / F.lit(float(target_rows))
        )
        .cast("int")
        .alias("grp"),
    )


def compact_table(
    spark: SparkSession,
    table_dir: str,
    part_col: str,
    target_rows: int,
) -> dict:
    """Rewrite the hive-partitioned parquet table at ``table_dir`` into
    one file per planned merge group (layout contract in the module
    docstring).  Returns ``{"n_rows": int, "n_groups": int}``.  Safe
    against crashes at any point: temp-write + double-rename, with
    ``recover_table`` healing a half-finished swap on the next call."""
    recover_table(spark, table_dir)
    table = spark.read.parquet(table_dir)
    n_before = table.count()
    counts = table.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_rows"))
    plan = plan_compaction(counts, part_col, target_rows)
    n_groups = plan.agg(F.countDistinct("grp")).collect()[0][0]

    obs = Observation("compaction_rows")
    compacted = (
        table.join(F.broadcast(plan.drop("n_rows")), part_col)
        .repartition("grp")  # all rows of a group in ONE task => 1 file
        .sortWithinPartitions(part_col)
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )

    tmp_path = table_dir + ".__merge_tmp__"
    old_path = table_dir + ".__merge_old__"
    fs, jvm = _hadoop_fs(spark, table_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    fs.delete(hpath(tmp_path), True)
    fs.delete(hpath(old_path), True)
    compacted.write.mode("overwrite").partitionBy("grp").parquet(tmp_path)
    n_written = int(obs.get["n"])
    if n_written != n_before:
        fs.delete(hpath(tmp_path), True)
        raise IOError(
            f"compact_table: wrote {n_written} rows, expected {n_before}"
            " — original table left untouched"
        )
    if not fs.rename(hpath(table_dir), hpath(old_path)):
        raise IOError(f"compact_table: cannot move aside {table_dir}")
    if not fs.rename(hpath(tmp_path), hpath(table_dir)):
        fs.rename(hpath(old_path), hpath(table_dir))
        raise IOError(f"compact_table: cannot install {tmp_path}")
    fs.delete(hpath(old_path), True)
    return {"n_rows": n_written, "n_groups": int(n_groups)}


def data_file_stats(spark: SparkSession, table_dir: str) -> DataFrame:
    """Per-data-file row counts for a parquet table — the before/after
    evidence a compaction run is judged by (one narrow scan; the
    aggregate is one row per file)."""
    return (
        spark.read.parquet(table_dir)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
