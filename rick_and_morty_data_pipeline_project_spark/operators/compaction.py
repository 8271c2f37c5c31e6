"""Small-file compaction planning.

Streaming ingest and per-batch appends leave tables as many small
files; scans then pay per-file open/footer costs and lose row-group
skipping.  The fix is periodic compaction: group small files into
target-sized bins and rewrite each bin as one file.  This module plans
the bins; the rewrite is a filtered read + write per bin.

Scale shape: the per-file row counts come from ONE distributed
aggregation keyed on ``input_file_name()`` (combinable, no data
movement beyond the per-file counts); the bin-packing runs driver-side
over the FILE LIST — bounded by file count, not data size (a 100 TB
table with 10⁵ files is a 10⁵-row planning problem).  First-fit over
files sorted largest-first is the standard compaction heuristic
(2-approximation of optimal bin count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_rows: int,
    max_files: int = 100_000,
) -> DataFrame:
    """Plan compaction bins for the parquet table at ``path``.

    Returns (file, n_rows, bin_id): files sharing a bin_id should be
    rewritten together; each bin holds ≤ ``target_rows`` rows unless a
    single file already exceeds the target (it gets its own bin).
    """
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc("file"))
        .limit(max_files + 1)
        .collect()
    )
    if len(stats) > max_files:
        raise ValueError(
            f"plan_compaction collects per-file stats to the driver: got "
            f"> {max_files} files; raise max_files only if the driver can "
            f"hold the file list"
        )
    bins: list[list[tuple[str, int]]] = []
    bin_rows: list[int] = []
    for row in stats:  # largest-first first-fit
        f, n = row["file"], row["n_rows"]
        for i in range(len(bins)):
            if bin_rows[i] + n <= target_rows:
                bins[i].append((f, n))
                bin_rows[i] += n
                break
        else:
            bins.append([(f, n)])
            bin_rows.append(n)
    out = [
        (f, n, i) for i, files in enumerate(bins) for f, n in files
    ]
    return spark.createDataFrame(out, "file string, n_rows long, bin_id int")


def compact(
    spark: SparkSession, src_path: str, dst_path: str, target_rows: int
) -> int:
    """Execute a compaction plan: rewrite ``src_path`` into ``dst_path``
    with one file per bin.  Returns the number of bins written."""
    plan = plan_compaction(spark, src_path, target_rows).collect()
    n_bins = max((r["bin_id"] for r in plan), default=-1) + 1
    df = spark.read.parquet(src_path)
    file_to_bin = {r["file"]: r["bin_id"] for r in plan}
    mapping = F.create_map(
        *[F.lit(x) for kv in file_to_bin.items() for x in kv]
    )
    (
        df.withColumn("_bin", mapping[F.input_file_name()])
        .repartition(max(n_bins, 1), F.col("_bin"))
        .drop("_bin")
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n_bins
