"""Footer-only parquet table statistics — the metadata-read path.

``profile_table_files`` (queries/extraq.py) audits a table by scanning
it; this module produces the SAME per-file report from parquet FOOTERS
alone: row counts from file metadata, key bounds from row-group
column statistics.  At 100 TB that is the difference between reading
the table and reading ~KB per file — the standard "stats from
metadata" primitive behind compaction planning, freshness checks, and
query-planning statistics.

Distribution shape: the driver lists the file paths (file LISTING is
cheap and is what every table format's planner does); the footer reads
run as an Arrow-batched ``mapInPandas`` over the path relation, so a
million-file table fans its metadata reads across the cluster instead
of serializing them on the driver.  Only file paths and the fixed-width
stats rows ever move.

Caveat (documented, not hidden): parquet string statistics may be
truncated by writers; this helper is exact for integer/temporal key
columns (the driver corpus's keys), and callers needing exact bounds
on string keys must fall back to the scanning audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parquet_footer_stats(
    spark: SparkSession, table_dir: str, key_col: str
) -> DataFrame:
    """(file, n_rows, min/max of ``key_col``) per parquet file under
    ``table_dir`` — footer reads only, distributed over the file list."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    paths = []
    for status in fs.listStatus(hpath):
        p = status.getPath()
        if p.getName().endswith(".parquet"):
            paths.append((p.toString(),))
    if not paths:
        raise ValueError(f"no parquet files under {table_dir}")
    fdf = spark.createDataFrame(paths, "path string").repartition(
        min(len(paths), 64)
    )

    def batches(it):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                md = pq.ParquetFile(local).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                idx = names.index(key_col)
                mn = mx = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.has_min_max:
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                rows.append(
                    (local.rsplit("/", 1)[-1], md.num_rows, mn, mx)
                )
            yield pd.DataFrame(
                rows, columns=["file", "n_rows", "min_key", "max_key"]
            )

    return fdf.mapInPandas(
        batches, "file string, n_rows long, min_key long, max_key long"
    )
