"""Globally-sorted export without a single-task sort.

A naive `df.orderBy(col).write` funnels the whole relation through one
total-order sort; the distributed form is range partitioning (sampled
split points) + per-partition sort: each output file is internally
sorted AND file N's range precedes file N+1's, so concatenating files
in partition order yields the total order.  This is how a 100 TB table
gets exported in key order: the sort parallelizes across executors and
no task ever holds more than its range.

The same layout is what makes downstream parquet min-max row-group
skipping effective on the sort key (every file covers a narrow range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_globally_sorted(
    df: DataFrame, order_col: str, path: str, num_files: int = 8
) -> None:
    """Write ``df`` to ``path`` as ``num_files`` parquet files forming a
    global ascending order on ``order_col`` (file ranges disjoint and
    ordered by filename part index)."""
    (
        df.repartitionByRange(num_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
