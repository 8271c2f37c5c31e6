"""MERGE (upsert + delete) over plain parquet — MUT-3 completed.

The reference's mutation surface is drop/recreate (MUT-2) and
insert-if-absent (MUT-3, Scraper.py:409-412); a production pipeline
needs the full MERGE triad: update matched rows, insert unmatched
ones, delete flagged ones.  Without a lakehouse table format this is
copy-on-write over the whole table:

    survivors = target LEFT ANTI updates (on the key)
    result    = survivors UNION (updates minus deletes)

— one shuffle on the merge key, then a full rewrite.  At 100 TB the
same plan applies per *file group*: partition the table by a
key-derived bucket so a MERGE rewrites only the buckets containing
touched keys (that is exactly what Delta/Iceberg copy-on-write does);
the operator's logic is unchanged, only the write scope shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> int:
    """MERGE ``updates`` into the parquet table at ``target_path``.

    * rows whose key matches a target row REPLACE it (last-writer-wins
      within ``updates`` is the caller's responsibility — assert your
      updates are key-unique upstream),
    * unmatched update rows are INSERTED,
    * if ``delete_col`` is set, update rows with that boolean column
      true DELETE the matching target row instead.

    Returns the resulting row count.  The result is localCheckpointed
    before the overwrite because Spark cannot lazily overwrite a path
    it is still reading (read-before-write conflict); the checkpoint
    bounds are the merged table, which the overwrite streams back out.
    """
    target = spark.read.parquet(target_path)
    if delete_col is not None:
        # NULL flag (e.g. from a left join) means "not a delete" — a
        # bare filter(col)/filter(~col) pair would drop NULL-flag rows
        # from BOTH sides and silently ignore the upsert
        flag = F.coalesce(F.col(delete_col), F.lit(False))
        deletes = updates.filter(flag).select(*key_cols)
        writes = updates.filter(~flag).drop(delete_col)
    else:
        deletes = None
        writes = updates
    touched = writes.select(*key_cols).unionByName(
        deletes if deletes is not None else writes.select(*key_cols).limit(0)
    )
    survivors = target.join(touched, key_cols, "left_anti")
    merged = survivors.unionByName(writes).localCheckpoint()
    merged.write.mode("overwrite").parquet(target_path)
    return merged.count()
