"""Shared scaffold for durable read-modify-write foreachBatch sinks.

Every sink that maintains a parquet table from a stream (HLL sketch
table, SCD2 dimension) needs the same sequence, in the same order:

1. ``recover_table`` BEFORE the existence check — a crash between
   atomic_overwrite's two renames leaves the only complete table at
   the ``.__merge_old__`` side, and checking existence first would make
   the batch reinitialize the table from itself (silent history loss).
2. Read the current table (or None when absent).
3. Compute the new state from (batch, current).
4. ``atomic_overwrite`` — temp-write + rename swap, safe even though
   the plan reads the path it replaces.

Centralizing it means the recover-before-exists invariant is fixed in
one place for every current and future durable sink.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from rick_and_morty_data_pipeline_project_spark.operators.merge import (
    _hadoop_fs,
    atomic_overwrite,
    read_marker,
    recover_table,
)

# Hidden sidecar (underscore prefix => invisible to parquet readers)
# recording the last micro-batch folded into the table.  It lands in
# the SAME atomic rename as the data, which is what makes the
# at-least-once foreachBatch contract safe for additive folds: a crash
# between the swap and the checkpoint commit replays the batch, and
# the replay sees batch_id <= stored and no-ops instead of
# double-counting.
#
# Contract: the checkpoint directory and the table directory live and
# die TOGETHER (the standard Structured Streaming sink contract).
# Deleting the checkpoint but keeping the table restarts batch ids at
# 0, which the guard cannot distinguish from a replay — those batches
# would be skipped.  Start a new table_dir whenever you start a new
# checkpoint.
_BATCH_MARKER = "_last_batch_id"


def make_durable_sink(
    table_dir: str,
    apply_fn: Callable[[DataFrame, Optional[DataFrame]], DataFrame],
    require_seed: bool = False,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function underlying ``durable_table_sink``,
    exposed so tests can drive it directly (including replaying a
    batch_id, which real foreachBatch does after a crash)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        recover_table(sess, table_dir)
        fs, jvm = _hadoop_fs(sess, table_dir)
        exists = fs.exists(jvm.org.apache.hadoop.fs.Path(table_dir))
        if not exists and require_seed:
            raise IOError(
                f"durable_table_sink: seed table missing at {table_dir}"
            )
        if exists:
            stored = read_marker(sess, table_dir, _BATCH_MARKER)
            if stored is not None and batch_id <= int(stored):
                # at-least-once replay of a batch already folded into
                # the table — applying it again would double-count
                return
        current = sess.read.parquet(table_dir) if exists else None
        atomic_overwrite(
            sess,
            apply_fn(batch_df, current),
            table_dir,
            marker=(_BATCH_MARKER, str(batch_id)),
        )

    return _sink


def durable_table_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    apply_fn: Callable[[DataFrame, Optional[DataFrame]], DataFrame],
    require_seed: bool = False,
):
    """Start an availableNow foreachBatch query that folds each
    micro-batch into the parquet table at ``table_dir`` via
    ``apply_fn(batch_df, current_or_None)``.  ``require_seed`` makes a
    missing table an error instead of a first-batch bootstrap.

    Exactly-once per batch: the last-applied batch_id travels in the
    table's atomic swap (``_last_batch_id`` sidecar) and replays are
    skipped — see ``make_durable_sink``."""
    return (
        stream.writeStream.foreachBatch(
            make_durable_sink(table_dir, apply_fn, require_seed)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
