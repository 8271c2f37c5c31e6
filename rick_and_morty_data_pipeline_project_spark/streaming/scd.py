"""Streaming CDC → SCD Type-2 dimension maintenance.

The streaming completion of operators/scd.py: each micro-batch of
change events applies as one SCD2 transition against the durable
dimension table, so the dimension's history advances continuously with
the CDC feed instead of waiting for a nightly batch.

Semantics: batches apply SEQUENTIALLY (foreachBatch bodies are
serialized), so ``n`` micro-batches produce exactly the history that
``n`` sequential :func:`scd2_apply` calls produce — asserted against
the batch operator in tests/test_streaming.py.  Within one micro-batch
the operator's last-writer-wins collapse applies; a key changing twice
must arrive in different batches to yield two history rows (true CDC
ordering — the stream's time axis IS the batch axis).

Durability: read-modify-write through atomic_overwrite with
recover_table first (the same crash contract as the streaming sketch
table — a failure mid-swap restores, never reinitializes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rick_and_morty_data_pipeline_project_spark.operators.merge import (
    _hadoop_fs,
    atomic_overwrite,
    recover_table,
)
from rick_and_morty_data_pipeline_project_spark.operators.scd import scd2_apply


def stream_scd2_apply(
    updates_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    tracked: list[str],
    effective_col: str = "effective_date",
):
    """Maintain the SCD2 dimension at ``table_dir`` from a stream of
    update rows (key, *tracked, effective_col).  The table must be
    seeded (an initial current-state write) before the stream starts.
    Returns the started query (availableNow trigger)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        recover_table(sess, table_dir)
        fs, jvm = _hadoop_fs(sess, table_dir)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(table_dir)):
            raise IOError(
                f"stream_scd2_apply: seed table missing at {table_dir}"
            )
        current = sess.read.parquet(table_dir)
        new_state = scd2_apply(
            current,
            batch_df,
            key=key,
            tracked=tracked,
            effective_col=effective_col,
        )
        atomic_overwrite(sess, new_state, table_dir)

    return (
        updates_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
