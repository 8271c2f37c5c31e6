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

from rick_and_morty_data_pipeline_project_spark.operators.scd import scd2_apply
from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
    durable_table_sink,
)


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
    Returns the started query (availableNow trigger); the
    crash-recovery/read/swap sequencing lives in streaming/_durable.py."""

    def _apply(batch_df: DataFrame, current) -> DataFrame:
        return scd2_apply(
            current,
            batch_df,
            key=key,
            tracked=tracked,
            effective_col=effective_col,
        )

    return durable_table_sink(
        updates_stream,
        table_dir,
        checkpoint_dir,
        _apply,
        require_seed=True,
    )
