"""Streaming ≡ batch equivalence: the watermarked streaming hourly
rollup must produce exactly the batch rollup once the stream drains."""

from __future__ import annotations

from rick_and_morty_data_pipeline_project_spark.queries.catalog import QUERIES
from rick_and_morty_data_pipeline_project_spark.streaming.windowed import (
    run_available_now,
    stream_events_hourly,
)
from tests.conftest import SF_SMALL


def test_stream_matches_batch(spark):
    stream_df = stream_events_hourly(spark, SF_SMALL)
    assert stream_df.isStreaming
    run_available_now(stream_df, "hourly_test")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    batch = QUERIES["events_hourly_rollup"].fn(spark, SF_SMALL)
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
