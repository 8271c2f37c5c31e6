"""SparkSession factory with scale-oriented defaults.

The reference uses a single SQLite connection as its "engine"
(Scraper.py:247-251); here the session is the engine.  Defaults are chosen
for the driver harness (local[32], 128 GiB) but every knob is the one you
would also set on a 1000-executor cluster:

* AQE on — runtime partition coalescing, skew-join splitting, and
  dynamic broadcast conversion replace hand-tuned shuffle counts.
* Arrow on — any pandas-UDF exchange is columnar, not pickled rows.
* UTC session timezone — deterministic timestamp semantics matching the
  DuckDB oracle (naive wall-clock in parquet).
* Broadcast threshold 64 MiB — the TPC-H-ish dims (region/nation/
  customer/supplier/part) stay broadcast even at large SF; fact-fact
  joins still shuffle on keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rick-and-morty-spark-engine",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Shuffle partition count ~ cores for local mode; AQE coalesces further.
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(int(cpus), 8)))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable parity/perf conf to an externally-created
    session (the driver owns the session for `queries()` calls)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
