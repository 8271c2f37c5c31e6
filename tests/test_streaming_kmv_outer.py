"""Streaming KMV sketch-table maintenance and the watermarked
stream-stream LEFT OUTER join — the two round-8 late additions to the
streaming surface.

KMV: unlike the HLL twin (estimate-equality through a lossy union),
every number here is deterministic arithmetic, so streaming ≡ batch is
asserted BIT-FOR-BIT, including the estimator path (k < per-day
distinct count).

Outer join: null-padded rows are watermark-driven, so the test drives
the watermark forward with far-future sentinel batches across a
checkpoint-resumed second run, then asserts the final file-sink output
equals the batch left join exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table
from tests.conftest import SF_SMALL

_K = 12  # < per-day distinct on most days (11-15) => both readout paths


def _batch_kmv_expected(events, k):
    """The batch KMV readout computed directly from the raw events —
    per-day and TOTAL (k-1)/u_k estimates with the exact-count branch,
    same formula the oracled batch query sketch_kmv_rollup pins."""
    from rick_and_morty_data_pipeline_project_spark.streaming.kmv import (
        kmv_uniform_hash,
    )

    pairs = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("user_id").alias("item"),
    ).distinct()
    hashed = pairs.withColumn("u", kmv_uniform_hash(F.col("item")))
    rows = {}
    for scope in ("day", "total"):
        if scope == "day":
            grouped = hashed.groupBy("day")
        else:
            grouped = hashed.select(
                F.lit("TOTAL").alias("day"), "item", "u"
            ).dropDuplicates(["item"]).groupBy("day")
        # same Spark arithmetic (incl. F.round HALF_UP) as the readout,
        # so the comparison below really is bit-for-bit
        agged = grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.element_at(
                F.sort_array(F.collect_list("u")),
                F.least(F.count(F.lit(1)), F.lit(k)).cast("int"),
            ).alias("_uk"),
        ).select(
            "day",
            F.round(
                F.when(
                    F.col("n") < k, F.col("n").cast("double")
                ).otherwise(F.lit(float(k - 1)) / F.col("_uk")),
                6,
            ).alias("est"),
        )
        for r in agged.collect():
            rows[r["day"]] = r["est"]
    return rows


def test_stream_kmv_table_bit_identical_to_batch(spark, tmp_path):
    """Incrementally-maintained KMV table ≡ batch formula EXACTLY:
    per-day estimates and the merged TOTAL match bit-for-bit after the
    events arrive split across micro-batches that split days (so the
    fold genuinely merges same-day minima), and the state stays ≤ k
    rows per day."""
    from rick_and_morty_data_pipeline_project_spark.streaming.kmv import (
        kmv_table_estimates,
        stream_kmv_sketch_table,
    )

    events = load_table(spark, SF_SMALL, "events")
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            str(in_dir / f"chunk_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*/")
    )
    table_dir = str(tmp_path / "kmv_table")
    q = stream_kmv_sketch_table(
        stream, table_dir, str(tmp_path / "ckpt"), k=_K
    )
    q.awaitTermination()

    sk = spark.read.parquet(table_dir)
    sizes = sk.groupBy("day").count().collect()
    assert sizes and all(r["count"] <= _K for r in sizes)

    got = {
        r["day"]: r["est_distinct"]
        for r in kmv_table_estimates(spark, table_dir).collect()
    }
    want = _batch_kmv_expected(events, _K)
    n_days = events.select(
        F.date_format("ts", "yyyy-MM-dd")
    ).distinct().count()
    assert got == want and len(got) == n_days + 1  # every day + TOTAL
    # both branches really exercised on this corpus
    n_day = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id"
    ).distinct().groupBy("d").count().collect()
    assert any(r["count"] < _K for r in n_day)
    assert any(r["count"] >= _K for r in n_day)


def _sentinel(spark, events_schema, ts, view_user, click_user):
    """One far-future view + one far-future click (different users, so
    they cannot join) — advances BOTH sides' watermarks."""
    return spark.createDataFrame(
        [
            (10_000_000, ts, view_user, "view", 0.0, "{}"),
            (10_000_001, ts, click_user, "click", 0.0, "{}"),
        ],
        schema=events_schema,
    )


def test_stream_outer_join_flushes_unmatched_at_watermark(
    spark, tmp_path
):
    """LEFT OUTER stream-stream attribution: matched pairs emit
    eagerly; unconverted views emit null-click rows only once the
    watermark proves no click can arrive.  Run 1 drains the real
    events (nulls still pending in state); run 2 resumes from the
    checkpoint with two sentinel batches that advance the watermark
    past every real view — after which the file-sink output equals
    the batch left join bit-for-bit."""
    from rick_and_morty_data_pipeline_project_spark.streaming.outerjoin import (
        view_click_outer_stream,
    )

    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    events.coalesce(1).write.parquet(str(in_dir / "a_real.parquet"))

    def _run():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*/")
        )
        q = (
            view_click_outer_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run()
    mid = spark.read.parquet(str(tmp_path / "out"))
    # inner matches already emitted; null flush still pending
    assert mid.filter(F.col("click_id").isNotNull()).count() > 0

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    for i, days in enumerate((2, 4)):
        _sentinel(
            spark,
            events.schema,
            max_ts + datetime.timedelta(days=days),
            -1 - i,
            -10 - i,
        ).coalesce(1).write.parquet(str(in_dir / f"z_sentinel_{i}.parquet"))
    _run()

    got = {
        (r["view_id"], r["click_id"]): r["latency_s"]
        for r in spark.read.parquet(str(tmp_path / "out"))
        .filter(F.col("user_id") >= 0)
        .collect()
    }
    want = {
        (r["view_id"], r["click_id"]): r["latency_s"]
        for r in view_click_outer_stream(events).collect()
    }
    assert got == want
    # the outer join genuinely adds rows the inner join lacks
    nulls = [k for k in want if k[1] is None]
    assert nulls and len(want) > len(nulls)
