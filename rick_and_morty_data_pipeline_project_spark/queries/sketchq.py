"""Sketch-table queries: mergeable HLL rollups and Count-Min probes.

Both are rows-only catalog entries (``sql=None``): the sketch binaries
are engine-specific, so a DuckDB hash-oracle is impossible by
construction — the same situation as ``agg_approx_distinct``.  Their
accuracy contracts are enforced instead by tests/test_sketches.py:
per-key HLL estimates within the lg_k=12 error envelope of the exact
distincts, union-of-sketches == whole-input sketch *exactly* (HLL union
losslessness), and every CMS estimate inside the one-sided
``true ≤ est ≤ true + eps·N`` band.

Reference parity note: the reference has no sketches (453-line scraper,
Scraper.py) — these extend §2.10's training-data-pipeline surface where
distinct-counting (dedup audits, per-source uniques) and heavy-hitter
detection (domain skew, boilerplate URLs) are everyday 100 TB jobs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.sketches import (
    cms_point_estimates,
    hll_rollup,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q, t


def sketch_hll_rollup(spark, sf_dir):
    """Daily unique users from per-day HLL sketches plus a TOTAL row
    re-aggregated from the sketches themselves (one raw-data pass for
    the whole report — the persisted-sketch-table pattern).

    Scale: the shuffle carries one fixed-size (~2^12-register) sketch
    state per (task, day); the TOTAL union touches only |days| sketch
    rows, never the events again.
    """
    e = t(spark, sf_dir, "events")
    return (
        hll_rollup(
            e,
            key_col=F.date_format("ts", "yyyy-MM-dd"),
            item_col="user_id",
            lg_k=12,
        )
        .withColumnRenamed("key", "day")
        .withColumnRenamed("est_distinct", "est_users")
        .orderBy("day")
    )


def sketch_cms_user_counts(spark, sf_dir):
    """Per-user event frequencies estimated from ONE global Count-Min
    sketch, reported next to the exact counts with the overcount column
    making the one-sided error visible.

    Scale: the sketch grid is ~100 KB at any corpus size and collects
    once on the driver (like the IVF centroid literals); the probe side
    is the already-aggregated distinct-user relation through a
    vectorized Arrow-batched lookup — raw events are scanned exactly
    once, by the JVM.
    """
    e = t(spark, sf_dir, "events")
    return cms_point_estimates(
        e, "user_id", eps=0.001, confidence=0.99, seed=42
    ).orderBy("item")


def events_rolling_dau_hll(spark, sf_dir):
    """Trailing-7-day active users from DAILY HLL SKETCHES — the 100 TB
    twin of the exact ``events_rolling_dau``: instead of exploding the
    |distinct (user, day)| pair set 7×, each day's fixed-size sketch
    contributes to its 7 window ends and the per-window state is a
    sketch union.  Shuffle volume becomes 7 × |days| × ~2^lg_k registers
    — independent of user cardinality — which is the plan you want when
    the pair set itself is the bottleneck.  Error-bounded against the
    exact twin in tests/test_sketches.py (rows-only: sketch internals).
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("_day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("_day"), F.date_add(F.col("_day"), 6))
        ).alias("win_day"),
        "sk",
    )
    counted = contrib.groupBy("win_day").agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sk", F.lit(True))
        ).alias("_n")
    )
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("_min_day"),
        F.max(F.col("ts").cast("date")).alias("_max_day"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("_min_day"), F.col("_max_day"))
        ).alias("win_day")
    )
    return spine.join(counted, "win_day", "left").select(
        F.date_format("win_day", "yyyy-MM-dd").alias("win_day"),
        F.coalesce("_n", F.lit(0)).alias("n_active_7d_est"),
    )


QUERIES: dict[str, Q] = {
    "sketch_hll_rollup": Q(sketch_hll_rollup, None),
    "sketch_cms_user_counts": Q(sketch_cms_user_counts, None),
    "events_rolling_dau_hll": Q(events_rolling_dau_hll, None),
}
