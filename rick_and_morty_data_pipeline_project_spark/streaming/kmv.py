"""Streaming maintenance of a persisted K-minimum-values sketch table.

The streaming completion of the batch ``sketch_kmv_rollup`` query
(queries/sketchq.py): micro-batches of events fold into per-day KMV
sketches and MERGE into a durable parquet sketch table, so "distinct
users per day / lifetime" stays answerable at any moment from
O(k · days) rows of state while raw events are read exactly once.

Why a KMV twin when streaming/sketches.py already maintains HLL:
KMV's state is *plain rows* — the k smallest uniform hashes of the
distinct items (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07
``(k-1)/u_k`` estimator) — and the hash is deterministic,
engine-independent arithmetic (md5 → 60-bit prefix → /2^60, the exact
formula of the batch query).  That makes the streaming-maintained
table BIT-IDENTICAL to a batch rebuild, so the equivalence test can
assert exact equality of estimates, not just closeness — the
strongest streaming ≡ batch contract any sketch in this engine can
offer (HLL register state is the documented rows-only core; KMV is
the portable, fully-checkable one).

Mergeability (why the fold is exact): a hash among the k smallest of
a union is among the k smallest of every part that contains its item,
so the union's KMV is exactly the k smallest of the deduplicated
concatenation of part KMVs.  The per-batch candidate minima therefore
lose nothing, and replay-safety needs no special casing beyond the
durable sink's batch-id guard: re-folding the same items is a no-op
because the hash of an item never changes (dedup by item) — the fold
is idempotent per item, not merely per batch.

Scale/durability:
* Per batch: one distinct + salted two-stage top-k per day
  (``operators/topk.grouped_topk_salted`` — ``day`` is
  low-cardinality, the shape a bare per-day rank window would
  serialize); the merge re-ranks ≤ (k·days + k·days) rows.
* The table update rides ``streaming/_durable.durable_table_sink``:
  temp-write + atomic-rename swap with the last batch id inside the
  swap, so crashes replay idempotently (exactly-once per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.topk import (
    grouped_topk_salted,
)
from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
    durable_table_sink,
)


def kmv_uniform_hash(item: F.Column) -> F.Column:
    """The engine's canonical content-addressed uniform draw in [0,1):
    md5 of the salted item string → first 15 hex digits (60 bits) →
    divide by 2^60.  Mirrors the batch ``sketch_kmv_rollup`` formula
    exactly (queries/sketchq.py) — both engines and both modes draw
    the SAME value for the same item, which is what makes streaming
    maintenance bit-identical to a batch rebuild."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv:"), item.cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )


def stream_kmv_sketch_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    item_col: str = "user_id",
    k: int = 256,
):
    """Maintain a (day, item, u) parquet KMV table — ≤ k rows per day,
    the k hash-smallest distinct items — from an event stream.
    Returns the started availableNow query; crash recovery and the
    atomic swap live in streaming/_durable.py."""

    def _candidates(df: DataFrame) -> DataFrame:
        pairs = df.select(
            F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
            F.col(item_col).alias("item"),
        ).distinct()
        hashed = pairs.withColumn("u", kmv_uniform_hash(F.col("item")))
        return grouped_topk_salted(
            hashed, ["day"], "u", k, tiebreak="item"
        ).withColumn("k", F.lit(k))  # k travels WITH the sketch: a
        # readout guessing a different k would silently misestimate

    def _apply(batch_df: DataFrame, current) -> DataFrame:
        cand = _candidates(batch_df)
        if current is None:
            return cand
        # same item ⇒ same u (content-addressed), so dedup by (day,
        # item) — duplicates must not occupy two of the k slots
        merged = current.unionByName(cand).dropDuplicates(["day", "item"])
        return grouped_topk_salted(
            merged, ["day"], "u", k, tiebreak="item"
        ).withColumn("k", F.lit(k))

    return durable_table_sink(stream, table_dir, checkpoint_dir, _apply)


def kmv_table_estimates(spark, table_dir: str) -> DataFrame:
    """Read the sketch table back as per-day distinct estimates plus
    the union-of-all TOTAL row.  A day holding fewer than k rows IS
    its distinct set (exact count); otherwise the Beyer et al.
    unbiased estimate ``(k-1)/u_k``.  ``k`` is read from the table
    itself (stored with every sketch row), never caller-supplied —
    a wrong guess would silently fire the exact-count branch.  The
    TOTAL arm merges the per-day minima (dedup by item, re-take k
    smallest) — exactly the global KMV by the mergeability argument
    in the module docstring.  Only the O(k · days) sketch rows are
    touched, never event data."""
    sk = spark.read.parquet(table_dir)
    ks = [r["k"] for r in sk.select("k").distinct().collect()]
    if len(ks) != 1:
        raise ValueError(
            f"kmv_table_estimates: table stores conflicting k values {ks}"
        )
    k = int(ks[0])

    def _readout(grouped: DataFrame) -> DataFrame:
        return grouped.select(
            "day",
            F.round(
                F.when(
                    F.col("n_kept") < k, F.col("n_kept").cast("double")
                ).otherwise(F.lit(float(k - 1)) / F.col("_uk")),
                6,
            ).alias("est_distinct"),
        )

    per_day = _readout(
        sk.groupBy("day").agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("_uk")
        )
    )
    g = sk.select("item", "u").dropDuplicates(["item"])
    g_kept = g.orderBy("u", "item").limit(k)  # heap top-k, never a sort
    total = _readout(
        g_kept.agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("_uk")
        ).select(F.lit("TOTAL").alias("day"), "n_kept", "_uk")
    )
    return per_day.unionByName(total)
