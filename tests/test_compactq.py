"""compact_layout_audit support: the BFD tie-invariance claim the
canonical-literal oracle rests on, and the replay's fidelity to the
operator's own packing."""

from __future__ import annotations

import random

from rick_and_morty_data_pipeline_project_spark.queries.compactq import (
    _bfd_bins,
)


def test_bfd_multiset_invariant_under_equal_size_permutations():
    """The staged file names are Spark UUIDs, so the DESC-size/ASC-name
    order is fixed only up to permutations of EQUAL-sized files — the
    oracle is well-defined iff those permutations cannot change the
    (bin_rows, src_files) multiset.  BFD's state is a function of the
    size sequence alone, so they cannot; pinned here over many shuffles
    of a tie-heavy size list."""
    sizes = [7, 7, 7, 5, 5, 5, 5, 3, 3, 2, 2, 2, 1, 1]
    target = 10
    rng = random.Random(13)
    base = _bfd_bins([(f"f{i}", n) for i, n in enumerate(sizes)], target)
    for _ in range(50):
        labels = list(range(len(sizes)))
        rng.shuffle(labels)
        # shuffled labels permute the ASC-name tie order among equals
        shuffled = [(f"g{labels[i]:03d}", n) for i, n in enumerate(sizes)]
        assert _bfd_bins(shuffled, target) == base


def test_bfd_replay_matches_plan_compaction(spark, tmp_path):
    """The pure-Python replay must pack exactly like the operator:
    stage files with known row counts, run plan_compaction, compare
    the (bin_rows, n_files) multisets."""
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.operators.compaction import (
        plan_compaction,
    )

    counts = [37, 31, 29, 23, 23, 19, 17, 13, 11, 7, 7, 5, 3, 2, 1]
    src = str(tmp_path / "tbl")
    for i, n in enumerate(counts):
        spark.range(n).withColumn("part", F.lit(i)).coalesce(
            1
        ).write.mode("append").parquet(src)

    plan = plan_compaction(spark, src, target_rows=60)
    got = sorted(
        (r["rows"], r["files"])
        for r in plan.groupBy("bin_id")
        .agg(
            F.sum("n_rows").alias("rows"), F.count(F.lit(1)).alias("files")
        )
        .collect()
    )
    want = _bfd_bins([(f"x{i}", n) for i, n in enumerate(counts)], 60)
    assert got == want
