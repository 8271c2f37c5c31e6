"""Pins for the shared encode-on-arrival skeleton
(streaming/_ingest_common.py, r11 verdict stretch item 9).

The three quantized-ingest tiers (PQ/OPQ, binary, SQ8) must all route
through ``encode_upsert_sink`` — one fold, three call sites — so the
replay/idempotence semantics cannot drift tier-by-tier.  The pins are
source-derived (the helper-extraction pattern proven for the r10 IVF
coarse quantizer): a fourth copy of the fold reintroduced into any
tier module turns these red.

Bit-level equivalence of the refactor itself is pinned by the
pre-existing streaming ≡ batch tests in tests/test_pq.py and
tests/test_vecx.py (they drive the real sinks through restarts and
replays and compare against one-shot batch encodes).
"""

from __future__ import annotations

import inspect

import pytest

from rick_and_morty_data_pipeline_project_spark.streaming import (
    _ingest_common,
    bin_ingest,
    pq_ingest,
    sq_ingest,
)


@pytest.mark.parametrize("mod", [pq_ingest, bin_ingest, sq_ingest])
def test_tier_routes_through_shared_skeleton(mod):
    src = inspect.getsource(mod)
    assert "encode_upsert_sink" in src, mod.__name__
    # no private copy of the fold: the anti-join upsert and the
    # durable sink call live ONLY in the shared skeleton now
    assert "left_anti" not in src, mod.__name__
    assert "durable_table_sink" not in src, mod.__name__


def test_skeleton_is_the_only_fold_owner():
    src = inspect.getsource(_ingest_common)
    assert "left_anti" in src
    assert "durable_table_sink" in src


def test_reduce_same_id_max_deterministic(spark):
    from rick_and_morty_data_pipeline_project_spark.streaming._ingest_common import (
        reduce_same_id_max,
    )

    rows = [(1, [3, 9]), (1, [3, 7]), (2, [1, 1]), (1, [2, 99])]
    df = spark.createDataFrame(rows, "vec_id long, codes array<int>")
    out = {
        r["vec_id"]: r["codes"]
        for r in reduce_same_id_max(df, "vec_id").collect()
    }
    # lexicographic max over the code struct, independent of row order
    assert out == {1: [3, 9], 2: [1, 1]}
    out_rev = {
        r["vec_id"]: r["codes"]
        for r in reduce_same_id_max(
            spark.createDataFrame(rows[::-1], "vec_id long, codes array<int>"),
            "vec_id",
        ).collect()
    }
    assert out_rev == out


def test_reduce_same_id_max_multi_column(spark):
    from rick_and_morty_data_pipeline_project_spark.streaming._ingest_common import (
        reduce_same_id_max,
    )

    rows = [(1, 5, -2), (1, 5, 3), (1, 4, 99)]
    df = spark.createDataFrame(rows, "vec_id long, w0 long, w1 long")
    out = reduce_same_id_max(df, "vec_id").collect()
    assert len(out) == 1
    # field-order comparison: w0 dominates, then w1
    assert (out[0]["w0"], out[0]["w1"]) == (5, 3)
