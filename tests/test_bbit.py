"""b-bit MinHash audit (queries/bbitq.py) — estimator identities and
the Li–König storage/accuracy trade measured on real candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.queries.bbitq import (
    _B_COLLISION,
    dedup_bbit_minhash_audit,
)
from tests.conftest import SF_ORACLE


def test_bbit_estimator_identities():
    # identical signatures: A = 1 → corrected estimate exactly 1;
    # fully-colliding-by-chance floor: A = C → estimate exactly 0
    c = _B_COLLISION
    est = lambda a: (a - c) / (1.0 - c)  # noqa: E731
    assert est(1.0) == 1.0
    assert est(c) == 0.0
    # 4 of 8 nibbles agreeing on unrelated docs (A=0.5) must NOT read
    # as J=0.5 — the correction pulls it down
    assert est(0.5) < 0.5


def test_bbit_tracks_full_sketch_on_real_candidates(spark):
    rows = dedup_bbit_minhash_audit(spark, SF_ORACLE).collect()
    assert rows, "LSH produced no candidate pairs"
    err_full = [r["err_full"] for r in rows]
    err_b4 = [r["err_b4"] for r in rows]
    # the b=4 sketch is 8× smaller; on the near-dup candidate range its
    # mean error must stay within 1 point of the full 32-bit sketch
    # (measured 0.0298 vs 0.0308 at sf0.01 — b-bit is not the
    # bottleneck, the 8-component variance is)
    mean_f = sum(err_full) / len(err_full)
    mean_b = sum(err_b4) / len(err_b4)
    assert mean_b <= mean_f + 0.01
    # corrected estimates live in [-C/(1-C), 1]
    lo = -_B_COLLISION / (1.0 - _B_COLLISION)
    assert all(lo - 1e-9 <= r["est_b4"] <= 1.0 + 1e-9 for r in rows)
    # a pair whose FULL components all agree must also read 1.0 at b=4
    for r in rows:
        if r["est_full"] == 1.0:
            assert r["est_b4"] == 1.0
