"""Unit tests for the statistics query family (queries/statsq.py) —
the semantic edges the 3-SF oracle parity gate cannot see because both
engines would have agreed on the wrong answer.
"""

from __future__ import annotations

import datetime
import hashlib
import math

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.queries import statsq


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_concurrency_midnight_boundary_stays_in_own_day(spark, tmp_path):
    """A session whose clamped end-boundary lands exactly on next
    midnight must decrement ITS OWN day's sweep line — the instant's
    calendar day would be day+1, and keying by it deflated the next
    day's concurrency (the review-caught bug: user 1's 23:59:59
    session leaked a −1 into day 2, reporting peak 1 instead of 2)."""
    d1 = datetime.datetime(2024, 1, 1, 23, 59, 59)
    d2a = datetime.datetime(2024, 1, 2, 10, 10, 0)
    d2b = datetime.datetime(2024, 1, 2, 10, 20, 0)
    d2c = datetime.datetime(2024, 1, 2, 10, 15, 0)
    d2d = datetime.datetime(2024, 1, 2, 10, 30, 0)
    sf_dir = _write_events(
        spark,
        tmp_path,
        [
            (0, d1, 1, "click", 1.0, "{}"),
            (1, d2a, 2, "click", 1.0, "{}"),
            (2, d2b, 2, "click", 1.0, "{}"),
            (3, d2c, 3, "click", 1.0, "{}"),
            (4, d2d, 3, "click", 1.0, "{}"),
        ],
    )
    out = {
        r["day"]: r["max_concurrency"]
        for r in statsq.events_max_concurrency(spark, sf_dir).collect()
    }
    assert out["2024-01-01"] == 1, out
    assert out["2024-01-02"] == 2, out


def test_bootstrap_draws_match_reference_md5_path(spark):
    """The replicate weights are content-addressed: weight(key, b)
    must equal the reference Python computation — md5 of
    'boot:<key>:<4*(b div 4)>', the (b%4)-th 8-hex window, compared
    NUMERICALLY against the pinned Poisson(1) thresholds.  The engine
    compares the hex window lexicographically; this reference parses
    it to an int — equality of the two proves the fixed-width-hex
    string compare is the numeric compare."""

    def ref_weight(key: int, b: int) -> int:
        base = b - (b % 4)
        h = hashlib.md5(f"boot:{key}:{base}".encode()).hexdigest()
        u = int(h[(b % 4) * 8 : (b % 4) * 8 + 8], 16)
        for k, t_ in enumerate(statsq._POISSON_T):
            if u < t_:
                return k
        return 9

    rows = [(key, b) for key in (1, 7, 12345) for b in range(8)]
    df = spark.createDataFrame(rows, "o_orderkey long, b int")
    h = F.md5(
        F.concat(
            F.lit("boot:"),
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            (F.col("b") - F.col("b") % 4).cast("string"),
        )
    )
    h8 = F.substring(h, F.lit(1) + (F.col("b") % 4) * 8, F.lit(8))
    w = F.lit(9)
    for k in range(len(statsq._POISSON_T_HEX) - 1, -1, -1):
        w = F.when(h8 < statsq._POISSON_T_HEX[k], F.lit(k)).otherwise(w)
    got = {
        (r["o_orderkey"], r["b"]): r["w"]
        for r in df.select("o_orderkey", "b", w.alias("w")).collect()
    }
    for key, b in rows:
        assert got[(key, b)] == ref_weight(key, b), (key, b)


def test_poisson_thresholds_pin_the_cdf():
    """The pinned integer thresholds are floor(CDF_Poisson(1)(k)·2³²)
    — regenerate from first principles and compare."""
    cum, term = 0.0, math.exp(-1.0)
    for k, pinned in enumerate(statsq._POISSON_T):
        cum += term
        assert pinned == math.floor(cum * 2**32), k
        term = term / (k + 1)
