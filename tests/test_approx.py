"""Accuracy bounds for the sketch-based approximate aggregates.

These can't hash-match a different engine (HLL/KLL sketch internals are
engine-specific), so `agg_approx_distinct` is a rows-only catalog entry;
this test bounds its error against the exact answers instead.
"""

from __future__ import annotations

import duckdb

from rick_and_morty_data_pipeline_project_spark.queries.tpchx import (
    agg_approx_distinct,
)
from tests.conftest import SF_ORACLE


def test_approx_distinct_and_median_within_tolerance(spark):
    got = {
        r["l_returnflag"]: r
        for r in agg_approx_distinct(spark, SF_ORACLE).collect()
    }
    exact = duckdb.sql(
        f"""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS nd,
               quantile_cont(l_extendedprice, 0.5) AS med
        FROM '{SF_ORACLE}/lineitem.parquet'
        GROUP BY l_returnflag
        """
    ).fetchall()
    assert len(exact) == len(got) > 0
    for flag, nd, med in exact:
        row = got[flag]
        # rsd=0.02 → generous 3-sigma-ish bound
        assert abs(row["approx_parts"] - nd) / nd < 0.06, (flag, row)
        # percentile_approx with accuracy 10000 on ~20k rows/group is
        # near-exact; allow 1% drift around the true median
        assert abs(row["approx_median_price"] - med) / med < 0.01, (flag, row)


def test_hourly_percentiles_approx_close_to_exact(spark):
    """percentile_approx returns a real data value with bounded RANK
    error (≈ n/accuracy, here ≈ 0 since groups ≪ accuracy=10000) — so
    the right bound is a quantile BRACKET, not a fixed relative error
    (hourly sf0.01 groups are tiny, so the p95 tail spacing is wide):
    approx p50 must land inside the exact [p45, p55] value band, approx
    p95 inside [p90, max]."""
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.queries._util import (
        dec,
        t,
    )
    from rick_and_morty_data_pipeline_project_spark.queries.extraq import (
        events_hourly_percentiles,
        events_hourly_percentiles_approx,
    )

    exact = {
        (r["hour"], r["event_type"]): r
        for r in events_hourly_percentiles(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["hour"], r["event_type"]): r
        for r in events_hourly_percentiles_approx(spark, SF_ORACLE).collect()
    }
    assert exact.keys() == approx.keys() and exact

    groups: dict = {}
    for r in (
        t(spark, SF_ORACLE, "events")
        .select(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00"
            ).alias("hour"),
            "event_type",
            dec("value", 18, 2).cast("double").alias("v"),
        )
        .collect()
    ):
        groups.setdefault((r["hour"], r["event_type"]), []).append(r["v"])

    eps = 1e-6  # outputs are rounded to 6 decimals
    rank_err = 0.01  # sketch rank error ≤ 1/accuracy = 1e-4; margin
    for key, a in approx.items():
        assert a["n_events"] == exact[key]["n_events"]
        vals = groups[key]
        n = len(vals)
        for col, p in (("p50_value", 0.5), ("p95_value", 0.95)):
            got = a[col]
            # the sketch returns an actual member of the group...
            assert any(abs(got - v) <= eps for v in vals), (key, col, got)
            # ...whose rank brackets the target percentage
            frac_lt = sum(v < got - eps for v in vals) / n
            frac_le = sum(v <= got + eps for v in vals) / n
            assert frac_lt <= p + rank_err, (key, col, got, frac_lt)
            assert frac_le >= p - rank_err, (key, col, got, frac_le)


def test_quantile_filter_approx_kept_set_close(spark):
    """The approx-median kept SET stays close to the exact twin's
    (computed through the shared _quantile_filter path — the promoted
    catalog query now reports per-language audit rows instead of the
    raw kept rows), and the promoted query's GK rank-guarantee booleans
    hold with kept_exact matching the exact twin's per-language kept
    counts."""
    from collections import Counter

    from rick_and_morty_data_pipeline_project_spark.queries._util import (
        approx_pctl,
    )
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        _quantile_filter,
        text_quantile_filter,
        text_quantile_filter_approx,
    )

    exact_rows = text_quantile_filter(spark, SF_ORACLE).collect()
    exact = {r["doc_id"] for r in exact_rows}
    approx = {
        r["doc_id"]
        for r in _quantile_filter(spark, SF_ORACLE, approx_pctl).collect()
    }
    assert exact
    drift = len(exact ^ approx) / len(exact)
    assert drift < 0.05, drift

    kept_by_lang = Counter(r["lang"] for r in exact_rows)
    for r in text_quantile_filter_approx(spark, SF_ORACLE).collect():
        assert r["rank_lo_ok"] and r["rank_hi_ok"], r
        assert r["kept_exact"] == kept_by_lang[r["lang"]], r


def test_rfm_segments_approx_buckets_close(spark):
    """Approx quartile thresholds may move bucket EDGES slightly; the
    fraction of customers whose (r,f,m) bucket assignment changes must
    stay small, and no bucket may shift by more than one step."""
    from rick_and_morty_data_pipeline_project_spark.queries.extraq import (
        customer_rfm_segments,
        customer_rfm_segments_approx,
    )

    exact = {
        r["o_custkey"]: (r["r_bucket"], r["f_bucket"], r["m_bucket"])
        for r in customer_rfm_segments(spark, SF_ORACLE).collect()
    }
    approx = {
        r["o_custkey"]: (r["r_bucket"], r["f_bucket"], r["m_bucket"])
        for r in customer_rfm_segments_approx(spark, SF_ORACLE).collect()
    }
    assert exact.keys() == approx.keys() and exact
    changed = 0
    for k, eb in exact.items():
        ab = approx[k]
        assert all(abs(a - e) <= 1 for a, e in zip(ab, eb)), (k, ab, eb)
        changed += ab != eb
    assert changed / len(exact) < 0.10, changed / len(exact)
