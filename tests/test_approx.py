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
