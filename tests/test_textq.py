

def test_quality_threshold_frontier_monotone(spark):
    """Raising the quality threshold can only shrink the kept set and
    kept-token mass; totals are threshold-independent; rates are the
    exact integer quotients."""
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        text_quality_threshold_frontier,
    )
    from tests.conftest import SF_ORACLE

    rows = sorted(
        text_quality_threshold_frontier(spark, SF_ORACLE).collect(),
        key=lambda r: r["threshold_pct"],
    )
    assert [r["threshold_pct"] for r in rows] == [50, 60, 70, 80, 90]
    kept = [r["n_kept"] for r in rows]
    toks = [r["tokens_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert len({(r["n_docs"], r["tokens_total"]) for r in rows}) == 1
    for r in rows:
        assert r["keep_rate"] == r["n_kept"] / r["n_docs"]
        assert r["token_retention"] == r["tokens_kept"] / r["tokens_total"]
