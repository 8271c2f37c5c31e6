

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


def test_tfidf_dense_int64_verify_bit_equals_posting_verify(spark):
    """r15: the dense-path unrolled int64-micros dot must reproduce the
    decimal posting-verify aggregate bit-for-bit — every surviving
    (id_a, id_b) AND every rounded cosine — and the overflow guard must
    refuse when the product bound cannot be guaranteed."""
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        _tfidf_dense_candidates,
        _tfidf_dense_exact_verify,
        _tfidf_posting_verify,
        _tfidf_weight_relation,
        _TFIDF_DENSE_VOCAB_CAP,
    )
    from tests.conftest import SF_ORACLE

    w, norms = _tfidf_weight_relation(spark, SF_ORACLE)
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("norm").alias("_na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("norm").alias("_nb"))
    terms = [
        r["term"]
        for r in w.select("term").distinct().orderBy("term")
        .limit(_TFIDF_DENSE_VOCAB_CAP + 1).collect()
    ]
    maxw = w.agg(F.max("w")).first()[0]
    new = _tfidf_dense_exact_verify(w, na, nb, terms, maxw)
    assert new is not None
    old = _tfidf_posting_verify(
        w, na, nb, _tfidf_dense_candidates(w, na, nb, terms)
    )
    new_rows = sorted(map(tuple, new.collect()))
    old_rows = sorted(map(tuple, old.collect()))
    assert len(new_rows) > 0
    assert new_rows == old_rows  # ids AND rounded cosine, bit-for-bit

    # guard: a max|w| that could overflow int64 products must refuse
    import decimal

    huge = decimal.Decimal("4000000000000.000000")  # 4e18 micros
    assert _tfidf_dense_exact_verify(w, na, nb, terms, huge) is None
    assert _tfidf_dense_exact_verify(w, na, nb, terms, None) is None
