"""Kneser–Ney bigram LM (queries/lmq.py) — semantics pinned against an
independent pure-Python reference on a hand-checkable corpus (oracle
parity alone cannot catch a formula bug both engines share)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.queries.lmq import (
    _D,
    text_kneser_ney_score,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import t
from tests.conftest import SF_ORACLE


def _kn_reference(docs: dict[int, str]) -> dict[int, tuple[int, float]]:
    """Independent dict-based interpolated-KN implementation."""
    bigrams: dict[tuple[str, str], int] = {}
    streams: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        bs = list(zip(toks, toks[1:]))
        streams[doc_id] = bs
        for b in bs:
            bigrams[b] = bigrams.get(b, 0) + 1
    c_hist: dict[str, int] = {}
    n_follow: dict[str, int] = {}
    n_precede: dict[str, int] = {}
    for (w1, w2), c in bigrams.items():
        c_hist[w1] = c_hist.get(w1, 0) + c
        n_follow[w1] = n_follow.get(w1, 0) + 1
        n_precede[w2] = n_precede.get(w2, 0) + 1
    n_types = float(len(bigrams))
    out = {}
    for doc_id, bs in streams.items():
        if not bs:
            continue
        lps = []
        for w1, w2 in bs:
            p = (bigrams[(w1, w2)] - _D) / c_hist[w1] + (
                _D * n_follow[w1] / c_hist[w1]
            ) * (n_precede[w2] / n_types)
            lps.append(math.log(p))
        out[doc_id] = (len(bs), sum(lps) / len(lps))
    return out


def test_kneser_ney_hand_checked_corpus(spark):
    docs = {
        1: "a b a c",
        2: "b a b",
        3: "c a",
        4: "x",  # single token: no bigrams, must drop out
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )

    # run the catalog query's operator body against the synthetic corpus
    import rick_and_morty_data_pipeline_project_spark.queries.lmq as lmq
    import rick_and_morty_data_pipeline_project_spark.queries._util as util

    orig = util.t
    try:
        util.t = lambda s, sf, name: df  # noqa: ARG005
        lmq.t = util.t
        got = {
            r["doc_id"]: (
                r["n_bigrams"],
                r["avg_kn_logprob"],
                r["perplexity"],
            )
            for r in text_kneser_ney_score(spark, "unused").collect()
        }
    finally:
        util.t = orig
        lmq.t = orig

    ref = _kn_reference(docs)
    assert set(got) == set(ref) == {1, 2, 3}
    for doc_id, (n, lp) in ref.items():
        gn, glp, gppl = got[doc_id]
        assert gn == n
        assert abs(glp - round(lp, 6)) < 1e-9
        assert abs(gppl - round(math.exp(-lp), 6)) < 1e-6


def test_kneser_ney_probabilities_sum_to_one(spark):
    # interpolated KN is a proper distribution: for each history w1,
    # Σ_w2∈V P(w2|w1) ≈ (c-D sum) + λ(w1)·Σ P_cont = 1 when summed over
    # the FULL continuation vocabulary.  Verify on the real corpus for
    # a sample of histories, computing the model exactly as the query.
    e = t(spark, SF_ORACLE, "documents")
    toked = e.select(
        F.split(F.col("text"), " ").alias("t")
    )
    big = toked.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t")),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    rows = big.groupBy("w1", "w2").count().collect()
    bigrams = {(r["w1"], r["w2"]): r["count"] for r in rows}
    c_hist: dict[str, int] = {}
    n_follow: dict[str, int] = {}
    n_precede: dict[str, int] = {}
    for (w1, w2), c in bigrams.items():
        c_hist[w1] = c_hist.get(w1, 0) + c
        n_follow[w1] = n_follow.get(w1, 0) + 1
        n_precede[w2] = n_precede.get(w2, 0) + 1
    n_types = float(len(bigrams))
    vocab_cont = list(n_precede)
    p_cont_total = sum(n_precede[w] / n_types for w in vocab_cont)
    assert abs(p_cont_total - 1.0) < 1e-9  # continuation dist is proper
    for w1 in list(c_hist)[:20]:
        seen = sum(
            (bigrams[(w1, w2)] - _D) / c_hist[w1]
            for (a, w2) in bigrams
            if a == w1
        )
        lam = _D * n_follow[w1] / c_hist[w1]
        total = seen + lam * p_cont_total
        assert abs(total - 1.0) < 1e-9, (w1, total)
