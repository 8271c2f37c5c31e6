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


def test_turing_estimates_hand_checked(spark):
    # corpus: a×3, b×2, c×2, d×1, e×1, f×1  → N=10
    # N_1=3, N_2=2, N_3=1; r*=  r=1: 2·N2/N1=4/3;  r=2: 3·N3/N2=1.5;
    # r=3: 4·N4/N3=0 (gap).  unseen mass = N1/N = 0.3
    docs = {1: "a a b c d", 2: "a b c e f"}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    import rick_and_morty_data_pipeline_project_spark.queries.lmq as lmq

    orig = lmq.t
    try:
        lmq.t = lambda s, sf, name: df  # noqa: ARG005
        rows = {
            r["r"]: r for r in lmq.text_turing_estimates(spark, "x").collect()
        }
    finally:
        lmq.t = orig
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_r"] == 3 and abs(rows[1]["r_star"] - round(4 / 3, 6)) < 1e-9
    assert rows[2]["n_r"] == 2 and rows[2]["r_star"] == 1.5
    assert rows[3]["n_r"] == 1 and rows[3]["r_star"] == 0.0
    assert all(r["unseen_mass"] == 0.3 for r in rows.values())
    # Good-Turing mass identity: Σ_r N_r·r* = Σ_s≥2 s·N_s = N − N_1,
    # so adjusted observed mass + unseen mass = 1 EXACTLY (gap classes
    # contribute 0 to both sides)
    adj = sum(rows[r]["r_star"] * rows[r]["n_r"] for r in rows) / 10.0
    assert abs(adj + rows[1]["unseen_mass"] - 1.0) < 1e-6


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
