"""Product quantization: deterministic training, faithful ADC scoring
(Spark ≡ numpy reference), useful recall against exact search, and the
advertised compression."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from rick_and_morty_data_pipeline_project_spark.operators.pq import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table
from tests.conftest import SF_SMALL

_M, _K = 8, 16


def _corpus(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_pq_training_is_deterministic(spark):
    emb = _corpus(spark)
    b1 = train_pq_codebooks(emb, m=_M, k=_K)
    b2 = train_pq_codebooks(emb, m=_M, k=_K)
    assert b1 == b2
    assert len(b1) == _M and all(len(b) == _K for b in b1)
    assert all(len(c) == 64 // _M for b in b1 for c in b)


def test_pq_adc_matches_numpy_reference_and_recalls(spark):
    emb = _corpus(spark)
    books = train_pq_codebooks(emb, m=_M, k=_K)
    codes = pq_encode(emb, books).cache()
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(V)

    queries = [(int(i), V[i].tolist()) for i in ids[:5]]
    got = pq_topk(queries, codes, books, top_k=10).collect()
    assert len(got) == 50

    # numpy ADC reference for query 0: identical ranking, ~equal dists
    B = [np.array(b) for b in books]
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    q = np.array(queries[0][1])
    w = 64 // _M
    lut = np.stack(
        [((B[j] - q[j * w : (j + 1) * w][None, :]) ** 2).sum(axis=1) for j in range(_M)]
    )
    ref = {
        vid: float(sum(lut[j][c] for j, c in enumerate(code_map[vid])))
        for vid in ids
    }
    ref_top = sorted(ids, key=lambda v: (ref[v], v))[:10]
    got_q0 = [r for r in got if r["query_id"] == queries[0][0]]
    assert [r["vec_id"] for r in got_q0] == ref_top
    for r in got_q0:
        assert abs(r["adc_dist"] - ref[r["vec_id"]]) < 1e-9

    # recall@10 vs exact L2 over the full corpus, averaged over
    # queries.  This synthetic corpus is near-uniform in 64-dim and
    # distances CONCENTRATE (measured: the 10th neighbor is only
    # 1.099× the 1st; the median 1.487×), so no 32×-compressed code
    # can rank inside that band — measured recall here is 0.36-0.46
    # across configs, vs 10/500 = 0.02 for random selection.  Pin
    # "massively beats chance" with margin, not a clustered-corpus
    # recall this data cannot exhibit.
    hits = 0
    for qid, qv in queries:
        qa = np.array(qv)
        exact = sorted(ids, key=lambda v: (((V[v] - qa) ** 2).sum(), v))[:10]
        approx = {
            r["vec_id"] for r in got if r["query_id"] == qid
        }
        hits += len(approx & set(exact))
    recall = hits / 50
    assert recall >= 0.25, recall  # ≥ 12× better than chance
    # a query vector's own id must be retrieved (self-quantization
    # error is the smallest possible for its own code)
    for qid, _ in queries:
        assert qid in {r["vec_id"] for r in got if r["query_id"] == qid}


def test_pq_compression_and_plan(spark):
    import re

    emb = _corpus(spark)
    books = train_pq_codebooks(emb, m=_M, k=_K)
    codes = pq_encode(emb, books)
    assert codes.count() == emb.count()
    # m small ints per row vs 64 floats — the 10^9-vector memory story
    assert all(
        len(r["codes"]) == _M and all(0 <= c < _K for c in r["codes"])
        for r in codes.collect()
    )
    # the ADC scan is pure codegen over the codes column: no Python
    # UDF, no join, no window in the scoring plan
    one = pq_topk([(0, [0.0] * 64)], codes, books, top_k=5)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # plain substring checks: Spark node names embed these words
    # without word boundaries (BroadcastHashJoin, WindowExec), so a
    # \b-anchored regex would never fire
    for bad in ("EvalPython", "Window", "Join"):
        assert bad not in plan, (bad, plan)
