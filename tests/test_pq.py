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


def test_ivf_pq_residual_index_and_probed_search(spark):
    """IVFADC: residual-PQ index routes by coarse cell; search scores
    ONLY probed cells yet still recalls far above chance, and probing
    every cell recovers plain-PQ-or-better quality."""
    from rick_and_morty_data_pipeline_project_spark.operators.pq import (
        ivf_pq_index,
        ivf_pq_topk,
        train_ivf_pq,
    )

    emb = _corpus(spark)
    coarse, books = train_ivf_pq(emb, n_cells=8, m=_M, k=_K)
    idx = ivf_pq_index(emb, coarse, books).cache()
    assert idx.count() == emb.count()
    cells = {r["cell_id"] for r in idx.select("cell_id").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1

    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(V)
    queries = [(int(i), V[i].tolist()) for i in ids[:5]]

    got = ivf_pq_topk(queries, idx, coarse, books, n_probe=3, top_k=10)
    rows_got = got.collect()
    assert len(rows_got) == 50
    hits = 0
    for qid, qv in queries:
        qa = np.array(qv)
        exact = sorted(ids, key=lambda v: (((V[v] - qa) ** 2).sum(), v))[:10]
        approx = {r["vec_id"] for r in rows_got if r["query_id"] == qid}
        hits += len(approx & set(exact))
        # the query's own vector lives in its nearest cell, which is
        # always probed — self-retrieval must hold
        assert qid in approx
    assert hits / 50 >= 0.2, hits / 50  # ≥ 10x chance on 3/8 of the corpus

    # search really is restricted to the probed cells
    one = ivf_pq_topk(queries[:1], idx, coarse, books, n_probe=1, top_k=500)
    qa = np.array(queries[0][1])
    own_cell = int(
        np.argmin(((np.array(coarse) - qa[None, :]) ** 2).sum(axis=1))
    )
    n_cell = idx.filter(F.col("cell_id") == own_cell).count()
    assert one.count() == min(500, n_cell)


def test_ivf_pq_full_probe_matches_residual_quality(spark):
    """n_probe = n_cells degenerates to exhaustive residual-PQ.  On
    CLUSTERED corpora residual quantization beats plain PQ; this
    near-uniform corpus has no cluster structure for the coarse stage
    to remove (residual energy ≈ vector energy), so the honest pin is
    comparable quality (within 0.1 recall of plain PQ — measured
    0.32 vs 0.36) while the probed variant buys its scan reduction."""
    from rick_and_morty_data_pipeline_project_spark.operators.pq import (
        ivf_pq_index,
        ivf_pq_topk,
        train_ivf_pq,
    )

    emb = _corpus(spark)
    coarse, books = train_ivf_pq(emb, n_cells=8, m=_M, k=_K)
    idx = ivf_pq_index(emb, coarse, books)
    plain_books = train_pq_codebooks(emb, m=_M, k=_K)
    codes = pq_encode(emb, plain_books)
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(V)
    queries = [(int(i), V[i].tolist()) for i in ids[:5]]

    def recall(res):
        hits = 0
        for qid, qv in queries:
            qa = np.array(qv)
            exact = sorted(
                ids, key=lambda v: (((V[v] - qa) ** 2).sum(), v)
            )[:10]
            hits += len(
                {r["vec_id"] for r in res if r["query_id"] == qid}
                & set(exact)
            )
        return hits / 50

    r_ivf = recall(
        ivf_pq_topk(queries, idx, coarse, books, n_probe=8, top_k=10).collect()
    )
    r_pq = recall(pq_topk(queries, codes, plain_books, top_k=10).collect())
    assert r_ivf >= r_pq - 0.1 and r_ivf >= 0.2, (r_ivf, r_pq)
