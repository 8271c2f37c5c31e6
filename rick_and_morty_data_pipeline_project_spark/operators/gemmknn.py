"""Exact all-pairs kNN graph via Arrow-batched blocked GEMM.

The kNN GRAPH (top-k neighbors for EVERY corpus vector, not a handful
of query vectors) is the prerequisite of semantic dedup (SemDeDup,
Abbas et al. 2023), embedding-space clustering, and graph-based ANN
index builds.  Brute force is O(n²·dim) no matter the engine — what
decides throughput is whether the inner loop is a vectorized matrix
multiply or a per-pair fold.  This operator runs the scoring as one
``numpy`` GEMM per Arrow batch inside ``mapInPandas``: the corpus
streams through in batches of rows (the distributed axis), each batch
multiplying against a broadcast unit-normalized corpus matrix
(``X_batch @ X_allᵀ`` — BLAS, ~two orders of magnitude faster per pair
than a per-row JVM fold), followed by a per-row partial top-k in the
same batch.  No shuffle at all: the top-k per query is complete within
the batch that owns the query row, because every batch sees the whole
broadcast corpus.

Scale contract: the BROADCAST side is capped (``max_broadcast_rows``,
default 100k × 64 float64 ≈ 50 MB — comfortably under executor
broadcast budgets); above the cap the operator refuses loudly rather
than silently degrade, and the documented composition is the IVF
route: assign vectors to trained cells (operators/similarity.knn_ivf /
pq.py IVFADC) and run this GEMM graph per cell or cell-neighborhood,
which is exactly how FAISS builds graphs beyond RAM.  The distributed
axis (the streamed corpus) is unbounded.

Determinism / oracle story: scores are rounded to ``round_digits``
BEFORE ranking, and ranking tie-breaks on neighbor id, so the DuckDB
oracle (per-pair left-fold dots, same rounding, same tie-break)
reproduces the output exactly provided no unrounded score sits within
GEMM-vs-fold float noise (~1e-14) of a rounding boundary — an
empirical margin the test suite checks at every shipped SF
(tests/test_vecx.py::test_gemm_graph_rounding_margin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.parallelism import fan_out

GRAPH_SCHEMA = "query_id long, neighbor_id long, cosine double, rank int"

#: broadcast-side ceiling — 100k × 64 float64 ≈ 50 MB, the classic
#: "small enough to broadcast" budget.  Beyond this, compose with IVF
#: cells (module docstring) instead of raising the cap.
MAX_BROADCAST_ROWS = 100_000


def knn_graph_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    max_broadcast_rows: int = MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Top-k cosine neighbors for EVERY vector (self excluded), exact.

    Output: (query_id, neighbor_id, cosine, rank) with cosine rounded
    to ``round_digits`` and rank ordered by (cosine desc, neighbor_id
    asc) — |corpus|·k rows.
    """
    # One bounded scan builds the broadcast side; n comes from the
    # collected rows (no separate count() action — the limit guard
    # keeps the collect itself capped at max_broadcast_rows + 1).
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(max_broadcast_rows + 1)
        .collect()
    )
    n = len(rows)
    if n > max_broadcast_rows:
        raise ValueError(
            f"knn_graph_gemm: corpus exceeds broadcast cap "
            f"{max_broadcast_rows} rows; compose with IVF cells "
            f"(operators/similarity.knn_ivf) for the beyond-RAM regime"
        )
    ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_X = sc.broadcast(X)
    scale = 10.0 ** round_digits

    def batches(it):
        all_ids, all_X = b_ids.value, b_X.value
        for pdf in it:
            q_ids = pdf["_qid"].to_numpy(dtype=np.int64)
            Q = np.array(pdf["_qv"].tolist(), dtype=np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            # EXACT half-away-from-zero rounding on the scaled score,
            # bit-matching DuckDB round() over the |scaled| <= 1e6
            # cosine domain (probed r11: DuckDB v1.0 deviates from
            # half-away only above ~1e15 — unreachable for a rounded
            # cosine) (np.round is
            # half-to-even — verified to differ at exact .5 scaled
            # values; the bare floor(|x|+0.5) idiom double-rounds when
            # |x|+0.5 rounds UP across an integer, e.g. |x| =
            # 0.49999999999999994).  The correction term is exact:
            # for r = floor(|x|+0.5), |x| - (r-1) is computed without
            # rounding error (Sterbenz — the operands are within a
            # factor of two), so "did floor overshoot" is decided on
            # the true fraction.  Spark's own F.round (decimal
            # HALF_UP) can still differ at representation boundaries;
            # the margin property test excludes those for the shipped
            # corpora (test_gemm_graph_rounding_margin).
            raw = Q @ all_X.T * scale
            av = np.abs(raw)
            r = np.floor(av + 0.5)
            r = np.where(av - (r - 1.0) < 0.5, r - 1.0, r)
            sims = np.copysign(r, raw) / scale
            out_q, out_n, out_c, out_r = [], [], [], []
            for row_i, qid in enumerate(q_ids):
                s = sims[row_i]
                mask = all_ids != qid
                cand_ids = all_ids[mask]
                cand_s = s[mask]
                if len(cand_ids) > k:
                    # exact tie handling: keep EVERYTHING scoring at or
                    # above the k-th value, then break ties by id —
                    # a plain argpartition[:k] could drop a tied
                    # candidate with a smaller id
                    part = np.argpartition(-cand_s, k - 1)[:k]
                    thresh = cand_s[part].min()
                    sel = np.nonzero(cand_s >= thresh)[0]
                else:
                    sel = np.arange(len(cand_ids))
                order = np.lexsort((cand_ids[sel], -cand_s[sel]))
                top = sel[order][:k]
                out_q.extend([qid] * len(top))
                out_n.extend(cand_ids[top].tolist())
                out_c.extend(cand_s[top].tolist())
                out_r.extend(range(1, len(top) + 1))
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "cosine": pd.Series(out_c, dtype="float64"),
                    "rank": pd.Series(out_r, dtype="int32"),
                }
            )

    src = fan_out(corpus).select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    )
    return src.mapInPandas(batches, schema=GRAPH_SCHEMA)
