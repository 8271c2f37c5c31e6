"""Distributed PCA over an embedding column.

The classic dimensionality-reduction step of an embedding pipeline
(whitening before clustering, 2-D map projections, cheap pre-filters in
front of exact cosine).  Layout chosen for 100 TB, not for the local
corpus:

* **Fit = one narrow pass + a fixed-size aggregation.**  Each row emits
  its d mean terms and d(d+1)/2 upper-triangular outer-product terms via
  nested ``transform``/``slice`` (pure JVM, no Python, no join), then a
  single ``groupBy(pos).sum`` reduces them.  The explode is pipelined
  inside the task and partial aggregation means each task ships at most
  ``d + d(d+1)/2 + 1`` rows across the shuffle — for d=64 that is 2 145
  rows per task whatever the corpus size.  (The alternative — 2 000+
  aggregate expressions in one ``agg`` — blows up codegen; a vector
  outer-product via pandas UDF would move every row through Python.)
* **Eigendecomposition on the driver.**  The Gram/covariance matrix is
  d×d — kilobytes — so ``numpy.linalg.eigh`` on the driver is the right
  tool, exactly like the IVF centroid collect in
  operators/similarity.py.  Components are sign-fixed (largest-|w|
  element made positive) so the basis is deterministic.
* **Project = broadcast literals, narrow map.**  Each principal score is
  ``dot(v, w_j) − μ·w_j`` with ``w_j`` and the scalar ``μ·w_j`` inlined
  as literals; one more scan of the corpus, zero shuffle.

No counterpart in the reference (Scraper.py has no vector surface);
this extends SURVEY.md §2.10's embedding operators.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.vectors import dot_col


@dataclass
class PcaModel:
    mean: np.ndarray  # float64[d]
    components: np.ndarray  # float64[k, d] — rows are unit eigenvectors
    explained_variance: np.ndarray  # float64[k] — descending eigenvalues


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int) -> PcaModel:
    """Fit PCA from the elementwise sums Σv and upper-tri Σ v vᵀ.

    cov[i,j] = Σ(v_i v_j)/n − μ_i μ_j (population covariance — the
    normalization constant does not change the eigenbasis).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # flat layout: position 0 sums the constant 1 (the row count — the
    # "+1" that keeps the fit a SINGLE pass, no separate df.count()
    # action), then d mean terms v_i, then for i = 0..d−1 the products
    # v_i·v_j for j ≥ i (slice is 1-based; i arrives 0-based).
    terms = F.concat(
        F.array(F.lit(1.0)),
        v,
        F.flatten(
            F.transform(
                v,
                lambda x, i: F.transform(
                    F.slice(v, i + 1, F.lit(dim)), lambda y: x * y
                ),
            )
        ),
    )
    # Input guard, still single-pass: a NULL vector, wrong-length
    # vector, or NULL element would silently misalign the flat
    # positions across rows (posexplode packs positions per-row) and
    # corrupt the covariance sums.  Invalid rows emit the one-element
    # sentinel [NaN]; NaN poisons the position-0 row-count sum, which
    # the driver turns into a ValueError instead of wrong components.
    valid = (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == dim)
        & ~F.exists(v, lambda x: x.isNull())
    )
    terms = F.when(valid, terms).otherwise(F.array(F.lit(float("nan"))))
    sums_rows = (
        df.select(F.posexplode(terms).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    flat = np.zeros(1 + dim + dim * (dim + 1) // 2)
    for r in sums_rows:
        flat[r["pos"]] = r["s"]
    n = flat[0]
    if np.isnan(n):
        raise ValueError(
            "pca_fit: invalid embeddings (NULL vector, NULL element, "
            f"or length != dim={dim}) in input"
        )
    if n == 0:
        raise ValueError("pca_fit: empty input")
    flat = flat[1:]
    mean = flat[:dim] / n
    cov = np.zeros((dim, dim))
    off = dim
    for i in range(dim):
        m = dim - i
        cov[i, i:] = flat[off : off + m]
        cov[i:, i] = flat[off : off + m]
        off += m
    cov = cov / n - np.outer(mean, mean)
    return _model_from_cov(mean, cov, k)


def _model_from_cov(mean: np.ndarray, cov: np.ndarray, k: int) -> PcaModel:
    """Shared eigendecomposition + deterministic sign fix."""
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T.copy()
    # deterministic sign: the largest-magnitude coordinate is positive
    for j in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[j]))
        if comps[j][pivot] < 0:
            comps[j] = -comps[j]
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(eigvals[order], 0.0),
    )


def pca_fit_canonical(vectors: np.ndarray, k: int) -> PcaModel:
    """Deterministic single-machine reference fit over a fixed-order
    (caller-sorted) float64 matrix — same math as :func:`pca_fit`
    (population covariance, eigh, sign fix) with one fixed summation
    order, so repeated calls on identical input are bitwise identical.

    This is the oracle/verification twin of the distributed fit: the
    catalog query projects onto THIS basis (after asserting the
    distributed fit agrees) so the DuckDB oracle can inline the exact
    same component literals.  It materializes the matrix in memory —
    a test-harness device, not the 100 TB path (that is
    :func:`pca_fit` + :func:`pca_project`)."""
    n, dim = vectors.shape
    if n == 0:
        raise ValueError("pca_fit_canonical: empty input")
    mean = vectors.sum(axis=0) / n
    cov = vectors.T @ vectors / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh determinism
    return _model_from_cov(mean, cov, k)


def assert_models_close(
    got: PcaModel, want: PcaModel, atol: float = 1e-6
) -> None:
    """Raise unless two fits describe the same basis: eigenvalues and
    sign-fixed components within ``atol``.  Used by the catalog query
    to turn a distributed-fit regression into a hard (driver-visible)
    failure while projecting on the canonical basis."""
    if not np.allclose(
        got.explained_variance, want.explained_variance, atol=atol
    ):
        raise AssertionError(
            "pca: distributed fit eigenvalues diverge from canonical "
            f"fit: {got.explained_variance} vs {want.explained_variance}"
        )
    if not np.allclose(got.components, want.components, atol=atol):
        raise AssertionError(
            "pca: distributed fit components diverge from canonical fit"
        )
    if not np.allclose(got.mean, want.mean, atol=atol):
        raise AssertionError(
            "pca: distributed fit mean diverges from canonical fit"
        )


def pca_project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str,
    round_digits: int | None = 6,
    whiten: bool = False,
) -> DataFrame:
    """Append pc1..pck score columns: dot(v, w_j) − μ·w_j as a narrow
    JVM map over broadcast literal components.  ``whiten=True`` scales
    each score by 1/√λ_j so the output has identity covariance (the
    preprocessing k-means/GMM-style consumers want); the scale folds
    into the literal component, so the plan is unchanged."""
    out = df
    for j, (w, lam) in enumerate(
        zip(model.components, model.explained_variance), start=1
    ):
        if whiten:
            w = w / np.sqrt(max(lam, 1e-12))
        from rick_and_morty_data_pipeline_project_spark.functions.litjson import (
            array_lit,
        )

        lit_w = array_lit([float(x) for x in w])
        score = dot_col(F.col(vec_col), lit_w) - F.lit(
            float(np.dot(model.mean, w))
        )
        if round_digits is not None:
            score = F.round(score, round_digits)
        out = out.withColumn(f"pc{j}", score)
    return out
