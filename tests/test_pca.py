"""PCA contracts: the distributed fit must agree with a straight numpy
PCA on the collected vectors, and the projection query must be exactly
the (v − μ)·W scores it claims."""

from __future__ import annotations

import numpy as np

from rick_and_morty_data_pipeline_project_spark.operators.pca import (
    pca_fit,
    pca_project,
)
from rick_and_morty_data_pipeline_project_spark.queries.vecq import (
    embedding_pca_project,
)
from tests.conftest import SF_ORACLE


def _load(spark):
    rows = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def test_fit_matches_numpy_eigh(spark):
    ids, X = _load(spark)
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    model = pca_fit(emb, "embedding", dim=64, k=6)

    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    eigvals, eigvecs = np.linalg.eigh(cov)
    top = np.argsort(eigvals)[::-1][:6]

    assert np.allclose(model.mean, mu, atol=1e-9)
    # eigenvalues descending, non-negative, match numpy
    assert (np.diff(model.explained_variance) <= 1e-12).all()
    assert np.allclose(model.explained_variance, eigvals[top], atol=1e-8)
    # components orthonormal
    g = model.components @ model.components.T
    assert np.allclose(g, np.eye(6), atol=1e-8)
    # same subspace as numpy's eigenvectors (up to sign)
    for j, col in enumerate(top):
        dot = abs(float(model.components[j] @ eigvecs[:, col]))
        assert dot > 1 - 1e-8, (j, dot)
    # deterministic sign convention
    for j in range(6):
        pivot = np.argmax(np.abs(model.components[j]))
        assert model.components[j][pivot] > 0


def test_projection_matches_numpy_scores(spark):
    ids, X = _load(spark)
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    model = pca_fit(emb, "embedding", dim=64, k=3)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"])
        for r in pca_project(emb, model, "embedding", round_digits=None)
        .select("vec_id", "pc1", "pc2", "pc3")
        .collect()
    }
    want = (X - model.mean) @ model.components.T
    for i, vid in enumerate(ids.tolist()):
        assert np.allclose(got[vid], want[i], atol=1e-6), vid
    # scores are centered and their variances equal the eigenvalues
    W = np.array([got[v] for v in ids.tolist()])
    assert np.allclose(W.mean(axis=0), 0, atol=1e-6)
    assert np.allclose(
        W.var(axis=0), model.explained_variance, rtol=1e-6, atol=1e-8
    )


def test_catalog_query_shape_and_determinism(spark):
    a = embedding_pca_project(spark, SF_ORACLE)
    assert [f.name for f in a.schema.fields] == [
        "vec_id", "label", "pc1", "pc2", "pc3", "pc4",
    ]
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, embedding_pca_project(spark, SF_ORACLE).collect()))
    assert ra == rb and len(ra) == 500


def test_whitened_projection_has_identity_covariance(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    model = pca_fit(emb, "embedding", dim=64, k=3)
    rows = (
        pca_project(emb, model, "embedding", round_digits=None, whiten=True)
        .select("pc1", "pc2", "pc3")
        .collect()
    )
    W = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in rows])
    cov = np.cov(W, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(3), atol=1e-6)
