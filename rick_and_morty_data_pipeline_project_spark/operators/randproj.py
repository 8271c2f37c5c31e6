"""Sparse random projection (Johnson–Lindenstrauss) for embeddings.

Achlioptas (JCSS 2003) database-friendly JL: entries of the projection
matrix are drawn from {+1, 0, −1} with probabilities {1/6, 2/3, 1/6}
and the projection is scaled by sqrt(3 / d_out) — the classic
sparse-JL construction (two thirds of the matrix is zero, so the
projection is adds/subtracts, no multiplies, in a columnar engine).

Role in the 100 TB pipeline: a seeded, DATA-INDEPENDENT dimensionality
reduction in front of the quadratic ANN stages — unlike PCA
(operators/pca.py) there is nothing to train, so the matrix is a pure
literal both in the Spark plan and in the DuckDB oracle (no
canonical-model staging, no testdata dependency at import).  Projecting
64 → 16 dims cuts every downstream dot product and shuffle payload 4×
while JL bounds the pairwise-distance distortion; the per-vector
norm-ratio column IS the audit a deployment watches.

Plan shape: one narrow per-row map over the corpus — zero shuffle,
zero aggregation, trivially linear at any scale.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.vectors import (
    dot_col,
    norm2_col,
)


def jl_matrix(d_in: int, d_out: int, seed: int = 7) -> list[list[float]]:
    """Seeded Achlioptas ±1/0 matrix, returned as d_out rows of length
    d_in (one row per OUTPUT dimension, ready to use as dot-product
    literals).  Deterministic: same (d_in, d_out, seed) → same matrix
    in the operator, the oracle builder, and the tests."""
    rng = np.random.RandomState(seed)
    flat = rng.choice(
        [-1.0, 0.0, 1.0], size=(d_out, d_in), p=[1.0 / 6, 2.0 / 3, 1.0 / 6]
    )
    return flat.tolist()


def jl_scale(d_out: int) -> float:
    return math.sqrt(3.0 / d_out)


def jl_project_cols(
    vec_col: Column, matrix: list[list[float]]
) -> list[Column]:
    """One UNROUNDED float64 projection column per output dimension:
    ``sqrt(3/d_out) * Σ x_i · r_ji`` with the engine-wide left-fold dot
    (functions/vectors.py) so the oracle replays it bit-for-bit."""
    from rick_and_morty_data_pipeline_project_spark.functions.litjson import (
        array_lit,
    )

    scale = jl_scale(len(matrix))
    return [
        F.lit(scale)
        * dot_col(vec_col, array_lit([float(x) for x in row]))
        for row in matrix
    ]


def jl_project(
    df: DataFrame,
    matrix: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Project every vector and surface the JL distortion audit.

    Output: (``id_col``, pos ∈ 0..d_out−1, proj_value, norm_ratio)
    where ``norm_ratio = ‖proj‖ / ‖x‖`` — the quantity the JL lemma
    says concentrates near 1.  The projected norm folds the UNROUNDED
    projection values in output-dimension order (same fold as the
    oracle); rounding applies only to the exported columns.
    """
    projs = F.array(*jl_project_cols(F.col(vec_col), matrix))
    staged = df.select(
        F.col(id_col),
        projs.alias("_p"),
        norm2_col(F.col(vec_col)).alias("_onorm"),
    ).select(
        id_col,
        "_p",
        (
            F.sqrt(
                F.aggregate(
                    F.col("_p"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            )
            / F.col("_onorm")
        ).alias("_ratio"),
    )
    return staged.select(
        id_col,
        F.posexplode(F.col("_p")).alias("pos", "_v"),
        F.round(F.col("_ratio"), round_digits).alias("norm_ratio"),
    ).select(
        id_col,
        "pos",
        F.round(F.col("_v"), round_digits).alias("proj_value"),
        "norm_ratio",
    )
