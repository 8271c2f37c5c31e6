"""Scalar quantization (SQ8) kNN — the 8-bit tier of the quantization
ladder (1-bit binquant / 8-byte-code PQ / 64-byte SQ8 / full float).

SQ8 is the tier production ANN systems default to (FAISS
``ScalarQuantizer`` QT_8bit, Milvus/Lucene int8 HNSW storage): each
dimension of the unit-normalized corpus is affinely mapped to one byte
using per-dimension [min, max] train statistics, so a 64-dim float32
vector becomes 64 bytes (4× smaller) while keeping ~full recall —
far gentler than PQ's 8-byte codes or binquant's 8-byte sign words.

Search is asymmetric (ADC): the RAW unit-normalized query is scored
against the DECODED corpus codes — one affine reconstruction per
element, then the engine-wide float64 left-fold dot — followed by an
exact rerank of the shortlist only, the same two-stage shape as the
other quantized tiers (operators/binquant.py, operators/pq.py).

Determinism contract (what makes the DuckDB oracle hash-exact):
per-dimension min/max are arithmetic-free aggregates over identical
doubles; the encode is ``floor((x-min)/(max-min)*255.0 + 0.5)``
clamped to [0,255] — one IEEE-identical expression in both engines
with half-up handled by the exact ``floor`` (F.floor returns BIGINT,
the oracle casts its floor to BIGINT); the decode is
``min + code*(max-min)/255.0``; and both the ADC score and the exact
rerank reuse the normalize-then-left-fold dot every vector oracle
already proves bit-equal (functions/vectors.py).

Scale: train stats are ONE 2×dim row (an AQE-friendly partial+final
aggregate), broadcast into the encode/decode projections — zero
corpus shuffle; the candidate stage is a broadcast(queries) ×
corpus-scan nested loop reading 64 bytes/vector worth of codes; the
only shuffle is the integer shortlist rank, and the rerank joins the
BROADCAST shortlist back to the corpus scan, exactly like the 1-bit
tier.  (In this composition the decode is fused into the corpus
projection — at 10⁹ vectors the stored table IS the code table, and
the scan cost is the 4×-smaller byte read.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.functions.vectors import dot_col
from rick_and_morty_data_pipeline_project_spark.operators.parallelism import fan_out
from rick_and_morty_data_pipeline_project_spark.operators.similarity import (
    _normalized,
)

#: code range ceiling — one unsigned byte per dimension.
SQ_LEVELS = 255


def sq8_code_col(nv: Column, mins: Column, maxs: Column) -> Column:
    """``array<bigint>`` of per-dimension byte codes for unit vector
    ``nv`` under train stats ``mins``/``maxs`` (array columns).

    code_d = clamp(floor((x_d - min_d)/(max_d - min_d)·255 + 0.5),
    0, 255); a degenerate dimension (max == min) codes to 0.  The
    clamp only bites for out-of-train-range queries — corpus values
    lie inside their own stats by construction.
    """
    return F.transform(
        nv,
        lambda x, i: F.when(
            F.element_at(maxs, i + 1) == F.element_at(mins, i + 1),
            F.lit(0).cast("long"),
        ).otherwise(
            F.least(
                F.lit(255).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(
                        (x.cast("double") - F.element_at(mins, i + 1))
                        / (
                            F.element_at(maxs, i + 1)
                            - F.element_at(mins, i + 1)
                        )
                        * 255.0
                        + 0.5
                    ),
                ),
            )
        ),
    )


def sq8_decode_col(codes: Column, mins: Column, maxs: Column) -> Column:
    """Affine reconstruction: xhat_d = min_d + code_d·(max_d −
    min_d)/255.0 — the exact expression the oracle replays."""
    return F.transform(
        codes,
        lambda c, i: F.element_at(mins, i + 1)
        + c.cast("double")
        * (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
        / 255.0,
    )


def sq8_train_stats(nc: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-row (mins, maxs) train-statistics relation over the
    unit-normalized corpus — per-dimension min/max, arithmetic-free
    and hence engine-identical."""
    return nc.agg(
        F.array(
            *[F.min(F.element_at(F.col(vec_col), d + 1)) for d in range(dim)]
        ).alias("_mins"),
        F.array(
            *[F.max(F.element_at(F.col(vec_col), d + 1)) for d in range(dim)]
        ).alias("_maxs"),
    )


def knn_sq8(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    shortlist: int = 50,
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage SQ8 kNN: ADC shortlist (raw query × decoded byte
    codes), exact cosine rerank on the shortlist only.

    Output: (query_id, neighbor_id, adc, cosine, rank) — ``adc`` is
    the stage-1 approximate score rounded to ``round_digits``; rank ≤
    ``k`` by (cosine desc, id asc).
    """
    nc = _normalized(fan_out(corpus), id_col, vec_col, "neighbor_id", "_cv")
    nq = _normalized(queries, id_col, vec_col, "query_id", "_qv")
    stats = sq8_train_stats(nc, "_cv", dim)
    coded = nc.crossJoin(F.broadcast(stats)).select(
        "neighbor_id",
        sq8_code_col(F.col("_cv"), F.col("_mins"), F.col("_maxs")).alias(
            "_code"
        ),
        "_mins",
        "_maxs",
    )
    decoded = coded.select(
        "neighbor_id",
        sq8_decode_col(F.col("_code"), F.col("_mins"), F.col("_maxs")).alias(
            "_dv"
        ),
    )
    adc = dot_col(F.col("_qv"), F.col("_dv"))
    cand = (
        F.broadcast(nq)
        .crossJoin(decoded)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("_adc"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.desc("_adc"), F.asc("neighbor_id")
    )
    short = (
        cand.withColumn("_r", F.row_number().over(w_short))
        .filter(F.col("_r") <= shortlist)
        .drop("_r")
    )
    rer = (
        F.broadcast(short)
        .join(nc, "neighbor_id")
        .join(F.broadcast(nq), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_adc"), round_digits).alias("adc"),
            F.round(dot_col(F.col("_qv"), F.col("_cv")), round_digits).alias(
                "cosine"
            ),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return rer.withColumn("rank", F.row_number().over(w_final)).filter(
        F.col("rank") <= k
    )
