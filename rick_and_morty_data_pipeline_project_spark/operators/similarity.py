"""Similarity search (approximate nearest neighbor) over embeddings.

Baseline: brute-force cosine top-k — the query set is broadcast against
the corpus (one corpus scan, no shuffle of the big side), per-query heap
top-k via window row_number partitioned by query id.  At 100 TB the
corpus scan dominates and parallelizes linearly; the shuffle carries only
(n_queries × candidates-per-partition) rows thanks to the rank filter
being pushed through AQE.

Scale path: random-hyperplane LSH — bucket both sides by the sign-bit
string of dots with a fixed set of hyperplanes (deterministic,
seed-generated, frozen at operator construction), join on bucket, rank
inside buckets only.  Probing multiple bucket permutations trades recall
for cost; recall is property-tested in tests/.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.functions.vectors import cosine_col


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Self-matches (same id) are excluded.  Output:
    (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    cos = cosine_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN — the classic ANN scale path.

    Coarse quantizer: the ``n_cells`` lowest-id corpus vectors serve as
    deterministic centroids (production would train k-means; a fixed
    data-derived centroid set keeps the operator exactly reproducible
    by the SQL oracle).  Every corpus vector is assigned to its nearest
    centroid in one broadcast pass (no shuffle of the corpus); each
    query probes its ``n_probe`` nearest cells and ranks only those
    cells' members — candidate count ≈ |corpus|·n_probe/n_cells per
    query instead of |corpus|.
    """
    cents = (
        corpus.orderBy(F.asc(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_cent"))
    )

    def assign(df: DataFrame, out_id: str, out_vec: str, nprobe: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.col("cell_id"),
            cosine_col(F.col(vec_col), F.col("_cent")).alias("_sim"),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("_sim"), F.asc("cell_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= nprobe)
            .drop("_sim", "_r")
        )

    cells = assign(corpus, "neighbor_id", "_cv", 1)
    probes = assign(queries, "query_id", "_qv", n_probe)
    cos = cosine_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    # Each corpus vector lives in exactly one cell, so (query, neighbor)
    # pairs are already unique — no dedup shuffle needed.
    cand = (
        probes.join(cells, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket string for a vector column given frozen planes."""
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to LSH bucket collisions.

    OR-amplification across ``n_tables`` independent hash tables (each
    ``n_planes`` hyperplanes): a candidate qualifies if it collides in
    ANY table, which is the standard recall/cost dial.  Each row emits
    n_tables (table, bucket) keys; the join is on the composite key, so
    pair count is Σ_tables Σ_buckets |bucket|² — still far from n².
    """
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * ti)
        for ti in range(n_tables)
    ]

    def with_buckets(df: DataFrame, out_id: str) -> DataFrame:
        keys = F.array(
            *[
                F.concat_ws(
                    "#", F.lit(str(ti)), lsh_bucket_col(F.col(vec_col), planes)
                )
                for ti, planes in enumerate(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"_{out_id}_v"),
            F.explode(keys).alias("bucket"),
        )

    q = with_buckets(queries, "query_id")
    c = with_buckets(corpus, "neighbor_id")
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_col(F.col("_query_id_v"), F.col("_neighbor_id_v")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-label elementwise mean vector, exploded to (label, pos, value).

    posexplode → groupBy(label, pos) keeps the aggregation JVM-side and
    map-combinable; the alternative (collecting arrays) would not scale.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("v").cast("double")), round_digits).alias(
            "centroid"
        )
    )
