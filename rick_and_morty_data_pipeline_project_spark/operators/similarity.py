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

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.functions.vectors import (
    cosine_col,
    dot_col,
    norm2_col,
)
from rick_and_morty_data_pipeline_project_spark.operators.parallelism import fan_out


def _normalized(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str
) -> DataFrame:
    """(id, unit-vector) projection.  Staged so the norm is computed
    once per vector (not re-inlined per element), making every
    downstream cosine a single dot product — 3× less arithmetic in the
    quadratic stage.  Mirrored exactly by the oracles' ``normed`` CTE
    (same element order, same float ops) so results stay bit-equal."""
    base = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"))
    staged = base.select(out_id, norm2_col(F.col("_v")).alias("_n"), "_v")
    return staged.select(
        out_id,
        F.transform("_v", lambda x: x.cast("double") / F.col("_n")).alias(
            out_vec
        ),
    )


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
    (query_id, neighbor_id, cosine, rank).  Both sides are unit-
    normalized up front (see _normalized); the corpus side fans out so
    the per-pair fold arithmetic isn't serialized on an unsplittable
    single-file scan.
    """
    q = _normalized(queries, id_col, vec_col, "query_id", "_qv")
    c = _normalized(fan_out(corpus), id_col, vec_col, "neighbor_id", "_cv")
    cos = dot_col(F.col("_qv"), F.col("_cv"))
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


def train_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic spherical k-means coarse quantizer for IVF.

    Trains driver-side on a bounded pseudo-random sample: rows are
    ordered by ``xxhash64(id)`` (a deterministic shuffle — replays and
    retries see the identical sample) and the top ``sample_size``
    collected via one heap-top-k job.  At 100 TB the collect stays a
    fixed ~sample_size × dim float64 block (a few MB) no matter the
    corpus size; training cost is O(sample · n_cells · dim · iters) on
    the driver, microseconds next to a single corpus scan.  Init is a
    seeded choice over the sample, so the whole pipeline is replayable
    bit-for-bit (no ``rand()`` anywhere).

    Returns unit-norm centroids (spherical k-means: assign by max dot,
    re-mean, re-normalize) ready to inline as broadcast literals in
    :func:`knn_ivf`.
    """
    X = sample_vectors_deterministic(corpus, id_col, vec_col, sample_size)
    return kmeans_fit_sample(X, n_cells, n_iters, seed)


def sample_vectors_deterministic(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> "np.ndarray":
    """The engine's ONE deterministic driver-side vector sampler,
    shared by every trainer (IVF spherical k-means here, PQ/IVFADC L2
    codebooks in ``operators/pq.py``): rows ordered by ``xxhash64(id)``
    with the id itself as tiebreak — a deterministic shuffle, so
    replays, retries, and the pure-Python canonical oracle replay
    (queries/vecq.py, queries/pqq.py) all see the identical sample —
    then one heap-top-k collect, a fixed ~sample_size × dim float64
    block no matter the corpus size."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.asc(F.xxhash64(F.col("_id"))), F.asc("_id"))
        .limit(sample_size)
        .collect()
    )
    return np.array([r["_v"] for r in rows], dtype=np.float64)


def kmeans_fit_sample(
    X: "np.ndarray", n_cells: int, n_iters: int = 10, seed: int = 42
) -> list[list[float]]:
    """The pure-numpy spherical k-means core shared by the distributed
    sampler (:func:`train_kmeans_centroids`) and the canonical oracle
    twin (queries/vecq.py): identical input rows → bitwise-identical
    centroids (numpy ops are deterministic per machine/process)."""
    if len(X) < n_cells:
        raise ValueError(
            f"train_kmeans_centroids: sample of {len(X)} vectors cannot "
            f"seed {n_cells} cells"
        )
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), n_cells, replace=False)].copy()
    for _ in range(n_iters):
        assign = (X @ cent.T).argmax(axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm > 0:
                    cent[j] = mean / norm
    return [c.tolist() for c in cent]


_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def spark_xxhash64_long(v: int, seed: int = 42) -> int:
    """Pure-Python twin of Spark's ``xxhash64`` on a LongType column
    (XXH64 of the 8-byte little-endian value, default seed 42) —
    verified value-equal against the JVM in
    tests/test_dedup_similarity.py.  Lets the oracle side replay the
    deterministic-sample ordering without a SparkSession."""
    import struct

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    (k1,) = struct.unpack("<Q", struct.pack("<q", v))
    acc = (seed + _XXH_P5 + 8) & _M64
    k1 = (k1 * _XXH_P2) & _M64
    k1 = rotl(k1, 31)
    k1 = (k1 * _XXH_P1) & _M64
    acc ^= k1
    acc = (rotl(acc, 27) * _XXH_P1 + _XXH_P4) & _M64
    acc ^= acc >> 33
    acc = (acc * _XXH_P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _XXH_P3) & _M64
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def unit_list(vec) -> list[float]:
    """Driver-side unit normalization with the IDENTICAL float64
    left-fold ``_normalized`` runs executor-side (acc starts 0.0,
    squares added in element order) — bit-equal to the oracles'
    ``normed`` CTE, so a centroid collected raw and normalized here
    matches the same vector normalized in-plan."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    n = math.sqrt(acc)
    return [float(x) / n for x in vec]


def head_centroid_pairs(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple]:
    """The deterministic head-id coarse quantizer shared by
    :func:`knn_ivf` and ``binquant.knn_ivf_binary``: the ``n_cells``
    lowest-id corpus vectors, fetched RAW with one bounded heap-top-k
    job and unit-normalized driver-side via :func:`unit_list`.  A
    fixed data-derived centroid set keeps both operators exactly
    reproducible by their SQL oracles' ``cents`` CTEs."""
    cent_rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.asc("_id"))
        .limit(n_cells)
        .collect()
    )
    return [(r["_id"], unit_list(r["_v"])) for r in cent_rows]


def centroids_literal(cent_pairs: list[tuple], id_type: str):
    """Inline ``(cell_id, unit centroid)`` pairs as an array-of-structs
    literal — the quantizer is broadcast-sized by definition, so cell
    assignment downstream is a NARROW per-row expression with zero
    corpus shuffle.

    r14 perf: built as ONE ``from_json`` over a single string literal
    instead of n_cells×(dim+1) nested ``F.lit`` calls — the old form
    paid ~512 py4j round-trips plus Catalyst analysis of a 512-node
    tree on EVERY query construction (measured: 0.53 s of
    knn_cosine_ivf's build time).  The optimizer constant-folds the
    foldable ``from_json`` into the identical array<struct> literal, so
    the executed plan — and every float bit (json.dumps emits
    shortest-round-trip reprs) — is unchanged; knn_ivf output proven
    row-exact.  Non-finite values can't round-trip through JSON, so
    they fall back to the nested-literal form (never hit by unit
    centroids; defensive only)."""
    import json as _json
    import math as _math

    if all(
        _math.isfinite(x) for _, cvec in cent_pairs for x in cvec
    ):
        payload = _json.dumps(
            [{"cell_id": cid, "cent": list(cvec)} for cid, cvec in cent_pairs]
        )
        return F.from_json(
            F.lit(payload),
            f"array<struct<cell_id:{id_type},cent:array<double>>>",
        )
    return F.array(
        *[
            F.struct(
                F.lit(cid).cast(id_type).alias("cell_id"),
                F.array(*[F.lit(x) for x in cvec]).alias("cent"),
            )
            for cid, cvec in cent_pairs
        ]
    )


def cell_sim_cmp(l, r):
    """array_sort comparator for cell argmax: sim desc, cell_id asc —
    the same order as the oracles' ROW_NUMBER tie-break."""
    return (
        F.when(l["sim"] > r["sim"], F.lit(-1))
        .when(l["sim"] < r["sim"], F.lit(1))
        .when(l["cell_id"] < r["cell_id"], F.lit(-1))
        .when(l["cell_id"] > r["cell_id"], F.lit(1))
        .otherwise(F.lit(0))
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
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN — the classic ANN scale path.

    Coarse quantizer: by default the ``n_cells`` lowest-id corpus
    vectors serve as deterministic centroids (a fixed data-derived
    centroid set keeps the operator exactly reproducible by the SQL
    oracle); pass ``centroids`` (e.g. from
    :func:`train_kmeans_centroids`) for a trained quantizer with better
    cell balance — same plan shape, cells keyed 0..n-1.  Every corpus
    vector is assigned to its nearest
    centroid in one broadcast pass (no shuffle of the corpus); each
    query probes its ``n_probe`` nearest cells and ranks only those
    cells' members — candidate count ≈ |corpus|·n_probe/n_cells per
    query instead of |corpus|.

    Everything downstream of the up-front unit-normalization (cell
    assignment AND candidate scoring) is a plain dot product — cosine
    ranking is invariant to the normalization, and the oracle mirrors
    the same normalize-then-dot float ops bit-for-bit.
    """
    ncorpus = _normalized(fan_out(corpus), id_col, vec_col, "_id", "_nv")
    nqueries = _normalized(queries, id_col, vec_col, "_id", "_nv")

    # The coarse quantizer is small by definition (that is the point of
    # IVF), so materialize it on the driver once — one heap-top-k job —
    # and inline it as a literal.  Cell assignment then becomes a NARROW
    # per-row expression (transform → array_sort → slice → explode):
    # zero shuffle of the corpus, vs. the window formulation which
    # fanned the corpus n_cells× through a crossJoin and then shuffled
    # it through a row_number partitionBy.  At 100 TB the corpus-side
    # shuffle is the whole cost; the quantizer stays a broadcast-sized
    # constant regardless of corpus size.
    # Collect RAW vectors (cheap heap-top-k straight off the scan) and
    # unit-normalize driver-side with the identical float64 left-fold
    # (acc starts 0.0, products added in element order) — bit-equal to
    # _normalized / the oracle's normed CTE.  The head-id quantizer
    # (unit_list / head_centroid_pairs / centroids_literal /
    # cell_sim_cmp) is shared with binquant.knn_ivf_binary so the two
    # IVF tiers can never drift apart arithmetically.
    if centroids is not None:
        cent_pairs = [(i, list(map(float, c))) for i, c in enumerate(centroids)]
        id_type = "int"
    else:
        cent_pairs = head_centroid_pairs(corpus, id_col, vec_col, n_cells)
        id_type = ncorpus.schema["_id"].dataType.simpleString()
    cents_lit = centroids_literal(cent_pairs, id_type)

    def assign(df: DataFrame, out_id: str, out_vec: str, nprobe: int) -> DataFrame:
        sims = F.transform(
            cents_lit,
            lambda c: F.struct(
                dot_col(F.col("_nv"), c["cent"]).alias("sim"),
                c["cell_id"].alias("cell_id"),
            ),
        )
        top = F.slice(F.array_sort(sims, cell_sim_cmp), 1, nprobe)
        return df.select(
            F.col("_id").alias(out_id),
            F.col("_nv").alias(out_vec),
            F.explode(top).alias("_c"),
        ).select(out_id, out_vec, F.col("_c.cell_id").alias("cell_id"))

    cells = assign(ncorpus, "neighbor_id", "_cv", 1)
    probes = assign(nqueries, "query_id", "_qv", n_probe)
    cos = dot_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    # Each corpus vector lives in exactly one cell, so (query, neighbor)
    # pairs are already unique — no dedup shuffle needed.  Probes are
    # (n_queries × n_probe) rows — broadcast them so the corpus side of
    # the cell join streams without a shuffle.
    cand = (
        F.broadcast(probes)
        .join(cells, "cell_id")
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
    """Sign-bit bucket string for a vector column given frozen planes.

    Plane literals are single from_json nodes (functions/litjson —
    r14: the nested-F.lit form cost 384 py4j calls + tree nodes per
    bucket expression); values and the executed plan are unchanged."""
    from rick_and_morty_data_pipeline_project_spark.functions.litjson import (
        array_lit,
    )

    bits = []
    for plane in planes:
        arr = array_lit([float(x) for x in plane])
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
    # fan_out (r15, guide §2.6): the bucket column is n_tables×n_planes
    # interpreted 64-dim folds per corpus row; on the unsplittable
    # single-file local scan that all ran on one task.  Candidates are
    # dropDuplicates-ed and the final window is fully tie-broken, so
    # the balancing exchange cannot change a row.
    c = with_buckets(fan_out(corpus), "neighbor_id")
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


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|x|/127``,
    ``q_i = round(x_i/scale)`` ∈ [−127, 127].

    The storage/bandwidth lever for ANN at scale: a quantized corpus is
    4× smaller than float32 (8× vs float64), which is 4× more vectors
    per executor page-cache and 4× less shuffle/broadcast traffic in
    the IVF probe stage; scoring dequantizes on the fly
    (``dot ≈ scale_a·scale_b·Σ qa_i·qb_i``) with integer multiplies.
    Narrow, zero-shuffle, one pass.  Deterministic — no sampling or
    calibration state; re-quantizing the same vector is bit-identical.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        (amax / F.lit(127.0)).alias("scale"),
        F.transform(
            x, lambda v: F.round(v / (amax / F.lit(127.0))).cast("int")
        ).alias("qvec"),
    )


def knn_hard_negatives_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Hard-negative mining: per query, the top-k most-similar corpus
    vectors with a DIFFERENT label (dense-retrieval contrastive
    negatives).  Same plan as :func:`knn_bruteforce` — both sides
    unit-normalized ONCE (no per-pair norm recompute), broadcast
    queries, ``fan_out`` corpus, heap top-k — with the label
    inequality fused into the pair filter.  Output adds the negative's
    label."""
    q = _normalized(queries, id_col, vec_col, "query_id", "_qv").join(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("_qlabel"),
        ),
        "query_id",
    )
    c = _normalized(fan_out(corpus), id_col, vec_col, "neighbor_id", "_cv").join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neg_label"),
        ),
        "neighbor_id",
    )
    cos = dot_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("_qlabel") != F.col("neg_label"))
        .select("query_id", "neighbor_id", "neg_label", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_bruteforce_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force kNN over the int8-quantized corpus — the memory-
    bound regime's plan: unit-normalize, quantize both sides
    (:func:`quantize_int8`), then score with
    ``scale_q·scale_c·Σ qa_i·qb_i`` — an integer-multiply dot over a
    4×-smaller corpus (what fits in page cache decides brute-force
    throughput at scale).  Approximate (|cosine error| ≤ ~dim·s_a·s_b/2
    ≈ 1e-2 for unit vectors); recall vs the exact operator is
    property-tested.  Same broadcast-queries/stream-corpus shape as
    :func:`knn_bruteforce`."""
    q = quantize_int8(
        _normalized(queries, id_col, vec_col, "query_id", "_v"),
        "query_id",
        "_v",
    ).select("query_id", F.col("scale").alias("_sq"), F.col("qvec").alias("_qq"))
    c = quantize_int8(
        _normalized(fan_out(corpus), id_col, vec_col, "neighbor_id", "_v"),
        "neighbor_id",
        "_v",
    ).select(
        "neighbor_id", F.col("scale").alias("_sc"), F.col("qvec").alias("_qc")
    )
    int_dot = F.aggregate(
        F.zip_with("_qq", "_qc", lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("_sq") * F.col("_sc") * int_dot.cast("double"), 6
            ).alias("cosine"),
        )
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


MMR_SCHEMA = "query_id long, neighbor_id long, cosine double, mmr_rank int"


def knn_mmr(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: diverse top-k neighbors.

    Plain top-k returns near-duplicates of each other when the corpus
    clusters; MMR greedily picks, at each step, the candidate
    maximizing ``lam·sim(query, d) − (1−lam)·max_{s∈selected}
    sim(d, s)`` — relevance traded against redundancy.  The selection
    is inherently sequential in k, so the Spark shape is: exact
    :func:`knn_bruteforce` SHORTLIST per query (distributed, bounded at
    ``shortlist`` rows per query), then one ``applyInPandas`` group per
    query that runs the k-step greedy over shortlist×shortlist dot
    products — O(shortlist²·k) Python work on ≤ ``shortlist`` rows,
    never on the corpus.  Deterministic: candidates are processed in
    (cosine desc, neighbor_id asc) shortlist order and equal-score ties
    keep the earliest — i.e. the higher-cosine (then lower-id)
    candidate.

    Scale: the shortlist stage carries the whole cost model (see
    knn_bruteforce / knn_ivf — swap in IVF for the shortlist at 10⁹
    vectors).  Fetching shortlist vectors re-scans the corpus once
    (narrow) against the BROADCAST shortlist — the corpus never
    shuffles; the re-rank stage then shuffles only
    shortlist·|queries| rows on query_id.
    """
    top = knn_bruteforce(
        queries, corpus, id_col, vec_col, k=shortlist
    ).select("query_id", "neighbor_id", "cosine")
    nvecs = _normalized(corpus, id_col, vec_col, "neighbor_id", "_nv")
    staged = nvecs.join(F.broadcast(top), "neighbor_id")

    def rerank(pdf):
        import numpy as np

        pdf = pdf.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.array(pdf["_nv"].tolist(), dtype=np.float64)
        sims = vecs @ vecs.T  # shortlist×shortlist neighbor-neighbor
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            best_i, best_score = None, None
            for i in remaining:
                redundancy = (
                    max(sims[i, j] for j in selected) if selected else 0.0
                )
                score = lam * rel[i] - (1.0 - lam) * redundancy
                # strict > keeps the earliest (highest-cosine, lowest
                # id) candidate on ties — deterministic
                if best_score is None or score > best_score:
                    best_i, best_score = i, score
            selected.append(best_i)
            remaining.remove(best_i)
        out = pdf.iloc[selected][["query_id", "neighbor_id", "cosine"]]
        out = out.assign(mmr_rank=np.arange(1, len(selected) + 1))
        return out

    return staged.groupBy("query_id").applyInPandas(rerank, schema=MMR_SCHEMA)
