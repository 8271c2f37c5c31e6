"""Streaming PQ encode-on-arrival — the vector half of the ingest
story.

The streaming ingest family already covers exact and LSH near-dup
admission (streaming/dedup.py); this completes it for ANN corpora: as
embedding rows arrive, each micro-batch is PQ-encoded (the same
``operators/pq.pq_encode`` Arrow pass the batch path uses, against
FROZEN codebook literals) and folded into a durable parquet CODES
table — the search-time index grows incrementally, m small ints per
vector, no raw-vector storage on the hot path.

Determinism contract: codes are a pure function of (vector, frozen
codebooks) — arrival order, batch boundaries, restarts and replays
cannot change them — so the maintained table is BIT-IDENTICAL to a
one-shot batch ``pq_encode`` over the same rows (pinned in
tests/test_pq.py).  Training stays a batch-side concern by design:
re-fitting books on a stream would silently re-shape every previously
issued code (the classic ANN-index poisoning mistake); rotate books by
building a NEW table.

Durability: ``streaming/_durable.py`` — recover-before-exists, batch
id riding the atomic table swap, at-least-once replays no-op.  The
fold is an anti-join upsert keyed by id: a replayed or re-sent vector
re-encodes to the identical codes, so last-write-wins is idempotent.

Scale: per batch cost is one Arrow encode pass over the batch plus an
anti-join against the (m-int-per-row) codes table — broadcastable
until the table is huge, and at that point the right deployment is
partitioned table_dir shards (the sharded-Bloom pattern), not a
different algorithm.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from rick_and_morty_data_pipeline_project_spark.operators.pq import (
    pq_encode,
)
from rick_and_morty_data_pipeline_project_spark.streaming._ingest_common import (
    encode_upsert_sink,
)


def stream_pq_codes_table(
    stream: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    table_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation=None,
):
    """Maintain a durable (id, codes) parquet table from a vector
    stream: encode each micro-batch with the frozen ``codebooks`` and
    upsert by id (new codes win — idempotent, since codes are a pure
    function of the vector).

    ``rotation``: an optional frozen orthogonal matrix — pass the R
    from ``opq.opq_fit`` to maintain an OPQ codes table instead (the
    encode becomes ``opq.opq_encode``: one extra GEMM per Arrow batch;
    codes stay a pure function of (vector, R, books), so every
    idempotence/restart property carries over unchanged — pinned in
    tests/test_pq.py).  Like the books, R is frozen by design:
    re-fitting a rotation on the stream would re-shape every
    previously issued code."""

    # Fold skeleton (deterministic intra-batch duplicate reduction +
    # anti-join upsert + durable swap) is the shared
    # ``_ingest_common.encode_upsert_sink``; only the encode differs
    # per tier.  The skeleton's max-over-struct reduction orders
    # exactly like the bare array max this tier originally used
    # (struct comparison delegates to its single array field).
    def _encode(batch: DataFrame) -> DataFrame:
        if rotation is not None:
            from rick_and_morty_data_pipeline_project_spark.operators.opq import (
                opq_encode,
            )

            return opq_encode(
                batch.select(id_col, vec_col),
                rotation,
                codebooks,
                id_col,
                vec_col,
            )
        return pq_encode(
            batch.select(id_col, vec_col), codebooks, id_col, vec_col
        )

    return encode_upsert_sink(
        stream, table_dir, checkpoint_dir, _encode, id_col
    )
