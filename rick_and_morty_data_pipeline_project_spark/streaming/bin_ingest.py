"""Streaming binary-quantization encode-on-arrival — the 1-bit tier of
the ingest family (streaming/pq_ingest.py is the 8-byte-code tier).

As embedding rows arrive, each micro-batch is packed into sign words
(``operators/binquant.sign_word_cols`` — the identical expression the
batch path and the ``knn_cosine_binary`` oracle use) and folded into a
durable (id, w0, w1, …) parquet table: the Hamming-prefilter index
grows incrementally at ~8 bytes per 64-dim vector, no raw-vector
storage on the hot path.

Determinism contract: words are a pure function of the vector's signs
— arrival order, batch boundaries, restarts and replays cannot change
them — so the maintained table is BIT-IDENTICAL to a one-shot batch
pack over the same rows GIVEN UNIQUE IDS (pinned in
tests/test_vecx.py).  With duplicate ids the two differ by
construction: ``pack_words_df`` emits one row per input row, while
this sink keys the durable table by id and collapses same-id rows to
the max word tuple — the equivalence then holds only after applying
the same max-struct reduction to the batch pack.  There is
nothing to train and hence nothing to freeze: binary quantization has
no index-poisoning surface at all, which is exactly why it is the
cheapest tier.

Durability: streaming/_durable.py — recover-before-exists, batch id
riding the atomic table swap, at-least-once replays no-op; the fold is
the same anti-join upsert keyed by id as the PQ tier, with intra-batch
duplicates reduced deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.binquant import (
    sign_word_cols,
)
from rick_and_morty_data_pipeline_project_spark.streaming._ingest_common import (
    encode_upsert_sink,
)


def pack_words_df(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, w0, w1, …): the batch-side packing this stream maintains
    incrementally — shared so the streaming≡batch test compares the
    same expression, not a re-implementation."""
    ws = sign_word_cols(F.col(vec_col), dim)
    return df.select(
        F.col(id_col),
        *[w.alias(f"w{i}") for i, w in enumerate(ws)],
    )


def stream_binary_words_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maintain a durable (id, sign words) parquet table from a vector
    stream: pack each micro-batch and upsert by id (idempotent — words
    are a pure function of the vector).  Fold skeleton (deterministic
    duplicate reduction + anti-join upsert + durable swap) is the
    shared ``_ingest_common.encode_upsert_sink``."""

    def _encode(batch: DataFrame) -> DataFrame:
        return pack_words_df(
            batch.select(id_col, vec_col), dim, id_col, vec_col
        )

    return encode_upsert_sink(
        stream, table_dir, checkpoint_dir, _encode, id_col
    )
