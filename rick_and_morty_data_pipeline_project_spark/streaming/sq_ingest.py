"""Streaming SQ8 encode-on-arrival — the 8-bit tier of the ingest
family (streaming/pq_ingest.py is the 8-byte-PQ-code tier,
streaming/bin_ingest.py the 1-bit sign-word tier; this completes the
quantization ladder on the streaming side too).

As embedding rows arrive, each micro-batch is unit-normalized and
affinely encoded against FROZEN per-dimension [min, max] train
statistics (``operators/sq.sq8_code_col`` — the identical expression
the batch path and the ``knn_cosine_sq8`` oracle use) and folded into
a durable (id, codes) parquet table: the ADC-searchable index grows
incrementally at ~dim bytes per vector.

Train-stat freezing is the SAME index-poisoning defense as the PQ
tier's frozen codebooks: stats are fitted ONCE on a trusted corpus
and passed in as plain Python lists — arriving data can never shift
the quantization grid, so a poisoned stream cannot degrade the codes
of previously ingested vectors (it can only produce clamped codes for
itself, which is the documented out-of-range behavior).

Determinism contract: codes are a pure function of (vector, frozen
stats) — arrival order, batch boundaries, restarts and replays cannot
change them — so the maintained table is BIT-IDENTICAL to a one-shot
batch encode over the same rows GIVEN UNIQUE IDS (pinned in
tests/test_vecx.py; same-id duplicates collapse to the max code
tuple, the pq_ingest reduction).

Durability: streaming/_durable.py — recover-before-exists, batch id
riding the atomic table swap, at-least-once replays no-op; the fold is
the same anti-join upsert keyed by id as the PQ and binary tiers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.similarity import (
    _normalized,
)
from rick_and_morty_data_pipeline_project_spark.operators.sq import sq8_code_col
from rick_and_morty_data_pipeline_project_spark.streaming._ingest_common import (
    encode_upsert_sink,
)


def sq8_codes_df(
    df: DataFrame,
    mins: Sequence[float],
    maxs: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): unit-normalize then encode against the frozen
    stats — the batch-side twin this stream maintains incrementally,
    shared so the streaming≡batch test compares the same expression."""
    nv = _normalized(df, id_col, vec_col, id_col, "_nv")
    mins_lit = F.array(*[F.lit(float(x)) for x in mins])
    maxs_lit = F.array(*[F.lit(float(x)) for x in maxs])
    return nv.select(
        F.col(id_col),
        sq8_code_col(F.col("_nv"), mins_lit, maxs_lit).alias("codes"),
    )


def stream_sq8_codes_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    mins: Sequence[float],
    maxs: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maintain a durable (id, codes) parquet table from a vector
    stream: encode each micro-batch against the FROZEN stats and
    upsert by id (idempotent — codes are a pure function of the
    vector and the frozen grid).  Fold skeleton (deterministic
    duplicate reduction + anti-join upsert + durable swap) is the
    shared ``_ingest_common.encode_upsert_sink``."""

    def _encode(batch: DataFrame) -> DataFrame:
        return sq8_codes_df(
            batch.select(id_col, vec_col), mins, maxs, id_col, vec_col
        )

    return encode_upsert_sink(
        stream, table_dir, checkpoint_dir, _encode, id_col
    )
