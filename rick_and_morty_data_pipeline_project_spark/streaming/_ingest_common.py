"""Shared encode-on-arrival skeleton for the quantized-ANN ingest
family (r11 verdict stretch item 9).

``streaming/pq_ingest.py`` (8-byte PQ / OPQ codes),
``streaming/bin_ingest.py`` (1-bit sign words) and
``streaming/sq_ingest.py`` (64-byte SQ8 codes) all maintain a durable
(id, code columns) parquet table from a vector stream with the SAME
three-step fold, differing only in the encode expression:

1. **Encode** the micro-batch against FROZEN parameters (codebooks /
   nothing / train stats) — codes are a pure function of the vector
   and the frozen artifact, so replays and reorderings cannot change
   them.
2. **Reduce intra-batch duplicates deterministically**: same-id rows
   collapse to the lexicographic max over the code-column struct
   (NOT ``dropDuplicates``' arbitrary pick) so a crash-replay rebuilds
   the bit-identical table even if a batch ever carries one id with
   two different vectors.
3. **Anti-join upsert** into the current table keyed by id —
   idempotent under at-least-once replays because step 1 is pure and
   step 2 is deterministic.

The fold rides ``streaming/_durable.py``'s recover-before-exists +
atomic-swap + batch-id-marker scaffold, so every durability property
(crash mid-swap, replayed batch ids, checkpoint restart) is inherited
unchanged.  Extracting the skeleton here (same argument as the r10
IVF coarse-quantizer helper) means a fourth quantization tier adds an
encode function and ONE call — not a fourth copy of the fold whose
replay semantics could silently drift.

Reduction-equivalence note: for a single array-typed code column the
max-over-struct reduction used here orders exactly like the bare
``F.max("codes")`` the PQ tier originally used (struct comparison
delegates to its only field; Spark array ordering is element-wise
lexicographic), so the tier-level streaming ≡ batch bit-for-bit tests
in tests/test_pq.py / tests/test_vecx.py pin that the extraction
changed nothing.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.streaming._durable import (
    durable_table_sink,
)


def reduce_same_id_max(df: DataFrame, id_col: str) -> DataFrame:
    """Collapse same-id rows to the lexicographic max over the
    non-id-column struct — the deterministic intra-batch duplicate
    reduction shared by every ingest tier (step 2 above)."""
    code_cols = [c for c in df.columns if c != id_col]
    return (
        df.groupBy(id_col)
        .agg(F.max(F.struct(*[F.col(c) for c in code_cols])).alias("_c"))
        .select(id_col, *[F.col(f"_c.{c}").alias(c) for c in code_cols])
    )


def encode_upsert_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    encode: Callable[[DataFrame], DataFrame],
    id_col: str = "vec_id",
):
    """Maintain a durable (id, code columns) parquet table from a
    vector stream: ``encode`` each micro-batch (a pure function of the
    rows and frozen parameters), reduce intra-batch duplicates
    deterministically, and anti-join upsert by ``id_col``."""

    def _apply(batch: DataFrame, current: Optional[DataFrame]) -> DataFrame:
        codes = reduce_same_id_max(encode(batch), id_col)
        if current is None:
            return codes
        return current.join(codes, id_col, "left_anti").unionByName(codes)

    return durable_table_sink(stream, table_dir, checkpoint_dir, _apply)
