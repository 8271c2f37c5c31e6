"""Python UDTF surface (Spark 4 ``@udtf``).

The reference's row-expanding idioms (SURVEY.md §2.9) are all covered
by built-in explode/inline, and every catalog query keeps its hot path
JVM-side — so no UDTF appears in `queries()`.  This module exists to
prove the escape hatch works end-to-end when a future operator needs
imperative row expansion: ``ChunkDocs`` is the UDTF twin of the
declarative ``text_chunk_overlap`` query and is asserted EXACTLY equal
to it in tests/test_udtf.py.

Scale note: a UDTF runs Python per input row (Arrow-batched transfer,
but the generator itself is Python). Use it only where built-ins can't
express the expansion; the declarative twin here is strictly faster and
is the exported one.
"""

from __future__ import annotations

import math

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, n_chunk_tokens int, chunk_text string")
class ChunkDocs:
    """Sliding-window token chunking: yields one row per chunk of
    ``chunk`` tokens starting every ``stride`` tokens (short docs yield
    one chunk) — byte-identical output to
    queries/textq.py:text_chunk_overlap."""

    def eval(self, text: str, chunk: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        n_chunks = max(math.ceil((n - chunk) / stride), 0) + 1
        for i in range(n_chunks):
            sl = toks[i * stride : i * stride + chunk]
            yield i, len(sl), " ".join(sl)


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("chunk_docs", ChunkDocs)
