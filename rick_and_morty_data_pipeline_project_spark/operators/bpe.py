"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The tokenizer-training step of an LLM data pipeline, restated for
Spark's execution model:

* **Train on the word-frequency relation, not the corpus.**  Classic
  BPE iterates over word *types* weighted by frequency, so the first
  (and only corpus-sized) job is one whitespace-token count — a single
  map-combinable shuffle.  Every merge iteration after that runs on the
  vocabulary relation, which is orders of magnitude smaller than the
  corpus and bounded by the type count whatever the input size.
* **Symbol sequences as delimiter-wrapped strings.**  A word's current
  segmentation is one string with every symbol wrapped in ``\\x1f``
  (``"ab" → "\\x1fa\\x1f\\x1fb\\x1f"``).  Applying merge (l, r) is then a
  plain ``replace("\\x1fl\\x1f\\x1fr\\x1f" → "\\x1flr\\x1f")`` — and because
  both the JVM's and DuckDB's ``replace`` scan left-to-right
  non-overlapping, the *greedy merge semantics of BPE come out of the
  engine's string primitive*, identically in both engines, which is
  what makes an exact unrolled-CTE SQL oracle possible for an
  iterative tokenizer trainer (same trick family as the PageRank
  unrolled oracle).  No Python ever touches a row.
* **One tiny collect per iteration.**  Each merge step aggregates pair
  counts (map-combinable; pair space ≤ vocab·avg_len) and collects the
  single argmax row (ties broken lexicographically so training is
  deterministic).  n_merges driver round-trips of one row each — the
  same driver-loop shape as the trained-IVF k-means.

No counterpart in the reference (a 453-line scraper); extends
SURVEY.md §2.10's text surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELIM = "\x1f"
_DD = DELIM + DELIM


def wrap_word_col(word) -> "F.Column":
    """word → one-symbol-per-char wrapped string."""
    return F.concat(
        F.lit(DELIM),
        F.array_join(F.split(word, ""), _DD),
        F.lit(DELIM),
    )


def symbols_col(w) -> "F.Column":
    """wrapped string → current symbol array."""
    return F.split(F.expr(f"btrim({w}, '{DELIM}')"), _DD)


@dataclass
class BpeMerge:
    rank: int
    left: str
    right: str
    pair_weight: int


def train_bpe(
    words: DataFrame, n_merges: int
) -> tuple[list[BpeMerge], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) relation.

    Returns the merge table and the word relation with its final
    segmentation (column ``w``) for downstream token accounting.
    """
    # Materialize the vocab ONCE: every iteration runs an action, and
    # without this cut each pair-count job would replay the corpus-sized
    # token count (the repeated-action anti-pattern).  After the cut the
    # per-iteration lineage is vocab-sized replace layers only.
    cur = words.select(
        "word", "cnt", wrap_word_col(F.col("word")).alias("w")
    ).localCheckpoint(eager=True)
    merges: list[BpeMerge] = []
    for rank in range(1, n_merges + 1):
        syms = cur.select("cnt", symbols_col("w").alias("s"))
        pairs = syms.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("s"), 1, F.size("s") - 1),
                    F.slice(F.col("s"), 2, F.size("s")),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(
                F.col("p.l").alias("l"), F.col("p.r").alias("r")
            )
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], best[0]["c"]
        merges.append(BpeMerge(rank, l, r, int(c)))
        cur = cur.withColumn(
            "w",
            F.replace(
                F.col("w"),
                F.lit(f"{DELIM}{l}{DELIM}{DELIM}{r}{DELIM}"),
                F.lit(f"{DELIM}{l}{r}{DELIM}"),
            ),
        )
        # Bound lineage growth across iterations: each localCheckpoint
        # cuts the replace-chain plan so iteration i never re-runs
        # iterations 1..i−1 (vocab-sized relation — cheap to persist).
        if rank % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur
