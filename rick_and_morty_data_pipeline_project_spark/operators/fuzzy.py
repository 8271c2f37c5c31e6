"""FastSS fuzzy matching: exact edit-distance-≤1 self-join.

Deletion-neighborhood blocking (the FastSS family): two strings within
one edit always share a single-deletion variant —

* substitution at position i → both strings' i-th deletions are equal;
* insertion/deletion → the longer string's deletion at the edit point
  equals the shorter string itself (its identity variant);
* equality → identity variants collide.

So exploding each string into its ``len+1`` variants (itself + each
single-char deletion) and equi-joining on the variant key yields a
COMPLETE candidate set for lev ≤ 1, verified afterwards by a real
levenshtein — no recall loss, unlike ad-hoc prefix/phonetic blocking.
Completeness is property-tested against a brute-force all-pairs oracle
on randomized strings (tests/test_property.py) and the catalog query's
DuckDB oracle states the naive n² semantics directly.

Scale: candidate generation is a narrow explode; the join key
cardinality is ≈ |corpus|·avg_len, so parallelism is high and there
are no hot blocks (a prefix-blocked variant measured 10× slower at
sf0.1 — 15 hot keys streaming |block|² pairs).  Cost tracks true
variant-collision mass.  For lev ≤ k, generalize to k-deletion
neighborhoods (size C(len,k)) — the standard FastSS trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs_lev1(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``name_col`` values are within
    edit distance 1 (including exact duplicates at distance 0).
    Output: id_a, id_b, edit_distance."""
    variants = df.select(
        F.col(id_col),
        F.col(name_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, length({name_col})), i -> "
                f"CASE WHEN i = 0 THEN {name_col} "
                f"ELSE concat(substring({name_col}, 1, i-1), "
                f"substring({name_col}, i+1, length({name_col}))) END)"
            )
        ).alias("_variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b.hint("shuffle_hash"), "_variant")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{name_col}").alias("_na"),
            F.col(f"b.{name_col}").alias("_nb"),
        )
        .distinct()  # a pair may collide on several variants
    )
    return (
        cand.withColumn(
            "edit_distance", F.levenshtein("_na", "_nb").cast("long")
        )
        .filter(F.col("edit_distance") <= 1)
        .select("id_a", "id_b", "edit_distance")
    )
