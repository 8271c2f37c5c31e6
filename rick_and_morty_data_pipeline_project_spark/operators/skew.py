"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions; manual salting is the
explicit fallback when one join key dominates so heavily that even a
split partition's *single key* exceeds an executor (the classic
power-law user_id / null-key case at 100 TB).

Mechanics: the skewed (large) side gets a deterministic salt in
[0, n_salts) appended to the key; the other side is replicated once per
salt value.  The shuffle then spreads each hot key over n_salts
reducers.  Replication cost is |small side| × n_salts, so n_salts is a
dial between skew relief and duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``key`` with salt-spread shuffle.

    Deterministic: the salt is a hash of the skewed side's full row
    (xxhash64 of all columns), not rand(), so replays/retries produce
    identical partitioning.  Result is exactly ``skewed.join(other,
    key, how)`` — verified in tests/test_skew.py.

    Only ``inner`` and ``left`` are supported: the replicated ``other``
    side would emit each unmatched right row ``n_salts`` times under
    right/full joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"salt-replicated right side duplicates unmatched right rows "
            f"under right/full join semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # shuffle_hash: salting only makes sense for a SHUFFLE join (a
    # broadcastable right side has no skew problem to solve), so pin the
    # plan to the strategy the operator exists to fix — otherwise a
    # small local fixture broadcasts and the salt is dead weight.
    return left.join(right.hint("shuffle_hash"), [key, "_salt"], how).drop(
        "_salt"
    )
