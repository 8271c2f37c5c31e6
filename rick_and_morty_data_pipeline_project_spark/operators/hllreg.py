"""Explicit-register HyperLogLog — the PORTABLE, fully-oracled HLL.

Spark's built-in ``hll_sketch_agg`` (Apache DataSketches) is excellent
at scale but its register state and HIP estimator are engine-internal:
no external system can replay the ESTIMATES, so queries built on it
are forever rows-only for the driver (their accuracy/merge contracts
are certified by the oracled ``*_audit`` twins in queries/sketchq.py).
This module is the same sketch *algorithm* with every step made
engine-independent — the CMS grid-replay trick (r8) extended to HLL:

* **hash**: md5 → 15 hex chars → 60-bit non-negative integer, the
  KMV-proven deterministic cross-engine uniform hash;
* **register**: top p=12 bits (m=4096 registers); **rank**: ρ =
  position of the first 1-bit in the remaining 48 bits, computed with
  INTEGER string-length arithmetic (``49 − length(bin(w))``, ρ=49 for
  w=0) — no float log anywhere near the registers;
* **state**: per-key rows ``(key, register, max ρ)`` — a relation any
  engine can GROUP BY/MAX, mergeable by element-wise max exactly like
  register arrays;
* **estimate**: Flajolet–Fuss–Gandouet–Meunier (AofA 2007) raw
  estimate α·m²/Σ2^{−M[j]} with the small-range linear-counting
  correction (Heule et al., EDBT 2013 threshold form).  The harmonic
  sum is EXACT int64 — Σ 2^{49−M[j]} ≤ m·2^49 = 2^61 — so both
  engines divide the same inlined double literal by the same exact
  integer; only ln() in the linear-counting branch is genuinely
  float, covered by the repo-standard round-to-6.

Scale: per-event work is one md5 + integer ops (the same bill the
JVM sketch pays for xxhash); the shuffle carries ≤ m rows per key
(map-side combined), and every rollup/union after the first pass
touches only the bounded register relation, never the raw input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: precision: p register bits → m = 2^p registers
P = 12
M_REG = 1 << P
#: remaining hash bits after the register index (60-bit hash − p)
W_BITS = 60 - P
W_MASK = (1 << W_BITS) - 1
#: ρ ∈ [1, W_BITS] for w > 0, RHO_CAP for w = 0 — so the exact
#: harmonic sum Σ 2^(RHO_CAP − ρ) ≤ m·2^RHO_CAP = 2^61 fits int64
RHO_CAP = W_BITS + 1
#: α_m for m ≥ 128 (Flajolet et al. 2007, fig. 3)
ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)
#: the whole numerator α·m²·2^RHO_CAP as ONE double literal — both
#: engines divide it by the same exact integer sum
A_NUM = ALPHA * M_REG * M_REG * float(1 << RHO_CAP)
#: linear-counting switch threshold (2.5·m)
LC_THRESHOLD = 2.5 * M_REG


def hll_register_table(
    df: DataFrame,
    key_col: Column,
    item_col: str,
    prefix: str = "hll:",
) -> DataFrame:
    """(key, register, m_rho): the sketch state as a relation.  One
    pass over the input; map-side-combined MAX per (key, register);
    ≤ m rows per key regardless of item cardinality.  NULL items are
    filtered on BOTH engines (the KMV r08 advisory: never let a NULL
    ordering default into sketch state)."""
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col(item_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
    )
    w = h.bitwiseAND(F.lit(W_MASK))
    rho = F.when(w == 0, F.lit(RHO_CAP)).otherwise(
        F.lit(RHO_CAP) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(
            key_col.alias("key"),
            F.shiftright(h, W_BITS).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("key", "register")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_estimate(reg_df: DataFrame, est_name: str = "est") -> DataFrame:
    """Aggregate a (key, register, m_rho) relation to (key, est).

    The caller supplies rows grouped however it likes (per day, per
    rolling window, merged TOTAL) — estimation is one GROUP BY over
    the register relation: exact int64 harmonic sum, one double
    divide, the linear-counting CASE, round(…, 6)."""
    agg = reg_df.groupBy("key").agg(
        F.count(F.lit(1)).alias("_seen"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - m_rho)")
        ).alias("_s_seen"),
    )
    s = F.col("_s_seen") + (F.lit(M_REG) - F.col("_seen")) * F.lit(
        1 << RHO_CAP
    )
    v = (F.lit(M_REG) - F.col("_seen")).cast("double")
    e_raw = F.lit(A_NUM) / s.cast("double")
    est = F.when(
        (e_raw <= F.lit(LC_THRESHOLD)) & (v > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v),
    ).otherwise(e_raw)
    return agg.select("key", F.round(est, 6).alias(est_name))


def hll_register_sql(
    source: str, key_expr: str, item_expr: str, prefix: str = "hll:"
) -> str:
    """The DuckDB twin of :func:`hll_register_table` as a SELECT body
    (same hash, same integer ρ arithmetic)."""
    h = (
        f"CAST(CAST('0x' || substring(md5('{prefix}' || "
        f"CAST({item_expr} AS VARCHAR)), 1, 15) AS BIGINT) AS BIGINT)"
    )
    return f"""
  SELECT {key_expr} AS key,
         CAST(({h} >> {W_BITS}) AS INTEGER) AS register,
         MAX(CASE WHEN ({h} & {W_MASK}) = 0 THEN {RHO_CAP}
                  ELSE {RHO_CAP} - length(bin({h} & {W_MASK}))
             END) AS m_rho
  FROM {source}
  WHERE {item_expr} IS NOT NULL
  GROUP BY 1, CAST(({h} >> {W_BITS}) AS INTEGER)
"""


def hll_estimate_sql(reg_source: str, est_name: str = "est") -> str:
    """The DuckDB twin of :func:`hll_estimate` over a
    (key, register, m_rho) relation named ``reg_source``."""
    s = (
        f"(sum(CAST(1 AS BIGINT) << ({RHO_CAP} - m_rho)) "
        f"+ ({M_REG} - count(*)) * (CAST(1 AS BIGINT) << {RHO_CAP}))"
    )
    v = f"CAST({M_REG} - count(*) AS DOUBLE)"
    e_raw = f"{A_NUM!r} / CAST({s} AS DOUBLE)"
    return f"""
  SELECT key,
         round(CASE WHEN {e_raw} <= {LC_THRESHOLD!r} AND {v} > 0
                    THEN {float(M_REG)!r} * ln({float(M_REG)!r} / {v})
                    ELSE {e_raw}
               END, 6) AS {est_name}
  FROM {reg_source}
  GROUP BY key
"""
