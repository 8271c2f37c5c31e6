"""b-bit MinHash (Li & König, WWW 2010): store only the lowest b bits
of each MinHash component and correct the estimator for accidental
low-bit collisions.

With b = 4 a component shrinks from 32 bits to a nibble — the
8-component signature fits in 4 BYTES per document (8× less sketch
storage / shuffle / page-cache than the full signature, which is the
whole economics of near-dup detection at 10¹⁰ documents).  Two
unequal minima still agree on their low 4 bits with probability
C = 2⁻⁴, so the matching fraction A estimates
E[A] = C + (1 − C)·J and the unbiased estimate is

    Ĵ_b = (A − C) / (1 − C),      C = 0.0625 (exact dyadic)

(the r₁, r₂ → 0 simplification of Li–König eq. 4 — the regime where
set sizes are far below the 2¹²⁸ hash space, which md5 shingles are).

The audit query scores every LSH candidate pair three ways — full
32-bit component agreement, bias-corrected 4-bit agreement, and the
EXACT 3-gram Jaccard — so the storage/accuracy trade is a measured
column, not a claim.  All arithmetic is exact-dyadic until the final
divisions; both engines replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    shingles_from_tokens,
    tokens_col,
)
from rick_and_morty_data_pipeline_project_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
)
from rick_and_morty_data_pipeline_project_spark.operators.parallelism import fan_out
from rick_and_morty_data_pipeline_project_spark.queries._util import Q, t

_B_COLLISION = 0.0625  # C = 2^-4, exact dyadic
_NUM_HASHES = 8
#: width of ONE MinHash component in hex chars (a 32-bit md5 slice —
#: see functions/textfns.minhash_components).  Coincidentally equal to
#: _NUM_HASHES here but semantically unrelated: the last-hex-char
#: nibble extraction must key off THIS constant, or retuning the
#: signature length would silently read '' == '' as agreement.
_COMPONENT_HEX_WIDTH = 8


def _bbit_agreement(sa, sb):
    """Fraction of components whose LOW NIBBLE (last hex char of the
    8-hex-char component) agrees — the only bits a b=4 deployment
    stores."""
    matches = F.aggregate(
        F.zip_with(
            sa,
            sb,
            lambda x, y: F.when(
                F.substring(x, _COMPONENT_HEX_WIDTH, 1)
                == F.substring(y, _COMPONENT_HEX_WIDTH, 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches / F.lit(float(_NUM_HASHES))


def dedup_bbit_minhash_audit(spark, sf_dir):
    """Per LSH-candidate pair: full-signature Jaccard estimate, b=4-bit
    bias-corrected estimate, exact 3-gram Jaccard, and both absolute
    errors.  Output: (id_a, id_b, est_full, est_b4, jaccard_exact,
    err_full, err_b4)."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, band_size=4, shingle_k=3
    )
    sigs = minhash_signatures(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, shingle_k=3
    )
    toked = fan_out(d).select("doc_id", tokens_col(F.col("text")).alias("_tk"))
    grams = toked.select(
        "doc_id",
        F.array_distinct(shingles_from_tokens(F.col("_tk"), 3)).alias("g"),
    )
    joined = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("_sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("_sb")),
            "id_b",
        )
        .join(
            grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("_ga")),
            "id_a",
        )
        .join(
            grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("_gb")),
            "id_b",
        )
    )
    a4 = _bbit_agreement(F.col("_sa"), F.col("_sb"))
    est_b4 = (a4 - F.lit(_B_COLLISION)) / F.lit(1.0 - _B_COLLISION)
    inter = F.size(F.array_intersect("_ga", "_gb"))
    exact = inter / (F.size("_ga") + F.size("_gb") - inter)
    return joined.select(
        "id_a",
        "id_b",
        F.round("jaccard_est", 6).alias("est_full"),
        F.round(est_b4, 6).alias("est_b4"),
        F.round(exact, 6).alias("jaccard_exact"),
        F.round(F.abs(F.col("jaccard_est") - exact), 6).alias("err_full"),
        F.round(F.abs(est_b4 - exact), 6).alias("err_b4"),
    )


# The oracle reuses textq's single-source banding CTE chain (sigs +
# banded), so a band-size retune cannot desynchronize this audit from
# the LSH family it audits.
from rick_and_morty_data_pipeline_project_spark.queries.textq import (  # noqa: E402
    _BANDED_CTE_SQL,
)

BBIT_AUDIT_SQL = f"""
WITH {_BANDED_CTE_SQL},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_filter(generate_series(1, {_NUM_HASHES}),
                         i -> a.sig[i] = b.sig[i])) / {_NUM_HASHES} AS est_full,
         (len(list_filter(generate_series(1, {_NUM_HASHES}),
                          i -> substr(a.sig[i], {_COMPONENT_HEX_WIDTH}, 1)
                             = substr(b.sig[i], {_COMPONENT_HEX_WIDTH}, 1)))
            / {_NUM_HASHES}.0 - {_B_COLLISION!r}) / {1.0 - _B_COLLISION!r}
           AS est_b4
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
),
grams AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [array_to_string(toks, ' ')]
           END) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
SELECT p.id_a, p.id_b,
       round(p.est_full, 6) AS est_full,
       round(p.est_b4, 6) AS est_b4,
       round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
             / (len(ga.g) + len(gb.g)
                - len(list_filter(ga.g, x -> list_contains(gb.g, x)))), 6)
         AS jaccard_exact,
       round(abs(p.est_full
             - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
               / (len(ga.g) + len(gb.g)
                  - len(list_filter(ga.g, x -> list_contains(gb.g, x))))), 6)
         AS err_full,
       round(abs(p.est_b4
             - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
               / (len(ga.g) + len(gb.g)
                  - len(list_filter(ga.g, x -> list_contains(gb.g, x))))), 6)
         AS err_b4
FROM pairs p
JOIN grams ga ON ga.doc_id = p.id_a
JOIN grams gb ON gb.doc_id = p.id_b
"""


QUERIES = {
    "dedup_bbit_minhash_audit": Q(
        dedup_bbit_minhash_audit,
        BBIT_AUDIT_SQL,
        "b-bit MinHash (b=4) bias-corrected estimates vs full sketch vs exact",
    ),
}
