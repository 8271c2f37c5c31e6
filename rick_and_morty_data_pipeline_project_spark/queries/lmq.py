"""Kneser–Ney smoothed bigram language model with per-document
perplexity scoring — the CCNet-shape LM quality filter (Wenzek et al.,
LREC 2020 score documents by LM perplexity; Kneser & Ney, ICASSP 1995;
Chen & Goodman 1998 the standard formulation).

Interpolated KN with a single absolute discount D = 0.75 (exact
dyadic — 3/4 — so the subtraction is bit-identical in any IEEE-754
engine):

    P(w2|w1) = (c(w1,w2) − D)/c(w1·)  +  λ(w1) · P_cont(w2)
    λ(w1)    = D · N1+(w1,·) / c(w1·)
    P_cont(w2) = N1+(·,w2) / N1+(··)

where c(w1·) is the bigram-HISTORY count (Σ_w2 c(w1,w2)), N1+ are
distinct-continuation counts, and N1+(··) the number of distinct
bigram types.  Scoring the training corpus itself means every scored
bigram has c ≥ 1 > D, so no max(·,0) branch is needed (the oracle
replays the same arithmetic without it).

Everything is relational: two map-combinable exact-count aggregations
(bigram types with counts; that table re-aggregated three ways for
histories / left-continuations / type total), one broadcast scalar,
and a join of the document bigram stream against the model — the same
join topology as `text_bigram_logprob`, which the driver has verified
hash-green since r4.  At 100 TB: counts combine map-side on
high-cardinality keys; the model relation is |bigram types|, far
smaller than the token stream; the scoring join shuffles on the
bigram key once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    tokens_col,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q, t

_D = 0.75  # absolute discount, exact dyadic


def text_kneser_ney_score(spark, sf_dir):
    """Per-document mean interpolated-KN bigram log-probability and
    perplexity.  Docs with < 2 tokens have no bigrams and drop out
    (identically in the oracle).  Output: (doc_id, n_bigrams,
    avg_kn_logprob, perplexity)."""
    d = t(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col(F.col("text")).alias("t"))
    big = toked.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t")),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    hist = bc.groupBy("w1").agg(
        F.sum("c_ab").alias("c_hist"),
        F.count(F.lit(1)).alias("n_follow"),
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_precede"))
    types = bc.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
    )
    c_hist = F.col("c_hist").cast("double")
    p_kn = (F.col("c_ab") - F.lit(_D)) / c_hist + (
        F.lit(_D) * F.col("n_follow") / c_hist
    ) * (F.col("n_precede") / F.col("n_types"))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(F.log(p_kn)).alias("_lp"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("_lp"), 6).alias("avg_kn_logprob"),
        F.round(F.exp(-F.col("_lp")), 6).alias("perplexity"),
    )


KNESER_NEY_SQL = f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
big AS (
  SELECT doc_id, u.p[1] AS w1, u.p[2] AS w2
  FROM tk, LATERAL (
    SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
  ) u
),
bc AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2),
hist AS (
  SELECT w1, sum(c_ab) AS c_hist, count(*) AS n_follow
  FROM bc GROUP BY 1
),
cont AS (SELECT w2, count(*) AS n_precede FROM bc GROUP BY 1),
types AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc),
agg AS (
  SELECT big.doc_id,
         count(*) AS n_bigrams,
         avg(ln(
           (bc.c_ab - {_D!r}) / CAST(hist.c_hist AS DOUBLE)
           + ({_D!r} * hist.n_follow / CAST(hist.c_hist AS DOUBLE))
             * (cont.n_precede / types.n_types)
         )) AS lp
  FROM big
  JOIN bc USING (w1, w2)
  JOIN hist USING (w1)
  JOIN cont USING (w2)
  CROSS JOIN types
  GROUP BY 1
)
SELECT doc_id, n_bigrams,
       round(lp, 6) AS avg_kn_logprob,
       round(exp(-lp), 6) AS perplexity
FROM agg
"""


def text_turing_estimates(spark, sf_dir):
    """Turing frequency re-estimates over the unigram distribution
    (Good 1953; the Gale & Sampson 1995 presentation): for each
    observed frequency class r, the count-of-counts N_r and the
    Turing-adjusted frequency r* = (r+1)·N_{r+1}/N_r (0 where the
    successor class is empty — the gap SGT smoothing exists to fill,
    kept raw here so the estimator is exactly replayable), plus the
    Good-Turing unseen-probability mass N_1/N every LM backoff scheme
    allocates to novel events.

    Scale: two map-combinable count aggregations (token counts, then
    counts-of-counts); the class relation is |distinct frequencies| —
    tens of rows regardless of corpus size; the r → r+1 lookup is a
    self-join on that tiny relation.  Output: (r, n_r, r_star,
    unseen_mass)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens_col(F.col("text"))).alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    cc = counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_r"))
    nxt = cc.select(
        (F.col("c") - 1).alias("c"), F.col("n_r").alias("_n_next")
    )
    totals = counts.agg(
        F.sum("c").cast("long").alias("_n_total"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("_n1"),
    )
    out = (
        cc.join(nxt, "c", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("c").alias("r"),
            "n_r",
            F.round(
                (F.col("c") + 1).cast("double")
                * F.coalesce(F.col("_n_next"), F.lit(0)).cast("double")
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("_n1").cast("double") / F.col("_n_total").cast("double"),
                6,
            ).alias("unseen_mass"),
        )
    )
    return out


TURING_SQL = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
counts AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
cc AS (SELECT c, count(*) AS n_r FROM counts GROUP BY 1),
totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM counts
)
SELECT cc.c AS r, cc.n_r,
       round(CAST(cc.c + 1 AS DOUBLE)
             * CAST(COALESCE(nxt.n_r, 0) AS DOUBLE)
             / CAST(cc.n_r AS DOUBLE), 6) AS r_star,
       round(CAST(t.n1 AS DOUBLE) / CAST(t.n_total AS DOUBLE), 6)
         AS unseen_mass
FROM cc
LEFT JOIN cc nxt ON nxt.c = cc.c + 1
CROSS JOIN totals t
"""


QUERIES = {
    "text_kneser_ney_score": Q(
        text_kneser_ney_score,
        KNESER_NEY_SQL,
        "interpolated Kneser-Ney bigram LM perplexity per document",
    ),
    "text_turing_estimates": Q(
        text_turing_estimates,
        TURING_SQL,
        "Good-Turing frequency re-estimates + unseen mass per class",
    ),
}
