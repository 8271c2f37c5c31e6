"""Nonparametric statistics: Mann–Whitney U (rank-sum) and Theil–Sen
robust slope — the distribution-free complements to the parametric
battery (Welch t in ``stats_welch_t``, OLS slope in
``events_user_trend_slope``).

Exactness discipline (what makes both fully hash-verified):

* Mann–Whitney midranks are computed on the DECIMAL(12,2) value (the
  corpus value column is 2-decimal, so tie GROUPS are exact), and
  every rank quantity is a half-integer: cum-count + (c+1)/2.  The
  rank-sum R₁ is a float sum of exact half-integers bounded far below
  2⁵², so float addition is EXACT in any order — partial-aggregation
  order cannot move a bit.  Only the final z (divides + sqrt of the
  same exact doubles) is real float math, rounded to 6.
* Theil–Sen daily means divide an exact decimal sum by an exact
  count; pairwise slopes difference those identical doubles; the
  median is Spark's exact ``percentile`` ≡ DuckDB ``quantile_cont``
  (same p·(n−1) interpolation — engine-parity noted in the round-8
  verification addenda).

Scale: Mann–Whitney is two map-combinable aggregations plus one
value-keyed window per pair (the tie relation is |distinct values|,
not |rows|); Theil–Sen's pair stage is a user-keyed self-join bounded
by days² per user (≤ ~500 rows/user for a 31-day window), never a
global quadratic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.queries._util import Q, dec, t

_BASELINE = "view"


def events_mann_whitney(spark, sf_dir):
    """Mann–Whitney U of ``value`` for every event type against the
    '{baseline}' baseline, with midrank tie handling and the
    tie-corrected normal approximation.  Output per type:
    (event_type, n_treat, n_base, u_stat, z) — |z| > 1.96 rejects
    equal distributions at α = 0.05; on this uniform corpus z ≈ 0 is
    the A/A sanity check, exactly like ``events_ab_proportion_z``."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", dec("value", 12, 2).alias("_v")
    ).filter(F.col("_v").isNotNull())
    treat = ev.filter(F.col("event_type") != _BASELINE).select(
        F.col("event_type").alias("pair"),
        "_v",
        F.lit(1).alias("_t"),
        F.lit(0).alias("_b"),
    )
    pairs = (
        ev.filter(F.col("event_type") != _BASELINE)
        .select(F.col("event_type").alias("pair"))
        .distinct()
    )
    base = (
        ev.filter(F.col("event_type") == _BASELINE)
        .crossJoin(F.broadcast(pairs))
        .select("pair", "_v", F.lit(0).alias("_t"), F.lit(1).alias("_b"))
    )
    cnt = (
        treat.unionByName(base)
        .groupBy("pair", "_v")
        .agg(F.sum("_t").alias("nt"), F.sum("_b").alias("nb"))
    )
    w = (
        Window.partitionBy("pair")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = F.col("nt") + F.col("nb")
    ranked = cnt.select(
        "pair",
        "nt",
        c.alias("c"),
        F.coalesce(F.sum(F.col("nt") + F.col("nb")).over(w), F.lit(0)).alias(
            "cb"
        ),
    )
    midrank = F.col("cb") + (F.col("c") + F.lit(1)) / F.lit(2.0)
    agg = ranked.groupBy("pair").agg(
        F.sum("nt").cast("long").alias("n_treat"),
        (F.sum("c") - F.sum("nt")).cast("long").alias("n_base"),
        F.sum(F.col("nt").cast("double") * midrank).alias("_r1"),
        F.sum(
            F.col("c").cast("long") * F.col("c") * F.col("c") - F.col("c")
        ).cast("long").alias("_tsum"),
    )
    n1, n2 = F.col("n_treat"), F.col("n_base")
    u1 = F.col("_r1") - (n1 * (n1 + 1)).cast("double") / F.lit(2.0)
    mu = (n1 * n2).cast("double") / F.lit(2.0)
    sigma = F.sqrt(
        (n1 * n2).cast("double")
        / F.lit(12.0)
        * (
            (n1 + n2 + 1).cast("double")
            - F.col("_tsum").cast("double")
            / ((n1 + n2) * (n1 + n2 - 1)).cast("double")
        )
    )
    return agg.select(
        F.col("pair").alias("event_type"),
        "n_treat",
        "n_base",
        F.round(u1, 6).alias("u_stat"),
        F.round((u1 - mu) / sigma, 6).alias("z"),
    )


MANN_WHITNEY_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE value IS NOT NULL
),
pairs AS (SELECT DISTINCT event_type AS pair FROM ev
          WHERE event_type <> '{_BASELINE}'),
tagged AS (
  SELECT event_type AS pair, v, 1 AS t, 0 AS b FROM ev
  WHERE event_type <> '{_BASELINE}'
  UNION ALL
  SELECT p.pair, e.v, 0 AS t, 1 AS b
  FROM ev e CROSS JOIN pairs p WHERE e.event_type = '{_BASELINE}'
),
cnt AS (SELECT pair, v, SUM(t) AS nt, SUM(b) AS nb FROM tagged GROUP BY 1, 2),
ranked AS (
  SELECT pair, nt, nt + nb AS c,
         COALESCE(SUM(nt + nb) OVER (
           PARTITION BY pair ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM cnt
),
agg AS (
  SELECT pair,
         CAST(SUM(nt) AS BIGINT) AS n_treat,
         CAST(SUM(c) - SUM(nt) AS BIGINT) AS n_base,
         SUM(CAST(nt AS DOUBLE) * (cb + (c + 1) / 2.0)) AS r1,
         CAST(SUM(CAST(c AS BIGINT) * c * c - c) AS BIGINT) AS tsum
  FROM ranked GROUP BY 1
)
SELECT pair AS event_type, n_treat, n_base,
       round(r1 - CAST(n_treat * (n_treat + 1) AS DOUBLE) / 2.0, 6) AS u_stat,
       round((r1 - CAST(n_treat * (n_treat + 1) AS DOUBLE) / 2.0
              - CAST(n_treat * n_base AS DOUBLE) / 2.0)
             / sqrt(CAST(n_treat * n_base AS DOUBLE) / 12.0
                    * (CAST(n_treat + n_base + 1 AS DOUBLE)
                       - CAST(tsum AS DOUBLE)
                         / CAST((n_treat + n_base) * (n_treat + n_base - 1)
                                AS DOUBLE))), 6) AS z
FROM agg
"""


def events_theil_sen_slope(spark, sf_dir):
    """Per-user Theil–Sen slope of DAILY MEAN value over day number —
    the median of all pairwise slopes, robust to the outliers that
    swing the OLS twin (``events_user_trend_slope``): one wild day
    moves OLS by its leverage but shifts the slope median by at most
    one order statistic.  Output: (user_id, n_days, n_pairs,
    theil_sen_slope)."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("_d"),
        dec("value", 12, 2).alias("_y"),
    )
    daily = e.groupBy("user_id", "_d").agg(
        (F.sum("_y").cast("double") / F.count(F.lit(1))).alias("y"),
        F.datediff(F.first("_d"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    )
    a = daily.select(
        "user_id", F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        "user_id", F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    slopes = (
        a.join(b, "user_id")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            "user_id",
            (
                (F.col("yb") - F.col("ya"))
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("slope"),
        )
    )
    days = daily.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_days"))
    agg = slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile(F.col("slope"), F.lit(0.5)).alias("_med"),
    )
    return (
        agg.join(days, "user_id")
        .select(
            "user_id",
            "n_days",
            "n_pairs",
            F.round(F.col("_med"), 6).alias("theil_sen_slope"),
        )
    )


THEIL_SEN_SQL = """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(value AS DECIMAL(12,2)) AS yv
  FROM events
),
daily AS (
  SELECT user_id, d,
         CAST(SUM(yv) AS DOUBLE) / COUNT(*) AS y,
         datediff('day', DATE '1970-01-01', d) AS x
  FROM base GROUP BY user_id, d
),
slopes AS (
  SELECT a.user_id, (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.user_id = b.user_id AND a.x < b.x
),
days AS (SELECT user_id, COUNT(*) AS n_days FROM daily GROUP BY 1)
SELECT s.user_id, d.n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(s.slope, 0.5), 6) AS theil_sen_slope
FROM slopes s JOIN days d ON d.user_id = s.user_id
GROUP BY s.user_id, d.n_days
"""


def events_kendall_tau(spark, sf_dir):
    """Per-user Kendall τ-b between day number and daily mean value —
    the nonparametric monotone-trend test (no x-ties: days are
    distinct; y-ties corrected in the denominator).  Concordant /
    discordant / tied counts are exact integers over the bounded
    per-user pair relation (days² ≤ ~500 rows/user); τ divides at the
    very end.  Output: (user_id, n_days, concordant, discordant,
    tau_b) for users whose days aren't all value-tied."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("_d"),
        dec("value", 12, 2).alias("_y"),
    )
    daily = e.groupBy("user_id", "_d").agg(
        (F.sum("_y").cast("double") / F.count(F.lit(1))).alias("y"),
        F.datediff(F.first("_d"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    )
    a = daily.select("user_id", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select("user_id", F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, "user_id").filter(F.col("xa") < F.col("xb"))
    agg = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((F.col("yb") > F.col("ya")).cast("long")).alias("concordant"),
        F.sum((F.col("yb") < F.col("ya")).cast("long")).alias("discordant"),
        F.sum((F.col("yb") == F.col("ya")).cast("long")).alias("_ty"),
    )
    days = daily.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_days"))
    n0 = F.col("n0")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(
        n0.cast("double") * (n0 - F.col("_ty")).cast("double")
    )
    return (
        agg.filter(F.col("_ty") < n0)
        .join(days, "user_id")
        .select(
            "user_id",
            "n_days",
            "concordant",
            "discordant",
            F.round(tau, 6).alias("tau_b"),
        )
    )


KENDALL_SQL = """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(value AS DECIMAL(12,2)) AS yv
  FROM events
),
daily AS (
  SELECT user_id, d,
         CAST(SUM(yv) AS DOUBLE) / COUNT(*) AS y,
         datediff('day', DATE '1970-01-01', d) AS x
  FROM base GROUP BY user_id, d
),
agg AS (
  SELECT a.user_id,
         CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant,
         CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM daily a JOIN daily b
    ON a.user_id = b.user_id AND a.x < b.x
  GROUP BY 1
),
days AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days
         FROM daily GROUP BY 1)
SELECT g.user_id, d.n_days, g.concordant, g.discordant,
       round(CAST(g.concordant - g.discordant AS DOUBLE)
             / sqrt(CAST(g.n0 AS DOUBLE) * CAST(g.n0 - g.ty AS DOUBLE)), 6)
         AS tau_b
FROM agg g JOIN days d ON d.user_id = g.user_id
WHERE g.ty < g.n0
"""


def events_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of the corpus-wide
    daily value series (the moving-average method STL refines):
    trend = centered 7-day moving mean, seasonal = day-of-week mean of
    the detrended series (re-centered to sum to zero over the week so
    trend + seasonal + residual = y exactly), residual = remainder —
    the forecasting/monitoring primitive that complements the Holt and
    EWMA entries with an explicit seasonality split.

    Scale: one day-keyed aggregate (map-combinable exact decimal
    sums), then windows/joins over the |days| relation only — the raw
    stream is touched once.  Output: (d, y, trend, seasonal, residual)
    rounded to 6."""
    e = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("_d"), dec("value", 12, 2).alias("_y")
    )
    daily = e.groupBy("_d").agg(
        (F.sum("_y").cast("double") / F.count(F.lit(1))).alias("y")
    )
    w7 = (
        Window.orderBy("_d").rowsBetween(-3, 3)
    )
    detr = daily.select(
        "_d",
        "y",
        (F.col("y") - F.avg("y").over(w7)).alias("_detr"),
        F.avg("y").over(w7).alias("trend"),
        F.dayofweek("_d").alias("_dow"),
    )
    dow = detr.groupBy("_dow").agg(F.avg("_detr").alias("_s_raw"))
    center = dow.agg(
        (F.sum("_s_raw") / F.count(F.lit(1))).alias("_s_mean")
    )
    seas = dow.crossJoin(F.broadcast(center)).select(
        "_dow", (F.col("_s_raw") - F.col("_s_mean")).alias("_seasonal")
    )
    out = detr.join(seas, "_dow").select(
        F.date_format("_d", "yyyy-MM-dd").alias("d"),
        F.round("y", 6).alias("y"),
        F.round("trend", 6).alias("trend"),
        F.round("_seasonal", 6).alias("seasonal"),
        F.round(
            F.col("y") - F.col("trend") - F.col("_seasonal"), 6
        ).alias("residual"),
    )
    return out


SEASONAL_SQL = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, CAST(value AS DECIMAL(12,2)) AS yv
  FROM events
),
daily AS (
  SELECT d, CAST(SUM(yv) AS DOUBLE) / COUNT(*) AS y
  FROM base GROUP BY 1
),
detr AS (
  SELECT d, y,
         y - AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS detr,
         AVG(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend,
         dayofweek(d) + 1 AS dow
  FROM daily
),
dow AS (SELECT dow, AVG(detr) AS s_raw FROM detr GROUP BY 1),
center AS (SELECT SUM(s_raw) / COUNT(*) AS s_mean FROM dow),
seas AS (SELECT dow, s_raw - c.s_mean AS seasonal
         FROM dow CROSS JOIN center c)
SELECT strftime(dt.d, '%Y-%m-%d') AS d,
       round(dt.y, 6) AS y,
       round(dt.trend, 6) AS trend,
       round(s.seasonal, 6) AS seasonal,
       round(dt.y - dt.trend - s.seasonal, 6) AS residual
FROM detr dt JOIN seas s ON s.dow = dt.dow
"""


QUERIES = {
    "events_mann_whitney": Q(
        events_mann_whitney,
        MANN_WHITNEY_SQL,
        "Mann-Whitney U rank-sum vs the view baseline, tie-corrected z",
    ),
    "events_theil_sen_slope": Q(
        events_theil_sen_slope,
        THEIL_SEN_SQL,
        "per-user Theil-Sen robust slope (median of pairwise daily slopes)",
    ),
    "events_kendall_tau": Q(
        events_kendall_tau,
        KENDALL_SQL,
        "per-user Kendall tau-b monotone-trend test (y-tie corrected)",
    ),
    "events_seasonal_decompose": Q(
        events_seasonal_decompose,
        SEASONAL_SQL,
        "additive seasonal decomposition: 7-day trend + zero-sum dow seasonal",
    ),
}
