"""Corpus retrieval queries: Okapi BM25 over a distributed inverted
index.

The retrieval primitive every RAG / training-data pipeline ends up
needing: score documents against keyword queries without ever
materializing a dense |docs| × |terms| matrix.  The layout is the same
posting-list shape as the set-similarity joins in
``operators/dedup.py`` — explode tokens, filter to the (tiny) query
vocabulary BEFORE any shuffle, aggregate per (doc, term) — so the
shuffled data is proportional to query-term postings, not the corpus.
At 100 TB the corpus scan is the only full pass; everything after the
early term filter is a few thousand rows per query term.

Float parity with the DuckDB oracle follows the TFIDF pattern
(``textq.py``): each per-term BM25 contribution is computed with an
op-for-op identical double expression in both engines, rounded to 6
decimals, cast to DECIMAL(18,6), and summed EXACTLY — the per-doc score
is therefore order-insensitive and bitwise identical, so ORDER BY
(score, doc_id) tiebreaks identically too.

Reference parity note: the reference engine (Scraper.py) has no
retrieval surface at all — this family is part of the §2.10
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rick_and_morty_data_pipeline_project_spark.functions.textfns import tokens_col
from rick_and_morty_data_pipeline_project_spark.queries._util import Q, t

# Okapi BM25 constants (the standard Robertson defaults), written as the
# PRE-FOLDED literals (k1+1 = 2.2, 1−b = 0.25) so the Spark expression
# tree and the oracle SQL run the exact same float ops in the same
# order — see the module docstring.
_K1 = 1.2          # term-frequency saturation
_K1_PLUS_1 = 2.2
_B = 0.75          # length normalization strength
_ONE_MINUS_B = 0.25

# The fixed single-query term set (disjunctive keyword query).  Terms
# chosen from the synthetic corpus vocabulary with distinct document
# frequencies so scores separate on idf as well as tf/length.
BM25_TERMS = ("spark", "vector", "merge")
BM25_TOPK = 20

# The batched multi-query workload: (query_id, term) pairs.  This is
# the realistic serving shape — N queries scored in ONE corpus pass,
# per-query top-k via a rank window (WindowGroupLimit), instead of N
# sequential scans.
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("spark", "vector", "merge")),
    (2, ("hash", "join")),
    (3, ("window", "stream", "sort", "batch")),
)
BM25_PER_QUERY_K = 10

_ALL_QUERY_TERMS = tuple(
    sorted({term for _, terms in BM25_QUERIES for term in terms})
)


def _term_postings(docs, id_col: str, text_col: str, terms: tuple[str, ...]):
    """(id, term, tf, dl) for query-vocabulary terms only.

    The term filter sits BETWEEN the explode and the first shuffle, so
    only query-term postings are ever exchanged — the 100 TB-critical
    property.  ``dl`` (the full document token length) is projected
    BEFORE the explode and carried through the aggregate (min() of a
    per-doc constant), which avoids a second corpus pass or a join
    back to a lengths relation."""
    toked = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_tk")
    ).select(
        id_col,
        F.size("_tk").alias("dl"),
        F.explode("_tk").alias("term"),
    )
    hits = toked.filter(F.col("term").isin(*terms))
    return hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl")
    )


def _corpus_stats(docs, text_col: str):
    """One-row (n_docs, avgdl) relation; broadcast into the scoring
    join.  avgdl is derived as double(sum_dl)/n_docs — one float op,
    written identically in the oracle."""
    return (
        docs.select(F.size(tokens_col(F.col(text_col))).alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
        .select(
            "n_docs",
            (F.col("sum_dl").cast("double") / F.col("n_docs")).alias(
                "avgdl"
            ),
        )
    )


def bm25_scores(docs, id_col: str, text_col: str, terms: tuple[str, ...]):
    """Reusable BM25 core over ANY document DataFrame: (id, bm25) for
    every document matching ≥1 query term.  Single posting pass (df
    via count window over the postings, never a second corpus scan),
    narrow stats pass, exact-decimal contribution sum — the scores are
    order-insensitive and engine-portable.  Property-tested against a
    pure-Python reference in tests/test_property.py."""
    tf = _term_postings(docs, id_col, text_col, terms)
    stats = _corpus_stats(docs, text_col)
    w_term = Window.partitionBy("term")
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(_bm25_contrib()).cast("double").alias("bm25"))
    )


def _bm25_contrib():
    """Per-(doc, term) BM25 contribution, rounded and decimal-cast for
    exact order-insensitive summation.  Expects columns tf, dl, df,
    n_docs, avgdl in scope.  Expression structure mirrors the oracle
    SQL token for token."""
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * F.lit(_K1_PLUS_1)) / (
        F.col("tf")
        + F.lit(_K1)
        * (
            F.lit(_ONE_MINUS_B)
            + F.lit(_B) * (F.col("dl") / F.col("avgdl"))
        )
    )
    return F.round(idf * tfc, 6).cast("decimal(18,6)")


# --------------------------------------------------------------------------
def text_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k retrieval for one fixed disjunctive keyword
    query (``BM25_TERMS``).

    Plan shape: one posting pass (tokenize/explode → EARLY term filter,
    so only query-term postings shuffle → per-(doc, term) tf agg), df
    as a COUNT WINDOW over that same postings relation (partition by
    term — a separate ``dfreq`` aggregate would re-run the posting
    pipeline and re-scan the corpus for its branch: measured 3 parquet
    scans vs 2), one narrow stats scan (no explode), broadcast 1-row
    stats in, per-doc exact-decimal sum, and the global top-k as a
    single ``TakeOrderedAndProject`` (no full sort is ever
    materialized).  Everything after the term filter is O(matching
    postings)."""
    scored = bm25_scores(
        t(spark, sf_dir, "documents"), "doc_id", "text", BM25_TERMS
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_TOPK)


BM25_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM toks
  WHERE term IN {BM25_TERMS!r}
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
           AS avgdl
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(sum(CAST(round(
           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {_K1_PLUS_1}) / (tf + {_K1} * ({_ONE_MINUS_B} + {_B} * (dl / avgdl)))
         , 6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, bm25 FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
"""


# --------------------------------------------------------------------------
def text_bm25_multiquery(spark, sf_dir):
    """Batched BM25: all ``BM25_QUERIES`` scored in ONE corpus pass,
    per-query top-``BM25_PER_QUERY_K`` via a rank window.

    The union of all query vocabularies drives the single early term
    filter; the (query_id, term) mapping is a literal in-memory
    relation broadcast into the postings (queries are always the tiny
    side).  df is per TERM over the whole corpus — shared between
    queries that reuse a term — and computed as a count window over
    the already-filtered postings (same single-posting-pass rationale
    as ``text_bm25_topk``), not a second scan.  The per-query rank is
    ``row_number`` over (bm25 DESC, doc_id), executed as
    WindowGroupLimit: each shuffle partition keeps only its local
    top-k before the final per-query merge."""
    d = t(spark, sf_dir, "documents")
    tf = _term_postings(d, "doc_id", "text", _ALL_QUERY_TERMS)
    qterms = spark.createDataFrame(
        [(qid, term) for qid, terms in BM25_QUERIES for term in terms],
        "query_id int, term string",
    )
    stats = _corpus_stats(d, "text")
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(_bm25_contrib()).cast("double").alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_PER_QUERY_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


_QTERM_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, terms in BM25_QUERIES for term in terms
)

BM25_MULTIQUERY_SQL = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM toks
  WHERE term IN {_ALL_QUERY_TERMS!r}
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qterms(query_id, term) AS (VALUES {_QTERM_VALUES}),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
           AS avgdl
  FROM documents
),
scored AS (
  SELECT query_id, doc_id,
         CAST(sum(CAST(round(
           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {_K1_PLUS_1}) / (tf + {_K1} * ({_ONE_MINUS_B} + {_B} * (dl / avgdl)))
         , 6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM tf
  JOIN qterms USING (term)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, bm25,
         row_number() OVER (
           PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, bm25
FROM ranked WHERE rank <= {BM25_PER_QUERY_K}
"""


# --------------------------------------------------------------------------
# Exact phrase search (positional matching).  Every phrase is evaluated
# against the SAME materialized token array in one narrow pass — no
# explode, no shuffle, no per-phrase rescan.  At 100 TB this is the
# shape that matters: phrase matching is embarrassingly parallel over
# documents, so the only cost is the corpus scan the query already
# pays; an exchange anywhere in this plan would be a bug (pinned in
# tests/test_plans.py).
_PHRASES: tuple[tuple[str, ...], ...] = (
    ("hash", "join"),
    ("fast", "sort"),
    ("key", "scan"),
)


def _phrase_hits(tk, n, phrase: tuple[str, ...]):
    """Occurrence count of ``phrase`` (consecutive tokens) in token
    array ``tk`` of length ``n``.  Guarded with when(n >= L): Spark's
    ``sequence(1, 0)`` steps DOWNWARD to [1, 0] rather than producing
    an empty array, so short docs must short-circuit to 0 (DuckDB's
    generate_series is empty there — the oracle has the same guard for
    structure parity)."""
    L = len(phrase)

    def at(p, i, term):
        return F.element_at(tk, (p + F.lit(i)).cast("int")) == F.lit(term)

    def match(p):
        cond = at(p, 0, phrase[0])
        for i, term in enumerate(phrase[1:], start=1):
            cond = cond & at(p, i, term)
        return cond

    starts = F.sequence(F.lit(1), (n - F.lit(L - 1)).cast("int"))
    return F.when(
        n >= L, F.size(F.filter(starts, match))
    ).otherwise(F.lit(0))


def text_phrase_search(spark, sf_dir):
    """Exact multi-phrase search: for each phrase in ``_PHRASES``,
    every document containing it with its occurrence count.

    The token array is materialized ONCE as a projection alias and
    referenced by all phrases (the winnowing lesson: arrays referenced
    inside lambdas inline per reference — staging it keeps the regexp
    split to one evaluation).  The wide→long pivot is a ``stack``
    Generate, still narrow.  Zero exchanges end to end."""
    d = t(spark, sf_dir, "documents")
    staged = d.select("doc_id", tokens_col(F.col("text")).alias("_tk"))
    n = F.size(F.col("_tk"))
    hits = staged.select(
        "doc_id",
        *[
            _phrase_hits(F.col("_tk"), n, ph).alias(f"_h{i}")
            for i, ph in enumerate(_PHRASES)
        ],
    )
    stack_args = ", ".join(
        f"'{' '.join(ph)}', _h{i}" for i, ph in enumerate(_PHRASES)
    )
    return hits.selectExpr(
        "doc_id",
        f"stack({len(_PHRASES)}, {stack_args}) AS (phrase, n_hits)",
    ).filter(F.col("n_hits") > 0).select("phrase", "doc_id", "n_hits")


def _phrase_hits_sql(phrase: tuple[str, ...]) -> str:
    L = len(phrase)
    cond = " AND ".join(
        f"tk[p+{i}] = '{term}'" for i, term in enumerate(phrase)
    )
    return (
        f"CASE WHEN len(tk) >= {L} THEN len(list_filter("
        f"generate_series(1, len(tk)-{L - 1}), p -> {cond})) ELSE 0 END"
    )


_PHRASE_ARMS = "\n  UNION ALL ".join(
    f"SELECT doc_id, '{' '.join(ph)}' AS phrase, _h{i} AS n_hits FROM hits"
    for i, ph in enumerate(_PHRASES)
)

_PHRASE_HIT_COLS = ",\n         ".join(
    f"{_phrase_hits_sql(ph)} AS _h{i}" for i, ph in enumerate(_PHRASES)
)

PHRASE_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
hits AS (
  SELECT doc_id,
         {_PHRASE_HIT_COLS}
  FROM toks
),
long AS (
  {_PHRASE_ARMS}
)
SELECT phrase, doc_id, n_hits FROM long WHERE n_hits > 0
"""


# --------------------------------------------------------------------------
_SNIPPET_RADIUS = 4


def text_bm25_snippets(spark, sf_dir):
    """Serving-side snippet extraction for the BM25 top-k: each hit
    document with a ±``_SNIPPET_RADIUS``-token window around the FIRST
    occurrence of any query term — the retrieve → rank → snippet tail
    of a search/RAG pipeline.

    The 20-row top-k relation broadcasts back onto the corpus scan
    (never the other way), and the snippet itself is pure narrow array
    work on the staged token array: first-match position via a filtered
    index sequence, then one slice — no explode, no extra shuffle.  A
    top-k document always contains ≥1 query term (idf of the +1-form is
    strictly positive), so the position list is never empty."""
    topk = text_bm25_topk(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    staged = d.join(F.broadcast(topk), "doc_id").select(
        "doc_id", "bm25", tokens_col(F.col("text")).alias("_tk")
    )
    tk = F.col("_tk")
    n = F.size(tk)
    positions = F.filter(
        F.sequence(F.lit(1), n),
        lambda p: F.element_at(tk, p.cast("int")).isin(*BM25_TERMS),
    )
    first = F.element_at(positions, 1)
    start = F.greatest(first - _SNIPPET_RADIUS, F.lit(1))
    end = F.least(first + _SNIPPET_RADIUS, n)
    return staged.select(
        "doc_id",
        "bm25",
        F.concat_ws(
            " ", F.slice(tk, start, end - start + F.lit(1))
        ).alias("snippet"),
    )


BM25_SNIPPETS_SQL = f"""
WITH topk AS ({BM25_TOPK_SQL}),
staged AS (
  SELECT d.doc_id, topk.bm25, string_split(d.text, ' ') AS tk
  FROM documents d JOIN topk ON d.doc_id = topk.doc_id
),
pos AS (
  SELECT doc_id, bm25, tk,
         list_filter(generate_series(1, len(tk)),
                     p -> list_contains({list(BM25_TERMS)!r}, tk[p]))[1]
           AS first
  FROM staged
)
SELECT doc_id, bm25,
       array_to_string(
         list_slice(tk, greatest(first - {_SNIPPET_RADIUS}, 1),
                        least(first + {_SNIPPET_RADIUS}, len(tk))), ' ')
         AS snippet
FROM pos
"""


QUERIES: dict[str, Q] = {
    "text_bm25_topk": Q(text_bm25_topk, BM25_TOPK_SQL),
    "text_bm25_multiquery": Q(text_bm25_multiquery, BM25_MULTIQUERY_SQL),
    "text_bm25_snippets": Q(text_bm25_snippets, BM25_SNIPPETS_SQL),
    "text_phrase_search": Q(text_phrase_search, PHRASE_SEARCH_SQL),
}
