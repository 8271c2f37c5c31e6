"""String/text column expressions.

Covers the reference's scalar-function inventory (SURVEY.md §2.7
STR-1..STR-7) as reusable column expressions, plus the text-analysis
surface a large-scale training-data pipeline needs (token stats, quality
score, fingerprints, shingles, MinHash) — each designed to be exactly
reproducible in the DuckDB oracle (md5-based hashing, not engine-native
hash functions, so both engines agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Episode ids whose names keep their ':' (Scraper.py:227-229,295-297).
COLON_KEEP_IDS = (19, 25, 32, 35)


def normalize_name_col(name: Column, id_col: Column | None = None) -> Column:
    """The reference's episode-name → wiki-URL-slug normalization:
    strip ',' always; strip ':' unless id ∈ {19,25,32,35}; split on
    whitespace and re-join with '_' (Scraper.py:227-231, STR-4/STR-5)."""
    no_comma = F.regexp_replace(name, ",", "")
    if id_col is not None:
        stripped = F.when(
            id_col.isin(*COLON_KEEP_IDS), no_comma
        ).otherwise(F.regexp_replace(no_comma, ":", ""))
    else:
        stripped = F.regexp_replace(no_comma, ":", "")
    return F.concat_ws("_", F.split(F.trim(stripped), "\\s+"))


def wiki_url_col(name: Column, id_col: Column | None = None) -> Column:
    """f-string URL templating (STR-7, Scraper.py:219,334)."""
    return F.concat(
        F.lit("https://rickandmorty.fandom.com/wiki/"),
        normalize_name_col(name, id_col),
    )


def capitalize_col(c: Column) -> Column:
    """Python ``str.capitalize`` (Scraper.py:405 STR-2) — first char upper,
    rest lower. (Not ``initcap``: that uppercases every word.)"""
    return F.concat(
        F.upper(F.substring(c, 1, 1)), F.lower(c.substr(F.lit(2), F.length(c)))
    )


def token_count_col(text: Column) -> Column:
    return F.size(F.split(text, "\\s+"))


def stopword_ratio_col(text: Column, stopwords: list[str] = ("the", "a")) -> Column:
    toks = F.split(text, " ")
    sw = list(stopwords)
    return F.size(F.filter(toks, lambda t: t.isin(sw))) / F.size(toks)


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length/stopword/uniqueness heuristics for document quality filtering."""
    toks = F.split(text, " ")
    n = F.size(toks)
    return {
        "n_tokens": n,
        "n_chars2": F.length(text),
        "avg_token_len": (F.length(text) - (n - F.lit(1))) / n,
        "stopword_ratio": stopword_ratio_col(text),
        "distinct_ratio": F.size(F.array_distinct(toks)) / n,
    }


def fingerprint_col(text: Column) -> Column:
    """Exact-dup document fingerprint: md5 of whitespace-collapsed,
    lower-cased text. md5 is identical across Spark and DuckDB, so the
    oracle reproduces it exactly."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), "\\s+", " ")))


def shingles_col(text: Column, k: int = 3) -> Column:
    """Token k-gram shingles (array<string>); empty-safe for short docs."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(n >= k, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_col(shingles: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of md5(shingle || ':' || seed).

    md5-based so the DuckDB oracle computes the identical signature —
    engine-native hashes (xxhash64 vs duckdb hash) would diverge."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(f":{seed}"))))
    )


def minhash_signature_col(text: Column, num_hashes: int = 8, k: int = 3) -> Column:
    """array<string> MinHash signature of token-k-gram shingles."""
    sh = F.array_distinct(shingles_col(text, k))
    return F.array(*[minhash_col(sh, i) for i in range(num_hashes)])
