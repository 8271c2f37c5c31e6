"""BPE training semantics against a straight Python reference, plus the
greedy-overlap edge the replace-based merge must get right.  (Corpus
parity vs the unrolled-CTE DuckDB oracle is covered for both catalog
queries by tests/test_oracle_parity.py.)"""

from __future__ import annotations

from collections import Counter

from rick_and_morty_data_pipeline_project_spark.operators.bpe import (
    DELIM,
    symbols_col,
    train_bpe,
)


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: greedy left-to-right merge application,
    (count desc, left asc, right asc) tie-break."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, cnt in word_counts.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, c))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
        word_counts = dict(word_counts)
    return merges, segs


def test_train_matches_python_reference(spark):
    words = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "low": 7}
    df = spark.createDataFrame(
        list(words.items()), "word string, cnt long"
    )
    got, final = train_bpe(df, 5)
    want, segs = _py_bpe(words, 5)
    assert [(m.left, m.right, m.pair_weight) for m in got] == want
    from pyspark.sql import functions as F

    got_segs = {
        r["word"]: r["s"]
        for r in final.select("word", symbols_col("w").alias("s")).collect()
    }
    assert got_segs == segs


def test_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a) → ['aa','aa']; 'aaa' → ['aa','a'] — the
    non-overlapping left-to-right scan, not a re-entrant merge."""
    df = spark.createDataFrame(
        [("aaaa", 10), ("aaa", 1)], "word string, cnt long"
    )
    merges, final = train_bpe(df, 1)
    assert (merges[0].left, merges[0].right) == ("a", "a")
    # aaaa contributes 3 adjacent pairs × 10, aaa 2 × 1
    assert merges[0].pair_weight == 32
    got = {
        r["word"]: r["s"]
        for r in final.select(
            "word", symbols_col("w").alias("s")
        ).collect()
    }
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_merged_symbols_participate_in_later_merges(spark):
    df = spark.createDataFrame([("abab", 4)], "word string, cnt long")
    merges, final = train_bpe(df, 2)
    assert [(m.left, m.right) for m in merges] == [("a", "b"), ("ab", "ab")]
    row = final.select(symbols_col("w").alias("s")).collect()[0]
    assert row["s"] == ["abab"]
    assert DELIM not in "".join(row["s"])
