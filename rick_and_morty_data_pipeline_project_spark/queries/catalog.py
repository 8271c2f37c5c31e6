"""The complete named-query catalog exported through __spark_entry__.py.

Each entry is an operator-family exemplar from SURVEY.md §2 (plus the
§2.10 training-data-pipeline extensions).  Entries with ``sql`` set are
fully hash-verified against DuckDB by the driver; ``sql=None`` entries
(sequential greedy matching, LSH with engine-side constants, sketches)
get the rows-only check and are covered by Python oracles in tests/.

Ordering contract: the verification driver compares the FIRST 50
exported queries against their oracles.  ``DRIVER_WINDOW`` pins those
50 slots explicitly.

Rotation policy (round 5, standing):

1. **Never-checked first.** Every oracled query that has never held a
   driver CORRECTNESS row is rotated in before anything else.  The
   round-5 window contains all 26 queries that were never-checked AS OF
   the window freeze (the list ``tools/rotation_report.py`` printed
   then).  Queries oracled later in round 5 (bloom-sharded, jpeg
   headers, classifier, boilerplate, split, gopher, file audit, the
   four rows-only promotions) necessarily have no r05 row — rule 1
   applies to them at the round-6 freeze, via the same report.
2. **Changed-file re-check rule.** Any query whose implementing file
   (operator module or query module) changed since the query's last
   green driver row MUST be rotated back in, even if it was green in a
   prior round — a standing row only certifies the code as it existed
   when the row was earned.  Round 5 touches ``operators/dedup.py``
   (Bloom relation-mode ceiling guard), ``operators/bpe.py``
   (incremental driver trainer) and ``operators/pca.py`` (oracled
   projection), so the window re-greens the dedup family exemplars and
   the BPE/PCA queries alongside the never-checked set.
3. **Flagship + classics.** ``flagship_greedy_match`` (EP-2 sequential
   MUT-1 semantics vs a recursive-CTE DuckDB oracle) stays in-window
   every round; remaining slots are filled with classic §2 exemplars
   (TPC-H pricing/join/top-K, window functions, text scoring) and the
   round's perf watch items (``knn_cosine_ivf`` regressed +19% in r04
   — re-measured AND re-verified here).

Every query outside the window stays exported (positions 51+) and is
still cell-exact verified locally by tests/test_oracle_parity.py,
which parametrizes the WHOLE catalog.

Pending round-6 rotation: the rule-2 ledger is now EXECUTABLE —
``python tools/rotation_report.py`` diffs per-query implementation
fingerprints against the manifest frozen at this window
(``tools/query_fingerprints.json``) and prints exactly which queries'
code changed after the freeze plus which new oracled queries have no
driver row.  Build the r06 window from that output (never-checked new
queries first, then fingerprint-stale re-greens), then re-freeze with
``--update-fingerprints``.
"""

from __future__ import annotations

from rick_and_morty_data_pipeline_project_spark.queries import (
    bpeq,
    extraq,
    mmq,
    reference,
    sketchq,
    textq,
    tpch,
    tpchf,
    tpchx,
    vecq,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q

_ALL: dict[str, Q] = {}
for mod in (tpch, tpchx, tpchf, textq, vecq, extraq, mmq, reference, sketchq, bpeq):
    for name, q in mod.QUERIES.items():
        assert name not in _ALL, f"duplicate query name: {name}"
        _ALL[name] = q

# The 50 driver-checked slots.  All must carry a full DuckDB oracle.
# Round-5 rotation (see module docstring for the standing policy):
# 26 never-checked queries + flagship + changed-file re-greens + classics.
DRIVER_WINDOW: tuple[str, ...] = (
    # ================= 26 never-driver-checked oracled queries ======
    # -- §2.10 text analysis (new families) --------------------------
    "text_char_entropy",
    "text_feature_hashing",
    "text_zipf_fit",
    "text_keyness_by_source",
    "text_bigram_logprob",
    "text_tfidf_cosine_pairs",
    "text_quality_normalized",
    "text_pack_buckets",
    "text_shard_index",
    "unpivot_emotion_scores",
    "pipeline_filter_funnel",
    # -- §2.10 dedup (containment / span / incremental Bloom) --------
    "dedup_ngram_containment",
    "dedup_span_profile",
    "dedup_incremental_bloom",
    # -- §2.10 similarity audits -------------------------------------
    "knn_recall_audit",
    "knn_label_agreement",
    # -- SCD2 / fuzzy join / analytics --------------------------------
    "scd2_customer_segments",
    "join_fuzzy_customer_names",
    "events_user_trend",
    "events_type_bigrams",
    "events_sliding_rollup",
    "events_gap_fill",
    "view_click_attribution",
    "scalar_bit_interleave",
    # -- §2.10 BPE training -------------------------------------------
    "bpe_train_merges",
    "text_bpe_token_stats",
    # ================= flagship (standing, every round) =============
    "flagship_greedy_match",
    # ================= changed-file re-greens (rule 2) ==============
    # operators/dedup.py changes this round -> re-green the family
    "dedup_incremental_batch",
    "dedup_incremental_prefilter",
    "dedup_incremental_lsh",
    "dedup_exact_stats",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_simhash64_pairs",
    "dedup_minhash_clusters",
    "dedup_cluster_representatives",
    # ================= classics + perf watch ========================
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_volume",
    "q6_forecast_revenue",
    "topk_two_stage_parts",
    "win_rank_top_orders_per_customer",
    "join_anti_customers_without_orders",
    "scalar_string_functions",
    "text_emotion_scores",
    "text_quality_scores",
    "knn_cosine_ivf",
    # promoted from rows-only this round: canonical-literal projection
    # oracle + in-query distributed-fit assert (operators/pca.py)
    "embedding_pca_project",
)

# The PCA oracle inlines canonical components fit from the sf0.01
# testdata at import; on a machine without the testdata tree the entry
# degrades to rows-only — keep the window all-oracled by swapping in a
# classic exemplar.
if _ALL["embedding_pca_project"].sql is None:
    DRIVER_WINDOW = tuple(
        "knn_cosine_bruteforce" if n == "embedding_pca_project" else n
        for n in DRIVER_WINDOW
    )

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)
assert len(set(DRIVER_WINDOW)) == 50, "duplicate name in DRIVER_WINDOW"
for _name in DRIVER_WINDOW:
    assert _name in _ALL, f"unknown query in DRIVER_WINDOW: {_name}"
    assert _ALL[_name].sql is not None, f"window entry lacks oracle: {_name}"

QUERIES: dict[str, Q] = {name: _ALL[name] for name in DRIVER_WINDOW}
for name, q in _ALL.items():
    if name not in QUERIES:
        QUERIES[name] = q


def queries_dict():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_dict():
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
