"""The complete named-query catalog exported through __spark_entry__.py.

Each entry is an operator-family exemplar from SURVEY.md §2 (plus the
§2.10 training-data-pipeline extensions).  Entries with ``sql`` set are
fully hash-verified against DuckDB by the driver; ``sql=None`` entries
(sequential greedy matching, LSH with engine-side constants, sketches)
get the rows-only check and are covered by Python oracles in tests/.

Ordering contract: the verification driver compares the FIRST 50
exported queries against their oracles.  ``DRIVER_WINDOW`` pins those
50 slots explicitly so that every §2.10 operator family (text analysis,
dedup, similarity search, multimodal, flagship) plus one exemplar per
classic operator family holds a hash-verified correctness row.  Every
remaining query stays exported (positions 51+) and is still cell-exact
verified locally by tests/test_oracle_parity.py, which parametrizes the
WHOLE catalog, not just the window.
"""

from __future__ import annotations

from rick_and_morty_data_pipeline_project_spark.queries import (
    extraq,
    mmq,
    reference,
    textq,
    tpch,
    tpchf,
    tpchx,
    vecq,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q

_ALL: dict[str, Q] = {}
for mod in (tpch, tpchx, tpchf, textq, vecq, extraq, mmq, reference):
    for name, q in mod.QUERIES.items():
        assert name not in _ALL, f"duplicate query name: {name}"
        _ALL[name] = q

# The 50 driver-checked slots.  All must carry a full DuckDB oracle.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- §2.10 text analysis ------------------------------------------
    "text_emotion_scores",
    "text_token_stats",
    "text_top2_emotions",
    "text_quality_scores",
    "text_emotion_by_source",
    "text_filter_topk",
    "text_language_id",
    "text_rolling_fingerprint",
    # -- §2.10 deduplication ------------------------------------------
    "dedup_exact_stats",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # -- §2.10 similarity search / embeddings -------------------------
    "embedding_norms",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "embedding_label_centroids",
    # -- §2.10 multimodal + reference flagship ------------------------
    "multimodal_metadata_stats",
    "flagship_best_match_with_replacement",
    # EP-2 greedy matching: sequential MUT-1 semantics, hash-verified
    # against a recursive-CTE DuckDB oracle (reference.FLAGSHIP_EP2_SQL)
    "flagship_greedy_match",
    # -- operator exemplars without a round-1 correctness row ---------
    "join_asof_click_error",
    "sessionize_events",
    "subquery_scalar_exists",
    "scalar_regex_functions",
    "scalar_null_conditional",
    "pivot_event_type_by_day",
    "join_on_expression",
    "array_functions",
    "agg_macro_avg_rounded",
    # -- classic family exemplars (one per family) --------------------
    "q1_pricing_summary",
    "q2_scan_filter_project",
    # (q3_top_unshipped_orders moved past the window to make room for
    # flagship_greedy_match: its families stay covered — broadcast join
    # by q5, heap top-k by sort_limit/topk_two_stage — and its round-1
    # CORRECTNESS row stands)
    "q5_nation_volume",
    "q6_forecast_revenue",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_open_orders",
    "join_self_lineitem_pairs",
    "join_range_user_window",
    "agg_exact_distinct",
    "agg_rollup_region_nation",
    "agg_grouping_sets",
    "agg_percentiles",
    "win_rank_top_orders_per_customer",
    "win_range_frame",
    "sort_limit_top_orders",
    "topk_two_stage_parts",
    "set_ops_customers",
    "scalar_string_functions",
    "scalar_math_functions",
    "events_hourly_rollup",
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
