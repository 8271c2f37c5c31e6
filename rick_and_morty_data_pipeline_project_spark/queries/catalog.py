"""The complete named-query catalog exported through __spark_entry__.py.

Each entry is an operator-family exemplar from SURVEY.md §2 (plus the
§2.10 training-data-pipeline extensions).  Entries with ``sql`` set are
fully hash-verified against DuckDB by the driver; ``sql=None`` entries
(sequential greedy matching, LSH with engine-side constants, sketches)
get the rows-only check and are covered by Python oracles in tests/.

Ordering contract: the verification driver compares the FIRST 50
exported queries against their oracles.  ``DRIVER_WINDOW`` pins those
50 slots explicitly.  Rotation policy (round 3): rounds 1+2 earned
triple-green driver rows for 80 distinct queries — those families keep
their standing rows and rotate OUT; the window now holds the oracled
queries that had never seen a driver row (clusters, decontamination,
incremental dedup, sampling/packing, the analytics family, int8/LSH/
filtered kNN, multimodal dims/frames, simhash pairing incl. the new
64-bit variant) plus ``flagship_greedy_match`` as the §2.10-flagship
exemplar (every §2.10 family keeps ≥1 in-window exemplar — most
rotated-in queries ARE §2.10 operators).  Five never-checked queries
with green in-window siblings are deferred to the round-4 rotation:
``pipeline_filter_funnel``, ``text_pack_buckets``,
``text_quality_normalized``, ``events_sliding_rollup``,
``events_gap_fill`` — joined by the queries added after this round's
window froze: ``dedup_incremental_bloom``, ``dedup_span_profile``,
``view_click_attribution``, ``scalar_bit_interleave``,
``text_shard_index``, ``text_char_entropy``, ``dedup_ngram_containment``,
``bpe_train_merges``, ``text_bpe_token_stats``, ``scd2_customer_segments``,
``text_bigram_logprob``, ``knn_recall_audit``,
``join_fuzzy_customer_names``, ``unpivot_emotion_scores``,
``events_user_trend``, ``text_keyness_by_source``,
``text_zipf_fit``, ``text_feature_hashing``,
``knn_label_agreement``, ``events_type_bigrams`` (fully oracled), and the rows-only ``sketch_hll_rollup``,
``sketch_cms_user_counts``, ``embedding_pca_project``,
``events_rolling_dau_hll``
(``tools/rotation_report.py`` prints the live rotation state).
Every query outside the window stays exported
(positions 51+) and is still cell-exact verified locally by
tests/test_oracle_parity.py, which parametrizes the WHOLE catalog.
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
# Round-3 rotation: every slot except flagship_greedy_match is a query
# with NO prior CORRECTNESS row (r01+r02 covered 80 others; see module
# docstring for the policy and the 5 deferred names).
DRIVER_WINDOW: tuple[str, ...] = (
    # -- §2.10 dedup: clustering / representatives --------------------
    "dedup_minhash_clusters",
    "dedup_semantic_clusters",
    "dedup_cluster_representatives",
    # -- §2.10 dedup: simhash pairing (16-bit + new 64-bit) -----------
    "dedup_simhash_pairs",
    "dedup_simhash64_pairs",
    # -- §2.10 dedup: incremental ingest + audit ----------------------
    "dedup_incremental_batch",
    "dedup_incremental_prefilter",
    "dedup_incremental_lsh",
    "dedup_minhash_estimate_audit",
    "dedup_source_matrix",
    # -- §2.10 decontamination ----------------------------------------
    "decontaminate_ngram_overlap",
    "decontaminate_embedding_overlap",
    # -- §2.10 similarity search / embeddings -------------------------
    "knn_cosine_filtered",
    "knn_cosine_lsh",
    "knn_cosine_int8",
    "embedding_quantize_error",
    "knn_degree_stats",
    # -- §2.10 text analysis ------------------------------------------
    "text_vocab_df",
    "text_tfidf_topterms",
    "text_pmi_collocations",
    "text_unigram_logprob",
    "text_repetition_signals",
    "text_language_confidence",
    "text_redact_patterns",
    "text_quantile_filter",
    # -- §2.10 sampling / packing / chunking --------------------------
    "sample_hash_deterministic",
    "sample_mixture_weights",
    "sample_stratified_topk",
    "sample_weighted_topk",
    "text_pack_materialize",
    "text_chunk_overlap",
    # -- §2.10 multimodal ---------------------------------------------
    "multimodal_resize_dims",
    "multimodal_frame_samples",
    # -- §2.10 flagship exemplar (keeps the family in-window; EP-2
    #    sequential MUT-1 semantics vs recursive-CTE DuckDB oracle) ---
    "flagship_greedy_match",
    # -- analytics family (no prior row) ------------------------------
    "events_zscore_outliers",
    "customer_rfm_segments",
    "events_funnel_steps",
    "events_funnel_summary",
    "events_retention_cohorts",
    "basket_part_affinity",
    "graph_pagerank3",
    "profile_orders_quality",
    "events_value_histogram",
    "events_sliding_uniques",
    "events_key_skew_report",
    "orders_monthly_growth",
    "events_hourly_percentiles",
    "events_rolling_dau",
    # -- remaining never-checked operator exemplars -------------------
    "scalar_try_functions",
    "join_salted_user_events",
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
