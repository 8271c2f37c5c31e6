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

The rule-2 ledger is EXECUTABLE — ``python tools/rotation_report.py``
diffs per-query implementation fingerprints against the manifest
frozen at the current window (``tools/query_fingerprints.json``) and
prints which queries' code changed after the freeze plus which oracled
queries have no driver row yet.  Each round's window is built from
that output (never-checked first, then fingerprint-stale re-greens,
then oldest-green refreshes), then re-frozen with
``--update-fingerprints``; ``--assert-no-debt`` gates the round close
on "no oracled query born before this round lacks a green row".

Round-6 window (this file's ``DRIVER_WINDOW``): the 15 r5-born
never-checked queries + 6 r6-born entries (5 audits — HLL accuracy/
merge-invariance, rolling-DAU envelope, JPEG pixel-decode, CMS
one-sided band, approx-distinct/percentile rank-error — plus the
cross-document exact-substring dedup treatment
``dedup_remove_duplicate_spans``) + 13 late-r6-born never-checked
entries (BM25 top-k, batched multi-query BM25, multi-phrase search,
compaction planner, BM25 snippet extraction, hybrid RRF fusion,
two-stage BM25→cosine rerank, PRF query expansion, per-user EWMA,
Pareto skyline, referential-integrity audit, correlation matrix,
snapshot diff, plus the real ISO-BMFF container audit
multimodal_mp4_boxes — rule 1 displaces fourteen
r01 refreshes incl. win_first_last_nth and q17 to r07) + flagship + 12
rule-2 stale re-greens (this
round's bpe/profile/multimodal edits plus the fingerprint expansion
to dict/list module constants; two more stale entries —
profile_table_files_fast and flagship_greedy_match — are already
counted in the never-checked/flagship slots) + 12 of the 24 queries
whose only green row dates to round 1 (TPC-H classics +
the remaining r01 refreshes — q7, q8, q10, q11, q12, q13, q14,
q15, q16, q18, q19, q20, q21, q22, agg_cube_flag_status,
win_first_last_nth, win_lag_order_gap, win_moving_avg,
win_ntile_rank_stats, win_running_total and friends — go to r07).
15+6+14+1+12+2 = 50.  (Continuation amendment: the final two slots —
the q4/q9 oldest-green refreshes — were re-assigned to the
rule-2-stale tfidf pair after its dense-dispatch rewrite; rule 2
outranks an r01 refresh whose code never changed.  q4/q9 move to the
r07 refresh pool.)

Round-6 continuation (post-freeze): 17 more oracled queries were born
after this window froze (range-partition planner, zorder layout, MV
refresh, profile drift, triangle census, k-core peel, k-anonymity,
CHECK-constraint suite, chi-square, Kaplan-Meier, A/B z-test,
key-gap + Benford audits, LSH recall audit, VARIANT functions, BPE
encode, HHI).  The two rule-2-stale tfidf queries were amended INTO
this window (above); the 17 births are rule-1 mandatory for the r07
freeze — ``python tools/rotation_report.py`` lists them, and its
``--assert-no-debt`` gate exempts exactly this class (born after the
last freeze ⇔ absent from the fingerprint manifest) while still
flagging anything older that is red or unscheduled.
"""

from __future__ import annotations

from rick_and_morty_data_pipeline_project_spark.queries import (
    bpeq,
    extraq,
    lakeq,
    mmq,
    reference,
    retrievalq,
    sketchq,
    textq,
    tpch,
    tpchf,
    tpchx,
    vecq,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q

_ALL: dict[str, Q] = {}
for mod in (
    tpch, tpchx, tpchf, textq, vecq, extraq, mmq, reference, sketchq, bpeq,
    retrievalq, lakeq,
):
    for name, q in mod.QUERIES.items():
        assert name not in _ALL, f"duplicate query name: {name}"
        _ALL[name] = q

# The 50 driver-checked slots.  All must carry a full DuckDB oracle.
# Round-6 rotation (standing policy in the module docstring):
# 15 never-checked (all r5-born-after-freeze) + 6 r6-born entries
# (5 audits — HLL accuracy/merge, rolling-DAU envelope, JPEG pixel
# decode, CMS band, approx rank error — + the exact-substring dedup
# treatment) + 13 late-r6-born never-checked (BM25 ×2, snippets,
# phrase search, compaction planner, hybrid RRF, two-stage rerank,
# PRF expansion, per-user EWMA, Pareto skyline, referential-integrity
# audit, correlation matrix, snapshot diff) + flagship + 12
# fingerprint-stale re-greens (rule 2: this round's bpe/profile/
# multimodal edits plus the fingerprint coverage expansion to
# dict/list module constants — lexicons and LANG_MARKERS now count)
# + 2 oldest-green refreshes (last driver row r01: TPC-H classics
# q4/q9; the remaining r01 queries incl.
# q7/q8/q10/q11/q12/q15/q17/q21/q22/win_first_last_nth go to r07).
# 15+6+14+1+12+2 = 50.
DRIVER_WINDOW: tuple[str, ...] = (
    # ========== 15 never-driver-checked oracled queries (r5-born) ====
    "text_quality_classifier",
    "dedup_incremental_bloom_sharded",
    "text_remove_boilerplate",
    "split_leakage_safe",
    "text_gopher_rules",
    "text_winnowing_fingerprints",
    "knn_hard_negatives",
    "knn_cosine_mmr",
    "knn_cosine_ivf_kmeans",
    "events_mad_outliers",
    "customer_abc_pareto",
    "profile_table_files",
    "profile_table_files_fast",
    "multimodal_jpeg_headers",
    "multimodal_decode_features",
    # ========== r6-born oracled audit twins (never-checked) ==========
    "sketch_hll_accuracy_audit",
    "events_rolling_dau_hll_audit",
    "multimodal_jpeg_decode_audit",
    "sketch_cms_accuracy_audit",
    "agg_approx_distinct_audit",
    "dedup_remove_duplicate_spans",
    # ========== flagship (standing, every round) =====================
    "flagship_greedy_match",
    # ========== rule-2 fingerprint-stale re-greens ===================
    "bpe_train_merges",
    "text_bpe_token_stats",
    "flagship_best_match_with_replacement",
    "text_emotion_scores",
    "text_filter_topk",
    "text_language_confidence",
    "text_language_id",
    "text_top2_emotions",
    "unpivot_emotion_scores",
    # multimodal.py changed this round (real-JPEG fixtures + decode) —
    # re-green the whole oracled multimodal family
    "multimodal_metadata_stats",
    "multimodal_resize_dims",
    "multimodal_frame_samples",
    # ========== r6-born retrieval + table-ops (never-checked; rule 1
    # displaces four of the r01 window-function refreshes to r07) =====
    "text_bm25_topk",
    "text_bm25_multiquery",
    "text_phrase_search",
    "profile_compaction_plan",
    "text_bm25_snippets",
    "text_hybrid_rrf",
    "text_rerank_two_stage",
    "text_prf_expansion",
    "events_ewma",
    "part_skyline_pareto",
    "audit_referential_integrity",
    "lineitem_corr_matrix",
    "snapshot_diff_orders",
    # ========== latest-r6-born never-checked (rule 1 displaces the
    # q17 refresh to r07): real ISO-BMFF container audit ==============
    "multimodal_mp4_boxes",
    # ========== rule-2 re-greens (continuation amendment) ============
    # The tfidf pair's implementation changed AFTER the r06 freeze
    # (dense-dispatch rewrite of the cosine join; topterms shares the
    # weighting helper), so their r05 green rows no longer certify the
    # shipped code.  Rule 2 outranks the two oldest-green r01 refreshes
    # that held these slots (q4/q9 — code untouched since r01, their
    # rows still valid; they go to r07), so the window was amended
    # before the r06 driver run.
    "text_tfidf_cosine_pairs",
    "text_tfidf_topterms",
)

# Round-5 window, retired 2026-08-14 (all 50 earned green rows in
# CORRECTNESS_r05.json; kept for the rotation ledger):
_R05_WINDOW: tuple[str, ...] = (
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

# Canonical-literal oracles (knn_cosine_ivf_kmeans, the PCA
# projection, ...) are fit from the sf0.01 testdata at import; on a
# machine without the testdata tree those entries degrade to rows-only.
# Keep the window all-oracled by swapping any degraded entry for an
# ever-green spare that still carries its oracle.
_SPARES = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_volume",
    "q6_forecast_revenue",
    "knn_cosine_bruteforce",
    "text_quality_scores",
    "knn_cosine_ivf",
    "topk_two_stage_parts",
]
_spares = [
    s
    for s in _SPARES
    if s not in DRIVER_WINDOW and _ALL[s].sql is not None
]
_degraded = [n for n in DRIVER_WINDOW if _ALL[n].sql is None]
if len(_degraded) > len(_spares):
    raise RuntimeError(
        f"{len(_degraded)} window entries degraded to rows-only "
        f"(missing testdata for canonical-literal oracles: {_degraded}) "
        f"but only {len(_spares)} oracled spares are available — "
        "cannot keep the driver window all-oracled"
    )
DRIVER_WINDOW = tuple(
    n if _ALL[n].sql is not None else _spares.pop(0) for n in DRIVER_WINDOW
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
