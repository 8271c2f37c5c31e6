"""Regenerate EXPLAIN.md: annotated formatted physical plans for the
headline queries, as evidence that each plan has the shape the 100 TB
design story claims (pushdown, broadcast, heap top-k, bounded windows).

Run: python tools/gen_explain.py   (writes /root/repo/EXPLAIN.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> what to look for in its plan (the claim being evidenced)
ANNOTATED = {
    "q2_scan_filter_project": "filters reach the parquet scan (PushedFilters) and the read schema is pruned to referenced columns",
    "q5_nation_volume": "dimension joins are BroadcastHashJoin; only the fact table shuffles",
    "topk_two_stage_parts": "TWO TakeOrderedAndProject stages (heap top-k), never a global sort",
    "dedup_ngram_jaccard": "inverted-index posting self-join (ShuffledHashJoin, ReusedExchange: the shingle pipeline computed once)",
    "knn_cosine_ivf": "centroid literals inlined (no training join), corpus cell-assignment narrow, probe side broadcast",
    "flagship_best_match_with_replacement": "per-emotion prefixes from one corpus pass; windows rank only bounded prefix rows",
    "events_zscore_outliers": "exactly one exchange (user_id hash partition) feeding a bounded ROWS window",
    "customer_rfm_segments": "no Window operator anywhere — quartile thresholds broadcast back as scalars",
    "graph_pagerank3": "three unrolled join+aggregate iterations in a single plan",
    "text_chunk_overlap": "narrow transform: one scan, no key shuffle, no join",
    "sample_weighted_topk": "weighted sampling: narrow priority expression, WindowGroupLimit heap pushdown on the group window",
    "basket_part_affinity": "pair space from the basket-key self-join (bounded by basket size), marginals broadcast back",
    "events_retention_cohorts": "user-keyed aggs + one join back; the matrix agg output is weeks², independent of event count",
    "dedup_simhash64_pairs": "64-bit simhash as two 32-bit halves; 4×16-bit band explode (narrow) → band-keyed ShuffledHashJoin (cost ∝ bucket collisions, never n²) → integer popcount verify",
    "dedup_incremental_bloom": "Bloom probe is a literal-bitmap scan predicate (no bitmap join); the one Join is the exact anti-join resolving all-bits candidates",
    "view_click_attribution": "equi-key (user) join with an event-time range residual — the batch plan of the watermarked stream-stream join; never a cross product",
    "text_shard_index": "packed-shard offset index: one shuffle on the shard key feeding a running-sum window — no Python, no join",
    "sketch_hll_rollup": "explicit-register HLL (r9): per-day (register, max ρ) relation built once and localCheckpoint-ed; per-day estimate and the TOTAL (element-wise register MAX merge) both read the checkpointed RDD — no second raw scan, no COUNT(DISTINCT), no engine-internal sketch state; exact int64 harmonic sums, the estimator DuckDB replays bit-exactly",
    "embedding_pca_project": "PCA projection: scan + literal-component dot products, ZERO exchanges (the fit's only shuffle carries the fixed d(d+1)/2-row moment aggregate)",
    "text_char_entropy": "character entropy: one narrow pass of JVM higher-order functions, no shuffle",
    "scd2_customer_segments": "SCD2: broadcast update join + unions over one dimension read — no repeated scans per branch family",
    "dedup_incremental_bloom_sharded": "sharded Bloom (m=2^43): distinct-fingerprint probes equi-join the SPARSE word relation — no dense bitmap row, no broadcast giant; verdicts join back per fingerprint; the one remaining exact join resolves all-bits candidates",
    "multimodal_jpeg_headers": "byte-level JPEG header walk: scan → fan_out balance of the narrow (id, md5) source (r14: the Python codec stage ran 1-way on the single-file scan; at cluster scale the balance is a no-op) → synthesize → filter → Arrow-batched MapInPandas — the binary column never shuffles, only 7-column metadata leaves the stage",
    "text_quality_classifier": "distilled linear classifier inference: one narrow scan, ZERO exchanges — features/sigmoid/verdict all JVM-side (higher-order-function lambdas sit outside codegen but never touch Python)",
    "text_remove_boilerplate": "C4-style span removal: span-count agg shuffle + per-doc rebuild shuffle (the count relation joins back broadcast locally; at scale it is a third span-keyed shuffle) — whole documents never shuffle",
    "text_gopher_rules": "Gopher rule battery: one narrow scan, zero exchanges, per-rule flags as codegen'd expressions",
    "text_winnowing_fingerprints": "winnowing: staged shingle-hash projection computed once per doc (multi-referenced alias), window explode narrow, the only exchange is the final distinct",
    "knn_hard_negatives": "hard-negative mining: both sides normalized once, broadcast queries x fan-out corpus scan, label filter fused before the per-query heap top-k",
    "join_fuzzy_customer_names": "FastSS fuzzy join: narrow deletion-variant explode → ONE high-cardinality equi-join (no hot blocks) → levenshtein verify on candidates only",
    "events_user_trend": "grouped OLS: six map-combinable decimal sums, one user_id shuffle, closed-form projection — no window, no iteration",
    "sketch_hll_accuracy_audit": "HLL audit: sketch + exact distinct built in the SAME day-keyed aggregate (one raw shuffle); TOTAL row re-aggregates |days| sketch states; the regrouped merge-invariance arm is a second day+type aggregate — all one-row frames cross-joined, never a raw rescan per check",
    "knn_cosine_pq": "PQ ADC (r9, batched): ONE scan of the checkpointed m-int codes relation scores ALL queries — broadcast LUT relation join + aggregate(zip_with(codes, lut)) fold, then the salted two-stage exact per-query top-k (stage-1 window partitioned by (query_id, _salt)); no Python in the scoring tree, no per-query scan branches",
    "knn_cosine_ivfpq": "IVFADC (r9, batched): the broadcast (query, cell, residual-LUT) relation's equi-join ON cell_id IS the probe — only rows in some query's probed cells are scored, in one scan of the index — then the salted two-stage per-query top-k",
    "orders_dense_row_ids": "dense row ids (r9): range repartition + in-partition sort + Arrow local-index pass + broadcast prefix-sum offsets — NO window operator anywhere (the oracle's row_number formulation is exactly what this plan must not contain)",
    "events_rolling_dau_hll": "rolling HLL DAU (r9, explicit registers): contribution explode carries ≤4096 register rows/day ×7 window ends; (win_day, register) MAX merge then the register estimator — shuffle independent of user cardinality, no raw-pair explode",
    "sketch_kmv_set_ops": "KMV set ops (r9): per-type sketches via the salted two-stage top-k; the only non-equi join is the |types|-squared pair enumeration (materialized once); every join touching the distinct relation or sketch rows is a broadcast HASH join — the OR-of-equalities nested-loop formulation is pinned out",
    "events_holt_forecast": "Holt smoothing (r9): map-combined daily aggregate, per-key ordered-list collect, one aggregate() fold — no window, no Python, no global sort; the sequential recursion lives in the fold, not a driver loop",
    "events_rolling_dau_hll_audit": "rolling-DAU audit: sketch arm shuffles 7×|days| fixed-size states (cardinality-independent); exact arm explodes the distinct pair set (audit-only); both meet on a |days|-row join",
    "multimodal_jpeg_decode_audit": "JPEG pixel-decode audit: synthesize and decode are Arrow-batched MapInPandas stages over the fan_out-balanced narrow source (r14); the pre-encode material check joins doc text back by id (broadcast at this SF; a co-partitioned self-join at scale — audit-only cost); the binary column never shuffles, only the 4-column verdict leaves the final stage",
    "sketch_cms_accuracy_audit": "CMS audit: one map-combinable count_min_sketch aggregate (fixed ~100 KB state), driver decode, Arrow-batched probe over the REDUCED distinct-item relation; N rides a one-row crossJoin — raw events scanned once per arm, never per item",
    "agg_approx_distinct_audit": "approx-agg audit: production aggregate (approx_count_distinct + percentile_approx + exact distinct in ONE groupBy) plus a broadcast join-back rank count — the percentile guarantee checked by counted ranks, one extra scan, audit-only",
    "events_hourly_percentiles_approx_audit": "grouped-percentile audit: production sketch aggregate per (hour, type) + ONE broadcast join-back rank count covering both p50 and p95 (3 bounded scans, never a per-quantile rescan); booleans pinned TRUE by the oracle",
    "join_interval_bucketized": "keyless interval join: both sides mapped to 7-day bucket indexes (intervals explode to <=4 buckets, points to one), BroadcastHashJoin on the bucket key with the BETWEEN as residual filter; the only BNLJ is the one-row bounds crossJoin — never |orders|x|promos|",
    "dedup_jaccard_prefix_join": "exact global Jaccard >= 0.8: rare-first prefix index probed by full postings (shuffle_hash on the shingle key), length filter inside the join, decimal-free integer-exact verify — candidates proportional to prefix collisions, posting relation checkpointed once",
    "customer_rfm_segments_approx_audit": "RFM threshold audit: per-customer aggregate, one 9-scalar sketch aggregate broadcast back, one 18-sum rank count, 9 labelled rows exploded from a single aggregated row — 4 bounded scans, never a per-metric rescan",
    "text_pii_redact": "PII scrub: one narrow scan, zero exchanges — regexp_extract_all counts + chained global regexp_replace are codegen'd; only (id, counts, md5) leave the stage",
    "sample_source_mixture": "data mixing: per-source count agg (tiny) -> quotas broadcast back -> ONE rank window partitioned by source (double-gated r8: dispatches to the salted two-stage top-k above the per-source cap, bit-identical selection); hash-rank selection is content-addressed, layout-independent",
    "topk_salted_segment_orders": "salted two-stage top-k exemplar: stage-1 window partitioned by (segment, _salt) over the broadcast-joined facts, stage-2 re-rank over <= 32*k survivors; never one task per 5-value segment",
    "sketch_cms_user_counts": "Count-Min promoted oracle: single count_min_sketch aggregate (fixed grid state), one bounded driver collect, Arrow-batched probe over the reduced item relation; estimates replayed bit-exactly by the DuckDB grid oracle",
    "text_quantile_filter_approx": "approx-median audit shape: one map-combinable per-lang agg carrying exact+sketch medians, thresholds broadcast back; two bounded scans of documents (agg arm + join-back rank arm)",
    "events_sequence_match": "CEP-lite: one scan, one user-key aggregate folding ordered type-initials, regexes codegen'd per USER; no Python, no second shuffle",
    "events_transition_matrix": "Markov transitions: lead window on the high-card user key, normalizer window over the tiny count relation; 1 scan, 2 windows, 0 joins",
    "events_user_trend_slope": "per-user OLS slope: min-window + one aggregate of exact sufficient statistics; 1 scan, 0 joins, closed-form doubles in the final projection",
    "lineitem_weighted_percentiles": "exact weighted quartiles by counting selection: every scan carries a pushed BETWEEN on the raw price (only the target buckets are read); windows rank within one bucket",
    "orders_cdc_apply": "CDC apply: union of 3 narrow projections of one table, rank window on the HIGH-cardinality key, |status|-row aggregate; no join, no global sort",
    "orders_skyline_price_date": "2-D skyline by dimension reduction: per-date min agg (tiny spine) -> prefix-min window over the spine only -> broadcast join back; 2 scans, 1 Window, no self-join",
    "audit_functional_dependencies": "FD audit: one count-distinct aggregate per candidate, unioned one-row arms; map-combinable, no sort",
    "sketch_kmv_rollup": "portable KMV sketch: per-day k-minima via salted two-stage top-k, TOTAL via TakeOrderedAndProject heap; estimates cross-engine deterministic",
    "events_max_concurrency": "sweep-line concurrency: netted boundary instants (keyed by SESSION day — midnight end-boundaries stay in their own day) -> SEGMENTED prefix sum (within-(day,blk) windows + broadcast block offsets), net relation checkpointed once; never an unpartitioned ORDER BY instant",
    "events_cusum_changepoint": "CUSUM change point: map-combinable daily count, then every window runs on the calendar-bounded |types|x|days| relation; statistic scaled by D stays pure int64",
    "text_js_divergence": "pairwise JSD: token counts checkpointed once (tokenize runs 1x for 3 consumers), token-keyed equi self-join (co-occurrence shape — never |S|^2 x |V|), per-source totals broadcast; one-sided tokens folded in via 1-Sum(p) closed form",
    "stats_bootstrap_ci": "Poisson bootstrap: fan_out -> B-fold explode with content-addressed weights (4 draws per md5), all JVM codegen; B=64-group map-combined aggregate; percentile over exactly B rows",
    "events_autocorrelation": "lag-k ACF: daily-count relation only past the first aggregate; centering and lead windows partitioned by event_type; decimal(18,0)^2-exact sums, per-lag rows unpivot via stack from ONE aggregate (1 scan)",
    "customer_gini_revenue": "Gini by bucketed segmented ranking: 256-bucket histogram (bounded driver collect) -> broadcast rank offsets -> row_number WITHIN buckets; exact decimal(18,0)x(18,0) rank-weighted sum, no global sort",
    "stats_welch_t": "Welch t-test: one type-pruned scan -> one conditional aggregate row of exact decimal sufficient statistics (n, Sum v, Sum v^2 per arm); t and Satterthwaite df are closed-form doubles",
    "events_activity_streaks": "gaps-and-islands: distinct (user, day) -> island key day - row_number (window on the HIGH-card user key) -> two map-combinable aggregates -> bounded histogram",
    "sketch_heavy_hitters_audit": "MG heavy hitters: one Arrow-batched mapInPandas reduces each partition to <=k rows, driver merges bounded counters and inlines <=k estimates as a literal map; exact arm is one map-combinable aggregate",
    "join_pit_segment_revenue": "point-in-time join: hash join on c_custkey with the half-open [valid_from, valid_to) string-date interval as residual filter; the SCD2 dimension is rebuilt by the shared query, orders scanned once",
    "audit_table_checksum": "cross-engine checksum: one pruned scan + one map-combinable decimal sum per table (3 arms), no Sort/Window/Join — order-insensitivity is the point of the fold",
    "dedup_remove_duplicate_spans": "exact-substring dedup treatment: span explode (Generate) → span-keyed (distinct-docs, keeper) aggregate → join-backs for covered-index union → JVM filter-by-index rebuild — posting-shaped, cost tracks duplicated-span mass, never |docs|²",
    "text_bm25_topk": "BM25 retrieval: term filter BEFORE the first exchange (only query-term postings shuffle), df as a count window over the same postings relation (≤2 parquet scans), 1-row stats broadcast, global top-k as heap TakeOrderedAndProject",
    "text_bm25_multiquery": "batched BM25: all queries scored in ONE posting pass (query→term map broadcast), per-query top-k via WindowGroupLimit — never a per-query rescan, never a global sort",
    "text_phrase_search": "exact multi-phrase search: staged token array evaluated by every phrase in one narrow projection, stack Generate for wide→long — one scan, ZERO exchanges",
    "profile_compaction_plan": "compaction planner: distributed per-day count, then running-sum bin packing over the partition LIST (one row per day — small by construction); the ordered window never sees the fact table",
    "text_hybrid_rrf": "hybrid RRF: each channel's rank-filter rewritten to a heap TakeOrderedAndProject BELOW its window (rank assignment runs on k rows), fusion is a full-outer join of two ≤20-row relations — O(k) after the channels, regardless of corpus size",
    "text_rerank_two_stage": "two-stage retrieval: BM25 candidates (heap top-50) broadcast into the embedding fetch (BroadcastHashJoin prunes the dense side to |candidates|); vector math and the final heap run on 50 rows — stage 2 is corpus-size-independent",
    "text_prf_expansion": "PRF expansion: 10-row feedback ids broadcast back onto the corpus fetch; feedback term counts broadcast INTO the vocabulary df aggregate; scans pinned at 5 (BM25 posting + stats, feedback fetch, vocab df, count-star)",
    "events_ewma": "recursive per-key EWMA without Python: one user-keyed exchange, recursion as a JVM fold over the time-ordered collected list — no join, no Arrow stage",
    "part_skyline_pareto": "skyline: the dominance test reduced to a running min over the per-size aggregate (one row per distinct size — bounded by the attribute domain); the window never sees the fact table; staircase broadcast back",
    "audit_referential_integrity": "referential-integrity audit: one scan per child table for ALL its FK edges (parents left-join into the same pass; per-edge orphan conditions are conditional counts in one aggregate) — 12 scans total vs 21 for the per-edge anti-join form",
    "lineitem_corr_matrix": "correlation matrix: ONE map-combinable global aggregate carries all 15 exact decimal sums (single reduce of ~15 numbers at any corpus size); pairwise r is closed-form double arithmetic on that one row; no join, no window",
    "snapshot_diff_orders": "snapshot diff: one key-co-partitioned full-outer SortMergeJoin, change classification in the join projection (null-safe struct compare), map-combinable class counts — no row leaves its key partition, no second pass",
    "multimodal_mp4_boxes": "ISO-BMFF container audit: synthesize and box-walk are two Arrow-batched MapInPandas stages over one scan with fan_out's narrow-source balance in front (r14; no-op at cluster scale) — container bytes never shuffle, only the 8-column metadata result leaves the stage",
    "table_range_partition_plan": "range-partition planner: the rank window runs over the bounded 1/16 content-hash SAMPLE only; cuts broadcast as one array row (BroadcastNestedLoopJoin); the full table is bucketed by a narrow codegen expression — no rangepartitioning exchange, no global sort",
    "profile_drift_orders": "profile drift: both snapshot profiles and their deltas from ONE conditional-aggregate pass (expand for exact distincts) — no join of profile rows, no second scan",
    "graph_triangle_count": "triangle census: zero parquet scans — the LSH edge list is localCheckpoint-ed once and the degree pass plus both closure joins read the materialized RDD (the naive 5-way self-join recomputes the LSH pipeline per branch)",
    "privacy_k_anonymity": "k-anonymity audit: one pruned scan + one QI-keyed aggregate; the class relation is |QI domain| rows at any table size",
    "audit_row_constraints": "CHECK-constraint suite: all 7 rules as conditional counts in ONE aggregate over ONE scan, stack unpivot after the 1-row agg",
    "graph_kcore_peel": "k-core peeling: all three rounds (degree agg + two LeftSemi induced-subgraph joins) read the once-checkpointed LSH edge list — zero parquet scans, monotonically shrinking edges",
    "events_chi2_type_dow": "chi-square: ONE scan builds the contingency table; marginals/N are window sums over that 35-cell relation (per-marginal groupBys re-scanned events 4x)",
    "events_survival_km": "Kaplan-Meier: ONE type-pruned scan (first-signup window + conditional-min aggregate share the user partitioning); all KM windows run on the <=31-row duration grain",
    "events_ab_proportion_z": "A/B z-test: one scan + user aggregate; arm totals and the statistic are windows over the 2-row arm relation",
    "text_bpe_encode": "BPE encode: symbol-to-id via an inlined literal map on the word-TYPE relation, per-doc id sequences reassembled by position — zero Python, <=2 corpus scans (word count + positioned re-join)",
    "text_tfidf_cosine_pairs": "tfidf cosine pairs, dense dispatch (vocab 31 <= 256): BroadcastNestedLoopJoin over pivoted vectors with the unrolled double dot fused in its filter; decimal-exact verify joins only the ~candidates; weight relation checkpointed (zero parquet scans) — the posting self-join form cost 224M pair-rows / 146 s here",
    "audit_key_gaps": "key-space completeness: bucket-keyed aggregate over one scan; the lag window runs on the bucket relation (|keyspace|/10k rows) — the gaps-and-islands evidence without the global key-row_number sort",
    "dedup_lsh_recall_audit": "LSH recall audit: exact truth via the inverted-index posting join (length filter inside it), candidates from band buckets, one full-outer pair join — no cartesian anywhere",
    "scalar_variant_functions": "VARIANT path: parse_json decodes each row once into the binary encoding, typed variant_get extraction, one aggregate — all JVM, no string re-parse per access",
    "coarsen_layout_audit": "partition coarsener certified end-to-end (r10): stage ~81 tiny month partitions, run the first-fit in-place rewrite (plan window over one row per partition VALUE; ONE shuffle by merge group; observe-metric row verification), audit the post-coarsen layout — n_files pinned 1 per group by the oracle; cost is staging-bound (two physical table writes), the operator's own plan is the scale story",
    "evolution_generation_census": "schema-generation census (r10): binaryFile listing → ONE Arrow-batched mapInPandas footer sniff (no row data read, bytes never shuffle) → signature-keyed count; file counts replayed by DuckDB as distinct-partition-value counts",
    "knn_cosine_opq": "OPQ ANN (r10): trained orthogonal rotation (driver-side, bounded sample) + the unchanged PQ ADC scan — rotation is one GEMM per Arrow encode batch, search still reads m=8 small ints per vector; the fold-rotation relation and single-pass full-outer code compare are BOUNDED verification (≤1M rows), switched off at production scale",
    "compact_layout_audit": "small-file compaction certified end-to-end (r10): per-file counts from ONE input_file_name aggregate, BFD packing driver-side over the file LIST (bounded by file count, not data), rewrite = one bin-keyed shuffle + partitionBy write (one file per bin, pinned by the oracle); staging-bound cost like coarsen — the operator plan is the scale story",
    "knn_cosine_binary": "binary-quantized ANN (r10 continuation): the candidate stage reads ONLY two BIGINT sign words per corpus row (32× less than float32) — xor+popcount inside WholeStageCodegen, queries broadcast (BroadcastNestedLoopJoin), corpus never shuffles; floats appear only in the 50-row-per-query shortlist rerank joins",
    "knn_cosine_lsh_multiprobe": "multi-probe LSH (r10 continuation): probe strings are substring surgery on ONE computed bucket (hyperplane dots evaluated once per row, not once per probe); candidate pairs structurally unique → NO dedup exchange in the plan, unlike the OR-amplified multi-table variant",
    "knn_cosine_ivf_binary": "IVF × binary composition (r10 continuation): centroid literals inlined (narrow cell assignment, zero corpus shuffle), probes broadcast into the cell equi-join, Hamming shortlist is the only shuffle and carries integer rows only; the rerank joins the BROADCAST shortlist back to the corpus scan",
    "knn_graph_gemm": "exact all-pairs kNN graph (r10 continuation): ONE mapInPandas stage — numpy GEMM per Arrow batch against the broadcast normalized corpus, per-row exact top-k inside the batch; no key shuffle and no top-k exchange anywhere (every batch sees the full broadcast corpus, so the top-k completes batch-locally) — the plan's only Exchange is fan_out's local round-robin repartition; 10× the fold path on identical output",
    "embedding_jl_project": "sparse JL projection (r10 continuation): literal ±1/0 matrix inlined → 16 fold dots + posexplode, one narrow pass, ZERO exchanges; data-independent (nothing trained, nothing staged)",
    "dedup_bbit_minhash_audit": "b-bit MinHash audit (r10 continuation): signatures are the same one-pass narrow md5 pipeline as the LSH family (ReusedExchange across the pair/sig/gram branches); the b=4 agreement is a nibble compare over already-computed components — no extra hashing for the 8×-smaller sketch",
    "knn_recall_matrix": "ANN recall dashboard (r10 continuation; +SQ8 arm and bootstrap-CI columns r11): seven full pipelines (exact + 6 variants) in ONE plan — each arm is the variant's own catalog plan unchanged (broadcast probes, narrow assignments, integer candidate stages), joined to the exact arm and unioned; the 60-row matrix is localCheckpointed so the output/means/CI branches reuse ONE execution of the arms (the multi-consumer pattern), and the CI stage adds only a |variants|·B·n md5-draw relation (3,840 rows) joined to it — cost is the sum of the arms ONCE by design (it IS seven queries), the per-arm plans are the scale story",
    "knn_cosine_sq8": "SQ8 scalar-quantized ANN (r11): train stats are ONE partial+final aggregate broadcast as a 1-row relation into the code/decode projection (zero corpus shuffle on the encode path); the ADC candidate stage is BroadcastNestedLoopJoin with the 10 queries built-side over the 64-byte-per-vector code scan; WindowGroupLimit heap pushdown on BOTH the shortlist and final ranks — the corpus's only Exchange is fan_out's local round-robin",
    "knn_frontier_recall_cost": "recall-vs-cost Pareto frontier (r12): ELEVEN pipelines in one plan — the matrix's 7 recall arms (each the variant's own catalog plan, unchanged) plus 4 candidate-count stages that reuse the operators' bucket/cell expressions (bucket equi-joins and the broadcast cell join count pairs without materializing them); the 6-row metric relation is localCheckpointed so the output branch and the Pareto dominance self-join reuse ONE execution of all arms; the dominance join itself is a 6×6 nested loop over integers — cost is the sum of the arms ONCE by design, the per-arm plans are the scale story",
    "knn_ivf_probe_frontier": "IVF probe-sweep tuning curve (r12 continuation): each (query, neighbor) pair carries exactly ONE probe rank (one cell per corpus vector), so the candidate sets at all 8 probe levels come from scoring each pair once and fanning it to its qualifying levels — the explode multiplies the |queries|-bounded pair relation, never the corpus; centroid literals inlined, probes broadcast into the cell equi-join (knn_ivf's own shape), per-level heap rank; the 8-row lag window is unpartitioned by design (bounded by the n_cells literal)",
    "dedup_lsh_banding_frontier": "LSH banding-parameter sweep (r12, collapsed r13): EXACT-DUPLICATE COLLAPSE first (groupBy text, localCheckpointed) so signatures, the ONE band-keyed multi-config self-join AND the truth posting-join all run on distinct texts (x20 tier 65.8 s -> 3.1 s); cross-group doc pairs expand with weight g_a*g_b, within-group pairs add C(g,2) to tp at every band_size, and the full-outer confusion is anchored on the 4-config spine — the whole S-curve for one signature pass + one truth pass over distinct texts",
    "dedup_threshold_frontier": "dedup threshold sweep (r12, reworked r13): EXACT-DUPLICATE COLLAPSE first (groupBy text -> min-id rep + group size, localCheckpointed) so the ONE posting co-occurrence join runs on distinct texts only — on exact-twin-heavy corpora (the 100 TB shape) the quadratic stage shrinks by the dup factor squared (x20 tier: 90.3 s -> 2.4 s); the per-threshold predicate stays pure integer arithmetic (100c >= pct(|A|+|B|-c)) over the group-pair fan-out, and doc-level counts come back by combinatorial expansion (sum g_a*g_b + C(g,2) within; removals = non-minima + qualifying id_b minima) — no float edge, no iteration",
    "text_quality_threshold_frontier": "quality-filter threshold sweep (r12 continuation): one narrow corpus scan computes the distilled classifier's proven 6-dp score, the 5-threshold fan-out multiplies that scan's output (never re-featurizes), and everything downstream is exact integer sums divided once — zero shuffle beyond the 5-group aggregate, no rounding after the proven score so no tie surface",
    "curation_run_card": "curation run card (r13): the five decision tables composed into one relation — each component keeps its own audited plan unchanged (the card adds a ~30-row unionByName + ONE 5-partition row_number window on top), so the card's cost model is exactly the sum of the five component tables; selection is rank-1 per stage over (meets_target DESC, cost ASC, unique config) — nothing new shuffles at scale",
    "knn_hubness_audit": "hubness audit (r11): the graph stage is the audited GEMM mapInPandas plan; downstream is a count aggregate, a corpus left join, and TWO integer aggregates (histogram + power sums) — the skewness comes from exact integers, no float accumulation anywhere",
    "knn_ndcg_label_eval": "nDCG@5 label eval (r11): exact arm is the audited broadcast top-k; the label joins touch k·|queries| rows (query labels broadcast); the metric stage is one integer SUM (the bit pattern) plus literal CASE lookups — no float summation, no log in the plan",
    "events_ks_test": "two-sample KS (r11): one value-keyed aggregate over the two samples, one |distinct-values|-bounded cumulative window (the documented Mann-Whitney shape), one integer MAX — D leaves integer arithmetic only in the final projection",
    "events_spearman_daily": "Spearman daily (r11): one day-keyed aggregate touches the raw stream once; doubled-midrank windows and the moment aggregate run on the |days| relation (deliberately single-partition at |days| rows)",
    "events_chi2_independence": "chi-squared independence (r11): one (type,dow) aggregate over the stream; the grid/margin joins are broadcast; the fold runs over a ≤|types|·7-element array in a single row — order-pinned by array_sort",
    "events_cusum_daily": "CUSUM monitor (r11 continuation): one day-keyed aggregate touches the stream once; the clamped recursion is TWO cumulative windows over SCALED-INTEGER deviations on the |days| relation — exact under any frame-aggregation order, no sequential fold, no Python",
    "orders_gini_concentration": "Gini concentration (r11 continuation): one customer aggregate, one |customers| rank window (the single deliberate exchange), one moment aggregate over exact cent integers",
    "orders_benford_audit": "Benford audit (r11 continuation): narrow integer-cents projection, one 9-group aggregate (localCheckpointed — orders scans once for output+chi2+total), literal-table expected values; no log in the plan",
    "text_js_divergence_sources": "JSD source drift (r11 continuation): map-combinable token aggregates; the per-source fold runs inside one row over |source vocab| entries, and the out-of-vocab mass is the closed-form coverage term — no full-vocab scan per source, no unordered float sum",
    "events_mann_whitney": "Mann-Whitney U (r10 continuation): tie relation is |distinct values| per pair (not |rows|) — one value-keyed aggregate, one bounded window for cumulative counts, one pair-keyed aggregate; rank quantities are exact half-integers so the float rank-sum is order-independent",
    "events_theil_sen_slope": "Theil-Sen slope (r10 continuation): user-keyed self-join bounded by days² per user (≤ ~500 rows/user), exact percentile over the bounded slope relation — never a global quadratic",
    "events_kendall_tau": "Kendall tau-b (r10 continuation): same bounded per-user pair relation as Theil-Sen; concordant/discordant/tied counts are exact integer aggregates, tau divides at the very end",
    "text_kneser_ney_score": "Kneser-Ney bigram LM (r10 continuation): two map-combinable count aggregations build the model (histories/continuations/type total from ONE bigram-type relation), the scoring join shuffles the doc bigram stream on its key once",
    "text_turing_estimates": "Good-Turing (r10 continuation): counts -> counts-of-counts (two map-combinable aggs); the class relation is |distinct frequencies| (tens of rows at any corpus size), the r->r+1 lookup a self-join on it",
    "embedding_outlier_scores": "label-outlier audit (r10 continuation): centroids stay a (label,pos) aggregate — never collected; similarity is a (label,pos) equi-join + sum; z-stats one more label-keyed aggregate joined back — no stage holds more than |labels|·dim or |rows| records",
    "events_seasonal_decompose": "seasonal decomposition (r10 continuation): one day-keyed aggregate touches the raw stream once; the 7-row moving window, dow means and re-centering all run on the |days| relation — the single-partition window is |days| rows by construction",
}


def main() -> None:
    from rick_and_morty_data_pipeline_project_spark.queries.catalog import QUERIES
    from rick_and_morty_data_pipeline_project_spark.session import get_spark

    spark = get_spark(app_name="gen-explain", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# EXPLAIN — formatted physical plans (generated)",
        "",
        f"Generated by tools/gen_explain.py over `{SF_DIR}`. Each plan is",
        "the evidence for the scale claim stated above it; the same shapes",
        "are asserted programmatically in tests/test_plans.py.",
        "",
    ]
    for name, claim in ANNOTATED.items():
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # keep the operator tree, drop the verbose per-node detail
        # section — but surface the scan-level pushdown evidence lines
        tree = plan.split("\n\n")[0]
        tree = re.sub(r"#\d+L?", "", tree)  # strip expr ids for readability
        evidence = [
            line.strip()
            for line in plan.splitlines()
            if re.match(r"\s*(PushedFilters|ReadSchema):", line)
        ]
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Claim:** {claim}")
        out.append("")
        out.append("```")
        out.append(tree.rstrip())
        for ev in evidence:
            out.append(ev)
        out.append("```")
        out.append("")
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md"),
        "w",
    ) as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(ANNOTATED)} plans)")


if __name__ == "__main__":
    main()
