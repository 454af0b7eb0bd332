"""Central registry wiring operators to the driver's graded contract.

Every graded operator lands as a triple (SURVEY.md §3.1):

    @graded("q_name", oracle="SELECT ... AS same_alias ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

- The callable goes into ``queries()`` in ``__spark_entry__.py``.
- The oracle SQL (DuckDB dialect, run over the same parquet views) goes
  into ``oracle_sql()``. ``oracle=None`` ⇒ rows-only check (for ops that
  are genuinely not SQL-expressible: LSH, iterative algorithms).

Column names are part of the graded contract: the driver sorts columns by
name before value-hashing, so every computed column is aliased identically
in both the Spark code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def graded(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# The driver grades the FIRST 50 registered queries (registration order
# caps at 50). This curated window spans every SURVEY.md §2 family
# (A sources, B filters, C joins, D aggs, E windows, F sort/limit,
# G set ops, H scalars, I LLM-pipeline, J streaming/temporal, K UDFs)
# plus TPC-H / ETL / NOAA representatives — all oracle-paired.
# Rotation history (entries leave the window but stay registered,
# oracle-paired, and covered by tests/test_oracle_parity.py):
# - Round 3 (first pass): 14 r1-r2-green family-redundant entries
#   swapped for never-driver-graded ones: q_agg_stats, q_bool_aggs,
#   q_rollup, q_minmax_by, q_join_left, q_window_first_last,
#   q_stream_tumbling, q_date_functions, q_regexp_extract,
#   q_variant_json, q_jsonl_roundtrip, q_quality_filter,
#   q_udaf_trimmed_mean, q_tpch_q7_volume.
# - Round 3 (second pass): 14 more entries green in BOTH r1 and r2
#   rotated out (q_pricing_summary, q_percentiles, q_filter_predicates,
#   q_join3_topk, q_join5_region, q_asof_join, q_union_all_yearly,
#   q_dedup_keyed, q_window_rank, q_window_rolling_1h, q_sessionize,
#   q_tumbling_window, q_json_extract, q_dedup_exact) for 14
#   never-driver-graded entries (all exact in today's vanilla-session
#   sweep at sf0.01), including the two new round-3 surfaces
#   q_sessionize_bucketed and q_manifest_sink_roundtrip.
# - Round 4: the fixture generator switched events.ts from
#   TIMESTAMP(NANOS) to TIMESTAMP(MICROS, ntz) between rounds, breaking
#   q_sessionize_bucketed / q_stream_interval_join / q_stream_sessionize
#   (unix_micros + watermarks reject TIMESTAMP_NTZ) — fixed in
#   io.normalize_events_ts; those three stayed in the window for driver
#   confirmation (r4: 50/50 green). NOTE: 10 oracle-paired queries
#   added late in round 4 (chunk_dedup, gap_fill, incremental_dedup,
#   referential_audit, fingerprint_md5, the two stream twins, TPC-H
#   Q3/Q6/Q18) landed AFTER that window froze and had never been
#   driver-graded until round 5.
# - Round 5: those 10 enter, plus the 5 new TPC-H completions
#   (Q2/Q9/Q12/Q16/Q21 — the suite now covers all 22 shapes), the 4
#   queries whose plans changed this round (rolling_1h / tfidf /
#   asof_join lost their terminal sorts; q_sample became an
#   oracle-paired hash-gate), and — a first — the 16 rows-only
#   queries that had NEVER had driver signal (the driver records a
#   weaker rows-only check for them; the point is confirming they run
#   clean under the vanilla driver, where worker-side pickling bugs
#   surface). Remaining slots went to one green rep per family plus
#   q_pricing_summary; the other headline bench queries sat out (green
#   r2-r4 and benched every round).
# - Round 6: after r5 every registered query has had driver signal at
#   least once, so the window shifts to RE-confirmation ordered by
#   staleness: the 16 new round-6 queries (zstd roundtrip, mixture
#   epochs, corpus clustering, quality gate + its streaming twin,
#   gopher per-source report, repetition filter, corpus shuffle-shard,
#   column profile, constraint suite, ANN index drift report, fuzzy
#   name match + its q=3 composite-key twin, multiset set-ops,
#   null-ordering top-k, table diff),
#   the 5 queries whose plans/semantics changed this round
#   (shared-signature LSH self-join, IVF cogroup scoring, widened
#   survivor key, Q11 integer-cents threshold), then 13 of the 15
#   queries last graded in r1 (q_date_spine and q_unpivot yielded
#   their slots; H/temporal and reshape stay covered by
#   q_date_functions and the r5-graded pivot queries) and 8 of the 19
#   last graded in r2 (both pre-date two fixture regenerations; the
#   13 r1/r2 entries that yielded slots to new queries rotate back in
#   r7), and 8 r3-graded family/high-value reps so every family
#   carries post-r5-fixture signal.
GRADED_WINDOW: list[str] = [
    # Round 9: CORRECTNESS_r08 went 50/50 (fourth consecutive all-green
    # window) and after r8 every registered query's LATEST driver signal
    # is green. Per VERDICT r8 item 1, this window is the complete stale
    # cohort: ALL 47 queries whose last driver grade is round 3 (10) or
    # round 4 (37) — three-plus fixture regenerations old, the one
    # failure source local sweeps can't simulate (the r4 encoding
    # incident). All 47 are oracle-paired, so ROWS_ONLY_WINDOW is empty
    # this round. Family coverage: the stale cohort itself carries
    # A (csv_roundtrip), H (string/map_functions), I (dedup_exact et
    # al.), J (three stream twins), K (udaf/mapinpandas), tpch (six),
    # etl (sql_surface-adjacent)... plus C/D/E/G via genuine stale
    # family members newly added to the any-of rep sets
    # (q_lateral_join→C, q_time_rollup+q_salted_agg→D,
    # q_sessionize_bucketed→E, q_union_distinct→G). The 3 remaining
    # slots fill the families with no stale member: B
    # (q_filter_predicates), F (q_sort_offset), NOAA (q_ghcn_pipeline) —
    # freshly green in r8, pure family insurance — and etl
    # (q_merge_upsert, its oldest-signal rep, last graded r5). That
    # makes 51, so ONE stale entry defers to r10: q_tpch_q14_promo —
    # the simplest stale TPC-H shape (single lineitem×part join, no
    # events.ts sensitivity), with five sibling stale TPC-H entries
    # still in-window carrying the family.
    # Round-9 NEW queries are registered, tested, and vanilla-sim'd but
    # enter the window in r10 (the r7→r8 precedent: VERDICT priority
    # consumed every slot): q_winsorize_approx + q_anomaly_mad_approx
    # (sketch scale twins, property-graded), q_containment_lsh
    # (rows-only — LSH-blocked containment), q_multimodal_decode +
    # q_wav_decode (pure-numpy codec round-trips, oracle-paired),
    # q_asof_nearest, q_mutual_knn, q_forecast_holt +
    # q_stream_forecast_holt (shared oracle), q_gdpr_erasure,
    # q_triangle_count, q_pareto_frontier, q_ab_test_report,
    # q_cooccurrence_pmi, q_markov_transitions, q_xml_roundtrip,
    # q_spatial_radius_join, q_stream_ab_test (shared AB oracle),
    # q_rbo_rank_similarity (ranking-agreement metric),
    # q_attribution_multitouch (largest-remainder revenue split),
    # q_peak_concurrency, q_proration_largest_remainder, q_psi_drift,
    # q_benford_audit, q_spatial_nearest, q_shortest_path_bfs,
    # q_market_basket_lift, q_acf_daily, q_stream_psi_drift (shared
    # PSI oracle), q_holt_winters_seasonal (bit-equal seasonal fold),
    # q_bollinger_bands (exact-integer rolling variance),
    # q_running_balance_floor (clamped non-linear running fold),
    # q_ndcg_eval (ranking-quality metric, two-phase heap prune),
    # q_jaccard_neighbors (common-neighbor link prediction),
    # q_ngram_novelty (per-source first-occurrence rate),
    # q_stream_holt_winters (shared HW oracle — twin #12),
    # q_curriculum_order (global sort index — the no-global-window
    # zipWithIndex), q_entity_resolution (blocking→CC→golden-record
    # composition, oracle = cross join + recursive closure),
    # q_geo_cluster (grid-density DBSCAN-lite: dense cells + CC over
    # the 8-neighborhood), q_user_ltv (cohort LTV triangle),
    # q_balanced_class_sample (exact-k per class via two-phase prune),
    # q_keyword_extraction (per-doc top-3, integer-surrogate order),
    # q_csv_malformed_recovery (PERMISSIVE quarantine; the CSV
    # column-pruning trap), q_pq_encode (rows-only: product
    # quantization — 8-bit codebooks, ADC recall-tested; completes the
    # ANN toolkit), q_stream_user_ltv (twin #13 — the first twin whose
    # derived KEY comes from the folded state: cohort = min week
    # across all batches; shares USER_LTV_ORACLE verbatim).
    # Round 10: CORRECTNESS_r09 went 50/50 (fifth consecutive all-green
    # window — the complete r3/r4-stale cohort re-confirmed), so the
    # stale-cohort debt is paid and this window grades the 45 round-9
    # additions that have NEVER had driver signal (VERDICT r9 item 1),
    # the 4 queries whose semantics changed in round 9 (CDC pair gained
    # full-outer insert semantics, containment gained the df cap,
    # event_sequence gained the celebrity cap), and q_tpch_q14_promo —
    # the single remaining r4-stale signal, deferred from r9. That is
    # exactly 50 after two swaps: the window must carry every §2 family
    # and the new cohort has NO genuine G-setops or noaa member, so
    # q_union_distinct (G) and q_ghcn_pipeline (noaa) fill those slots
    # and the two stream twins whose batch counterparts are in-window
    # with VERBATIM-shared oracles (q_stream_forecast_holt,
    # q_stream_holt_winters) defer to r11 — four other stream twins
    # remain in-window to exercise the foreachBatch/checkpoint machinery
    # under the vanilla driver. Family coverage otherwise rides the new
    # cohort itself: A (q_xml_roundtrip, q_csv_malformed_recovery),
    # B (q_balanced_class_sample — §2.B sample family), C
    # (q_asof_nearest, q_spatial_radius_join), D (q_ab_test_report,
    # q_benford_audit, q_acf_daily, q_peak_concurrency), E
    # (q_winsorize_approx, q_pareto_frontier, q_bollinger_bands,
    # q_event_sequence), F (q_curriculum_order — global sort index),
    # H (q_spatial_nearest — haversine math scalars), I (the analytics/
    # dedup/sampling batch), J (four stream twins + q_stream_cdc_apply),
    # K (q_multimodal_decode/q_wav_decode — mapInPandas codecs), tpch
    # (q14), etl (q_cdc_apply, q_proration, q_entity_resolution);
    # the any-of rep sets in test_graded_window_spans_every_family are
    # extended with these genuine members.
    # Round 11: CORRECTNESS_r10 went 49/50 (the one red row was
    # q_pq_encode's rows-only canonicalizer crash on array<int> — fixed
    # this round by stringifying the codes column; the operator was
    # always correct). This window grades the 27 round-10 queries that
    # have never had driver signal (25 round-10 additions + the two r9
    # stream twins q_stream_forecast_holt / q_stream_holt_winters that
    # yielded their r10 slots to the G/noaa family fills), the
    # q_pq_encode RE-grade, the new q_compaction (VERDICT r10 item 6 —
    # the one §2.A row that was tests-only), 16 oldest-signal
    # oracle-paired rotations chosen to carry every §2 family (r5/r6
    # cohort + the two stalest C/noaa reps, graded r7), and the first 5
    # of the 10 stale rows-only signals VERDICT r10 item 5 asks to
    # rotate through (r5-era: embed_docs, knn_lsh, fingerprint,
    # hll_sketch_union, cluster_corpus; the other 5 — ann_index_update,
    # dedup_simhash, dedup_minhash_lsh, lang_id, quality_score — rotate
    # in r12).
    # Round 12: CORRECTNESS_r11 went 50/50 (sixth consecutive all-green
    # window — first round with zero red rows anywhere). This window
    # grades (a) the 27 round-11 additions that have never had driver
    # signal (26 oracle-paired + q_kcore rows-only), (b) the 4 queries
    # whose PLANS were redesigned by the round-11 100× sweep —
    # q_market_basket_lift + q_jaccard_neighbors (SHJ→merge pins),
    # q_dedup_ngram_jaccard (PPJoin prefix-filter redesign),
    # q_dedup_simhash (filter-before-dedup swap) — semantics-preserving
    # by test but the driver should confirm, (c) the second half of the
    # stale rows-only rotation (VERDICT r10 item 5): q_ann_index_update,
    # q_dedup_simhash (already in (b)), q_dedup_minhash_lsh, q_lang_id,
    # q_quality_score, and (d) 15 oldest-signal fills: the entire
    # remaining r5-stale oracle-paired TPC-H block (q2/q6/q12/q15/q16/
    # q17/q18/q21) + q_referential_audit (etl, r5) + q_sample (B, r5) +
    # q_train_val_split (r5) + q_zstd_roundtrip (A, r6) +
    # q_set_ops_all (G, r6) + q_topk_global (F, r7 — no staler F
    # member exists) + q_ghcn_pipeline (noaa insurance, r10). Family
    # coverage otherwise rides the new cohort via genuine-member rep-set
    # extensions (C: skew_join_salted; D: covariance_matrix; E:
    # rolling_median; H: geohash_encode; I: dsir_select/dedup pairs;
    # J: the stream twins; K: mapinarrow/applyinarrow/udtf_table_arg;
    # etl: quantile_normalize). Deferred to r13 by this rotation: the
    # r5-stale leftovers q_approx_aggs, q_chunk_dedup, q_gap_fill,
    # q_fingerprint_md5, q_stream_heavy_hitters, q_stream_chunk_documents
    # (+ rows-only q_multimodal_features, q_stream_stateful,
    # q_custom_datasource).
    # Round 13: CORRECTNESS_r12 went 50/50 (seventh consecutive
    # all-green window; zero red rows anywhere for the second round).
    # This window grades (a) the 20 never-driver-graded queries: the 19
    # round-12 additions (17 oracle-paired + q_label_propagation +
    # q_mutual_knn_ivf rows-only) plus the new
    # q_dedup_ngram_jaccard_capped (VERDICT r12 item 4 — the production
    # cap gear, non-binding on fixtures, shares the uncapped oracle);
    # (b) q_lang_id + q_quality_score, converted from rows-only to
    # ORACLE-PAIRED this round (VERDICT item 5 — the oracles replay the
    # marker-argmax / IEEE score chain from the shared LANG_MARKERS /
    # EN_STOPWORDS sources); (c) the two LSH queries whose PLANS changed
    # with the round-12 hot-bucket star caps but were not in the r12
    # window: q_containment_lsh (rows-only) + q_semantic_dedup_lsh
    # (rows-only; VERDICT item 3 — q_dedup_minhash_lsh already got
    # post-cap signal in r12); (d) the complete r5-stale cohort (9):
    # q_chunk_dedup, q_fingerprint_md5, q_stream_chunk_documents,
    # q_gap_fill, q_approx_aggs (rows-only: approx aggs are
    # engine-defined) + rows-only q_stream_stateful,
    # q_stream_heavy_hitters, q_custom_datasource, q_multimodal_features;
    # (e) 17 oldest-signal r6-stale oracle-paired fills chosen for
    # family spread: q_date_functions (H), q_udtf_tokens (K),
    # q_tpch_q11_value (tpch), q_quality_gate + q_gopher_quality +
    # q_repetition_filter + q_fuzzy_name_match + q_cms_frequencies +
    # q_hist_quantiles (I), q_stream_quality_gate (J),
    # q_profile_columns + q_dq_checks + q_k_anonymity (etl/profiling),
    # q_stats_skipping (A), q_anomaly_mad (E), q_array_functions (H),
    # q_recursive_hierarchy (subqueries). Also changed this round and
    # in-window: q_mime_sniff + q_stream_mime_sniff gained the text-leg
    # sentinel byte (ADVICE r12 — the gate prediction is now a theorem,
    # never fixture-content-dependent). Deferred to r14 by this
    # rotation: the rest of the r6 cohort (date spine through
    # mode_by_group per the oldest-signal list), then the r7 cohort.
    # Round 14: CORRECTNESS_r13 went 50/50 (eighth consecutive all-green
    # window). This window grades (a) the 14 never-driver-graded
    # round-13 additions (all oracle-paired: twins #33-#36 included);
    # (b) the two sort-drop re-grades whose PLANS changed in r13
    # (q_window_rank 4->2 exchanges, q_join_left — semantics identical
    # by test, and both are r7-stale anyway); (c) the COMPLETE r6-stale
    # cohort (23 — six fixture regenerations old, the failure source
    # local sweeps can't simulate; includes the deliberate rows-only
    # rotation bpe pair / knn_ivf / doc_similarity / stream_drift_monitor);
    # (d) 11 oldest-signal family fills starting the r7 cohort:
    # jsonl_roundtrip (A, r7), tpch_q7_volume (tpch, r7), agg_stats +
    # percentiles (D, r7), cogroup_merge (K, r7), conditional_case
    # (B, r7 — §2.B CASE semantics, rep set extended), set_ops (G, r8),
    # variant_json (H, r7), sessionize (E headline, r7),
    # curriculum_order (F, r10 — oldest F), ghcn_pipeline (noaa
    # insurance, r12). Rep sets extended with genuine members:
    # B += conditional_case/null_handling/distinct_rows (§2.B rows),
    # E += sessionize_auto, H += array_functions (§2.H HOF row),
    # K += fuzzy_rank (§2.K Jaro-Winkler row), J += the r13 stream
    # twins + the r6 stream sketch/drift members.
    # Round 15: CORRECTNESS_r14 went 50/50 (ninth consecutive all-green
    # window). This window grades (a) the 24 round-14 additions, none of
    # which has driver signal (all oracle-paired: the threshold-metric
    # eval battery on the shared s20 grid, rank correlations with
    # doubled midranks, experimentation batteries #6-#8, isotonic/ECE
    # calibration, and stream twins #37-#41); (b) 7 oldest-signal
    # family fills for the families with no member in either the new
    # cohort or the r7-stale rotation: q_orc_roundtrip (A, r8),
    # q_sort_null_ordering (F, r11), q_union_distinct (G, r10),
    # q_grouped_zscore (K applyInPandas, r8), q_tpch_q8_share (tpch,
    # r8), q_ghcn_daily_wide (noaa, r13), q_math_haversine (H, r8);
    # (c) 19 of the 34 remaining r7-stale cohort (headline joins +
    # the §2.D/E agg/window block). Rep sets extended with genuine
    # new-cohort members: I += rouge/mrr/log_odds evals, J += twins
    # #37-#41, etl += target_encode_loo. All 50 are oracle-paired, so
    # ROWS_ONLY_WINDOW is empty this round.
    # Round 16 (OPTIMIZATION round 2): CORRECTNESS_r15 went 50/50 (tenth
    # consecutive all-green window — the first all-oracle one). Per
    # VERDICT r15 item 2, this window re-grades EVERY query path the r15
    # optimization round rewrote (plan-changed, several
    # value-path-changed — all builder-self-sim only until now) plus the
    # paths this round touches again (q_semantic_dedup's zero-norm/
    # NULL-semantics pin, the CC dispatch probe trim, the minhash/SRP
    # band-chain work, q_semantic_dedup_lsh):
    # --- (a) r15/r16 optimization re-grades (19) ---
    "q_semantic_dedup", "q_dedup_simhash", "q_containment_dedup",
    "q_containment_lsh", "q_cross_corpus_dedup", "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard", "q_dedup_ngram_jaccard_capped",
    "q_dedup_ngram_sketch", "q_entity_resolution", "q_geo_cluster",
    "q_perplexity_filter", "q_bootstrap_ci", "q_dq_checks",
    "q_heavy_hitters", "q_heavy_hitters_mg", "q_decontaminate",
    "q_connected_components", "q_semantic_dedup_lsh",
    # --- (b) stalest-signal family fills (8): A/B/C/E/F/G/tpch/noaa
    # have no member in (a) or (c) — each fill is that family's oldest
    # driver signal (csv_multichar_delim is the never-graded A-family
    # r15 addition, double duty) ---
    "q_csv_multichar_delim", "q_filter_predicates", "q_interval_join",
    "q_window_lag_lead", "q_topk_global", "q_dedup_keyed",
    "q_tpch_q10_returns", "q_ghcn_pipeline",
    # --- (c) never-driver-graded round-15 additions (23): the complete
    # first-session cohort (15) + the highest-value second-session
    # entries (batteries #12/#13/#14/#17, OLS, Heaps, and the
    # new-merge-shape twins #54/#57) ---
    "q_stream_theil_sen", "q_cliffs_delta", "q_sequential_mspt",
    "q_fleiss_kappa", "q_conformal_interval", "q_hilbert_order",
    "q_stream_kendall", "q_stream_cliffs_delta", "q_stream_conformal",
    "q_cochran_q", "q_zipf_fit", "q_post_stratification",
    "q_stream_mspt", "q_stream_zipf", "q_sql_udf",
    "q_one_way_anova", "q_kruskal_wallis", "q_diff_in_diff",
    "q_levene_test", "q_multiple_regression", "q_heaps_law",
    "q_stream_levene", "q_stream_gap_regularity",
    # Round-16 staging FIRST: the 16 round-15 additions (15
    # oracle-paired + q_dedup_ngram_sketch rows-only): q_stream_theil_sen
    # (twin #42), q_cliffs_delta, q_sequential_mspt (battery #9),
    # q_fleiss_kappa, q_conformal_interval, q_hilbert_order,
    # q_dedup_ngram_sketch, q_stream_kendall (twin #43),
    # q_stream_cliffs_delta (twin #44), q_stream_conformal (twin #45),
    # q_cochran_q (battery #10), q_zipf_fit, q_post_stratification
    # (battery #11), q_stream_mspt (twin #46), q_stream_zipf (twin #47),
    # q_sql_udf (the Spark 4 SQL-UDF §2.K surface, Catalyst-inlined),
    # PLUS the 10 round-15 second-session additions (all oracle-paired):
    # q_one_way_anova (battery #12), q_kruskal_wallis (battery #13),
    # q_diff_in_diff (battery #14), q_decision_stump,
    # q_multiple_regression, q_heaps_law, q_gap_regularity,
    # q_stream_diff_in_diff (twin #48), q_stream_kruskal (twin #49),
    # q_stream_heaps (twin #50), q_wilcoxon_signed_rank (battery #15),
    # q_pairwise_arms_bonferroni (battery #16), q_cramers_v,
    # q_tukey_fences, q_stream_multiple_regression (twin #51),
    # q_stream_decision_stump (twin #52), q_stream_wilcoxon (twin #53),
    # q_levene_test (battery #17), q_mann_kendall, q_cronbach_alpha,
    # q_stream_levene (twin #54), q_stream_mann_kendall (twin #55),
    # q_stream_cronbach (twin #56), q_friedman_test (battery #18),
    # q_stream_gap_regularity (twin #57 — segment-boundary merge),
    # q_page_hinkley, q_clustering_coefficient, q_embedding_norm_audit,
    # q_stream_page_hinkley (twin #58), q_stream_norm_audit (twin #59),
    # q_funnel_time_to_convert, q_simpson_check (battery #19),
    # q_stream_tukey (twin #60 — interpolated-quantile grid selection),
    # q_csv_multichar_delim (A), q_error_budget_slo (SRE burn rate),
    # q_stream_simpson (twin #61), q_metric_waterfall,
    # q_seasonality_strength, q_stream_clustering_coefficient (twin #62
    # — the union-distinct item-relation merge), q_bounce_rate,
    # q_apdex_score, q_stream_metric_waterfall (twin #63),
    # q_stream_seasonality (twin #64), q_stream_funnel_ttc (twin #65),
    # q_cochran_armitage (battery #20), q_mcc_score,
    # q_stream_bounce_rate (twin #66 — session stitching),
    # q_stream_apdex (twin #67), q_stream_error_budget (twin #68),
    # q_stream_mcc (twin #69), q_stream_cochran_armitage (twin #70).
    # THEN the remaining 15 r7-stale (unpivot,
    # date_spine, lang_stats, quality_filter, perplexity_filter,
    # bm25_rank, feature_hashing, regexp_extract, incremental_agg,
    # incremental_stats_merge, linear_trend, stream_stats_merge,
    # stream_feature_pit, connected_components, token_budget_select)
    # + the r8-stale cohort next, families per the any-of guard.
]

# The deliberate rows-only subset of the window (no oracle by design:
# engine-specific hashes/sketches/ANN, streaming state, custom source).
# test_graded_window_spans_every_family pins window∩rows-only == this.
ROWS_ONLY_WINDOW: set[str] = {
    # round 16: the six rows-only entries are ALL deliberate
    # optimization re-grades (VERDICT r15 item 2) — LSH/sketch paths
    # whose plans (and for simhash/semantic the value path) were
    # rewritten by the r15/r16 optimization rounds; each is
    # recall/equality-pinned in tests but needs vanilla-driver signal.
    "q_containment_lsh", "q_cross_corpus_dedup", "q_dedup_minhash_lsh",
    "q_dedup_ngram_sketch", "q_dedup_simhash", "q_semantic_dedup_lsh",
}
# round 15 note (historical): that window was all-oracle
# (ROWS_ONLY_WINDOW was empty — the first such round).


def load_all_queries() -> None:
    """Import every query module so registration side effects run, then
    reorder the registry so the driver's graded window (first 50) spans
    every §2 family."""
    # Imports are deferred so `import noaa_etl_spark` stays cheap.
    from noaa_etl_spark.queries import (  # noqa: F401
        relational,
        windows,
        temporal,
        text,
        similarity,
        sources,
        scalars,
        udfs,
        streaming,
        multimodal,
        noaa,
        scale,
        etl,
        subqueries,
        tpch,
        sampling,
        profiling,
    )

    missing = [n for n in GRADED_WINDOW if n not in QUERIES]
    if missing:  # not assert: -O would compile it out and silently
        # shrink/reorder the driver's graded first-50 at runtime
        raise RuntimeError(f"GRADED_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in GRADED_WINDOW}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
