#!/usr/bin/env python3
"""Regenerate docs/PLANS.md: formatted physical-plan evidence for the
headline queries (plan tree + pushdown/pruning detail lines), via
`graft.Smoke <query> <sfDir>`. Run after plan-affecting changes:

    python3 scripts/gen_plans.py [sfDir]
"""
import re, subprocess, sys, os

# --only q1,q2: patch ONLY those sections in the existing PLANS.md
# (replace in place or append at the end) instead of regenerating the
# whole file — the per-wave fast path; the full regen stays the
# ground-truth refresh after plan-affecting changes to shared machinery.
ONLY = None
argv = sys.argv[1:]
if "--only" in argv:
    i = argv.index("--only")
    ONLY = [q.strip() for q in argv[i + 1].split(",") if q.strip()]
    argv = argv[:i] + argv[i + 2:]
SF = argv[0] if argv else "/root/testdata/sf0.01"
QUERIES = ["q1_agg", "q2_filter_project", "q12_join_broadcast",
           "q20_flow_ledger", "t5_embed_topk", "t2_dedup_minhash",
           "t13_sample", "q28_struct_semi", "q33_asof_native",
           "q38_sessionize", "q40_scd2", "q41_tfidf", "q43_skew_salted",
           "q44_anti_join", "t20_quantize", "q47_delete_merge",
           "q48_bq_dialect", "t26_neardup_exact",
           "t28_decontaminate", "t30_quality_flags", "t31_dup_spans",
           "t32_pack", "t33_chunk", "t34_split", "t35_collapse",
           "t36_lm_score", "t37_incr_dedup", "t38_canonical", "t18_cluster",
           "t40_domain_filter", "t41_line_filter", "t42_line_dedup",
           "t43_bow_score", "t45_line_dedup_doc", "t49_token_mixture",
           "t50_span_scrub", "t51_vocab", "t52_ppl_band", "t53_ml_select",
           "t54_dsir", "t56_dense_ids", "t57_pq_topk",
           "t60_embed_decontam", "t61_char_entropy", "t62_url_canon",
           "t64_pagerank", "t65_heavy_hitters", "t67_ngram_novelty",
           "t69_length_buckets", "t70_k_anonymity", "t73_epoch_shuffle",
           "t74_compress_ratio", "t91_hll_rolling", "t93_theta_overlap",
           "t94_hybrid_search", "t95_zorder_layout", "t99_kll_rolling",
           "t102_theta_novelty", "t105_dp_counts", "t107_funnel",
           "t108_retention", "t110_content_chunks", "t111_chunk_neardup",
           "t112_blocklist", "t113_ks_drift", "t114_psi_drift",
           "t116_weighted_sample", "t117_bottomk_sample", "t120_mad_outliers",
           "t121_transitions", "t122_dim_stats", "t124_rolling_anomaly",
           "t125_dataset_card", "t127_grouped_ols", "t128_corr_matrix",
           "t129_neg_sample", "t130_hard_negatives", "t131_ppr", "t133_top_paths", "t134_stream_psi", "t135_water_fill",
           "t136_score_calibrate", "t137_ks_binned", "t138_calibrated_keep",
           "t139_ks_qbinned", "t140_rendezvous_shards", "t141_bootstrap_ci",
           "t142_chi2_drift", "t143_jsd_sources", "t144_bootstrap_diff",
           "t145_stream_bootstrap", "t146_ks_approx_edges", "t147_two_level_shards",
           "t148_mann_kendall", "t149_cusum_change", "t150_cohens_kappa",
           "t151_quantile_normalize", "t152_rake_weights",
           "t153_stream_cusum", "t154_drift_panel",
           "t155_fdr_alarms", "t156_snapshot_fingerprint",
           "t157_diversity", "t158_burst_gini",
           "t159_wasserstein", "t160_containment",
           "t161_auc", "t162_calibration", "t163_zipf",
           "t164_km_survival", "t165_avg_precision",
           "t166_containment_pairs", "t167_transition_entropy",
           "t168_heaps_fit", "t169_pmi_cooccur", "t170_l_diversity",
           "t171_benford", "t172_conformal", "t173_good_turing",
           "t174_label_mi", "t175_stream_conformal",
           "t176_mann_whitney", "t177_edit_verify", "t178_rolling_corr",
           "t179_readability", "t180_fd_audit", "t181_collocations",
           "t182_dispersion", "t183_cosine_profile",
           "t184_weighted_quantiles", "t185_sessions", "t186_fleiss",
           "t187_t_closeness", "t188_robust_outliers", "t189_acf",
           "t190_kruskal_wallis", "t191_theil_sen", "t192_triangles",
           "t193_spearman", "t194_jw_verify", "t195_isotonic",
           "t196_snm_block", "t197_cramers_v", "t198_kendall_tau",
           "t199_skew_kurtosis", "t200_assortativity", "t201_basket_rules",
           "t202_smd_balance", "t203_trimmed_mean", "t204_theil",
           "t206_median_ci", "t207_rfm", "t208_lorenz", "t209_mcnemar",
           "t210_cuped", "t211_chapman", "t212_chao1", "t213_seq_monitor",
           "t214_seasonality", "t215_entity_resolve",
           "t216_delta_attribution", "t217_pool_embed", "t218_srm",
           "t219_win_matrix", "t220_neyman", "t222_seasonal_outliers",
           "t223_column_entropy", "t224_fd_mine", "t225_winsorized",
           "t226_label_separation", "t227_chi2_residuals",
           "t228_info_gain", "t229_dedup_savings", "t230_ratio_ci",
           "t231_mde", "t232_influence", "t233_damerau_verify",
           "t234_concentration", "t235_triangle_doulion",
           "t237_png_phash", "t238_margin_bf_audit",
           "t239_pipeline_resume", "q49_sql_operator_view",
           "t240_cliffs_delta", "t241_cochran_q", "t242_krippendorff",
           "t243_source_overlap", "t244_token_fertility",
           "t245_median_of_means", "t246_hill_tail", "t248_mom_rolling",
           "t249_video_phash", "t251_lsh_calibration", "t252_ranking_metrics",
           "t253_winnowing", "t254_winnow_pairs", "t255_datacard",
           "t256_stream_decontam",
           "t257_cluster_quality", "t259_canonical_dedup",
           "t260_stream_quality", "t261_embedding_card",
           "t262_corpus_diff", "t263_common_component", "t264_kcore", "t266_prefix_jaccard",
           "t267_repetition", "t268_mink_prob", "t269_substr_dedup",
           "t270_rerank"]
root = os.path.join(os.path.dirname(__file__), "..")

# Per-query prose that must survive regeneration — evidence notes the
# plan tree alone doesn't spell out.
NOTES = {
    "t257_cluster_quality":
        "All k squared distances live in ONE array column per row "
        "(zip_with folds over exact micro-quantized longs — no "
        "explode, no xdim or xk row amplification on the corpus "
        "stage); argmin/next-best are array kernels; everything after "
        "the groupBy is k-row arithmetic, and the kxk centroid "
        "distance table is driver math joined broadcast. The md5 seed "
        "collect is k rows (model-sized).",
    "t259_canonical_dedup":
        "The canonical form is pure per-row expression work — the "
        "native NfcNormalizeExpr kernel (NFC quick-check fast path: "
        "already-normalized ASCII allocates nothing) feeding lower/"
        "regexp_replace/trim inside one codegen span. The dedup "
        "decision shuffles (digest, id) aggregates only; document "
        "bodies never ride the exchange.",
    "t260_stream_quality":
        "Stateless per-row scoring (token stats, the hashed-shingle "
        "bigram kernel, two portable regex counters) in ONE Project "
        "over the stream: append mode with no state store, so the "
        "result is arrival-order-independent and the driver row is "
        "hash-exact against the plain batch replay. A second stream "
        "branch + self-join would have planned STATEFUL — the gate "
        "computes PII counters inside the same select instead.",
    "t261_embedding_card":
        "One scan: flags and the micro-quantized norm are in-row "
        "expressions; the groupBy carries |groups| exact-percentile "
        "states of longs. Norms quantize components FIRST then "
        "integer-sum (the labelSeparation lesson) so both engines "
        "sqrt the same exact integer.",
    "t262_corpus_diff":
        "Both corpus versions reduce to (id, source, md5) BEFORE the "
        "full-outer join — at 100 TB the join exchanges 8-byte-digest "
        "rows, never documents; the per-source status counts are one "
        "map-side-combinable aggregate.",
    "t263_common_component":
        "Fit is one CovMoments scan (O(d^2) partials shuffle, never "
        "rows) + driver eigensolve; removal is the codegen'd "
        "RemoveComponentsExpr kernel with the kxd basis as a codegen "
        "reference object — no join, full-dimension residual out. The "
        "audit re-fits on the residual and measures per-row "
        "orthogonality (3e-16 at sf0.01) behind the Verify gate.",
    "t264_kcore":
        "Exact core numbers WITHOUT peeling: FRONTIER h-index "
        "iteration — a node's h-index only changes when a neighbor's "
        "value changed, so each round joins the previous changed set "
        "to the edges and recomputes a degree-bounded window over just "
        "the touched adjacency, terminating on an empty frontier. No "
        "adjacency lists, no driver node state; one materialized "
        "(node, c, chg) frame per round. t265 enforces the fixpoint + "
        "support invariants as zero-violation gates on the SAME cached "
        "decomposition (the t192/t236 shared-census convention).",
    "t267_repetition":
        "ONE RepetitionStatsExpr kernel call per row computes lines, "
        "all three gram sizes, and their exact BIGINT masses in a "
        "single pass (grams grouped by string in a per-doc map — no "
        "explode, no gram strings in the plan); the group aggregate "
        "sums masses map-side and each fraction is one IEEE divide at "
        "6dp. Nothing after the scan is corpus-sized.",
    "t268_mink_prob":
        "The t36 model reductions (bigram counts, contexts, vocab — "
        "shuffles carry bigram keys, never documents) feed per-doc "
        "micro-rounded NLL cells; the top-k% selection is the "
        "interval-overlap clip over a per-DOC cumulative window "
        "(high-cardinality key — spreads, unlike the t206 funnel "
        "class) and the mean is one double-divide chain of an exact "
        "DECIMAL sum.",
    "t266_prefix_jaccard":
        "EXACT all-pairs Jaccard with PRUNED candidates (Bayardo "
        "WWW'07): the df aggregate and posting-df join shuffle 8-byte "
        "digests; the per-doc rank window partitions on the "
        "high-cardinality doc id (spreads); the candidate self-join "
        "touches only the rarest |d| - floor(t|d|) + 1 positions per "
        "doc, so hot shingles generate no pairs unless they are some "
        "doc's rarest evidence; verification is the shared length "
        "prefilter + sorted-merge intersection. The oracle is the "
        "NAIVE uncapped replay - pruning recall loss is impossible to "
        "hide. Since round 13 the fixture reads the (session, sfDir)-"
        "cached pair census it shares with the q63 SQL view, so the "
        "recorded plan is the census checkpoint's scan (the t264 "
        "convention); ScaleStress times the raw operator.",
    "t269_substr_dedup":
        "The recorded plan is the shared span census's checkpoint scan "
        "(the t264/t266 cache convention; ScaleStress times the raw "
        "operator). The operator's own plan: one seed window ranking "
        "every seedLen-char position by min-(doc, offset) "
        "representative AND pruning to non-singleton classes in the "
        "same window pass (the ExactSubstr dup-halves rule - a "
        "mostly-unique corpus collapses right here); zero or more "
        "doubling rounds (self-join + fixed-width re-rank, exchange "
        "reuse dedupes sibling references); a <= 4-read overlapping "
        "rank-tuple cap for any minLen; one count window over the "
        "class tuple; per-doc island merge on the high-cardinality "
        "doc key. Fully lazy, no driver state, shuffle bytes "
        "O(corpus log minLen).",
    "t270_rerank":
        "Two-stage serving shape: everything corpus-sized lives in the "
        "t94 first stage (BM25 postings + dense cosine + RRF, all "
        "proven plans); the rerank leg is a BroadcastHashJoin of the "
        "20-row fused list to documents, the interpreted-lambda pair "
        "scorer over those 20 rows only, and a 20-row window - "
        "arbitrarily expensive per-pair scoring is safe BECAUSE the "
        "input is k-bounded by contract (the require'd query "
        "partition makes the window per-query, never corpus-wide).",
    "t235_triangle_doulion":
        "The Doulion coin is ONE codegen'd md5 Project over the deduped "
        "edge table (no extra shuffle); every closure join downstream "
        "runs on the p-thinned edges — O((pm)^1.5) where the exact t192 "
        "is O(m^1.5) — while the exact linear stats (nodes/edges/wedges, "
        "the cc denominator) reduce map-side from the FULL edge table. "
        "t236 gates the estimate at rel_err <= 0.05 vs the exact census.",
    "t237_png_phash":
        "All codec work — PNG encode of the planted copies, ImageIO "
        "decode (zlib inflate + filter reconstruction), the 32x32 DCT — "
        "is per-row inside mapPartitions batches: zero shuffle until "
        "the banded-Hamming posting explode, whose pairs route through "
        "the shared saturating-capped buckets (8-byte band keys).",
    "t238_margin_bf_audit":
        "The EXPLICIT brute-force audit baseline (since round 10 no "
        "longer the operator default — t75 runs the LSH provider): "
        "anchors broadcast, the corpus never shuffles for scoring, and "
        "the rank cut is the bounded-heap partial top-k aggregate. "
        "Compute is still N*M — 8.0x at 10x data vs the default's 2.1x "
        "— which is exactly why it must be requested by name.",
    "t239_pipeline_resume":
        "Stage boundaries are real parquet write-and-read-backs under "
        "the _SUCCESS-gated checkpoint dir: on resume, completed stages "
        "appear in the plan as plain columnar scans (no recomputation "
        "of their lineage), and the ledger unions 1-row aggregates of "
        "those scans. The mid-chain restart is exercised INSIDE the "
        "query (a partial 2-stage run precedes the full one).",
    "q49_sql_operator_view":
        "The operator reaches the planner through a temp VIEW, so the "
        "spark.sql text and the DataFrame form produce the same "
        "physical plan — the md5-rank projection and the salted "
        "two-level cap — with no SQL-surface penalty.",
    "t240_cliffs_delta":
        "The t176 midrank machinery verbatim: one map-side-combinable "
        "(source, score) block collapse, the per-source window over "
        "DISTINCT scores (bin first at billion-distinct cardinality — "
        "the t137 hatch), then a group-cardinality closed form; delta "
        "is one double divide of the exact BIGINT 2U accumulator.",
    "t241_cochran_q":
        "Raters are COLUMNS, so row totals are per-row expressions: "
        "the ONLY aggregation is one map-side-combinable per-source "
        "reduction carrying n, sum R_i^2 and the k column totals — no "
        "unpivot, no item-keyed shuffle at all. Q is one double divide "
        "of DECIMAL(38,0) products.",
    "t242_krippendorff":
        "The only ratings-sized stage is the (source, unit, category) "
        "HashAggregate; the unit-keyed and category-keyed reductions "
        "run on that collapsed frame, per-unit disagreement terms "
        "micro-round to BIGINT before the sum (order-independent), "
        "and alpha is one IEEE chain on a |sources|-row join.",
    "t243_source_overlap":
        "Gram digests come from ONE Md5Shingles kernel call per row "
        "(round 12) into the map-side-combinable (source, digest) "
        "distinct; the intersection self-join keys on 8-byte digests "
        "with per-digest fan-out bounded by |sources|^2, and the "
        "per-source counts broadcast back. 4.4 s -> ~1.2 s at sf0.1.",
    "t244_token_fertility":
        "Pure scan rate: both counting kernels (whitespace split + "
        "the codegen'd BPE-ish token counter) are per-row expressions "
        "feeding ONE map-side-combinable reduction to |langs| rows; "
        "no joins, no windows.",
    "t245_median_of_means":
        "One map-side-combinable (event_type, shard) reduction is the "
        "only corpus-sized stage; the per-group collect is bounded by "
        "the 16 shard means (model-sized), and both readouts are one "
        "IEEE chain each. The shard coin is a codegen'd md5 Project.",
    "t246_hill_tail":
        "The top-51 order statistics come from the bounded-heap "
        "TopKByScore partial aggregate — shuffle O(partitions*groups*k), "
        "never the per-group window sort a row_number cut would funnel "
        "— and everything after is a 51-element array expression.",
    "t248_mom_rolling":
        "The only corpus-sized stage is the (day, shard) HashAggregate; "
        "the 7-day re-slice is a range join of the |days| day list "
        "against the |days|*16 daily frame (both broadcast-sized at any "
        "corpus scale) — nightly re-slides touch pairs of longs, never "
        "raw history, and unlike the sketch rolling members the result "
        "is exact, hence hash-exact rather than gated.",
    "t18_cluster":
        "Round-11 timing audit (the r10 driver ran 7.73 s vs 3.50 s "
        "recorded): per-round instrumentation (-Dgraft.cc.debug) shows "
        "the pointer-jumping loop converges in 2 ROUNDS at ~0.10 s each "
        "on this graph at sf0.1 — the materialize-per-round cost the "
        "r10 verdict suspected is ~3% of the query. The weight is the "
        "n-gram Jaccard candidate pipeline FEEDING connectedComponents "
        "(capped postings + verify DPs) plus the one-time undirected "
        "distinct/persist; warm 3-run spread measured 2.77/3.11/3.30 s "
        "(1.2x) — the driver's 7.73 s was a whole-battery cold read, "
        "now inside the rebased budget (max of recent recorded runs, "
        "7.73, limit 23.2 s).",
    "t249_video_phash":
        "Decode and per-frame pHash run INSIDE mapPartitions against "
        "bytes already local (the *frames fan-out never crosses an "
        "exchange); candidate generation shuffles only 8-byte "
        "(band, value) keys from DISTINCT frame-hash shingles through "
        "the shared saturating-bucket pair generator; the "
        "frames_a*frames_b containment verify runs ONLY behind that "
        "shortlist (t177/t233 verify-DP contract). Codec work scales "
        "with pixels*frames — 3.1x at 10x, the t237 shape.",
    "t251_lsh_calibration":
        "The truth pipeline (capped n-gram Jaccard postings + verify "
        "DPs) runs ONCE and is checkpointed; each banding adds one "
        "signature scan + one capped-bucket pair pass (8-byte keys, the "
        "t2 machinery) and a left join against the truth pairs. Output "
        "is |bandings|*|bins| rows; the analytic column is per-row "
        "scalar math. Ratio 1.4x at 10x — truth-pair growth, not the "
        "signature scans.",
    "t252_ranking_metrics":
        "The corpus-sized work is the two retrievers (BM25 collapse + "
        "bounded-heap dense top-k, both already audited under t94); "
        "the metric layer joins O(lists*k) rows against the relevance "
        "ids and explodes a <= k IDCG sequence off a 1-row count frame "
        "— rank arithmetic on exact micro-rounded BIGINTs, hash-exact "
        "against the DuckDB replay. Ratio 1.0x at 10x (fixed k).",
    "t253_winnowing":
        "ONE codegen'd kernel call per row (WinnowingFps — digest + "
        "window minima + distinct in a single byte-walk; the composable "
        "nested-lambda form ran INTERPRETED at ~2 ms/doc, 10.6 s -> "
        "0.8 s at sf0.1 after the swap) — no explode, no shuffle beyond "
        "the final sort: the plan is one projection over the scan.",
    "t256_stream_decontam":
        "Stateless streaming: the winnowing kernel + the native "
        "sorted-merge intersection against a literal model-sized "
        "reference (array_intersect rebuilt a hash set per row and "
        "measured 30 s; the linear merge runs 2.2 s) — append mode "
        "with NO state store, arrival-order-independent, which is what "
        "makes the driver row hash-exact against a plain batch replay.",
    "t254_winnow_pairs":
        "The t253 in-row fingerprint work feeds 8-byte postings into "
        "the shared saturating-bucket cap (df 2..10 — boilerplate "
        "fingerprints drop before fan-out); pair counts expand "
        "in-array from capped lists (no posting self-join), and the "
        "per-doc size join keeps the corpus-sized frame on the probe "
        "side (pairs broadcast by AQE).",
    "t255_datacard":
        "ONE groupBy(source) carries the integer legs (dedup counts "
        "DISTINCT md5 digests — bodies never shuffle); the winnowing "
        "leg is the t253 in-row projection reduced to the same "
        "|sources| rows; the final join is |sources|-sized. Every "
        "column is an exact integer ratio — a release artifact with "
        "no estimates in it.",
    "t136_score_calibrate":
        "Both Windows are bounded: the data-side Window partitions by "
        "(__pid, source) — one window partition per RANGE partition "
        "segment, parallel sorts, never a whole-source funnel — and the "
        "broadcast-side Window runs over the metadata-sized "
        "(partitions + sources)-row offset table. The old plan's "
        "`Window [percent_rank() ... PARTITION BY source]` (one task "
        "per source, corpus-sized) is gone.",
    "t137_ks_binned":
        "The per-group Window is 9 rows (bin boundaries), whatever the "
        "value column's cardinality; the only corpus-sized stage is the "
        "map-side-combinable HashAggregate on (event_type, bin).",
    "t138_calibrated_keep":
        "t136's bounded-window calibration shape plus a per-row "
        "threshold comparison and the |sources|-row audit "
        "HashAggregate (partial map-side combine) — no new shuffle "
        "beyond the calibration's.",
    "t140_rendezvous_shards":
        "Both assignments are per-row Projects over the scan — 16 (then "
        "17) codegen'd md5s and an array_max fold, no shuffle until the "
        "final 16-row audit HashAggregate (partial map-side combine). "
        "Growing the shard count rewrites ~1/(N+1) of a corpus instead "
        "of reflowing every rank boundary.",
    "t139_ks_qbinned":
        "The decile-edge aggregate reduces the reference rows to "
        "|groups| rows of 9 doubles, broadcast back (BroadcastHashJoin); "
        "bin assignment is a per-row fold over that array; the KS tail's "
        "per-group Window is ≤ 10 rows. The exact percentile's per-group "
        "sort is the oracle-checkable form — percentile_approx is the "
        "drop-in when a group's reference sample exceeds a partition.",
    "t141_bootstrap_ci":
        "The corpus never shuffles: the 200-replicate explode and the "
        "Poisson-weight md5 fold are map-side Projects, and the first "
        "HashAggregate's partial combine reduces the exchange to "
        "partitions \u00d7 sources \u00d7 reps aggregate rows; the CI "
        "percentile aggregates |sources| \u00d7 200 replicate means. "
        "Driver state: none.",
    "t142_chi2_drift":
        "One map-side-combinable HashAggregate on (source, lang) is the only corpus-sized stage; the window and final aggregate run over category-cardinality rows, and the critical value is a literal array lookup.",
    "t143_jsd_sources":
        "The corpus-sized stage is the (source, token) count with partial map-side combine; the per-token corpus-count join is vocab-sized, group totals and the corpus total are broadcast, and the absent-token mass is the (ln 2/2)(1 − Q_cov) closed form — no group × vocab expansion exists anywhere in the plan.",
    "t144_bootstrap_diff":
        "t141's shape with a side split: replicate explode and Poisson folds map-side, partial-combined (source, replicate) aggregates, percentile CI over |sources| × 200 replicate differences.",
    "t145_stream_bootstrap":
        "Streaming state is per-(day-window, event_type, replicate) partial long sums — days × 5 × 100 rows, never raw events; the post-stream merge and percentile CI run on that metadata-sized table. Merging partials is exact long addition, which is why the watermark-replay oracle is the plain batch bootstrap.",
    "t146_ks_approx_edges":
        "Three KS paths over one scan each: the percentile_approx edge aggregate carries Greenwald–Khanna sketch state (no per-group reference sort) — the path for groups whose reference sample exceeds a partition; gates pin it against the exact-edge and full-exact answers.",
    "t147_two_level_shards":
        "Two map-side folds per row — 16 group hashes + 16 in-group shard hashes (2√N vs 256 flat) — no shuffle until the 1-row audit; the movement contract survives composition because only the new shard's group can move.",
    "t148_mann_kendall":
        "The corpus-sized stage is the daily-count aggregate (map-side combinable); the pair join, tie counts, and variance arithmetic all run on the days × groups series frame (≤ 31 rows per group here, 365/year) — Mann–Kendall's O(n²) pairs are period-pairs, never row-pairs.",
    "t149_cusum_change":
        "Same series frame; the scaled deviation n·S_k keeps the CUSUM an exact long, and every window partitions on (event_type) over period-cardinality rows.",
    "t150_cohens_kappa":
        "One map-side-combinable confusion-cell count on (source, labelA, labelB) is the only corpus-sized stage; marginals, p_e, and κ run on |labels|²-cardinality rows per group.",
    "t151_quantile_normalize":
        "t136's bounded calibration shape plus ONE global percentile-grid aggregate (101 doubles, broadcast — percentile_approx is the corpus-scale drop-in) and a per-row two-point interpolation; no new wide shuffle.",
    "t152_rake_weights":
        "The only corpus-sized stage is the (lang, bucket) cell count; the IPF loop runs driver-side over the 20 collected cells (model-sized state) and the weights broadcast back as a map literal.",
    "t153_stream_cusum":
        "Streaming state is days × event-types exact-long counts (the t134 shape minus bins); the CUSUM pick runs on that metadata-sized merged table.",
    "t154_drift_panel":
        "Three detectors share one scan lineage: KS's distinct-value window, PSI's and χ²'s combinable bin/category counts, joined on |groups| rows — the panel costs one pass per detector, all bounded shapes.",
    "t155_fdr_alarms":
        "The corpus-sized work is t113's KS chain; the p-value is per-row arithmetic on its |groups|-row output and the BH rank window runs over one row per MONITOR — a model-sized frame, so the global (no-partition) window is metadata, not a data funnel.",
    "t156_snapshot_fingerprint":
        "Each snapshot collapses to 64 fingerprint rows in ONE scan through a map-side-combinable (count, xor, sum-mod) aggregate — no sort, no keyed join; the full-outer verdict join touches |shards| rows. At 100 TB the row-level diff then runs only on the shards this map flags.",
    "t157_diversity":
        "ONE corpus scan (round 12): the GramDigestCounts native kernel emits every n's per-doc (n, digest48, count) rows in one byte-walk — the prior three unioned explode-shingle passes (rows x tokens x 3 records, each through its own md5 expression subtree) are gone — then TWO map-side-combinable groupBys so shuffles carry 8-byte digests and counts, never gram strings. 13.8 s -> ~1.0 s at sf0.1.",
    "t158_burst_gini":
        "Windows partition by event_type over the days × types aggregate (calendar-bounded frames); the only corpus-sized stage is the daily count scan.",
    "t159_wasserstein":
        "The t113 KS shape with one extra lead() in the same per-group ordered window: one groupBy(value) collapse, one sort per group over DISTINCT values, no new shuffle beyond exact KS; bin first for billion-distinct-value groups (the t137 hatch applies verbatim).",
    "t160_containment":
        "Per-doc DISTINCT digests come from ONE Md5Shingles kernel call per row (round 12 — no gram strings, no per-gram md5 subtrees), then the cross-doc distinct; the digest self-join fans out at most |sources|^2/2 pairs per digest and both size joins broadcast — every post-collapse structure is |sources|^2-bounded. 5.4 s -> ~1.2 s at sf0.1.",
    "t161_auc":
        "The exact-KS chain shape: ties collapse map-side to one (group, score) row with two long counts before the per-group cumulative window (distinct scores per partition — bin first, t137/t139, at billion-distinct-score cardinality); the rank sums stay exact BIGINTs so no float crosses an engine boundary.",
    "t162_calibration":
        "One map-side-combinable aggregate to (groups x bins) rows, then a bins-sized totals join; confidence mass is summed as DECIMAL(28,10) so every sum is order-independent — nothing after the first HashAggregate sees corpus-sized data.",
    "t163_zipf":
        "The top-100-per-source stage is the BOUNDED-HEAP top_k_by_score aggregate — partial heaps reduce map-side so the exchange carries at most partitions x sources x k entries, never the vocabulary-sized row_number window; the OLS runs on k-row integer micro-log moments.",
    "t164_km_survival":
        "Corpus-sized work ends at the per-user min/min collapse (map-side combinable); the at-risk and survival windows run on the (cohort x distinct durations) aggregate — duration-granularity-bounded, 30 rows here — and the horizon join is a broadcast 1-row aggregate.",
    "t165_avg_precision":
        "t161's stressed shape verbatim — ties collapse map-side to one (group, score) row before any window — plus one more cumulative sum over the SAME per-group distinct-score window frame (no extra exchange, no extra sort); the only float stage is that identically-ordered running term sum.",
    "t166_containment_pairs":
        "t4's candidate plan: posting lists reduce through the saturating df-capped collect (an ObjectHashAggregate over 8-byte shingle hashes, partial map-side), pairs expand in-array from capped buckets — no posting self-join, no window — and the sorted-intersect kernel runs only on surviving candidates; both direction rows project from ONE scored frame.",
    "t167_transition_entropy":
        "t121's per-user lag window (user-keyed shuffle, parallel partitions) feeds a map-side-combinable (prev, next) count; the entropy sum is an order-independent BIGINT micro-log aggregate over the |types|^2-row frame — no float reduction, no second corpus pass.",
    "t168_heaps_fit":
        "No per-source rank window anywhere in the plan: ranks come from the denseIds range repartition + per-partition row_number (parallel sorts, one long of driver state per partition, the t136 machinery), vocabulary first-sightings collapse via partial min over (source, 48-bit digest) — the one corpus-sized exchange, 8-byte keys — and every checkpoint structure after is a <= 63-row-per-source grid cumsum.",
    "t169_pmi_cooccur":
        "Doc-frequency counts shuffle 8-byte digests (partial HashAggregate before the exchange); the top-k stage is the bounded-heap ObjectHashAggregate collapsing to ONE k-entry row (k longs of driver state — model-sized, like centroids); the presence pass filters map-side on the broadcast digest literal and pairs expand in-array from per-doc <= k-element sorted sets — no posting self-join, no window; token strings appear only in the k-row dimension joined by broadcast.",
    "t170_l_diversity":
        "One map-side-combinable (quasi, sensitive) count is the only corpus-sized stage; the entropy window partitions by the quasi key over the ALREADY-AGGREGATED frame (bounded by per-group sensitive cardinality), and the per-term BIGINT micro-log rounding makes the entropy sum order-independent.",
    "t171_benford":
        "The corpus collapses to (group, leading digit) counts in one partial-aggregated pass — digit extraction is integer string arithmetic on BIGINT cents, no float log10 near decade boundaries; the 9-row digit grid explodes from the group totals (absent digits score their full Benford share) and everything after the first exchange is <= 9 rows per group.",
    "t172_conformal":
        "t161's chain on the calibration slice: map-side (group, score) tie collapse, per-group cumulative window over DISTINCT scores for the ceil((n+1)(1-alpha)) order statistic (bin first, t137/t139, at billion-distinct-score cardinality); the test slice reduces through ONE count aggregate against the broadcast group-cardinality threshold table.",
    "t173_good_turing":
        "One partial-aggregated (group, 8-byte digest) count is the only corpus-sized exchange; the frequency-of-frequencies collapse runs on the vocabulary-sized frame and the report arithmetic is single-row-per-group.",
    "t174_label_mi":
        "t169's skeleton: digest df counts -> bounded-heap top-k ObjectHashAggregate (k longs of driver state) -> map-side presence filter on the broadcast digest literal; the 2 x |labels| contingency builds from a broadcast cross of two bounded dimensions and every MI term is a BIGINT micro-log — order-independent, no float reduction.",
    "t175_stream_conformal":
        "The post-stream plan: the watermarked (day x type) coverage counts (bounded streaming state, the t134/t153 shape) carry the broadcast-joined threshold columns; the miss-count window partitions by event_type over the days x types frame — calendar-bounded. The calibration side is t172's collapse-then-window chain, run once, batch.",
    "t176_mann_whitney":
        "t161's exact chain with ONE added aggregate column (per-block tie cubes Σ(t³−t), exact BIGINT): same map-side tie collapse, same per-group distinct-score window, no new exchange; σ/z doubles appear only in the |groups|-row projection.",
    "t177_edit_verify":
        "The O(L²) levenshtein kernel appears ONLY after the t4 shortlist (capped posting buckets -> size prefilter -> sorted-intersect Jaccard >= 0.5) and the length quick-reject — the plan's generate/join pyramid is the t4 candidate chain verbatim, with two id-keyed text joins feeding the final codegen'd DP projection. Raw-candidate verification (the 364 s shape) never appears.",
    "t178_rolling_corr":
        "One map-side daily count is the only corpus stage; the five BIGINT moment windows share ONE ordered frame over the days-sized aggregate (a single Window node), and r is a closed-form projection — no second scan, no join.",
    "t179_readability":
        "Per-row codegen'd regexp_count/size expressions (no UDF, no explode) straight into one partial-aggregated group sum of BIGINT micro scores — the plan is scan -> project -> two-phase HashAggregate.",
    "t180_fd_audit":
        "Each audit is count -> lhs-reduction -> 1-row rollup, all partial-aggregated; four audits union AFTER their rollups, so the union carries 4 rows. NULL keys group as values (no null-dropping joins anywhere).",
    "t181_collocations":
        "The three corpus-sized exchanges are all partial-aggregated digest counts (48-bit bigram-pair digest + the two position margins) — each partition collapses to its DISTINCT bigrams before the exchange, with the bigram strings riding as min() payload, so shuffle bytes are vocabulary x partitions, not corpus. The margin joins and the nine-term xlx LLR run on the minCount-filtered bigram vocabulary; N arrives as a broadcast 1-row cross.",
    "t182_dispersion":
        "The corpus stage is one partial-aggregated (type, day) count; the moment aggregate (n, Σx, Σx²) runs on the calendar-bounded daily frame and D is a closed-form projection of exact BIGINTs — one row per type out.",
    "t183_cosine_profile":
        "The vec-id self-join shuffles 8-byte keys (sort-merge on id_a); the cosine kernel + bin assignment are per-row codegen'd projections, the bin histogram is a <= 20-row partial-aggregated count, and the corpus moments reduce to ONE row (decimal(38,0) micro sums — order-independent) broadcast back over the bins.",
    "t184_weighted_quantiles":
        "Values collapse map-side to (flag, price) blocks with exact BIGINT weight sums; cumulative weights ride cumulativeCells (round 12 — range-repartition + per-partition windows + broadcast prefix offsets, parallelism = partition count, never a |groups|-task sort funnel) and the p25/p50/p75 selection is a pure-integer rank test — no q*W float to straddle, no interpolation.",
    "t185_sessions":
        "ONE per-user Window carries the lag, the break flag, and the running break count (same partitioning + ordering — one exchange, one sort; user windows parallelize across the user-id shuffle, a user's rows bound the task); the session roll-up is a map-side-combinable HashAggregate on the same key distribution. Every output column is an exact BIGINT via unix_micros — no float boundary.",
    "t186_fleiss":
        "The three raters are per-row codegen'd projections unioned BEFORE the one ratings-sized exchange — the (source, item, category) partial-aggregated count; the per-item and per-category reductions run on that collapsed frame and the kappa rational is DECIMAL(38,0) integer products with one double divide in the |sources|-row projection. No windows anywhere.",
    "t187_t_closeness":
        "One partial-aggregated (quasi, bin) count is the only corpus-sized exchange; the global bin table broadcasts into the grid join (absent bins still accumulate their cumulative deficit), the per-group cumulative windows span exactly m bin rows, and the EMD terms are DECIMAL(38,0) cumulative products summed then divided ONCE — the verdict compares the already-6dp-rounded emd.",
    "t188_robust_outliers":
        "ONE corpus-sized (group, cents) partial-aggregated count, pinned; the median window, the deviation re-collapse, the MAD window, and the outlier count all run on that distinct-value frame (windows bounded by the quantized domain — bin first, the t137 hatch, past that), with the med/MAD tables broadcast |groups|-row joins. The flag test multiplies through the float factor (|x−med|·10⁴ > 51891·MAD) so no float compare runs.",
    "t189_acf":
        "The corpus-sized stage is the daily count (map-side combinable); the zero-fill grid explodes calendar-bounded sequences, the |groups|-row moment table broadcasts back, and ONE per-group ordered window carries all 7 lag columns (one exchange, one sort over calendar-bounded partitions). The moment aggregate is DECIMAL(38,0) — order-independent — and the lag explode emits 7 rows per group.",
    "t190_kruskal_wallis":
        "Two map-side-combinable collapses — (group, treatment, score) cells and (group, score) tie blocks — are the only corpus-sized stages; the midrank window runs per group over DISTINCT scores (bin first, the t137 hatch, at billion-distinct-score cardinality), rank sums stay exact BIGINTs, and the per-treatment micro terms sum order-independently before the closed-form H.",
    "t191_theil_sen":
        "The pair join expands PERIOD pairs over the days-sized grid (365 days → 66k pairs per group), never row pairs — the t148 Mann–Kendall contract; both median windows run over per-group distinct slope/intercept blocks and the slope broadcast into the intercept pass is |groups|-row.",
    "t193_spearman":
        "ONE (flag, qty, cents) cell collapse is the only corpus-sized exchange (map-side combinable); both marginal midrank windows run per flag over DISTINCT-value cell blocks (bin first, the t137 hatch, at unbounded cardinality), and the five moment sums reduce the cell frame through DECIMAL(38,0) — order-independent — into one row per flag.",
    "t194_jw_verify":
        "The SNM candidate generator: exact-collapse first, min-shingle-digest key per rep (one kernel pass), the global rank via denseIds' range repartition + broadcast offsets (parallel per-partition sorts — NO single-task window), then one 8-byte rank-keyed join makes exactly window*n candidate pairs. Texts join back by id only for candidates; the JW kernel is one codegen'd O(len*window) pass per pair — no DP table.",
    "t195_isotonic":
        "The (dow, bin) count collapse is the only corpus-sized stage; the cumulative window, the bins^2 segment join, and the bins^3 minimax reduction all run on the <= 10-row per-group frame — bounded by the FIXED bin count, invariant to row count. Every segment average is one IEEE divide of exact BIGINT cumulative sums.",
    "t196_snm_block":
        "t194's blocking chain (rank via range repartition + broadcast offsets, window*n candidates from one rank-keyed join) plus the sorted 8-byte hash-set intersection kernel per candidate — the fixed-budget complement to t2/t4's bucket generators: candidate count is exactly window*n_reps by construction, no bucket-skew tail, no cap tuning.",
    "t197_cramers_v":
        "ONE (mon, flag, status) cell collapse is the only corpus-sized exchange (map-side combinable); marginals, the r*c grid join (absent cells still contribute expected mass), and the micro-unit chi-square reduction are all category-cardinality — the float-sum hazard is closed by BIGINT micro terms.",
    "t198_kendall_tau":
        "The (flag, qty, tick) cell collapse is the only corpus-sized stage; the concordance join is per-flag DISTINCT-CELL pairs — bounded by the 50x11 quantized domain squared, NEVER rows — and tie terms/the verdict are marginal-cardinality. At unbounded value cardinality the contract says bin first or use t193's window-linear Spearman.",
    "t199_skew_kurtosis":
        "The corpus-sized stage is the daily count (map-side combinable); the |groups|-row moment table broadcasts back and the DECIMAL(38,0) m2/m3/m4 reduction runs on calendar-bounded rows. Same shape as t189's moment stage, two more powers.",
    "t200_assortativity":
        "One (u,v)-distinct edge collapse (8-byte keys), one node-keyed degree count, two edge-keyed degree joins, and a map-side-combinable 5-moment DECIMAL(38,0) reduction over both orientations — no windows, no driver state, nothing quadratic (the one scan-shaped member of the graph family).",
    "t201_basket_rules":
        "One (txn, item) DISTINCT collapse; pair expansion bounded by basket size (co-occurrence pairs, never row pairs); pair/item counts are 8-byte-key map-side-combinable reductions; min-support HAVING prunes the tail BEFORE the metric join; top-k is TakeOrdered (per-partition heap + driver merge), never a global sort.",
    "t202_smd_balance":
        "ONE map-side-combinable (source, side) moment collapse is the only corpus-sized stage; the A-x-B self-join and the SMD chain run on |groups| rows. Moments are DECIMAL(38,0).",
    "t203_trimmed_mean":
        "One (flag, cents) cell collapse rides the scan; cumulative counts ride cumulativeCells (round 12 — no |groups|-task funnel) and the interval-overlap clip makes partial tie blocks exact integers; one weighted DECIMAL(38,0) reduction.",
    "t204_theil":
        "The per-user count collapse is the corpus-sized stage (map-side combinable); the |groups|-row total table broadcasts back, each entity contributes one micro-rounded BIGINT log term (order-independent sum), and the index is one divide.",
    "t206_median_ci":
        "One (flag, cents) cell collapse rides the scan; cumulative counts ride cumulativeCells (round 12: range-repartition + per-partition windows + broadcast prefix offsets — the round-11 rc=1 post-mortem: the old per-flag window was a 3-task sort funnel, 8.6 s on the driver) and all three outputs are rank-test SELECTIONS in one reduction — no bootstrap replicates anywhere in the plan.",
    "t207_rfm":
        "The per-user collapse is the only corpus-sized stage; the three cut tables window over (metric)-keyed DISTINCT-value cells (3 partitions), pivot to ONE broadcast row, and scoring is per-row comparisons into a <= 27-row aggregate. No ntile, no global rank.",
    "t208_lorenz":
        "The caller's per-user collapse feeds one (type, mass) cell collapse; cumulative counts/masses ride cumulativeCells (round 12 — no |groups|-task funnel), and the 10-way clip explode keeps partial tie blocks exact integers — the trimmedMean machinery swept across all deciles in one pass.",
    "t209_mcnemar":
        "ONE map-side-combinable per-flag collapse to (n, b, c) exact BIGINTs; the statistic and verdict are per-group scalar expressions. Nothing after the scan exceeds |groups| rows.",
    "t210_cuped":
        "The per-user collapse is the corpus-sized stage; the 1-row theta/xbar moment aggregate broadcasts back, each user's adjusted metric micro-rounds to a BIGINT in one kernel pass, and the per-arm reduction is 2 rows. No windows.",
    "t211_chapman":
        "ONE map-side-combinable per-source collapse to three exact capture counts; the Chapman estimate is one IEEE divide per group row.",
    "t212_chao1":
        "Bigrams collapse to 48-bit digests through TWO map-side-combinable stages — (source, digest) counts then the 3-number frequency profile — so shuffles carry 8-byte digests and the estimate is a closed form on |sources| rows.",
    "t213_seq_monitor":
        "One map-side-combinable (day, arm) moment collapse is the only corpus-sized stage; the cumulative windows span per-arm calendar-bounded partitions, the a-b join is day-keyed, and the Lambda/p chain runs per-row on <= |days| rows. The running-max window is the days frame, never the corpus.",
    "t214_seasonality":
        "The caller's daily count is the corpus-sized stage; two map-side-combinable reductions over the calendar-bounded daily frame and one broadcast |groups|-row join produce the 7 x |groups| index table.",
    "t215_entity_resolve":
        "The full ER pipeline in one plan: exact-collapse first, the t196 blocking chain (range-repartition rank, window*n candidates), per-candidate JW kernels, pointer-jumping components in O(log n) rounds (id-keyed 8-byte joins, the t18 machinery), and a component-keyed canonical reduction. No window funnels anywhere; the recursive part is the CC rounds, each a bounded join+groupBy.",
    "t216_delta_attribution":
        "ONE map-side-combinable (cell, side) collapse; deltas are integer subtractions that sum EXACTLY to the broadcast 1-row total, so nothing after the scan exceeds |cells| rows.",
    "t217_pool_embed":
        "ONE groupBy(doc) shuffle carries (id, vector) structs; the fold is a per-row lambda over the sorted chunk list (bounded by chunks-per-doc), and the QA summaries are per-row dim folds. No window, no driver state — chunks fold in id order so the float sums are deterministic.",
    "t218_srm":
        "ONE map-side-combinable (day, arm) collapse to two exact BIGINTs per day; the chi-square and flag are per-row scalars on the days frame.",
    "t219_win_matrix":
        "The (source, length) cell collapse rides the scan; the dense grid is |groups|*|domain| rows with per-group cumulative windows over the bounded domain, and the pair stage is ONE value-keyed join of a-cells against the grid — never a cells-squared blowup; the 2W mass stays exact BIGINT.",
    "t220_neyman":
        "ONE map-side-combinable stratum moment collapse; sigma/weights/allocations are |strata|-row arithmetic against a broadcast 1-row total.",
    "t222_seasonal_outliers":
        "The daily count is the corpus stage; phase/moment tables broadcast back as |groups|*cycle-row joins, the deseasonalized micro value is one IEEE divide of exact DECIMAL(38,0) products per day, and the median/MAD passes run on distinct micro cells over the calendar-bounded frame (the t188 chain).",
    "t223_column_entropy":
        "|columns| map-side branches union into ONE (column, value) count collapse; micro-log BIGINT terms sum order-independently and the entropy is one divide per column row.",
    "t224_fd_mine":
        "12 rule-labeled branches union map-side into ONE (rule, lhs, rhs) count collapse; the majority-mass chain after it is group-cardinality. One generic plan regardless of how many rules are mined.",
    "t225_winsorized":
        "The trimmedMean shape with boundary SELECTIONS instead of drops: one cell collapse, cumulative counts via cumulativeCells (round 12 — no |groups|-task funnel), one DECIMAL(38,0) reduction carrying the clip weights and both fence values.",
    "t226_label_separation":
        "ONE corpus-pass hash aggregate (round 11 — the round-10 posexplode *dim row amplification is gone): per label n, the squared-norm fold, and 64 element_at DECIMAL component sums, all map-side-combining, so only |labels|*64 values shuffle; the centroid identity makes intra/inter means label-cardinality arithmetic with nothing pairwise ever materialized.",
    "t227_chi2_residuals":
        "The cramersV shape with the residual emitted per grid cell instead of folded into V: one (mon, flag, status) collapse, category-sized marginals and grid join, one IEEE divide+sqrt of exact DECIMAL integers per cell.",
    "t228_info_gain":
        "|features| map-side branches union into ONE (feature, value, label) count collapse; per-value totals, the micro-log reductions, and the label-entropy broadcast are all value-/label-cardinality.",
    "t229_dedup_savings":
        "The t38 component pipeline (capped posting candidates, pointer-jumping CC rounds) plus ONE component-keyed byte reduction and a 1-row verdict — the dedup machinery reused to price itself.",
    "t230_ratio_ci":
        "The per-user collapse rides the scan; ONE map-side-combinable 6-moment DECIMAL(38,0) reduction to |groups| rows carries ratio, variance components, and bounds. No windows, no driver state.",
    "t231_mde":
        "The per-user collapse + one 3-moment reduction to |groups| rows; sigma/MDE are per-row scalars of exact integers with the shared z literals.",
    "t232_influence":
        "ONE group-moment collapse; the global total joins back as a broadcast 1-row frame and every output is one divide of exact DECIMAL sums.",
    "t233_damerau_verify":
        "t194's blocking chain (range-repartition rank, window*n candidates, id-keyed text joins) with the full-DL kernel replacing JW: one codegen'd O(|a|*|b|) DP per candidate pair — the contract is a shortlisted pair set, never raw cross products.",
    "t234_concentration":
        "The per-user collapse rides the scan; ONE map-side-combinable reduction carries the DECIMAL(38,0) HHI moments AND the bounded-heap top-k aggregate — no window, no sort, |groups| output rows.",
    "t192_triangles":
        "Per-order pair expansion is bounded by order size (≤ 13 lineitems → ≤ 78 pairs); edges dedup through one (u, v)-keyed distinct — 8-byte shuffles — and the degree-ordered orientation bounds every oriented out-degree by O(√m), making the wedge-closure join O(m^1.5) regardless of hub skew (a hub's star orients INTO it, generating no wedges). No windows, no driver state.",
}

def plan_of(q):
    out = subprocess.run(
        ["bash", os.path.join(root, "scripts/run_main.sh"), "graft.Smoke", q, SF],
        capture_output=True, text=True).stdout
    m = re.search(r"== Physical Plan ==\n(.*?)\n\n", out, re.S)
    tree = m.group(1) if m else "(no plan captured)"
    details = []
    for line in out.splitlines():
        s = line.strip()
        if s.startswith(("PushedFilters:", "ReadSchema:")) and s not in details:
            details.append(s)
    return tree, details

def section_text(q):
    tree, details = plan_of(q)
    s = f"\n## {q}\n\n```\n== Physical Plan ==\n{tree}\n"
    if details:
        s += "\n" + "\n".join(details) + "\n"
    s += "```\n"
    if q in NOTES:
        s += "\n" + NOTES[q] + "\n"
    return s

if ONLY is not None:
    path = os.path.join(root, "docs/PLANS.md")
    body = open(path).read()
    for q in ONLY:
        sec = section_text(q)
        pat = re.compile(rf"\n## {re.escape(q)}\n.*?(?=\n## |\Z)", re.S)
        if pat.search(body):
            body = pat.sub(lambda _m: sec, body, count=1)
            print(f"replaced {q}")
        else:
            body += sec
            print(f"appended {q}")
    open(path, "w").write(body)
    print("done (patched) -> docs/PLANS.md")
    sys.exit(0)

with open(os.path.join(root, "docs/PLANS.md"), "w") as f:
    f.write("""# PLANS — formatted physical plans of headline queries (sf0.01)

Generated by `scripts/gen_plans.py` (graft.Smoke formatted explain) —
evidence for the scale-design claims: filter/projection pushdown at the
scan, broadcast joins for dimensions, partial (map-side) aggregation,
and the bounded-heap partial top-k replacing per-query windows.
Regenerate after plan-affecting changes. Note t13 shows the EXACT
ntile-binning variant (the oracle-checkable form the driver query now
runs — deliberately a global window); the distributed salted two-level
sampler remains the scale path and its plan shape is asserted in
OlsSpec ("the wide exchange is salted, not bins-only").
""")
    for q in QUERIES:
        tree, details = plan_of(q)
        f.write(f"\n## {q}\n\n```\n== Physical Plan ==\n{tree}\n")
        if details:
            f.write("\n" + "\n".join(details) + "\n")
        f.write("```\n")
        if q in NOTES:
            f.write("\n" + NOTES[q] + "\n")
        print(f"wrote {q}")
print("done -> docs/PLANS.md")
