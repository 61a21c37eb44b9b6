package graft

/** Golden-coverage gauge (round-12 verdict ask 3) — `never_benched`'s
  * exact analog for the golden program.
  *
  * The oracle gates cross-ENGINE divergence; it is blind to
  * cross-DERIVATION error (the same hand writing both mirrors). The
  * golden program closes that blind spot and is two-for-two on real
  * bugs (r11 shared-midrank, r12 χ² empty cells) — but until this
  * round nothing enumerated WHICH registry queries still lack an
  * independent anchor, so each part targeted "whatever felt risky"
  * instead of what was measurably uncovered. This object is the
  * explicit, auditable classification of every registry query:
  *
  *  - [[anchors]] — queries whose value semantics are pinned by an
  *    independent anchor: a published worked example, a structural
  *    theorem/ceiling, or an independent reimplementation (golden
  *    specs), or a unit spec that re-derives the result by brute
  *    force / plain-Scala replay / property law. The map value names
  *    the spec and the anchor so the claim is checkable.
  *  - [[declarative]] — queries whose Spark side composes BUILT-IN
  *    relational operators (scan/filter/join/aggregate/window/pivot)
  *    and whose oracle is the same declarative spec evaluated by an
  *    independent engine (DuckDB). Engine diversity IS the anchor
  *    there: a mirror-shared bug requires both engines to misread
  *    the same SQL semantics the same way. Hand-rolled ALGORITHMS
  *    (recursions, iterations, sketches, samplers, bit tricks) never
  *    qualify, even when short — that is exactly the χ²-empty-cell
  *    class.
  *  - everything else — [[neverGoldened]], the published gap list.
  *    GoldenCoverageSpec writes it to GOLDEN_COVERAGE.json and pins
  *    the expected list, so a new unclassified query fails the build
  *    and the list can only shrink deliberately (the never_benched
  *    discipline applied to derivation coverage).
  */
object GoldenCoverage {

  /** Query → the spec (and anchor kind) that independently pins it. */
  val anchors: Map[String, String] = Map(
    // ----- the golden program: published values / theorems /
    // independent reimplementations through the REAL closures -----
    "a30_ks_test" -> "InferenceGoldenSpec (KS D=1 ceiling + hand table)",
    "a38_mann_whitney" -> "InferenceGoldenSpec (published U; midrank recompute)",
    "a49_spearman" -> "InferenceGoldenSpec (published IQ/TV rho)",
    "a50_mann_kendall" -> "InferenceGoldenSpec (S lattice hand values)",
    "a54_welch_ttest" -> "InferenceGoldenSpec (published worked example)",
    "a62_kruskal_wallis" -> "InferenceGoldenSpec (published H)",
    "a63_cochran_armitage" -> "InferenceGoldenSpec (published trend Z)",
    "a64_jarque_bera" -> "InferenceGoldenSpec (moment hand recompute)",
    "a68_kendalls_w" -> "InferenceGoldenSpec (concordance ceiling W=1)",
    "a69_friedman" -> "InferenceGoldenSpec (ceiling + published chi2)",
    "a70_mcnemar" -> "InferenceGoldenSpec (discordant-pair hand values)",
    "a71_page_trend" -> "InferenceGoldenSpec (Page L ceiling)",
    "a72_wilcoxon_signed" -> "InferenceGoldenSpec (W+=27 published)",
    "a73_brown_forsythe" -> "InferenceGoldenSpec (median-center recompute)",
    "a75_mantel_haenszel" -> "InferenceGoldenSpec (published pooled OR)",
    "a76_hodges_lehmann" -> "InferenceGoldenSpec (pairwise-median recompute)",
    "a78_seasonal_mk" -> "InferenceGoldenSpec (per-season S hand values)",
    "t_pettitt" -> "InferenceGoldenSpec (max|U_t| = t(n-t) theorem)",
    "a24_chi_square" -> "InferenceGolden2Spec (V=1 ceiling family; caught the empty-cell bug)",
    "a36_survival_km" -> "InferenceGolden2Spec (Freireich 1965 KM ladder)",
    "a37_logrank" -> "InferenceGolden2Spec (Freireich log-rank chi2=16.793)",
    "a39_wilson_ci" -> "InferenceGolden2Spec (Newcombe 1998 81/263)",
    "a52_nelson_aalen" -> "InferenceGolden2Spec (hazard ladder hand values)",
    "a59_energy_distance" -> "InferenceGolden2Spec (closed-form two-sample)",
    "a67_cramers_v" -> "InferenceGolden2Spec (Cramer V=1 / V=0 ceilings)",
    "a74_sprt" -> "InferenceGolden2Spec (Wald ln 19 lattice)",
    "a77_cramer_von_mises" -> "InferenceGolden2Spec (Anderson rank form)",
    "t_cusum_shift" -> "InferenceGolden3Spec (Page CUSUM zero + hand walk)",
    "t_dtw_monthly" -> "InferenceGolden3Spec (Sakoe-Chiba DP reimplementation)",
    "t_holt_forecast" -> "InferenceGolden3Spec (linear-trend invariance)",
    "t_runs_test" -> "InferenceGolden3Spec (hand run counts)",
    "t_stl_strength" -> "InferenceGolden3Spec (Hyndman F_s in {0,1})",
    "t_theil_sen" -> "InferenceGolden3Spec (pairwise-slope median recompute)",
    "t_theil_sen_counts" -> "InferenceGolden3Spec (un-shadowed by this golden)",
    "a32_gini_spend" -> "InferenceGolden4Spec (two derivations agree)",
    "a44_markov_stationary" -> "InferenceGolden4Spec (doubly-stochastic uniform law)",
    "a53_shapley_attribution" -> "InferenceGolden4Spec (symmetry + efficiency axioms)",
    "a56_median_of_means" -> "InferenceGolden4Spec (hand blocks)",
    "a57_cuped" -> "InferenceGolden4Spec (variance-reduction identity)",
    "a58_diff_in_diff" -> "InferenceGolden4Spec (2x2 closed form)",
    "a22_ab_test" -> "InferenceGolden6Spec (two-proportion z hand values)",
    "a33_bootstrap_ci" -> "InferenceGolden6Spec (constant fixed point)",
    "a34_dispersion" -> "InferenceGolden6Spec (index hand values)",
    "a40_bootstrap_median" -> "InferenceGolden6Spec (constant fixed point)",
    "a47_changepoint_binseg" -> "InferenceGolden6Spec (argmax walk reimpl)",
    "a66_power_mde" -> "InferenceGolden6Spec (z0.975+z0.8 = 2.801585)",
    "t_ljung_box" -> "InferenceGolden6Spec (periodic rho^2 = 1)",
    "a29_correlation" -> "InferenceGolden7Spec (Pearson +-1 ends)",
    "a31_ols_hourly" -> "InferenceGolden7Spec (exact-plane recovery)",
    "t_pacf" -> "InferenceGolden7Spec (Durbin-Levinson on pair-loop ACF)",
    "t_burst_viterbi" -> "InferenceGolden8Spec (two-state Viterbi replay)",
    "t_drift_mix" -> "InferenceGolden8Spec (Lin JSD ln 2 / TV 1 ends)",
    "t_psi_drift" -> "InferenceGolden8Spec (PSI == 0 identity)",
    "a19_assoc_rules" -> "InferenceGolden9Spec (lift scale exact ends)",
    "a21_pareto_abc" -> "InferenceGolden9Spec (ABC integer boundary)",
    "a43_max_drawdown" -> "InferenceGolden9Spec (hand path)",
    "a16_funnel_stages" -> "InferenceGolden10Spec (hand funnel)",
    "audit_k_anonymity" -> "InferenceGolden10Spec (k ceiling)",
    "audit_l_diversity" -> "InferenceGolden10Spec (l ceiling)",
    "audit_t_closeness" -> "InferenceGolden10Spec (t ceiling)",
    "t_gap_fill" -> "InferenceGolden11Spec + SkylineSpec (interpolation definition)",
    "w18_five_number" -> "InferenceGolden11Spec (Hyndman-Fan type-7 on R's fixture)",
    "t_autocorrelation" -> "InferenceGolden12Spec (per-lag ACF hand values)",
    "t_burstiness" -> "InferenceGolden12Spec (Goh-Barabasi B=-1 floor)",
    "t_hour_uniformity" -> "InferenceGolden12Spec (uniformity ends)",
    "t_record_breaks" -> "InferenceGolden12Spec (record-count ends)",
    "tx9_repetition_filter" -> "InferenceGolden13Spec (hand ratios, float boundary)",
    "tx10_tfidf_top_terms" -> "InferenceGolden13Spec (Sparck Jones zero-weight law)",
    "w7_mad_outliers" -> "InferenceGolden14Spec (Iglewicz-Hoban 0.6745/3.5)",
    "w10_trimmed_mean" -> "InferenceGolden14Spec (Tukey rank trim)",
    "g1_pagerank" -> "GraphGoldenSpec (regular-graph uniformity) + PageRankSpec (integer replay)",
    "g2_triangles" -> "GraphGoldenSpec (K6 census) + TrianglesSpec (known censuses)",
    "g3_kcore" -> "GraphGoldenSpec (Seidman invariance) + KCoreSpec (hand peel)",
    "g3b_kcore_frontier" -> "GraphGoldenSpec + KCoreSpec (converged-round contract)",
    "g5_label_prop" -> "GraphGoldenSpec + LabelPropSpec (plain-Scala replay)",
    "g6_hits" -> "GraphGoldenSpec (bipartite fixed point) + HitsSpec (replay)",
    "g12_transitivity" -> "GraphGoldenSpec (clique/star ends)",
    "g13_sssp" -> "GraphGoldenSpec (Bellman-Ford replay)",
    "tx58_dup_span_coverage" -> "DupSpanGoldenSpec (Lee et al. metric, hand spans)",
    "tx52_fleiss_kappa" -> "InferenceGolden15Spec (Fleiss 1971 textbook-route recompute; kappa=1 ceiling)",
    "a42_kmv_distinct" -> "InferenceGolden15Spec (n<=k exactness theorem; independent hash replay of (k-1)P/h_k)",
    "a48_bitmap_distinct" -> "InferenceGolden15Spec (OR-rollup == exact distinct; non-additivity gap)",
    "w14_trimean" -> "InferenceGolden15Spec (Tukey hand quartiles incl. skewed shoulder)",
    "w17_winsorized_mean" -> "InferenceGolden15Spec (hand order-statistic clamp, outlier leverage removed exactly)",
    "tx35_weighted_median" -> "InferenceGolden15Spec (2cw>=W suffix rule hand-walked incl. exact-half boundary)",
    "t_goertzel_power" -> "InferenceGolden15Spec (power == quarter-bin |DFT|^2 from the definition; zero at constant)",
    "g15_link_prediction" -> "InferenceGolden15Spec (Zhou-Lu-Zhang RA hand graph; specialists beat generalists)",
    "g18_modularity" -> "InferenceGolden15Spec (disjoint equal bicliques -> Q = 1/2 closed form)",
    "t_trend_slope" -> "InferenceGolden16Spec (exact-line recovery; single-hour NULL guard)",
    "t_seasonal_residual" -> "InferenceGolden16Spec (strict 1.25x/0.75x boundaries pinned both sides)",
    "t_rolling_corr" -> "InferenceGolden16Spec (Pearson +-1 ceilings; zero-variance frame pinned out)",
    "audit_benford" -> "InferenceGolden16Spec (published log10(1+1/d) expectations vs hand shares)",
    "w13_gini_mean_diff" -> "InferenceGolden16Spec (closed form == hand pair enumeration, ties included)",
    "w15_equidepth_hist" -> "InferenceGolden16Spec (one-per-bucket spread; tie-straddle drift hand-pinned)",
    "a45_kmv_overlap" -> "InferenceGolden16Spec (below-k exactness of the theta-sketch estimator chain)",
    "sim2_norm_stats" -> "InferenceGolden16Spec (3-4-5 / 5-12-13 Pythagorean triangles)",
    "sim6_l2_normalize" -> "InferenceGolden16Spec (renorm == 1 theorem; exact first components)",
    "tx26_bm25" -> "InferenceGolden16Spec (Robertson/Zaragoza hand corpus, idf = ln 2 exactly)",
    "tx45_pmi_collocations" -> "InferenceGolden16Spec (Church-Hanks hand corpus, PMI = ln 2 exactly)",
    "tx50_unigram_viterbi" -> "InferenceGolden16Spec (independent imperative DP over the pinned piece table)",
    "j16_interval_union" -> "InferenceGolden17Spec (hand islands; strict touching-intervals merge rule)",
    "j17_asof_nearest" -> "InferenceGolden17Spec (merge_asof nearest semantics by hand: tie->prior, same-ts, NULL)",
    "j7_pit_join" -> "InferenceGolden17Spec (hand version visibility incl. on-date and before-first NULL)",
    "split_train_holdout" -> "InferenceGolden17Spec (independent polynomial-hash replay; partition theorem)",
    "split_group_aware" -> "InferenceGolden17Spec (group atomicity + independent group-hash replay)",
    "sample_exact_k" -> "InferenceGolden17Spec (exactly-k theorem; kept SET replays the md5 ranking)",
    "sample_stratified" -> "InferenceGolden17Spec (independent per-doc hash replay of the kept counts)",
    "g8_neighbor_jaccard" -> "InferenceGolden17Spec (hand J values; J=1 niche > giants; hub prune)",
    "g9_seed_harmonic" -> "InferenceGolden17Spec (hand depth-2 Rochat harmonic on a seed path)",
    "g19_degree_tail" -> "InferenceGolden17Spec (bit-length buckets on a hand K5 co-purchase graph)",
    "layout_zorder" -> "InferenceGolden17Spec (hand Morton codes incl. the 63->64 quadrant seam)",
    "sim1_topk_bruteforce" -> "InferenceGolden18Spec (hand cosines 1 / 1-over-sqrt2 / 0, tie-break pinned)",
    "sim7_label_centroids" -> "InferenceGolden18Spec (hand element-wise means; norm sqrt(20))",
    "sim13_native_centroids" -> "InferenceGolden18Spec (same hand centroid via the native aggregate path)",
    "sim14_mips_topk" -> "InferenceGolden18Spec (hand integer dots; high norm beats better angle)",
    "sim12_hybrid_rrf" -> "InferenceGolden18Spec (published 1/(60+rank) fusion replayed by hand)",
    "sim21_pca_power" -> "InferenceGolden18Spec (one-axis variance recovers the axis, loading 1e6)",
    "sim22_dbscan" -> "InferenceGolden18Spec (hand angle ladder: 4 cores / 1 border / 1 noise)",
    "a51_markov_removal" -> "InferenceGolden19Spec (Anderl removal effect exact rationals: 3/4, 1/3, 1/2)",
    "tx53_lsh_param_sweep" -> "InferenceGolden19Spec (S-curve exact ends: recall 1 at s=1, fp 0 at s=0)",
    "tx36_waterfill_budget" -> "InferenceGolden19Spec (hand level, sum min(n,t) = B, remainder by name)",
    "tx12_bigram_lm_score" -> "InferenceGolden19Spec (ln(c2/c1) replay; rare bigram crosses the gate)",
    "tx7_canonical_dedup" -> "InferenceGolden19Spec (hand raw-vs-canonical counts; cross-doc collision)",
    "m11_byte_entropy" -> "InferenceGolden19Spec (Shannon hand values: ln 2, 0, ln 4)",
    "g20_assortativity" -> "InferenceGolden19Spec (star reads Newman r = -1 exactly)",
    "a55_conformal_interval" -> "InferenceGolden19Spec (hand order statistic + hand coverage)",
    "tx41_decontamination" -> "InferenceGolden20Spec (hand 5-gram overlap, counted once)",
    "tx42_sequence_packing" -> "InferenceGolden20Spec (hand pack ids at B=2048 incl. exact boundary)",
    "j13_item_cf" -> "InferenceGolden20Spec (hand basket cosines; support cut; skey tie by id)",
    "t_sequence_likelihood" -> "InferenceGolden20Spec (hand matrix ln replay; improbable chain first)",
    "dedup_containment_pairs" -> "InferenceGolden20Spec (C_max = 1 ceiling with exact intersection)",
    "tx28_eval_metrics" -> "InferenceGolden21Spec (confusion-definition replay; van Rijsbergen F1)",
    "tx40_cohens_kappa" -> "InferenceGolden21Spec (textbook (po-pe)/(1-pe) route on the replayed 2x2)",
    "tx43_auc_exact" -> "InferenceGolden21Spec (brute-force Mann-Whitney pair counting, ties at 1/2)",
    "tx29_calibration" -> "InferenceGolden21Spec (replayed decile bins, exact per-bin rates)",
    "tx48_brier_decomp" -> "InferenceGolden21Spec (Murphy identity vs an independent binned Brier)",
    "t_rate_anomaly" -> "InferenceGolden22Spec (hand z = 10/sqrt(11); sd=0 degenerate pinned)",
    "g16_local_bridges" -> "InferenceGolden22Spec (triangle-plus-pendant: only the pendant bridges)",
    "tx3_lang_confusion" -> "InferenceGolden22Spec (hand marker argmax, confusion cell, und fallback)",
    "tx14_pii_scrub" -> "InferenceGolden22Spec (planted address found once; zero-residual theorem)",
    "tx30_distinctive_terms" -> "InferenceGolden22Spec (Dunning exclusive-term closed form 20 ln 2)",
    "tx44_leakage_safe_split" -> "InferenceGolden22Spec (structural zero straddle; replayed naive leak)",
    "audit_functional_deps" -> "InferenceGolden22Spec (hand violations; excess = sum(k-1) repair bound)",
    "layout_hilbert" -> "InferenceGolden22Spec (canonical imperative xy2d agreement on scattered points)",
    "tx32_phrase_search" -> "InferenceGolden23Spec (hand postings intersection; reversed/gapped excluded)",
    "tx33_lexical_complexity" -> "InferenceGolden23Spec (vowel-group heuristic: united=3, cat=1, xyz=0)",
    "tx34_shingle_novelty" -> "InferenceGolden23Spec (hand df=1 fractions: 1/2, 1/2, 1)",
    "tx13_passage_dedup" -> "InferenceGolden23Spec (planted re-crawl duplicates exactly its chunks)",
    "tx22_dup_ngram_coverage" -> "InferenceGolden23Spec (clone pair's positions exactly; within-doc excluded)",
    "pack_sequences" -> "InferenceGolden24Spec (hand concat-and-chunk bins per source)",
    "sample_allocation" -> "InferenceGolden24Spec (Hamilton largest-remainder; sum(alloc) = k exactly)",
    "g14_hierarchy_rollup" -> "InferenceGolden24Spec (hand 3-level chain to true root/depth via doubling)",
    "tx47_target_encoding" -> "InferenceGolden24Spec (out-of-fold complement identity on a hand table)",
    "j6_fuzzy_join" -> "InferenceGolden25Spec (FastSS three match classes by hand via the variant join)",
    "dedup_sparse_cosine" -> "InferenceGolden25Spec (cos=1 exact dot; 2-of-3 overlap pruned by absence)",
    "tx16_temperature_mixture" -> "InferenceGolden25Spec (rate min(1,16/sqrt n) at n=400; hash replay)",
    "diff_merge3" -> "InferenceGolden26Spec (all eight resolution classes, id-sum pinned)",
    "tx56_novelty_curve" -> "InferenceGolden26Spec (first-seen trigram deciles by hand; decile clamp)",
    "tx49_gini_features" -> "InferenceGolden26Spec (CART gain replay over the score protocol)",
    "j8d_fellegi_sunter" -> "InferenceGolden27Spec (separable decision table: match/nonmatch closed-form ends)",
    "a41_hll_distinct" -> "InferenceGolden27Spec (full independent Flajolet replay incl. the LC branch)",
    "tx25_bpe_encode" -> "InferenceGolden28Spec (pinned merge fuses by hand; unmatched words stay apart)",
    "tx55_dup_source_mix" -> "InferenceGolden28Spec (single- vs cross-source clusters, hand purity)",
    "est_hll_curve" -> "InferenceGolden28Spec (independent register replay across all three arms)",
    "j8_record_linkage" -> "InferenceGolden29Spec (hand decision table, one pair per cell; band-straddle blocking miss pinned)",
    "j8b_sorted_neighborhood" -> "InferenceGolden29Spec (hand w=2 windows; catches the pair banding misses)",
    "j6b_fuzzy_join_d2" -> "InferenceGolden29Spec (lev 0/1/2 classes by hand; depth-2-only reachability; lev-3 never a candidate)",
    "dedup_incremental" -> "InferenceGolden30Spec (history-wins keep-first by hand; within-batch dups both pass)",
    "dedup_incremental_near" -> "InferenceGolden30Spec (asymmetric split: arrival-x-history only, jac=1 exact, min-history first_match)",
    "m7_audio_frame_energy" -> "InferenceGolden31Spec (imperative PCM replay through the real WAV decode; 1-frame block boundary)",
    "m12_energy_dips" -> "InferenceGolden31Spec (imperative threshold/island replay; single-block strict-< pin)",
    "m8_image_dhash" -> "InferenceGolden31Spec (pixel-arithmetic dhash replay through real PNG/BMP decode; cross-codec theorem)",
    "m10_byteslice_frames" -> "InferenceGolden31Spec (hand ASCII slices; max(1,n/10) length; empty-tail clamp)",
    "g4_ppr_seeds" -> "InferenceGolden32Spec (3-round integer PPR hand trace; no-seed all-zero theorem)",
    "g10_assortativity" -> "InferenceGolden32Spec (star r=-1 exactly; regular-graph empty guard)",
    "g11_rich_club" -> "InferenceGolden32Spec (hand 20-node decile club, density 1 vs 28/380)",
    "g17_core_decomposition" -> "InferenceGolden32Spec (hand Seidman peel: supported K4=3-core, pendant=1)",
    "g22_neighborhood_function" -> "InferenceGolden32Spec (independent ANF replay: hash, rho ladder, max-merge balls, 0.673 m^2)",
    "a61_bh_fdr" -> "InferenceGolden33Spec (full independent BH replay: randomization p, tie-broken ranks, 5c<=4r k*; identical pairs p=1)",
    "t_forecast_skill" -> "InferenceGolden33Spec (hand ends: 24-periodic skill 0; anti-phase skill 24)",
    "sim17_ranking_ndcg" -> "InferenceGolden33Spec (ceiling ndcg=mrr=1 through real IVF; hand DCG 9885074/10271927 miss case)",
    "sim25_davies_bouldin" -> "InferenceGolden33Spec (imperative DB replay against the pinned Lloyd fit)",
    "tx38_isotonic_calibration" -> "InferenceGolden33Spec (closed form == sequential Ayer PAV stack on bins with a real violator)",
    "tx4_fingerprint_sample" -> "InferenceGolden34Spec (RFC 1321 md5 test-suite values; independent char-fold replay)",
    "tx27_textrank" -> "InferenceGolden34Spec (2-word fixed point at Scale; star hub/leaf 3-round hand trace)",
    "tx46_style_distance" -> "InferenceGolden34Spec (hand per-mille profiles; zero-filled one-sided vocab; L1 = 99999)",
    "tx51_rake_keywords" -> "InferenceGolden34Spec (Rose et al. deg/freq by hand; long phrase beats frequent word)",
    "tx57_feature_hash" -> "InferenceGolden34Spec (full replay: trigrams, poly hash, bucket fold, collided mass)",
    "sketch_cms_token_freq" -> "InferenceGolden34Spec (hand exact counts; absent probe 0; Cormode bound everywhere)",
    "tx17_epoch_oversample" -> "InferenceGolden34Spec (integer whole-epoch arithmetic; fractional gate hash-replayed)",
    "tx21_source_cap" -> "InferenceGolden34Spec (all-tie keep-set: doc_id fallback, exact kept ids)",
    "tx24_quantile_normalize" -> "InferenceGolden34Spec ((rank-1)/(n-1) decile boundary by hand; singleton pr = 0)",
    "tx37_proximity_search" -> "InferenceGolden34Spec (hand positions: in-slop hit, over-slop miss, order requirement)",
    "a60_permutation_test" -> "InferenceGolden35Spec (full independent randomization replay; identical-dist p = 1)",
    "a12b_tdigest_quantiles" -> "InferenceGolden35Spec (hand type-7 quantiles on data-point-aligned counts; sketch bound)",
    "diff_merkle_buckets" -> "InferenceGolden35Spec (Merkle locality: change/remove/add in exactly their buckets)",
    "dedup_semantic_cells" -> "InferenceGolden35Spec (hand pair/drop fold over exact 1.0/0.0 cosines per pinned cell)",
    "sim8_hard_negatives" -> "InferenceGolden35Spec (Pythagorean band edges incl. the strict 0.6 exclusion)",
    "sim18_mutual_nn" -> "InferenceGolden35Spec (reciprocity by hand: one (a<b) pair; unreciprocated top-1 dropped)",
    "sim19_ratio_test" -> "InferenceGolden35Spec (Lowe twins ambiguity vs imperative per-cell replay)",
    "tx18_quality_curriculum" -> "InferenceGolden35Spec (ntile equal-fill remainder rule on the all-tie source)",
    "sim22b_dbscan_lsh" -> "InferenceGolden36Spec (== sim22 AND the hand DBSCAN fold on identical clusters, where LSH completeness is a theorem)",
    "sim3_lsh_bucket_profile" -> "InferenceGolden36Spec (signature determinism: identical vectors never split across buckets in any table)",
    "dedup_embedding_lsh" -> "InferenceGolden36Spec (planted identical groups pair at cos 1.0 exactly; the %10 clone at the replayed rotation cosine; nothing else)",
    "pipeline_curation" -> "InferenceGolden36Spec (dedup-compose idempotence: re-ingestion under fresh ids leaves every output column unchanged)",
    "sim18_centroid_drift" -> "InferenceGolden36Spec (hand quantized means; floor-division-vs-truncation pinned on a negative odd sum)",
    // ----- unit specs that are independent anchors: brute force,
    // plain-Scala replay, or a law the algorithm must satisfy -----
    "tx8_bpe_pair_counts" -> "BpeSpec (brute-force greedy merge reference)",
    "tx8b_bpe_merges" -> "BpeSpec (brute-force reference, random-corpus property)",
    "sim28_mmr_rerank" -> "MmrSpec (diversification strictly beats top-k; rank-1 argmax)",
    "est_priority_ht" -> "PrioritySampleSpec (stream == batch; n<=k exact-total theorem)",
    "est_weighted_sample" -> "PrioritySampleSpec (stream == batch equality)",
    "sample_weighted_priority" -> "SkylineSpec (monotone consistency + size bias)",
    "tx20_classifier_gate" -> "QualityClassifierSpec (refit determinism, gate contract)",
    "tx31_skyline" -> "SkylineSpec (brute-force dominance skyline)",
    "dedup_prefix_filter" -> "PrefixFilterSpec (all-pairs completeness, pigeonhole lemma)",
    "t_ewma_burst" -> "PrefixFilterSpec (textbook EWMA recursion)",
    "layout_compaction" -> "PrefixFilterSpec (packing fold vs sequential simulation)",
    "g7_ktruss" -> "TrussSpec (independent peel replay)",
    "g21_stress_centrality" -> "StressSpec (exact sigma fixtures + shortcut negative control)",
    "dedup_components" -> "ConnectedComponentsSpec (driver-side union-find oracle)",
    "j8c_entity_clusters" -> "ConnectedComponentsSpec (union-find oracle on the linkage graph)",
    "merge_upsert" -> "MergeSpec (plain-Scala clause application)",
    "diff_snapshots" -> "MergeSpec (merge(old, diff(old,new)) rebuilds new)",
    "scd2_merge" -> "Scd2PropertySpec (incremental merge == full rebuild)",
    "scd2_history" -> "Scd2PropertySpec (change-point contract)",
    "skew_salted_count" -> "SkewSpec (salted == direct equivalence)",
    "a46_heavy_hitters" -> "FreqAggSpec (Misra-Gries superset guarantee + error bound)",
    "w16_topk_agg" -> "TopKAggSpec (native agg vs window formulation, tie/null/merge)",
    "sim9_kmeans_lloyd" -> "LloydSpec (brute-force argmin; cluster recovery)",
    "sim5_ivf_topk" -> "IvfSpec (recall vs brute force) + bench recall gate",
    "sim26_ivf_incremental" -> "IvfMaintenanceSpec (drift gate both directions)",
    "sim27_ivf_refit" -> "IvfMaintenanceSpec + IvfHotSwapSpec",
    "sim10_pq_adc_topk" -> "PqSpec (recall vs exact integer L2) + bench recall gate",
    "sim23_sq8_recall" -> "Sq8Spec (plain-Scala dot reference) + bench recall gate",
    "sim11_ivfpq_topk" -> "IvfSpec + PqSpec + bench recall gate vs exact ground truth",
    "sim4_lsh_topk" -> "NearDupSpec (collision laws) + bench recall gate",
    "dedup_minhash_pairs" -> "NearDupSpec (band collision laws, jaccard tracking)",
    "dedup_simhash_pairs" -> "NearDupSpec (simhash bit/Hamming semantics)",
    "dedup_banding_recall" -> "NearDupSpec laws; the query itself measures recall vs exact pairs",
    "dedup_ngram_jaccard" -> "NearDupSpec (jaccard_sorted vs array_intersect + known sets)",
    "j2_asof_last_click" -> "AsofJoinSpec (brute-force argmax property)",
    "j2b_asof_bucketed" -> "AsofJoinSpec (bucketed == plain on random data)",
    "j2c_asof_native" -> "NativeAsofSpec (brute force; native == composition)",
    "j3_range_join_sessions" -> "RangeJoinSpec (interval semantics incl. bucket boundaries)",
    "tx19_shard_manifest" -> "ShardWriterSpec",
    "dedup_embedding_near" -> "SimilaritySpec",
    "a8_snapshot_reagg" -> "ReaggPropertySpec (partition-invariance property)",
    "tx1_token_stats" -> "TextPropertySpec (tokenCount == split brute force)",
    "tx5_regex_token_stats" -> "TextPropertySpec (brute-force token properties)",
    "tx11_chunk_overlap" -> "TextPropertySpec (chunks == brute-force window slices)",
    "s7_dsv2_pushdown" -> "DsV2SourceSpec (pushdown == unfiltered-read filter)",
    "m1_binary_meta" -> "MultimodalSpec (binary + typed metadata contract)",
    "m2_media_features" -> "MultimodalSpec (real JDK codec decode, deterministic)",
    "m4_audio_features" -> "MultimodalSpec (real WAV decode, mono + stereo)",
    "m5_image_pixel_dedup" -> "MultimodalSpec (lossless pixel round-trip premise)",
    "m6_video_frames" -> "MultimodalSpec (AVI demux: DIB exact, MJPG real decode)",
    "m9_video_keyframes" -> "MultimodalSpec (stride sampling, exact fingerprints)",
  )

  /** Queries whose Spark side is a composition of built-in relational
    * operators and whose DuckDB oracle evaluates the same declarative
    * spec in an independent engine — engine diversity is the anchor.
    * Membership is deliberately conservative: anything with a
    * hand-rolled recursion, sketch, hash mix, or bit trick on either
    * side stays out and must earn an [[anchors]] entry instead.
    *
    * Known shared-function dependency, anchored separately: several
    * entries below (tx2_quality_hist and the tx18/tx21/tx24 windows)
    * consume the hand-rolled TextAnalysis.qualityScoreTokens scorer —
    * its FORMULA is pinned at every term boundary by
    * InferenceGolden37Spec, so these rows' declarative status covers
    * only their relational composition, as intended.
    */
  val declarative: Set[String] = Set(
    // TPC-H-shape relational queries (scan/filter/join/agg/window)
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_top_order_revenue",
    "q4_set_ops", "q4b_priority_semi", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_trade", "q8_market_share",
    "q9_product_profit", "q10_returned_revenue", "q11_important_stock",
    "q12_late_lanes", "q13_cust_order_dist", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_variety", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_excess_stock",
    "q21_waiting_suppliers", "q22_dormant_customers", "q23_yoy_growth",
    "q24_delivery_latency", "q25_supplier_reliability",
    "sql_q6_discount_revenue", "sql_correlated_above_avg",
    "join_3way_region_rollup", "set_ops_customer_orders",
    // census parity (CASE ladders, pivots, epoch conversions)
    "p2_age_group_dist", "p3_income_dist", "p4_work_hours_dist",
    "p5_capital_category_dist", "p8_pivot_wide_counts", "p8b_pivot_api",
    "p8c_unpivot_api", "p9_epoch_roundtrip", "p_json_props",
    "f1_sql_predicate", "f4_time_range", "f5_membership_topk",
    "f6_equality_filter", "o1_latest_snapshot", "o2_sort_timeseries",
    "o4_categorical_sort",
    // aggregation / OLAP built-ins
    "a1_global_stats", "a4_two_key_count", "a7_group_multi_agg",
    "a9_pct_high_income", "a11_topk_groups", "a12_quantiles",
    "a13_rollup", "a14_cube", "a15_grouping_sets", "a17_cooccurrence",
    "a18_cohort_retention", "a20_trending", "a23_attribution_models",
    "a25_source_entropy", "a26_time_to_convert", "a27_rfm_segments",
    "a28_mv_incremental",
    // windows over built-in frames
    "w1_zscore_outliers", "w2_percent_of_group", "w3_latest_per_group",
    "w5_lag_lead_delta", "w6_moving_frame", "w9_time_weighted_avg",
    "w11_rolling_range", "w12_daily_mode",
    // joins expressible as equi/semi/anti/range compositions
    "j1_argmax_join_back", "j4_bucketed_join", "j5_semi_anti",
    "j9_bitemporal", "j10_overlap_join", "j10_association_rules",
    "j11_min_gap", "j12_bloom_prune", "j14_mv_join_delta",
    "j15_interp_join", "j18_interval_intersect",
    // audits / ops that are predicate-and-count queries
    "audit_referential", "audit_contracts", "audit_key_skew",
    "decon_eval_overlap", "layout_skipping", "layout_encoding",
    "est_join_size", "est_quantile_sample", "mixture_weighted",
    "ops_backfill_ranges", "ops_combine_benefit",
    // event-time bucketing / sessionization via built-ins
    "t_tumbling_window", "t_sliding_window", "t_session_window",
    "t_distinct_users", "t_cumulative_users", "t_multigrain_rollup",
    "t_top_paths", "t_attribution_touch", "t_markov_transitions",
    "t_transition_dwell", "t_stickiness", "t_time_to_convert",
    "t_sliding_distinct", "t_session_gap_sweep", "t_incident_episodes",
    // text queries that are split/explode/count compositions
    "tx2_quality_hist", "tx6_vocab_topk", "tx15_oov_rate",
    "tx39_vocab_growth",
    // exact dedup: groupBy/window keep-rules
    "dedup_exact_keep_first", "dedup_exact_summary",
    "dedup_cluster_sizes", "dedup_keep_canonical",
    "dedup_approx_distinct", "dedup_golden_record",
    // map-typed metadata access (built-in element_at/map functions)
    "m3_meta_map_access",
  )

  /** MEASURED anchors (round-13 verdict ask 3's third class): queries
    * whose output IS a quality measurement of an approximate
    * structure against an EXACT ground-truth arm computed in the
    * same query (brute-force top-k — itself a declarative
    * composition an independent engine replays), re-measured at
    * full corpus scale on every bench run via the stress tier's
    * recall floor. A cross-derivation bug in the approximate side
    * cannot hide: it moves the measured overlap/recall, which the
    * oracle hashes and the bench gates. Hand-rolled SCORING of the
    * measurement itself (NDCG, Davies-Bouldin, …) never qualifies —
    * those need a real [[anchors]] entry.
    */
  val measured: Map[String, String] = Map(
    "sim15_matryoshka_recall" -> "overlap@5 + top-1 agreement of two EXACT brute-force rankings (full vs 32-dim prefix); both arms declarative, the measurement is the output",
    "sim16_filtered_topk" -> "per-probe overlap + slot-fill of filtered IVF vs filtered EXACT brute-force top-5, in-query",
    "sim16b_filtered_nprobe8" -> "same exact-arm overlap at nprobe 8 (the starvation remedy measured against the same exact truth)",
    "sim24_ivf_nprobe_curve" -> "recall-vs-exact at nprobe 1..3 against brute-force top-10, in-query; bench floor on the sim5 family",
    "sim29_recall_curve" -> "recall-vs-exact at nprobe 1/2/4/8 against brute-force top-5, in-query; bench recall floor 0.9 every run",
  )

  /** Registry queries with no independent anchor, no measured
    * exact-arm gauge, and no declarative justification — the
    * enumerable golden-program gap.
    */
  def neverGoldened(registry: Seq[String]): Seq[String] =
    registry.filterNot(n =>
      anchors.contains(n) || declarative(n) || measured.contains(n)).sorted

  /** Classification entries that name no current registry query —
    * stale claims that must fail the gauge (a renamed query must not
    * keep phantom coverage).
    */
  def staleEntries(registry: Seq[String]): Seq[String] = {
    val known = registry.toSet
    ((anchors.keySet ++ declarative ++ measured.keySet) -- known).toSeq.sorted
  }
}
