package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): the
    * reference's daily-flow aggregate (btcolap.sql:453-463 ≡
    * btc_logregression_pre.py:14-26) re-expressed on the `events` table —
    * timestamp-range filter + type filter + day bucket + signed sum.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.events(spark, sfDir)
      .filter(col("ts") > lit("2024-01-01").cast("timestamp") &&
              col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("daily_value"))
      .orderBy(col("day"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (RelationalQueries.q1Agg _),
    "q2_filter_project"  -> (RelationalQueries.q2FilterProject _),
    "q3_case_label"      -> (RelationalQueries.q3CaseLabel _),
    "q4_explode"         -> (RelationalQueries.q4Explode _),
    "q5_nest_roundtrip"  -> (RelationalQueries.q5NestRoundtrip _),
    "q6_dedup_keepfirst" -> (RelationalQueries.q6DedupKeepFirst _),
    "q7_dedup_removeall" -> (RelationalQueries.q7DedupRemoveAll _),
    "q8_dedup_nullmask"  -> (RelationalQueries.q8DedupNullMask _),
    "q9_dupe_audit"      -> (RelationalQueries.q9DupeAudit _),
    "q10_union_all"      -> (RelationalQueries.q10UnionAll _),
    "q11_union_distinct" -> (RelationalQueries.q11UnionDistinct _),
    "q12_join_broadcast" -> (RelationalQueries.q12JoinBroadcast _),
    "q13_join_semi"      -> (RelationalQueries.q13JoinSemi _),
    "q14_daily_series"   -> (RelationalQueries.q14DailySeries _),
    "q15_ols_daily"      -> (RelationalQueries.q15OlsDaily _),
    "q16_topn"           -> (RelationalQueries.q16TopN _),
    "q17_window_rank"    -> (RelationalQueries.q17WindowRank _),
    "q18_conditional_agg" -> (RelationalQueries.q18ConditionalAgg _),
    "q19_having_element" -> (RelationalQueries.q19HavingElement _),
    "q20_flow_ledger"    -> (RelationalQueries.q20FlowLedger _),
    "q21_json_extract"   -> (RelationalQueries.q21JsonExtract _),
    "q22_count_distinct" -> (RelationalQueries.q22CountDistinct _),
    "q23_rollup"         -> (RelationalQueries.q23Rollup _),
    "q24_setops"         -> (RelationalQueries.q24SetOps _),
    "q25_asof"           -> (RelationalQueries.q25AsOf _),
    "q26_range_join"     -> (RelationalQueries.q26RangeJoin _),
    "q27_ndjson_dim"     -> (RelationalQueries.q27NdjsonDim _),
    "q28_struct_semi"    -> (RelationalQueries.q28StructSemi _),
    "q29_explode_outer"  -> (RelationalQueries.q29ExplodeOuter _),
    "q30_congruent"      -> (RelationalQueries.q30Congruent _),
    "q31_window_frames"  -> (RelationalQueries.q31WindowFrames _),
    "q32_percentiles"    -> (RelationalQueries.q32Percentiles _),
    "q33_asof_native"    -> (RelationalQueries.q33AsOfNative _),
    "q34_topk_ties"      -> (RelationalQueries.q34TopKTies _),
    "q35_offset"         -> (RelationalQueries.q35Offset _),
    "q36_pivot"          -> (RelationalQueries.q36Pivot _),
    "q37_unpivot"        -> (RelationalQueries.q37Unpivot _),
    "q38_sessionize"     -> (RelationalQueries.q38Sessionize _),
    "q39_cube"           -> (RelationalQueries.q39Cube _),
    "q40_scd2"           -> (RelationalQueries.q40Scd2 _),
    "q41_tfidf"          -> (RelationalQueries.q41TfIdf _),
    "q42_profile"        -> (RelationalQueries.q42Profile _),
    "q43_skew_salted"    -> (RelationalQueries.q43SkewSalted _),
    "q44_anti_join"      -> (RelationalQueries.q44AntiJoin _),
    "q45_full_outer"     -> (RelationalQueries.q45FullOuter _),
    "q46_scalar_subquery" -> (RelationalQueries.q46ScalarSubquery _),
    "q47_delete_merge"   -> (RelationalQueries.q47DeleteMerge _),
    "q48_bq_dialect"     -> (RelationalQueries.q48BqDialect _),
    "t17_streaming_dedup" -> (TrainingQueries.t17StreamingDedup _),
    "t13_sample"         -> (TrainingQueries.t13StratifiedSample _),
    "t14_streaming_daily" -> (TrainingQueries.t14StreamingDaily _),
    "t15_embed_ivf"      -> (TrainingQueries.t15EmbedIvf _),
    "t1_dedup_exact"     -> (TrainingQueries.t1DedupExact _),
    "t2_dedup_minhash"   -> (TrainingQueries.t2DedupMinhash _),
    "t3_dedup_simhash"   -> (TrainingQueries.t3DedupSimhash _),
    "t4_ngram_jaccard"   -> (TrainingQueries.t4NgramJaccard _),
    "t5_embed_topk"      -> (TrainingQueries.t5EmbedTopK _),
    "t6_embed_ann"       -> (TrainingQueries.t6EmbedAnn _),
    "t7_embed_neardup"   -> (TrainingQueries.t7EmbedNearDup _),
    "t8_langid"          -> (TrainingQueries.t8LangId _),
    "t9_quality"         -> (TrainingQueries.t9Quality _),
    "t10_tokens"         -> (TrainingQueries.t10Tokens _),
    "t11_fingerprint"    -> (TrainingQueries.t11Fingerprint _),
    "t12_multimodal"     -> (TrainingQueries.t12Multimodal _),
    "t16_ann_recall"     -> (TrainingQueries.t16AnnRecall _),
    "t18_cluster"        -> (TrainingQueries.t18Cluster _),
    "t19_redact"         -> (TrainingQueries.t19Redact _),
    "t20_quantize"       -> (TrainingQueries.t20Quantize _),
    "t21_lsh_recall"     -> (TrainingQueries.t21LshRecall _),
    "t22_streaming_join" -> (TrainingQueries.t22StreamingJoin _),
    "t23_streaming_upsert" -> (TrainingQueries.t23StreamingUpsert _),
    "t24_stateful_balance" -> (TrainingQueries.t24StatefulBalance _),
    "t25_minhash_precision" -> (TrainingQueries.t25MinhashPrecision _),
    "t26_neardup_exact"  -> (TrainingQueries.t26NearDupExact _),
    "t27_simhash_recovery" -> (TrainingQueries.t27SimhashRecovery _),
    "t28_decontaminate"  -> (TrainingQueries.t28Decontaminate _),
    "t29_mixture"        -> (TrainingQueries.t29Mixture _),
    "t30_quality_flags"  -> (TrainingQueries.t30QualityFlags _),
    "t31_dup_spans"      -> (TrainingQueries.t31DupSpans _),
    "t32_pack"           -> (TrainingQueries.t32Pack _),
    "t33_chunk"          -> (TrainingQueries.t33Chunk _),
    "t34_split"          -> (TrainingQueries.t34Split _),
    "t35_collapse"       -> (TrainingQueries.t35Collapse _),
    "t36_lm_score"       -> (TrainingQueries.t36LmScore _),
    "t37_incr_dedup"     -> (TrainingQueries.t37IncrDedup _),
    "t38_canonical"      -> (TrainingQueries.t38Canonical _),
    "t39_stream_dedup"   -> (TrainingQueries.t39StreamDedup _),
    "t40_domain_filter"  -> (TrainingQueries.t40DomainFilter _),
    "t41_line_filter"    -> (TrainingQueries.t41LineFilter _),
    "t42_line_dedup"     -> (TrainingQueries.t42LineDedup _),
    "t43_bow_score"      -> (TrainingQueries.t43BowScore _),
    "t44_stream_sessions" -> (TrainingQueries.t44StreamSessions _),
    "t45_line_dedup_doc" -> (TrainingQueries.t45LineDedupDoc _),
    "t46_semdedup"       -> (TrainingQueries.t46Semdedup _),
    "t47_semdedup_check" -> (TrainingQueries.t47SemdedupCheck _),
    "t48_pipeline"       -> (TrainingQueries.t48Pipeline _),
    "t49_token_mixture"  -> (TrainingQueries.t49TokenMixture _),
    "t50_span_scrub"     -> (TrainingQueries.t50SpanScrub _),
    "t51_vocab"          -> (TrainingQueries.t51Vocab _),
    "t52_ppl_band"       -> (TrainingQueries.t52PplBand _),
    "t53_ml_select"      -> (TrainingQueries.t53MlSelect _),
    "t54_dsir"           -> (TrainingQueries.t54Dsir _),
    "t55_bpe"            -> (TrainingQueries.t55Bpe _),
    "t56_dense_ids"      -> (TrainingQueries.t56DenseIds _),
    "t57_pq_topk"        -> (TrainingQueries.t57PqTopK _),
    "t58_pq_check"       -> (TrainingQueries.t58PqCheck _),
    "t59_upsample"       -> (TrainingQueries.t59Upsample _),
    "t60_embed_decontam" -> (TrainingQueries.t60EmbedDecontam _),
    "t61_char_entropy"   -> (TrainingQueries.t61CharEntropy _),
    "t62_url_canon"      -> (TrainingQueries.t62UrlCanon _),
    "t63_stream_enrich"  -> (TrainingQueries.t63StreamEnrich _),
    "t64_pagerank"       -> (TrainingQueries.t64PageRank _),
    "t65_heavy_hitters"  -> (TrainingQueries.t65HeavyHitters _),
    "t66_hh_check"       -> (TrainingQueries.t66HhCheck _),
    "t67_ngram_novelty"  -> (TrainingQueries.t67NgramNovelty _),
    "t68_bpe_encode"     -> (TrainingQueries.t68BpeEncode _),
    "t69_length_buckets" -> (TrainingQueries.t69LengthBuckets _),
    "t70_k_anonymity"    -> (TrainingQueries.t70KAnonymity _),
    "t71_stream_hh"      -> (TrainingQueries.t71StreamHh _),
    "t72_stream_hh_check" -> (TrainingQueries.t72StreamHhCheck _),
    "t73_epoch_shuffle"  -> (TrainingQueries.t73EpochShuffle _),
    "t74_compress_ratio" -> (TrainingQueries.t74CompressRatio _),
    "t75_margin_mine"    -> (TrainingQueries.t75MarginMine _),
    "t76_margin_ann_check" -> (TrainingQueries.t76MarginAnnCheck _),
    "t77_ivfpq_topk"     -> (TrainingQueries.t77IvfPqTopK _),
    "t78_ivfpq_check"    -> (TrainingQueries.t78IvfPqCheck _),
    "t79_pagerank_dangling" -> (TrainingQueries.t79PagerankDangling _),
    "t80_ivf_clustered_recall" -> (TrainingQueries.t80IvfClusteredRecall _),
    "t81_ivfpq_append"   -> (TrainingQueries.t81IvfPqAppend _),
    "t82_temperature_mix" -> (TrainingQueries.t82TemperatureMix _),
    "t83_shard_manifest"  -> (TrainingQueries.t83ShardManifest _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
