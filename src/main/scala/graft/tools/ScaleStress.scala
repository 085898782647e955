package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.TrainingQueries
import graft.operators.TextDedup

/** Scale-stress evidence for the dedup/ANN family: builds a 10×
  * "sf1" corpus from sf0.1 — each document/vector replicated into 5
  * EXACT copies plus 5 near-duplicate variants (the dup-heavy shape
  * real training corpora have, i.e. the worst case for bucketed pair
  * generation) — then runs the driver queries t1–t7/t15/t18 verbatim
  * on both corpora and prints a markdown table of wall times, output
  * rows, and the audit quantities the caps are supposed to bound
  * (LSH candidate-pair counts, saturated-bucket counts).
  *
  * The claim under test: every pair generator routes through capped
  * bucket posting lists, so 10× rows cost ~10×-ish work — never the
  * quadratic blowup a flat bucket self-join would give on 10-member
  * dup clusters.
  *
  *   bash scripts/run_main.sh graft.tools.ScaleStress [baseSfDir]
  */
object ScaleStress {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** 10× corpus: ids shift to id*10+k; k<5 exact copies, k≥5 variants.
    * Document variants append a per-k suffix (near-dup texts); vector
    * variants k=5,6 rescale (cosine exactly 1, bytes differ — defeats
    * the exact-collapse, exercises LSH), k≥7 perturb dimension 0
    * (cosine ≈ 0.999…).
    */
  private def build10x(spark: SparkSession, base: String, out: String): Unit = {
    val k = col("k")
    val docs = graft.Tables.documents(spark, base)
      .crossJoin(spark.range(10).toDF("k"))
      .select(
        (col("doc_id") * 10 + k).as("doc_id"),
        when(k < 5, col("text"))
          .otherwise(concat(col("text"), lit(" variant "), k)).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val emb = graft.Tables.embeddings(spark, base)
      .crossJoin(spark.range(10).toDF("k"))
      .select(
        (col("vec_id") * 10 + k).as("vec_id"),
        when(k < 5, col("embedding"))
          .when(k < 7, transform(col("embedding"),
            x => (x * (lit(1.0f) + k.cast("float") / 100f)).cast("float")))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x + when(i === 0, (k.cast("float") - 6f) / 500f).otherwise(0f))
              .cast("float")))
          .as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional second arg: comma-separated query names — run only
    // those (cheap single-operator evidence refresh; audits skipped)
    val only: Option[Set[String]] =
      args.lift(1).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, base)

    val big = graft.io.TempDirs.create("graft_sf1").toString
    val (_, tBuild) = timed(build10x(spark, base, big))
    val nDocs = spark.read.parquet(s"$big/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$big/embeddings.parquet").count()
    println(f"built 10x corpus: $nDocs docs, $nVecs vectors in $tBuild%.1f s -> $big")

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "t1_dedup_exact"   -> (TrainingQueries.t1DedupExact _),
      "t2_dedup_minhash" -> (TrainingQueries.t2DedupMinhash _),
      "t3_dedup_simhash" -> (TrainingQueries.t3DedupSimhash _),
      "t4_ngram_jaccard" -> (TrainingQueries.t4NgramJaccard _),
      "t5_embed_topk"    -> (TrainingQueries.t5EmbedTopK _),
      "t6_embed_ann"     -> (TrainingQueries.t6EmbedAnn _),
      "t7_embed_neardup" -> (TrainingQueries.t7EmbedNearDup _),
      "t15_embed_ivf"    -> (TrainingQueries.t15EmbedIvf _),
      "t18_cluster"      -> (TrainingQueries.t18Cluster _),
      // round-4/5 additions: decontamination (broadcast eval posting),
      // quality flags (per-row codegen), duplicate spans (the posting
      // explode is the heaviest new shuffle), token-budget packing
      "t28_decontaminate" -> (TrainingQueries.t28Decontaminate _),
      "t30_quality_flags" -> (TrainingQueries.t30QualityFlags _),
      "t31_dup_spans"    -> (TrainingQueries.t31DupSpans _),
      "t32_pack"         -> (TrainingQueries.t32Pack _),
      // round-6 additions: chunking (per-row generate, output grows
      // with the duplication factor), split assignment (pure per-row
      // label), run collapse (per-row lambdas), bigram-LM scoring
      // (the count-reduce-then-join shape under a 10× bigram load)
      "t33_chunk"        -> (TrainingQueries.t33Chunk _),
      "t34_split"        -> (TrainingQueries.t34Split _),
      "t35_collapse"     -> (TrainingQueries.t35Collapse _),
      "t36_lm_score"     -> (TrainingQueries.t36LmScore _),
      // bloom prefilter + verify sliver; canonical election on top of
      // the t18 component pipeline
      "t37_incr_dedup"   -> (TrainingQueries.t37IncrDedup _),
      "t38_canonical"    -> (TrainingQueries.t38Canonical _),
      // line-level curation: per-row C4 filter, cross-doc line dedup
      // (the exact-copy-heavy 10× corpus is its worst case — every
      // line of every duplicated doc crosses the frequency threshold),
      // and the one-pass hashed-BoW classifier
      "t41_line_filter"  -> (TrainingQueries.t41LineFilter _),
      "t42_line_dedup"   -> (TrainingQueries.t42LineDedup _),
      "t43_bow_score"    -> (TrainingQueries.t43BowScore _),
      // SemDeDup: the 10× corpus replicates every vector into exact +
      // rescaled + perturbed variants, so cells fill with real
      // near-dup mass — the worst case for within-cell pair generation
      "t46_semdedup"     -> (TrainingQueries.t46Semdedup _),
      // token-budget mixture: one window per source; budgets bound the
      // SELECTED mass, so output stays ~constant while input grows 10×
      "t49_token_mixture" -> (TrainingQueries.t49TokenMixture _),
      // duplicate-span removal: the 10× corpus's exact copies make
      // EVERY span of every replicated doc a cross-doc duplicate — the
      // worst case for the covered-position mask and reassembly
      "t50_span_scrub"   -> (TrainingQueries.t50SpanScrub _),
      // vocabulary stats: two corpus-wide count shuffles; the 10× dup
      // corpus multiplies occurrences, not vocabulary, so the counts
      // tables stay vocab-sized
      "t51_vocab"        -> (TrainingQueries.t51Vocab _),
      // perplexity banding: t36's scored frame + two percentile
      // aggregates; band assignment is per-row threshold comparison
      "t52_ppl_band"     -> (TrainingQueries.t52PplBand _),
      // Moore–Lewis selection: ONE corpus reduction feeding two models
      // and two left-join scoring passes; the 10× corpus multiplies
      // counts, not the bigram vocabulary, so the model joins stay
      // vocab-sized while the scored frame grows linearly
      "t53_ml_select"    -> (TrainingQueries.t53MlSelect _),
      // DSIR weighting: per-row kernel scan + a bounded 64-row model
      // aggregate + map-side scoring — the whole pipeline should scale
      // at the scan rate, with the percentile the only corpus-wide agg
      "t54_dsir"         -> (TrainingQueries.t54Dsir _),
      // BPE merge learning: after the one corpus-sized word count,
      // every round is vocabulary-sized — the 10× corpus multiplies
      // frequencies, not the vocabulary, so round cost stays flat
      "t55_bpe"          -> (TrainingQueries.t55Bpe _),
      // dense global ids: range shuffle + parallel per-partition
      // sorts — should scale at the sort rate with NO funnel partition
      "t56_dense_ids"    -> (TrainingQueries.t56DenseIds _),
      // PQ ANN: train (distributed Lloyd over 10× subvectors) + encode
      // + ADC scan + broadcast rerank — everything corpus-sized is a
      // map-side scan; the near-dup-heavy 10× corpus stresses the
      // shortlist heap with tied scores
      "t57_pq_topk"      -> (TrainingQueries.t57PqTopK _),
      // round-7 additions: embedding decontamination (broadcast eval
      // matrix in one kernel scan — pure map-side; the 10× corpus
      // multiplies BOTH sides of the mod-20 split), char entropy +
      // URL canonicalization (per-row kernels/expressions; t62 adds
      // one canonical-key agg shuffle), PageRank (edge table grows
      // 10× in weight mass but the node set stays source-sized, so
      // per-round joins stay tiny), Misra–Gries (partial-agg shuffle
      // bounded at capacity entries per partition regardless of rows)
      "t60_embed_decontam" -> (TrainingQueries.t60EmbedDecontam _),
      "t61_char_entropy" -> (TrainingQueries.t61CharEntropy _),
      "t62_url_canon"    -> (TrainingQueries.t62UrlCanon _),
      "t64_pagerank"     -> (TrainingQueries.t64PageRank _),
      "t65_heavy_hitters" -> (TrainingQueries.t65HeavyHitters _),
      // train/val shingle coverage: the 10× corpus multiplies both
      // split sides; reference distinct-hash set grows with the
      // variant shingles, the join stays 8-byte-keyed
      "t67_ngram_novelty" -> (TrainingQueries.t67NgramNovelty _),
      // BPE train + encode: learning stays vocabulary-sized after the
      // one word-count shuffle (t55's property), the encode is a
      // shuffle-free projection with one kernel pass per rule
      "t68_bpe_encode"   -> (TrainingQueries.t68BpeEncode _),
      // round-11: the t55/t54 models through save→load→re-apply; adds
      // two model-table writes (12 and 64 rows) to the t55+t68+t54
      // work — persistence cost is corpus-independent by construction
      "t250_model_roundtrip" -> (TrainingQueries.t250ModelRoundtrip _),
      // one percentile aggregate + per-row threshold CASE + a
      // 4-group aggregate — everything after the token-count scan is
      // constant-sized
      "t69_length_buckets" -> (TrainingQueries.t69LengthBuckets _),
      // group-count + same-key join back (quasi-key cardinality table)
      "t70_k_anonymity"  -> (TrainingQueries.t70KAnonymity _),
      // two epochs of range-repartition dense ranks — the sort rate
      "t73_epoch_shuffle" -> (TrainingQueries.t73EpochShuffle _),
      // per-row zlib pass, no cross-row state
      "t74_compress_ratio" -> (TrainingQueries.t74CompressRatio _),
      // round-10: t75 now IS the ANN default (lshProvider 10/4 —
      // candidate work is the bucket-intersection fraction, ~4/1024
      // of the cross product): the sub-quadratic production shape
      "t75_margin_mine"  -> (TrainingQueries.t75MarginMine _),
      // the explicitly-requested brute-force audit baseline — the
      // pre-flip default whose ~10× growth at 10× data is the
      // contrast the t75 row is measured against
      "t238_margin_bf_audit" -> (TrainingQueries.t238MarginBfAudit _),
      // IVF-PQ serving: coarse assign + encode are one corpus scan,
      // the ADC scan reads only probed cells (t78 audits the
      // fraction), rerank is a broadcast point-lookup set
      "t77_ivfpq_topk"   -> (TrainingQueries.t77IvfPqTopK _),
      // dangling-mass PageRank: one extra 1-value aggregate per round
      // over the node-sized rank table — edge-shuffle cost unchanged
      "t79_pagerank_dangling" -> (TrainingQueries.t79PagerankDangling _),
      // index append: two per-batch assign+encode scans + the parity
      // join + a served recall leg — everything corpus-sized is a scan
      "t81_ivfpq_append" -> (TrainingQueries.t81IvfPqAppend _),
      // temperature mixing: one count aggregate + group-cardinality
      // quota join + the salted two-level cut
      "t82_temperature_mix" -> (TrainingQueries.t82TemperatureMix _),
      // shard assignment: range-repartition rank + floor-div + one
      // manifest aggregate — the sort rate, no funnel
      "t83_shard_manifest" -> (TrainingQueries.t83ShardManifest _),
      // streaming index maintenance: 4 micro-batches × (assign+encode
      // scan + id-keyed upsert) + the one-shot parity comparison
      "t84_stream_index_append" -> (TrainingQueries.t84StreamIndexAppend _),
      // production-param ANN mining checks: the brute-force baseline
      // legs are the quadratic part (the check's cost); the LSH legs
      // scale at the bucket-join rate
      "t85_margin_ann_clustered" -> (TrainingQueries.t85MarginAnnClustered _),
      // (t86 is events-table streaming — the 10× fixture replicates
      // documents/embeddings only, so it stays out of this harness
      // like t14/t22/t44; its state is accuracy-bounded by design)
      // validation suite: 7 conditional sums in one scan + one
      // group-cardinality uniqueness count
      "t87_validate_suite" -> (TrainingQueries.t87ValidateSuite _),
      // snapshot diff: two map-side hash projections + one key-keyed
      // full-outer join — the key-cardinality shuffle rate
      "t88_snapshot_diff" -> (TrainingQueries.t88SnapshotDiff _),
      // CDC apply: the t88 diff + two copy-on-write version rewrites
      // (the parquet backend's documented price; change-cardinality
      // inputs either way)
      "t89_cdc_apply" -> (TrainingQueries.t89CdcApply _),
      // leak-free splits: the t18 component pipeline + a per-row
      // arithmetic label — the pair-generation and CC rounds dominate,
      // and the 10× dup-heavy corpus is their worst case
      "t90_leakfree_split" -> (TrainingQueries.t90LeakFreeSplit _),
      // theta overlap: the 10× corpus multiplies rows per source, not
      // vocabulary — the pairwise stage reads a |sources|-row sketch
      // table either way, so cost is the token-scan rate
      // (t91/t92/t95/t96 are events-table ops — out of this fixture
      // like t14/t86; their state/audit shapes are argued in their
      // scaladocs and PERF_NOTES)
      "t93_theta_overlap" -> (TrainingQueries.t93ThetaOverlap _),
      // hybrid retrieval: BM25 postings are query-term-filtered before
      // df/scoring (so those shuffles grow with matching docs only);
      // the dense leg is the documented brute-force baseline — at
      // production scale the rank list comes from t77's IVF-PQ instead
      "t94_hybrid_search" -> (TrainingQueries.t94HybridSearch _),
      // content-defined chunking: one O(n) kernel pass + the explode —
      // output rows grow with corpus bytes, no shuffle at all
      "t110_content_chunks" -> (TrainingQueries.t110ContentChunks _),
      // chunk near-dup: 8-byte chunk-hash posting through the capped
      // buckets. The 10× fixture's exact-copy groups push hot chunks
      // PAST maxDf=50 — the saturating cap drops those buckets by
      // design, so pair output grows sublinearly while the posting
      // shuffle stays linear (the 100 TB safety property under test)
      "t111_chunk_neardup" -> (TrainingQueries.t111ChunkNearDup _),
      // Aho–Corasick blocklist: pure per-row kernel scan, no shuffle —
      // should track the scan rate exactly
      "t112_blocklist" -> (TrainingQueries.t112Blocklist _),
      // image aHash near-dup: per-row decode+hash, then banded pair
      // generation through the capped buckets (t111's shape on 8-byte
      // band keys); the 10× fixture multiplies DISTINCT texts ~6×
      // (5 exact copies collapse), so hashes and pairs grow with that
      // (t113/t114 are events-table drift checks — out of this fixture
      // like t14/t86/t91; their shapes are one groupBy(value)+window
      // and one bins-sized aggregation, argued in Drift.scala)
      "t115_image_phash" -> (TrainingQueries.t115ImagePhash _),
      // round-10: the REAL-codec twin — PNG encode+decode per distinct
      // text (per-row ImageIO work, no cross-row state) + the same
      // banded Hamming pair generation as t115
      "t237_png_phash" -> (TrainingQueries.t237PngPhash _),
      // round-11: video codec twin — Y4M synth + frame decode + per-
      // frame pHash per distinct text (per-row codec work ∝
      // pixels×frames) + banded Hamming over frame-hash SHINGLE sets;
      // the containment verify joins run only behind the capped
      // bucket shortlist
      "t249_video_phash" -> (TrainingQueries.t249VideoPhash _),
      // round-11: the banding calibration — the 10× dup-heavy corpus
      // is the intended worst case for its pair generators: ONE
      // checkpointed truth pipeline (df-capped postings), three
      // signature/bucket passes, left joins on 8-byte pair keys
      "t251_lsh_calibration" -> (TrainingQueries.t251LshCalibration _),
      // round-11: ranking metrics — retrievers scan 10×, the metric
      // layer stays O(lists×k) + a 1-row IDCG frame
      "t252_ranking_metrics" -> (TrainingQueries.t252RankingMetrics _),
      // round-11: winnowing — in-row digest work ∝ characters (the
      // codec class); t254's postings hit the dup-heavy corpus's
      // worst case: 10-member copy clusters fill df-capped buckets
      "t253_winnowing" -> (TrainingQueries.t253Winnowing _),
      "t254_winnow_pairs" -> (TrainingQueries.t254WinnowPairs _),
      // round-11: datacard — one groupBy(source) of integer legs +
      // the winnowing projection reduced to |sources| rows
      "t255_datacard" -> (TrainingQueries.t255Datacard _),
      // round-11: streaming decontam — stateless per-row kernel +
      // sorted-merge against a model-sized literal; the stream reads
      // the BASE fixture either way (its 10x axis is the base corpus
      // growth), so the row mainly witnesses kernel-rate stability
      "t256_stream_decontam" -> (TrainingQueries.t256StreamDecontam _),
      // round-11 continuation: cluster quality — the k distances live
      // in ONE array column per row (no explode), aggregates are
      // k-row; cost is a pure O(N·k·d) scan
      "t257_cluster_quality" -> (TrainingQueries.t257ClusterQuality _),
      // canonical dedup — per-row NFC kernel (quick-check fast path)
      // + the digest groupBy; bodies never shuffle
      "t259_canonical_dedup" -> (TrainingQueries.t259CanonicalDedup _),
      // streaming quality gate — stateless per-row expression work
      // (the t256 class); witnesses kernel-rate stability
      "t260_stream_quality" -> (TrainingQueries.t260StreamQuality _),
      // embedding card — one scan, percentile state per group
      "t261_embedding_card" -> (TrainingQueries.t261EmbeddingCard _),
      // corpus diff — (id, src, digest) full-outer join, group agg
      "t262_corpus_diff" -> (TrainingQueries.t262CorpusDiff _),
      // common-component removal — CovMoments scans + kernel passes
      // (t264 k-core is a lineitem-graph op, outside this docs
      // fixture — its 10x axis is sf0.01 -> sf0.1, recorded in
      // BENCH_SF1 like t189-t192)
      "t263_common_component" -> (TrainingQueries.t263CommonComponent _),
      // ES weighted sampling: per-row hash+ln, then the salted
      // two-level cap — sort-rate, output fixed at groups×k
      "t116_weighted_sample" -> (TrainingQueries.t116WeightedSample _),
      // round-10 agreement/effect-size/provenance wave: t240 is the
      // t176 midrank shape; t241/t242/t244 are map-side reductions of
      // per-row kernels; t243's pair join fans out <= |sources|^2 per
      // gram digest
      "t240_cliffs_delta" -> (TrainingQueries.t240CliffsDelta _),
      "t241_cochran_q" -> (TrainingQueries.t241CochranQ _),
      "t242_krippendorff" -> (TrainingQueries.t242Krippendorff _),
      "t243_source_overlap" -> (TrainingQueries.t243SourceOverlap _),
      "t244_token_fertility" -> (TrainingQueries.t244TokenFertility _),
      // CMS: exploded tokens reduce into partial sketches map-side —
      // only depth×width counter tables shuffle; probe side constant
      "t118_cms_counts" -> (TrainingQueries.t118CmsCounts _),
      // per-dimension stats: posexplode ×64 rows map-side-combined
      // into 64 groups — scan rate
      "t122_dim_stats" -> (TrainingQueries.t122DimStats _),
      // PCA: one CovMoments scan (O(d²) partials), driver eigen,
      // one projection kernel scan + the whitened-audit second pass
      "t123_pca_whiten" -> (TrainingQueries.t123PcaWhiten _),
      // dataset card: one text-dup count + join + one agg pass
      "t125_dataset_card" -> (TrainingQueries.t125DatasetCard _),
      // JL projection + distortion audit: two kernel scans + a
      // consecutive-id self-join on 8-byte keys
      "t126_jl_project" -> (TrainingQueries.t126JlProject _),
      // contrastive pair mining: anchors broadcast against the corpus
      // scan, bounded-heap cut — scoring grows linearly with corpus,
      // shuffle stays O(partitions·anchors·k)
      "t129_neg_sample" -> (TrainingQueries.t129NegSample _),
      "t130_hard_negatives" -> (TrainingQueries.t130HardNegatives _),
      // personalized PageRank: node set stays source-cardinality (the
      // 10× corpus multiplies edge WEIGHTS, not nodes), so per-round
      // joins are constant-sized and only the edge build scans 10×
      "t131_ppr" -> (TrainingQueries.t131Ppr _),
      // audio fingerprints: per-row PCM decode + hash (map-side), then
      // banded pairs over ~6× distinct audio rows
      "t132_audio_fingerprint" -> (TrainingQueries.t132AudioFingerprint _),
      // water-filling: the corpus-scale part is the map-side token
      // count; the solve itself windows over |sources| rows
      // (t134 is an events-table streaming monitor, outside this
      // fixture like t14/t119)
      "t135_water_fill" -> (TrainingQueries.t135WaterFill _),
      // score calibration: range-repartition + per-partition rank +
      // broadcast offset join — the sort parallelism is partition
      // count, never per-source task count
      // (t137 is an events-table drift monitor, outside this fixture
      // like t113/t114 — its window is 9 bin rows by construction)
      "t136_score_calibrate" -> (TrainingQueries.t136ScoreCalibrate _),
      // calibrated keep: t136's shape + a per-row threshold + the
      // |sources|-row audit aggregate
      "t138_calibrated_keep" -> (TrainingQueries.t138CalibratedKeep _),
      // rendezvous sharding: pure map-side O(shards) hashing per row
      // + one 16-row audit aggregate — should scale ~linearly
      // (t139 is an events-table drift monitor, outside this fixture)
      "t140_rendezvous_shards" -> (TrainingQueries.t140RendezvousShards _),
      // Poisson bootstrap: map-side rows x 200-replicate explode, then
      // partial-combined (source, b) aggregates — shuffle volume is
      // partitions x sources x reps, never corpus-sized
      "t141_bootstrap_ci" -> (TrainingQueries.t141BootstrapCI _),
      // chi-square homogeneity: one (source, lang) count shuffle, then
      // category-cardinality arithmetic
      "t142_chi2_drift" -> (TrainingQueries.t142Chi2Drift _),
      // JSD distinctiveness: the corpus-sized stage is the
      // map-side-combinable (source, token) count; the 10x dup corpus
      // multiplies counts, not vocabulary, so the join stays vocab-sized
      "t143_jsd_sources" -> (TrainingQueries.t143JsdSources _),
      // A/B diff bootstrap: t141's explode shape with a side split
      "t144_bootstrap_diff" -> (TrainingQueries.t144BootstrapDiff _),
      // two-level rendezvous: 2*sqrt(N) map-side hashes per row
      // (t145/t146 are events-table ops, outside this fixture)
      "t147_two_level_shards" -> (TrainingQueries.t147TwoLevelShards _),
      // Cohen's kappa: one (source, labelA, labelB) confusion count,
      // then |labels|^2-cardinality arithmetic
      // (t148/t149 are events-table series ops, outside this fixture)
      "t150_cohens_kappa" -> (TrainingQueries.t150CohensKappa _),
      // quantile normalization: t136's calibration + one broadcast
      // 101-double grid + per-row interpolation
      "t151_quantile_normalize" -> (TrainingQueries.t151QuantileNormalize _),
      // raking: one bounded cells count; IPF runs on 20 driver cells
      "t152_rake_weights" -> (TrainingQueries.t152RakeWeights _),
      // snapshot fingerprints: two one-scan commutative-monoid
      // reductions to 64 rows each + a |shards|-row verdict join —
      // the 10x corpus only grows the scans
      "t156_snapshot_fingerprint" -> (TrainingQueries.t156SnapshotFingerprint _),
      // diversity: 3 explode scans through two map-side-combinable
      // stages; the 10x corpus's exact copies add total-gram mass
      // while distinct-gram mass grows only with the variant suffixes
      "t157_diversity" -> (TrainingQueries.t157Diversity _),
      // containment: the 10x corpus's exact copies vanish at the
      // distinct (source, digest) collapse; only the variant suffixes
      // add digest mass to the pair join
      "t160_containment" -> (TrainingQueries.t160Containment _),
      // zipf: the token-count stage sees 10x grams map-side-combined;
      // the bounded-heap top-k exchange and the OLS stay k-sized
      "t163_zipf" -> (TrainingQueries.t163Zipf _),
      // (t165/t167 are events-table eval/behavior ops, outside this
      // fixture like t161/t121)
      // containment pairs: t4's capped posting buckets; the 10x
      // corpus's exact copies collapse at the dedup, the variant
      // suffixes add df-capped candidates only
      "t166_containment_pairs" -> (TrainingQueries.t166ContainmentPairs _),
      // heaps fit: denseIds range-shuffle + one 8-byte first-sighting
      // collapse both grow ~10x; checkpoint grids stay <= 63/source
      "t168_heaps_fit" -> (TrainingQueries.t168HeapsFit _),
      // PMI: df counts shuffle 8-byte digests; top-k is the bounded
      // heap; pairs expand in-array from <= k-element presence sets
      // (t170/t171/t172 are events-table ops, outside this fixture)
      "t169_pmi_cooccur" -> (TrainingQueries.t169PmiCooccur _),
      // good-turing: one (source, digest) count, map-side combined;
      // the count-of-counts stage is vocabulary-sized
      "t173_good_turing" -> (TrainingQueries.t173GoodTuring _),
      // label MI: t169's skeleton; contingency is k x |labels|
      // (t175/t176 are events-table ops, outside this fixture)
      "t174_label_mi" -> (TrainingQueries.t174LabelMi _),
      // edit verify: t4's capped candidates; levenshtein runs only on
      // surviving pairs, text joins are id-keyed
      "t177_edit_verify" -> (TrainingQueries.t177EditVerify _),
      // readability: per-row codegen'd regex counts + one map-side
      // combinable group aggregate
      // (t178/t180 touch the events table, outside this fixture)
      "t179_readability" -> (TrainingQueries.t179Readability _),
      // collocations: digest-keyed map-side-combined bigram/margin
      // counts; LLR arithmetic on the bigram vocabulary
      "t181_collocations" -> (TrainingQueries.t181Collocations _),
      // cosine profile: per-row kernel + bin count + 1-row moments
      // (t182/t184 touch events/lineitem, outside this fixture)
      "t183_cosine_profile" -> (TrainingQueries.t183CosineProfile _),
      // fleiss: three per-row raters union -> (source, item, category)
      // count; everything after is item-/category-keyed reductions
      // (t185/t187/t188 are events-table ops, outside this fixture)
      "t186_fleiss" -> (TrainingQueries.t186Fleiss _),
      // SNM blocking: the 10x fixture's 5 exact copies collapse at the
      // rep dedup and the 5 near-dup variants share min-shingle keys —
      // the window fills with REAL near-dup neighbors (SNM's dense
      // case); candidates stay exactly window*n_reps by construction
      // (t189-t192 are events/lineitem ops, outside this fixture —
      // their 10x axis is sf0.01->sf0.1, recorded in BENCH_SF1)
      "t194_jw_verify" -> (TrainingQueries.t194JwVerify _),
      "t196_snm_block" -> (TrainingQueries.t196SnmBlock _),
      // round 12: the DISTINCT-VALUE-CUMULATIVE family (the t206
      // post-mortem class — medianCI/quantiles/trimmed/winsorized/
      // Lorenz all ride Profiling.cumulativeCells) stressed on a
      // LOW-CARDINALITY group fixture (|langs| groups, n_chars
      // domain): the old per-group window was a |groups|-task sort
      // funnel whose cost ratio would be super-linear in rows; the
      // range-repartition rewrite should hold ~10×-ish. The driver
      // queries run these ops on lineitem (outside this fixture) —
      // same code path, same plan shape.
      "w206_median_ci" -> ((s: SparkSession, d: String) =>
        graft.ops.Profiling.medianCI(graft.Tables.documents(s, d),
          Seq("lang"), col("n_chars"))),
      "w184_weighted_quantiles" -> ((s: SparkSession, d: String) =>
        graft.ops.Profiling.weightedQuantiles(
          graft.Tables.documents(s, d)
            .withColumn("w", col("doc_id") % 7 + 1),
          Seq("lang"), "n_chars", "w")),
      "w203_trimmed_mean" -> ((s: SparkSession, d: String) =>
        graft.ops.Profiling.trimmedMean(graft.Tables.documents(s, d),
          Seq("lang"), col("n_chars"))),
      "w225_winsorized" -> ((s: SparkSession, d: String) =>
        graft.ops.Profiling.winsorizedMean(graft.Tables.documents(s, d),
          Seq("lang"), col("n_chars"))),
      "w208_lorenz" -> ((s: SparkSession, d: String) =>
        graft.ops.Profiling.lorenzDeciles(graft.Tables.documents(s, d),
          Seq("lang"), "n_chars")),
      // round 12: exact prefix-filter all-pairs — the dup-heavy 10x
      // fixture is its worst case (a 10-member dup cluster's 45 pairs
      // are the OUTPUT, not overhead); repetition + min-k are per-row
      // kernel / model-reduction shapes
      // the RAW operator, not the t266 fixture: the fixture's
      // (session, sfDir) cache would make the timed pass a cache hit
      // after the warm pass — this row must measure the prefix join
      "t266_prefix_jaccard" -> ((s: SparkSession, d: String) =>
        TextDedup.prefixFilterPairs(graft.Tables.documents(s, d),
          "text", "doc_id", shingleK = 3, threshold = 0.6)),
      "t267_repetition" -> (TrainingQueries.t267Repetition _),
      "t268_mink_prob" -> (TrainingQueries.t268MinkProb _),
      // round 13: exact substring spans via prefix-doubling — same
      // raw-operator convention (the t269 fixture caches); the 10×
      // dup-heavy fixture multiplies class sizes (positions per
      // class), never pairs them, so covered rows grow ~10×
      "t269_substr_dedup" -> ((s: SparkSession, d: String) =>
        graft.operators.SubstrDedup.duplicatedSpans(
          graft.Tables.documents(s, d), "text", "doc_id", minLen = 40)),
      // retrieve-then-rerank: the first stage (BM25 + dense + RRF)
      // scales with the corpus; the rerank leg stays k-bounded by
      // contract — 10× growth should land on the retrieval scan, not
      // the pair scoring
      "t270_rerank" -> (TrainingQueries.t270Rerank _),
      // the raw IVF-PQ provider (train + index + serve, uncached — the
      // t272 fixture itself is a capped audit that deliberately does
      // NOT scale): fixed 50-query side against the growing corpus;
      // training is scan-shaped (Lloyd + codebook passes), the ADC
      // read is nprobe/nlist of corpus×queries, the rerank leg stays
      // |queries|·8k — wall should track the corpus scan rate
      "t272_ivfpq_provider" -> ((s: SparkSession, d: String) => {
        val emb = graft.Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        graft.operators.Pq.ivfPqProvider()(
          emb, "vec_id", "embedding", qs, "qid", "qvec", 4)
      }))

    val selected = only.fold(queries)(names => queries.filter(q => names(q._1)))
    println("\n| query | sf0.1 s | sf0.1 rows | 10x s | 10x rows | time ratio |")
    println("|---|---|---|---|---|---|")
    for ((name, fn) <- selected) {
      // warm pass: per-query codegen/datasource init would otherwise
      // land entirely on the small-corpus timing and flatter the ratio
      fn(spark, base).write.format("noop").mode("overwrite").save()
      val (rowsS, tS) = timed {
        val df = fn(spark, base)
        val n = df.count(); df.write.format("noop").mode("overwrite").save(); n
      }
      val (rowsB, tB) = timed {
        val df = fn(spark, big)
        val n = df.count(); df.write.format("noop").mode("overwrite").save(); n
      }
      println(f"| $name | $tS%.2f | $rowsS | $tB%.2f | $rowsB | ${tB / tS}%.1f× |")
    }

    // audit quantities: the bounded candidate/bucket counts behind the
    // linear-ish growth (skipped on subset runs); a subset NAMING t48
    // still runs the composite-curation block below — the per-stage
    // breakdown is its own evidence row and refreshing it must not
    // cost a full-harness run
    if (only.exists(names => !names("t48"))) { spark.stop(); return }
    if (only.isEmpty) {
    println("\n| audit | sf0.1 | 10x |")
    println("|---|---|---|")
    def both(f: String => Long): (Long, Long) = (f(base), f(big))
    val (cS, cB) = both { d =>
      val docs = TextDedup.exact(graft.Tables.documents(spark, d), "text", "doc_id")
      TextDedup.minhashCandidates(docs, "text", "doc_id").count()
    }
    println(s"| minhash LSH candidate pairs | $cS | $cB |")
    val (oS, oB) = both { d =>
      val docs = TextDedup.exact(graft.Tables.documents(spark, d), "text", "doc_id")
      TextDedup.overflowBuckets(docs, "text", "doc_id").count()
    }
    println(s"| saturated (dropped) minhash buckets | $oS | $oB |")
    // t31 internals: the survivor pass shuffles 8-byte hashes only and
    // span text regenerates for candidate docs alone — these two counts
    // are what keeps its posting-explode shuffle linear-ish
    import graft.functions.TextFunctions
    val (shS, shB) = both { d =>
      graft.Tables.documents(spark, d)
        .select(col("doc_id").as("id"),
          explode(TextFunctions.hashed_shingles(col("text"), 6)).as("shash"))
        .groupBy(col("shash")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).count()
    }
    println(s"| t31 surviving span hashes | $shS | $shB |")
    val (cdS, cdB) = both { d =>
      val posting = graft.Tables.documents(spark, d)
        .select(col("doc_id").as("id"),
          explode(TextFunctions.hashed_shingles(col("text"), 6)).as("shash"))
      val survivors = posting.groupBy(col("shash"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select(col("shash"))
      posting.join(survivors, "shash").select(col("id")).distinct().count()
    }
    println(s"| t31 candidate docs (span text regenerated) | $cdS | $cdB |")
    // t46: saturated kmeans cells would silently dedup nothing — prove
    // the adaptive nlist keeps every cell under the pair-generation cap
    val (scS, scB) = both { d =>
      val emb = graft.Tables.embeddings(spark, d)
      // the EXACT nlist the t46/t47 queries run with — auditing any
      // other cell layout would prove nothing about production cells
      val nlist = TrainingQueries.semNlist(emb)
      graft.operators.Similarity
        .semCells(emb, "vec_id", "embedding", nlist, refineIters = 1)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .filter(col("n") > graft.operators.Similarity.DefaultSemDedupBucket)
        .count()
    }
    println(s"| t46 saturated (dropped) kmeans cells | $scS | $scB |")
    // t78: the IVF-PQ prune witness at both scales — scanned ADC rows
    // must track the probed fraction (~nprobe/nlist), NOT the corpus ×
    // query cross product, as the corpus grows
    def scanAudit(d: String): Map[String, Double] = {
      val emb = graft.Tables.embeddings(spark, d)
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.operators.Pq.ivfPqScanAudit(emb, "vec_id", "embedding",
          qs, "qid", "qvec", nlist = 16, nprobe = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val (paS, paB) = (scanAudit(base), scanAudit(big))
    println(s"| t78 ivfpq scanned ADC rows | ${paS("scanned_rows").toLong} " +
      s"| ${paB("scanned_rows").toLong} |")
    println(s"| t78 ivfpq scan fraction | ${paS("scan_fraction")} " +
      s"| ${paB("scan_fraction")} |")
    }
    // t48 with a REAL table-write materializer (the warehouse stage
    // boundary the Curation runner exists to swap in): ledger must
    // match the localCheckpoint form at both scales; the time delta is
    // the parquet write+read of each stage output
    // round 14: the composite row also records a PER-STAGE breakdown
    // (stage wall = that stage's compute + parquet write + read-back
    // under the table-write materializer, plus the ledger's in/out
    // counts) so inter-stage materialization cost at 10x is measured,
    // not inferred from the per-operator rows.
    def curationRun(d: String, tag: String)
        : (Long, Double, Double, Seq[(Int, Double)], Seq[String]) = {
      val ckpt = timed {
        TrainingQueries.t48Pipeline(spark, d).collect()
      }
      val matDir = graft.io.TempDirs.create(s"graft_cur_$tag").toString
      var stage = 0
      val stageTimes = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      val tbl = timed {
        TrainingQueries.t48PipelineMaterialized(spark, d, df => {
          stage += 1
          val p = s"$matDir/stage$stage"
          val (out, t) = timed {
            df.write.mode("overwrite").parquet(p)
            spark.read.parquet(p)
          }
          stageTimes += (stage -> t)
          out
        }).collect()
      }
      require(ckpt._1.map(_.toString).toSeq == tbl._1.map(_.toString).toSeq,
        s"table-write ledger diverged from localCheckpoint ledger at $d")
      val ledger = ckpt._1.map(r =>
        s"${r.getAs[String]("stage")} ${r.getAs[Long]("docs_in")}->" +
        s"${r.getAs[Long]("docs_out")}").toSeq
      (ckpt._1.length.toLong, ckpt._2, tbl._2, stageTimes.toSeq, ledger)
    }
    val (rowsS2, ckS, twS, stS, ledS) = curationRun(base, "s")
    val (rowsB2, ckB, twB, stB, ledB) = curationRun(big, "b")
    println(f"| t48 curation ledger rows (ckpt == table-write) | $rowsS2 | $rowsB2 |")
    println(f"| t48 curation s (ckpt / table-write) | $ckS%.2f / $twS%.2f " +
      f"| $ckB%.2f / $twB%.2f |")
    stS.zip(stB).zip(ledS.zip(ledB)).foreach {
      case (((i, ts), (_, tb)), (ls, lb)) =>
        println(f"| t48 stage $i table-write s | $ts%.2f ($ls) " +
          f"| $tb%.2f ($lb) |")
    }
    spark.stop()
  }
}
