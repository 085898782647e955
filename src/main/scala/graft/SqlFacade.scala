package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string surface (SURVEY.md §1.4: the reference's "API" is SQL text
  * executed on a connection — btc_logregression_pre.py:14-26). Register
  * the synthetic tables as temp views and any reference-shaped query
  * runs verbatim through `spark.sql`; Catalyst plans it identically to
  * the DataFrame forms (SqlFacadeSpec asserts result equality).
  */
object SqlFacade {

  /** Register every table under `sfDir` as a session temp view, plus
    * the engine's native SQL functions (cosine_sim, minhash_sig,
    * top_k_by_score, …) and optimizer/planner extensions.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    graft.plans.GraftExtensions.install(spark)
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Register the headline OPERATOR pipelines as SQL-queryable temp
    * views, so a SQL-only user reaches the operator library without
    * touching the Scala API (scalar natives are already injected by
    * [[graft.plans.GraftExtensions]]; these are the RELATIONAL ops —
    * whole-pipeline verbs a scalar function can't express):
    *
    *  - `minhash_near_dups`  — exact + MinHash/LSH near-dup pairs
    *    (id_a, id_b, jaccard), the t2 composition;
    *  - `quota_mix`          — per-source quota sampling (doc_id,
    *    source), the t29 recipe (q49 drives this one end-to-end
    *    through `spark.sql` text, hash-exact against the t29 oracle);
    *  - `quality_flags`      — the Gopher/C4 heuristic rule battery
    *    (t30 shape);
    *  - `drift_ks`           — per-event-type quantile-binned KS
    *    drift panel (t139 shape);
    *  - `drift_panel`        — the one-stop KS + PSI + χ² drift
    *    verdict (t154 composition; q50 drives it through SQL text,
    *    hash-exact against t154's oracle);
    *  - `hybrid_search`      — BM25 + dense cosine + RRF fusion, the
    *    first-stage RAG retrieval stack (t94 composition; q51,
    *    hash-exact against t94's oracle);
    *  - `near_dup_clusters`  — exact+n-gram near-dup connected
    *    components with canonical survivors (t38 composition; q52,
    *    hash-exact against t38's oracle);
    *  - `datacard`           — the per-source corpus release profile
    *    (t255 composition; q53, hash-exact against t255's oracle);
    *  - `cluster_quality`    — per-cluster inertia / silhouette /
    *    Davies–Bouldin audit (t257 composition; q54, hash-exact;
    *    building it collects the k md5-ordered seed centroids —
    *    model-sized, cached with the view);
    *  - `canonical_dups`     — Unicode-canonical duplicate groups
    *    (t259 composition; q55, hash-exact);
    *  - `embedding_card`     — per-label embedding health card
    *    (t261 composition; q56, hash-exact);
    *  - `corpus_diff`        — release-to-release snapshot delta
    *    (t262 composition; q57, hash-exact);
    *  - `filtered_search`    — metadata-filtered exact cosine top-k,
    *    the vector-DB "predicate + top-k" surface (t98 composition;
    *    q58, hash-exact);
    *  - `funnel`             — ordered first-touch funnel counts +
    *    conversion rates (t107 composition; q59, hash-exact);
    *  - `retention`          — weekly retention cohorts (t108
    *    composition; q60, hash-exact);
    *  - `sessions`           — gap-based sessionization (t185
    *    composition; q61, hash-exact);
    *  - `repetition`         — Gopher repetition report (t267
    *    composition; q62, hash-exact);
    *  - `prefix_jaccard`     — exact all-pairs Jaccard via prefix
    *    filtering (t266 composition; q63, hash-exact);
    *  - `mink_prob`          — min-k% prob membership probe (t268
    *    composition; q64, hash-exact);
    *  - `snapshot_diff`      — CDC classification between two corpus
    *    versions (t88 composition; q65, hash-exact);
    *  - `validate_suite`     — the declared-expectations data-quality
    *    release gate (t87 composition; q66, hash-exact);
    *  - `rolling_distinct`   — 7-day rolling distinct users from
    *    mergeable per-day HLL sketches (t91 composition; q67,
    *    hash-exact against an exact recount — see the q67 oracle
    *    note on coupon-mode exactness at verify scale);
    *  - `substr_dup_spans`   — exact character-level duplicated-
    *    substring spans via prefix-doubling rank classes (t269
    *    composition; q68, hash-exact);
    *  - `rerank`             — the two-stage retrieve-then-rerank
    *    stack: t94's hybrid first stage re-scored by the
    *    deterministic cross-scorer (t270 composition; q69,
    *    hash-exact);
    *  - `rolling_quantiles`  — 7-day rolling p50/p95 from mergeable
    *    per-day KLL sketches (t99 composition at k=8192; q70,
    *    hash-exact in the pre-compaction exact regime with a
    *    fail-fast precondition — see rollingQuantilesExact);
    *  - `weighted_quantiles` — exact weighted quartiles via pure
    *    integer rank tests (t184 composition; q71, hash-exact);
    *  - `langid_confusion`   — the trainable hashed-bigram
    *    naive-Bayes language-ID's confusion matrix (t271
    *    composition; q72, hash-exact).
    *
    * Views are lazy — each materializes only when a SQL statement
    * actually reads it — EXCEPT `near_dup_clusters` (the connected-
    * components loop is an eager algorithm — per-round actions, so
    * BUILDING its DataFrame runs the loop), `cluster_quality`
    * (building it collects the k md5-ordered seed centroids — one
    * small eager scan), `prefix_jaccard` (the shared pair census
    * is an eager localCheckpoint — computed once per (session,
    * sfDir), reused by t266 and every SQL query on the view),
    * `substr_dup_spans` (the shared span census is an eager
    * localCheckpoint, the prefix_jaccard pattern),
    * and `rolling_distinct` (rollingDistinct pins its |days|-row
    * sketch table — one events scan at build). The
    * built views are therefore cached per
    * (session, sfDir): the first registration pays the eager builds,
    * every later call (each q49–q57 query, every bench pass)
    * re-registers the cached frames for free.
    */
  // graft.SessionCache: stopped-session sweep on every access PLUS an
  // application-end listener, so the last session's frames release
  // even when no later registerOperatorViews call ever happens.
  private val viewCache = new SessionCache[Seq[(String, DataFrame)]]

  def registerOperatorViews(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val views = viewCache.getOrElseUpdate(spark, sfDir) {
      val docs = Tables.documents(spark, sfDir)
      Seq(
        "minhash_near_dups" ->
          graft.operators.TextDedup.exactClusters(docs, "text", "doc_id")
            .withColumn("jaccard", lit(1.0))
            .unionByName(graft.operators.TextDedup.minhashNearDups(
              graft.operators.TextDedup.exact(docs, "text", "doc_id"),
              "text", "doc_id", threshold = 0.8)),
        "quota_mix" ->
          graft.ops.Mixing.sampleQuotas(
            docs.select(col("doc_id"), col("source")), "source", "doc_id",
            (0 to 4).map(i => s"src$i" -> 10).toMap ++
              (5 to 9).map(i => s"src$i" -> 5).toMap,
            defaultQuota = 2),
        "quality_flags" ->
          graft.operators.TextAnalysis.qualityFlags(docs, "text"),
        "drift_ks" ->
          graft.ops.Drift.ksStatisticQuantileBinned(
            Tables.events(spark, sfDir), Seq("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              % 2 === 0,
            "value", nBins = 10),
        // whole-pipeline verbs already proven by their tNN fixtures —
        // the view IS the fixture's composition, so the SQL surface
        // returns the operator's exact output (q50–q53 pin this by
        // reusing the t154/t94/t38/t255 oracles verbatim)
        "drift_panel" ->
          graft.queries.TrainingQueries.t154DriftPanel(spark, sfDir),
        "hybrid_search" ->
          graft.queries.TrainingQueries.t94HybridSearch(spark, sfDir),
        "near_dup_clusters" ->
          graft.queries.TrainingQueries.t38Canonical(spark, sfDir),
        "datacard" ->
          graft.operators.CorpusStats.datacard(
            Tables.documents(spark, sfDir),
            "text", "doc_id", "source", "lang"),
        "cluster_quality" ->
          graft.queries.TrainingQueries.t257ClusterQuality(spark, sfDir),
        "canonical_dups" ->
          graft.queries.TrainingQueries.t259CanonicalDedup(spark, sfDir),
        "embedding_card" ->
          graft.queries.TrainingQueries.t261EmbeddingCard(spark, sfDir),
        "corpus_diff" ->
          graft.queries.TrainingQueries.t262CorpusDiff(spark, sfDir),
        // round 12: the ANN/vector and behavioral families reach the
        // SQL surface (q58–q61 pin them to the t98/t107/t108/t185
        // oracles verbatim)
        "filtered_search" ->
          graft.queries.TrainingQueries.t98FilteredAnn(spark, sfDir),
        "funnel" ->
          graft.queries.TrainingQueries.t107Funnel(spark, sfDir),
        "retention" ->
          graft.queries.TrainingQueries.t108Retention(spark, sfDir),
        "sessions" ->
          graft.queries.TrainingQueries.t185Sessions(spark, sfDir),
        "repetition" ->
          graft.queries.TrainingQueries.t267Repetition(spark, sfDir),
        // the (session, sfDir)-cached pair census t266 also serves —
        // one prefix join per session, not one per SQL query (the
        // t192/t236 shared-census convention; ORDER BY is the query's)
        "prefix_jaccard" ->
          graft.queries.TrainingQueries.prefixJaccardPairs(spark, sfDir),
        "mink_prob" ->
          graft.queries.TrainingQueries.t268MinkProb(spark, sfDir),
        // round 13: the snapshot-diff/CDC, validation-suite, and
        // rolling-sketch families reach the SQL surface (q65–q67 pin
        // them to the t88/t87 oracles and an exact rolling recount)
        "snapshot_diff" ->
          graft.queries.TrainingQueries.t88SnapshotDiff(spark, sfDir),
        "validate_suite" ->
          graft.queries.TrainingQueries.t87ValidateSuite(spark, sfDir),
        // q67's hash-exactness rests on the lgK=12 sketch staying in
        // its coupon-exact regime at VERIFY scale (measured exact at
        // ≤ 150 distinct/window; off by 2 at a 1338-distinct sf0.1
        // window). The precondition is ENFORCED by the Verify gate
        // "t92 hll max_exact_window <= 512" — a named, fail-fast trip
        // at the scale where exactness is claimed (r13 ADVICE); the
        // view itself stays buildable at any scale, where the t92
        // rel-err contract (≤ 5%) is the operative guarantee.
        "rolling_distinct" ->
          graft.queries.TrainingQueries.t91HllRolling(spark, sfDir),
        "substr_dup_spans" ->
          graft.queries.TrainingQueries.substrSpans(spark, sfDir),
        // round 14: the two remaining sketch/rank families reach the
        // SQL surface (q70 pins the KLL exact regime — see
        // rollingQuantilesExact's scaladoc; q71 reuses t184's exact
        // integer rank tests verbatim)
        "rolling_quantiles" ->
          graft.queries.TrainingQueries.rollingQuantilesExact(spark, sfDir),
        "weighted_quantiles" ->
          graft.queries.TrainingQueries.t184WeightedQuantiles(spark, sfDir),
        // round 14: the trainable naive-Bayes langid's confusion
        // matrix (t271 composition; q72, hash-exact — the full
        // train-and-score replay lives in the t271 oracle). EAGER at
        // construction: building the frame trains the model (two
        // small collects), paid once per (session, sfDir) here.
        "langid_confusion" ->
          graft.queries.TrainingQueries.t271LangidNb(spark, sfDir),
        "rerank" ->
          graft.queries.TrainingQueries.t270Rerank(spark, sfDir))
    }
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** Run a query written in the reference's BigQuery dialect: the
    * scoped textual translation (BigQueryDialect — backticked paths,
    * OFFSET/ORDINAL subscripts, ARRAY_AGG IGNORE NULLS, comma-lateral
    * UNNEST) bridges the constructs Spark's parser rejects; everything
    * else flows through `spark.sql` untouched.
    */
  def bigQuerySql(spark: SparkSession, query: String): DataFrame =
    spark.sql(BigQueryDialect.translate(query))

  /** The daily-flow analysis query (btcolap.sql:453-463 ≡ the flagship
    * entry) in SQL form.
    */
  val dailyFlowSql: String =
    """SELECT date_trunc('day', ts) AS day,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-01' AND event_type = 'purchase'
      |GROUP BY 1 ORDER BY day""".stripMargin
}
