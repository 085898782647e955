package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality evaluation for embedding partitions — the audit
  * layer the clustering family (Similarity.semCells two-level
  * quantizer, Pq/IVF coarse cells, Clustering connected components)
  * was missing: given a corpus and a centroid set, HOW GOOD is the
  * partition? Reference scope: the reference repo has no clustering
  * at all (SURVEY.md §2.12 beyond-parity surface); metric definitions
  * are the textbook ones (Rousseeuw 1987 silhouettes, simplified
  * centroid variant; Davies–Bouldin 1979).
  *
  * Two deliberate design points:
  *
  *  1. CENTROID-BASED ("simplified") silhouette, not pairwise: a(i)
  *     and b(i) are distances to the own/next centroid rather than
  *     mean member distances. Pairwise silhouette is O(N²) — a
  *     100 TB non-starter; the simplified form is the standard
  *     large-scale substitute (one corpus scan, O(N·k·d) work, zero
  *     row amplification — the k distances live in ONE array column
  *     per row, min/argmin via array kernels, no explode).
  *
  *  2. EXACT INTEGER CONTRACT (the t226 convention): components
  *     micro-quantized to longs, squared distances are exact integer
  *     sums (bounded by dim·(2·10⁶·max|x|)² — long-safe for unit-ish
  *     embeddings), per-point ratios micro-rounded to longs, cluster
  *     aggregates integer-summed, ONE IEEE divide per output at the
  *     6dp boundary. A DuckDB oracle replays every step hash-exactly.
  *
  * Centroids come from the caller (k collected rows — model-sized
  * driver state, the centroid/BPE-rules class). [[seedByMd5]] derives
  * a deterministic, SQL-replayable seed set: the k vectors of the
  * rows with the smallest (md5(id), id) — an engine-portable hash
  * sample (the Doulion seeded-md5 convention), unlike the xxhash64
  * ordering Similarity.seedCentroids uses internally.
  */
object ClusterEval {

  private def microQuantize(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1000000.0).cast("long"))

  /** Deterministic SQL-replayable centroid seeds: the micro-quantized
    * vectors of the k rows with the smallest (md5(CAST(id AS STRING)),
    * id). Tiny collect (k rows — model-sized).
    */
  def seedByMd5(df: DataFrame, idCol: String, vecCol: String,
                k: Int): Array[Array[Long]] = {
    require(k >= 2, s"need k >= 2 clusters, got $k")
    df.filter(col(vecCol).isNotNull)
      .select(microQuantize(col(vecCol)).as("__q"),
        md5(col(idCol).cast("string")).as("__h"), col(idCol).as("__id"))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).toArray)
  }

  /** Per-cluster quality table for the partition induced by assigning
    * every vector to its nearest centroid (squared L2 on the
    * micro-quantized components, ties to the smallest centroid index).
    *
    * Output, one row per NON-EMPTY cluster, ordered by `cluster`:
    *  - `n`               members
    *  - `inertia`         Σ d²(point, own centroid) in original
    *                      units² (6dp; the k-means objective)
    *  - `mean_silhouette` mean of (b−a)/max(a,b) over members, a/b =
    *                      squared distance to own/next-nearest
    *                      centroid (micro-rounded per point; 6dp;
    *                      1 = well separated, 0 = boundary)
    *  - `mean_dist`       mean root distance to own centroid in
    *                      original units (6dp; the DB dispersion sᵢ)
    *  - `db_worst`        Davies–Bouldin term max_{j≠i}(sᵢ+sⱼ)/d(cᵢ,cⱼ)
    *                      (6dp; lower is better; NULL if every other
    *                      cluster is empty or coincident)
    *
    * Scale shape: ONE corpus scan computes all k distances in-row
    * (array column, no explode — the t226 lesson); everything after
    * the groupBy is k-row arithmetic. The k×k centroid-distance table
    * is driver math (exact integers → IEEE sqrt, both engines
    * bit-identical).
    */
  def clusterQuality(df: DataFrame, idCol: String, vecCol: String,
                     centroids: Array[Array[Long]]): DataFrame = {
    val k = centroids.length
    require(k >= 2, s"need k >= 2 centroids, got $k")
    val q = df.filter(col(vecCol).isNotNull)
      .select(microQuantize(col(vecCol)).as("__q"))
    // all k squared distances in one array column: exact long sums
    // (micro² units), computed per row with zero amplification
    val dists = array((0 until k).map { j =>
      aggregate(
        zip_with(col("__q"), typedLit(centroids(j).toSeq),
          (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, d) => acc + d)
    }: _*)
    val withD = q.select(dists.as("__d"))
      .withColumn("__a", array_min(col("__d")))
      // first position of the min = smallest index on ties (matches
      // the oracle's ORDER BY d2, cid row_number convention)
      .withColumn("__own",
        (array_position(col("__d"), col("__a")) - 1).cast("int"))
      .withColumn("__b",
        array_min(filter(col("__d"), (_, i) => i =!= col("__own"))))
    val perPoint = withD.select(
      col("__own").as("cluster"), col("__a"),
      when(greatest(col("__a"), col("__b")) > 0,
        round((col("__b") - col("__a")).cast("double") /
          greatest(col("__a"), col("__b")).cast("double") * 1000000.0)
          .cast("long")).otherwise(0L).as("__sil_micro"),
      round(sqrt(col("__a").cast("double"))).cast("long").as("__r_micro"))
    val agg = perPoint.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("__a").cast("decimal(38,0)")).as("__inertia_sum"),
        sum(col("__sil_micro")).as("__sil_sum"),
        sum(col("__r_micro")).as("__r_sum"))
    // k×k centroid root distances — exact integer diffs, IEEE sqrt
    // (micro units); driver math, embedded as a tiny literal frame
    val spark = df.sparkSession
    import spark.implicits._
    val cd = (for {
      i <- 0 until k; j <- 0 until k if i != j
      d2 = centroids(i).zip(centroids(j))
        .map { case (a, b) => val t = a - b; t * t }.sum
      if d2 > 0L
    } yield (i, j, math.sqrt(d2.toDouble))).toDF("__i", "__j", "__dcc")
    // the k-row cluster summary is referenced THREE times below
    // (directly and on both sides of the DB self-join) — a LAZY local
    // checkpoint pins it to one persisted k-row RDD so the corpus
    // aggregation provably executes once, instead of trusting
    // exchange reuse to dedupe three identical subtrees. Lazy, not
    // eager/collected: registerOperatorViews BUILDS this frame for
    // the SQL surface, and an eager form would charge the whole
    // corpus scan to whatever unrelated query registers the views
    val s = agg.select(col("cluster"), col("n"),
        (col("__r_sum").cast("double") / col("n")).as("__s_micro"),
        col("__inertia_sum"), col("__sil_sum"), col("__r_sum"))
      .localCheckpoint(false)
    val db = s.join(broadcast(cd), col("cluster") === col("__i"))
      .join(s.select(col("cluster").as("__jc"),
        col("__s_micro").as("__s_j")), col("__j") === col("__jc"))
      .groupBy(col("cluster"))
      .agg(max((col("__s_micro") + col("__s_j")) / col("__dcc"))
        .as("__db_term"))
    s.join(db, Seq("cluster"), "left")
      .select(col("cluster"), col("n"),
        round(col("__inertia_sum").cast("double") / 1e12, 6).as("inertia"),
        round(col("__sil_sum").cast("double") / col("n") / 1e6, 6)
          .as("mean_silhouette"),
        round(col("__r_sum").cast("double") / col("n") / 1e6, 6)
          .as("mean_dist"),
        round(col("__db_term"), 6).as("db_worst"))
      .orderBy(col("cluster"))
  }

  /** Does Lloyd refinement EARN ITS KEEP on this corpus? The spherical
    * k-means objective (mean cosine to the argmax-cosine centroid —
    * the quantity [[Similarity.refineCentroids]]' assign/update steps
    * monotonically improve) measured at the hash-ordered seeds and
    * after `iters` refinement passes. Two rows (stage ∈ {seed,
    * refined}); refined mean_cos ≥ seed mean_cos up to float ulps is
    * the enforced Verify gate. One corpus scan per stage; centroid
    * state stays model-sized on the driver.
    */
  def lloydGain(df: DataFrame, vecCol: String, nlist: Int,
                iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // NORMALIZE inputs first: spherical k-means' monotonicity (the
    // enforced t258 gate) is a theorem only over unit vectors — the
    // plain-mean update maximizes Σ cos within a cell when members
    // are unit-norm (Σv·c/|c| peaks at the mean direction), but with
    // heterogeneous norms a long vector can drag the mean away from
    // the cell's mean DIRECTION and genuinely decrease mean cosine.
    // Cosine is scale-invariant, so normalizing changes neither the
    // assignments nor the reported objective — it makes the gate's
    // guarantee real instead of corpus-dependent. Zero vectors drop.
    val raw = df.filter(col(vecCol).isNotNull).select(col(vecCol).as("v"))
    val n2 = aggregate(col("v"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    // materialize the normalized vectors ONCE: the objective below
    // evaluates nlist cosine folds per row, and an un-pinned transform
    // would re-run the normalization inside every fold (measured 0.8 s
    // -> 5.1 s on the sf0.1 battery when left inline). Persisted with
    // an explicit RELEASE handle (not a leaked localCheckpoint —
    // repeated bench passes used to accumulate checkpoint blocks until
    // the ContextCleaner happened to GC them): the 2-row result is
    // collected eagerly below, the blocks free before return.
    val (vecs, release) = Clustering.materialize(
      raw.withColumn("__n", sqrt(n2))
        .filter(col("__n") > 0.0)
        .select(transform(col("v"), x => x.cast("double") / col("__n"))
          .as("vec")))
    try {
      val seeds = Similarity.seedCentroids(vecs, nlist)
      val refined = Similarity.refineCentroids(vecs, seeds, iters)
      def stage(name: String, cents: Array[Seq[Double]]): DataFrame = {
        val cos = greatest(cents.toIndexedSeq.map { c =>
          val dot = aggregate(
            zip_with(col("vec"),
              typedLit(c), (x, y) => x.cast("double") * y),
            lit(0.0), (a, x) => a + x)
          val cn = math.sqrt(c.map(x => x * x).sum)
          val vn = sqrt(aggregate(col("vec"),
            lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
          dot / (vn * lit(cn))
        }: _*)
        vecs.agg(count(lit(1)).as("n"),
            avg(cos).as("mean_cos"))
          .select(lit(name).as("stage"), col("n"),
            round(col("mean_cos"), 9).as("mean_cos"))
      }
      val out = stage("seed", seeds).unionByName(stage("refined", refined))
        .orderBy(col("stage"))
      val spark = df.sparkSession
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally release()
  }
}
