package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The salted TWO-LEVEL per-group cap shared by the deterministic
  * samplers (Ols.stratifiedSample, Mixing.sampleQuotas): first cap per
  * (group, salt) — the salt spreads each group over `salts` partitions
  * so no task ever sees more than ~|group|/salts rows — then re-cap
  * the ≤ cap·salts survivors per group. Both levels order by the SAME
  * key, so the final set is exactly the single-window
  * `Window.partitionBy(group)` form's (every globally-surviving row
  * survives its salt group): salting is a pure plan change, asserted
  * by both call sites' equivalence specs. A bare per-group window
  * would funnel the whole dataset through ≤ |groups| tasks at any
  * input size.
  */
private[graft] object Sampling {

  /** Keep at most `cap` rows per `partCols` group, smallest `orderBy`
    * first; `saltBy` (any stable per-row expression) spreads the
    * first-level cap. `cap` may vary per group (it is evaluated per
    * row).
    */
  def saltedCap(df: DataFrame, partCols: Seq[Column], orderBy: Column,
                saltBy: Column, cap: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val wSalted = Window.partitionBy(partCols :+ col("__salt"): _*)
      .orderBy(orderBy)
    val wGroup = Window.partitionBy(partCols: _*).orderBy(orderBy)
    df.withColumn("__salt", pmod(saltBy, lit(salts)))
      .withColumn("__rn1", row_number().over(wSalted))
      .filter(col("__rn1") <= cap)
      .withColumn("__rn2", row_number().over(wGroup))
      .filter(col("__rn2") <= cap)
      .drop("__salt", "__rn1", "__rn2")
  }

  private val HexDigits = "0123456789abcdef"

  private def requireIntegralId(df: DataFrame, idCol: String): Unit =
    graft.functions.TopKFunctions.requireIntegralId(
      df.schema(idCol).dataType, "bounded-heap sampling")

  /** The repo's seeded-uniform convention (shared with
    * Privacy.dpCounts): u in [0,1) from the first 8 hex digits of
    * md5(key ‖ '|' ‖ salt), digit extraction via strpos arithmetic so
    * ANY engine (and the DuckDB oracle) reproduces it bit-for-bit.
    * Clamped to [1e-9, 1-1e-9] so downstream ln() stays finite.
    * Callers whose key columns may contain the delimiter should
    * pre-encode (dpCounts base64s); integral ids need nothing.
    */
  def md5Uniform(keyParts: Seq[Column], salt: String): Column =
    // one native kernel call per row — bit-identical to the old
    // md5-hex + 8×(substring∘strpos) expression tree (which the oracle
    // still replays); see graft.functions.Md5Uniform32
    graft.functions.SeededUniform.md5_uniform32(
      concat_ws("|", keyParts.map(_.cast("string")) :+
        (lit(salt): Column): _*))

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * per group, the k rows with the smallest exponential key
    * e = −ln(u)/w (equivalent to the paper's largest u^(1/w)) form an
    * exact weight-proportional sample — a row of weight 2w is selected
    * exactly as if it had two tickets, with no replacement bias. The
    * seeded u makes the draw reproducible run-to-run AND replayable by
    * a SQL oracle.
    *
    * Scale shape: one per-row hash + ln, then the shared salted
    * two-level cap — never a bare per-group window (which would funnel
    * each group through one task). Rows with weight <= 0 hold no
    * tickets and are dropped, matching the paper's domain.
    *
    * Output: (groupCols…, idCol, weight, priority) — priority the 6dp
    * rounded selection key, smallest = most preferred.
    */
  def weightedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     weightCol: String, k: Int, salt: String,
                     salts: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = groupCols.map(col)
    val keyed = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__e",
        -log(md5Uniform(Seq(col(idCol)), salt)) / col(weightCol))
    saltedCap(keyed, g, struct(col("__e"), col(idCol)),
        xxhash64(col(idCol)), lit(k), salts)
      .select(g :+ col(idCol) :+
        col(weightCol).as("weight") :+
        round(col("__e"), 6).as("priority"): _*)
  }

  /** Seeded RANDOM negative sampling for contrastive pairs: for each
    * anchor, the k candidates with a different label holding the
    * smallest seeded uniform draw u = md5(anchor ‖ candidate ‖ salt)
    * — per-PAIR seeding, so one candidate can be a negative for many
    * anchors while each anchor still gets an independent uniform draw
    * over its candidate set. The uniform-random complement of
    * [[graft.operators.Similarity.hardNegatives]] (easy negatives for
    * warmup / loss mixing).
    *
    * Plan shape: anchors broadcast against the candidate scan,
    * label-mismatch predicate before the bounded-heap top-k aggregate
    * — O(partitions·|anchors|·k) shuffle, no window. Output:
    * (anchor_id, rank, neg_id, u).
    */
  def negativePairs(candidates: DataFrame, idCol: String, labelCol: String,
                    anchors: DataFrame, aIdCol: String, aLabelCol: String,
                    k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(candidates, idCol)
    val pairs = candidates
      .select(col(idCol).as("__cid"), col(labelCol).as("__clbl"))
      .join(broadcast(anchors.select(col(aIdCol).as("__aid"),
        col(aLabelCol).as("__albl"))))
      .filter(col("__cid") =!= col("__aid") &&
        !(col("__clbl") <=> col("__albl")))
      .withColumn("__u", md5Uniform(Seq(col("__aid"), col("__cid")), salt))
    pairs
      .groupBy(col("__aid"))
      .agg(graft.functions.TopKFunctions.top_k_by_score(
        -col("__u"), col("__cid").cast("long"), k).as("__picks"))
      .select(col("__aid").as("anchor_id"),
        posexplode(col("__picks")).as(Seq("pos", "p")))
      .select(col("anchor_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("neg_id"), round(-col("p.score"), 6).as("u"))
  }

  /** MERGEABLE uniform sample of distinct keys: the k smallest
    * md5-uniform draws per group — a bottom-k sketch, so samples of
    * shards merge into the sample of the union (re-rank the union of
    * bottom-k sets, take k): the property that lets 100 TB of shards
    * each ship k rows instead of re-scanning. Implemented on the
    * shared TopKByScore aggregate (score = −u): O(partitions·k) state,
    * map-side combined, NO window and NO global sort. Output:
    * (groupCols…, key, u) with u the 6dp-rounded draw.
    */
  def bottomKSample(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(df, keyCol)
    val g = groupCols.map(col)
    df.select(g :+ col(keyCol): _*)
      .dropDuplicates(groupCols :+ keyCol)
      .withColumn("__u", md5Uniform(Seq(col(keyCol)), salt))
      .groupBy(g: _*)
      .agg(graft.functions.TopKFunctions.top_k_by_score(
        -col("__u"), col(keyCol).cast("long"), k).as("__picks"))
      .select(g :+ explode(col("__picks")).as("__p"): _*)
      .select(g :+ col("__p.id").as(keyCol) :+
        round(-col("__p.score"), 6).as("u"): _*)
  }

  /** NEYMAN optimal stratified-sample allocation — given a total
    * budget, how many samples should each stratum get? n_h ∝ N_h·σ_h
    * (Neyman 1934): strata that are BIG or VARIABLE earn more budget
    * than proportional allocation gives them — the standard upgrade
    * for QA-sampling a heterogeneous corpus (feed the result's
    * `n_alloc` into the per-stratum [[weightedSample]]/bottom-k
    * samplers).
    *
    * Portability: per-stratum moments are exact DECIMAL(38,0)/
    * HUGEINT integers; σ_h is one fixed IEEE chain; the weight
    * N_h·σ_h micro-rounds to a BIGINT so the total is an exact sum,
    * and each allocation is ONE rounded divide. (Rounded allocations
    * may sum to budget ± |strata| — the caller's top-up policy, not
    * hidden here.) Single-value strata (σ undefined) drop.
    *
    * Scale shape: ONE map-side combinable (stratum, moments)
    * collapse; everything after is |strata| rows against a broadcast
    * 1-row total. Output: (strata…, n_h, sigma 6dp, weight_micro,
    * n_alloc).
    */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
                       valueCol: Column, budget: Long): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val g = strataCols.map(col)
    val dec = "decimal(38,0)"
    val m = df.filter(valueCol.isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_h"),
        sum(valueCol.cast("long").cast(dec)).as("__s"),
        sum(valueCol.cast("long").cast(dec) * valueCol.cast("long"))
          .as("__ss"))
      .filter(col("n_h") > 1)
    val sigma = sqrt((col("n_h").cast(dec) * col("__ss") -
      col("__s") * col("__s")).cast("double") /
      (col("n_h").cast("double") * (col("n_h") - 1)))
    val w = m.withColumn("__sigma", sigma)
      .withColumn("weight_micro",
        round(col("n_h") * col("__sigma") * 1000000.0).cast("long"))
    val tot = w.agg(sum(col("weight_micro")).as("__tw"))
    w.crossJoin(broadcast(tot))
      .select(g :+ col("n_h") :+ round(col("__sigma"), 6).as("sigma") :+
        col("weight_micro") :+
        round(lit(budget.toDouble) * col("weight_micro") / col("__tw"))
          .cast("long").as("n_alloc"): _*)
  }
}
