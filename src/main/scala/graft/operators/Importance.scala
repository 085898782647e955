package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") —
  * the model-free domain-selection step: map every document to hashed
  * unigram+bigram feature counts, fit two smoothed categorical
  * distributions over the buckets (target slice vs whole corpus), and
  * weight each document by its log importance ratio
  * `Σ_f n_f · (ln p_f − ln q_f)`. High weight = the document's
  * feature profile looks like the target domain.
  */
object Importance {

  /** Feature buckets of the DSIR hash — shared by the operator, its
    * oracle, and the scale-stress audit. */
  val DefaultBuckets = 64

  /** Per-document DSIR importance weights plus a top-quantile keep
    * flag.
    *
    * Output: (doc_id, n_feats, logw, keep) for EVERY document —
    * featureless (empty-text) docs carry n_feats = 0, logw = 0.
    * `logw` is rounded to 6dp; the per-bucket log ratios are rounded
    * to 6dp BEFORE the dot product so any engine replaying the
    * arithmetic feeds identical inputs to the sum (ln differs by an
    * ulp across libm implementations); keep = logw ≥ the rounded
    * `keepQuantile` exact percentile of the corpus weights.
    *
    * Scale shape: the feature map is ONE native-kernel scan per row —
    * no explode, no per-token strings, no shuffle. Fitting reduces the
    * `buckets`-length count vectors to exactly `buckets` rows
    * [posexplode → map-side combined groupBy], and the fitted model is
    * 2·`buckets` numbers — bounded by construction, held on the driver
    * like the k-means centroid matrices (never grows with the corpus).
    * Scoring is a per-row zip_with/aggregate dot product against the
    * literal log-ratio vector — map-side only. The one corpus-wide
    * ordering is the percentile aggregate over per-doc scalars, riding
    * a broadcast single-row frame (the t52 threshold convention).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  target: Column, buckets: Int = DefaultBuckets,
                  alpha: Double = 0.5, keepQuantile: Double = 0.75)
      : DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(keepQuantile > 0 && keepQuantile < 1,
      s"keepQuantile must be in (0, 1), got $keepQuantile")
    // NULL text = featureless (all-zero counts, logw 0), matching the
    // oracle's LEFT-join + coalesce-0 coverage of every document —
    // without the coalesce the kernel would null-propagate and drop
    // the row from the percentile the keep threshold rides on
    val feats = docs.select(col(idCol).as("doc_id"), target.as("__tgt"),
        TextFunctions.hashed_ngram_counts(
          coalesce(col(textCol), lit("")), buckets).as("f"))
      .localCheckpoint(true)
    // a NULL target verdict counts as out-of-domain (excluded by
    // `when`); posexplode emits every bucket of every row, so the
    // groupBy covers all `buckets` positions even for empty buckets
    val totals = feats
      .select(col("__tgt"), posexplode(col("f")).as(Seq("b", "n")))
      .groupBy(col("b"))
      .agg(sum(col("n")).as("c_all"),
           coalesce(sum(when(col("__tgt"), col("n"))), lit(0L)).as("c_tgt"))
      .collect() // bounded: exactly `buckets` rows, like k-means centroids
    val tAll = totals.map(_.getLong(1)).sum.toDouble
    val tTgt = totals.map(_.getLong(2)).sum.toDouble
    val lr = new Array[Double](buckets)
    totals.foreach { r =>
      val raw =
        math.log((r.getLong(2) + alpha) / (tTgt + alpha * buckets)) -
        math.log((r.getLong(1) + alpha) / (tAll + alpha * buckets))
      lr(r.getInt(0)) =
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lrCol = array(lr.toSeq.map(lit): _*)
    val scored = feats.select(col("doc_id"),
        aggregate(col("f"), lit(0L), (acc, x) => acc + x).as("n_feats"),
        round(aggregate(zip_with(col("f"), lrCol, (n, w) => n * w),
          lit(0.0), (acc, x) => acc + x), 6).as("logw"))
      .localCheckpoint(true) // consumed twice: threshold + labeling
    val thr = scored.agg(
      round(percentile(col("logw"), lit(keepQuantile)), 6).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_feats"), col("logw"),
        (col("logw") >= col("__thr")).as("keep"))
  }
}
