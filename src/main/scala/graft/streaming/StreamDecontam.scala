package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING decontamination — the ingest-time twin of the batch
  * winnowing family ([[graft.operators.TextDedup.winnowingSets]]):
  * every arriving document is flagged against a benchmark/eval
  * fingerprint set BEFORE it lands in the corpus, so contaminated
  * training text never needs a retroactive sweep.
  *
  * The check is STATELESS per row: the document's winnowing
  * fingerprints (in-row expression work — no explode, no state
  * store) intersect a literal reference set. That makes the query
  * append-mode with NO streaming state and its result independent of
  * arrival order/batching — which is exactly what lets the driver
  * row be HASH-EXACT against a plain batch SQL replay rather than
  * gated (the t14 convention, without even needing a watermark).
  *
  * The reference set is MODEL-SIZED driver state (eval benchmarks are
  * thousands of documents; their fingerprint union is 10⁴–10⁶ longs —
  * the k-means-centroid/BPE-rules class, never corpus-sized). A
  * reference too big to inline is the batch operator's territory
  * ([[graft.operators.TextDedup.contaminationPairs]] joins postings
  * instead); this operator is the low-latency ingest guard.
  */
object StreamDecontam {

  /** Flag each streamed document: `n_shared` = |its winnowing
    * fingerprints ∩ refFingerprints|, `contaminated` = n_shared ≥
    * minShared (two independent fingerprints ≈ two shared ≥ k+w−1-char
    * substrings — one can be a stock phrase; two is quotation).
    * Works identically on batch and streaming frames.
    */
  def flag(docs: DataFrame, textCol: String, idCol: String,
           refFingerprints: Array[Long], k: Int = 8, w: Int = 4,
           minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // the native sorted-merge kernel (SortedIntersectCount), not
    // Catalyst's array_intersect: against a 10⁴-element reference a
    // per-row hash-set rebuild measured 30 s at sf0.1 where the
    // linear merge over sorted distinct arrays is O(|fps| + |ref|)
    val ref = typedLit(refFingerprints.toSeq.distinct.sorted)
    graft.operators.TextDedup.winnowingSets(docs, textCol, idCol, k, w)
      .select(col("id").as(idCol),
        graft.functions.TextFunctions.sorted_intersect_count(
          sort_array(col("fps")), ref).cast("long").as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }
}
