package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TopKFunctions.top_k_by_score

/** Occupancy-capped LSH bucket machinery shared by the dedup and
  * similarity pipelines. Every flat bucket self-join is quadratic in
  * bucket occupancy, and real corpora HAVE mega-clusters (template
  * spam, duplicated embeddings): these helpers group to posting lists
  * with a bounded saturating collector — the agg buffer never holds
  * more than maxBucket+1 ids even for a billion-member bucket — and
  * drop saturated buckets instead of expanding them.
  */
private[graft] object Buckets {

  /** Bucket posting lists capped at maxBucket members: `keyed` must
    * carry an integral `id` column plus the bucket-key columns.
    * Saturated buckets (> maxBucket members) are dropped; audit them
    * with an occupancy count query (e.g. TextDedup.overflowBuckets).
    */
  def capped(keyed: DataFrame, bucketCols: Seq[String],
             maxBucket: Int): DataFrame = {
    val idType = keyed.schema("id").dataType
    graft.functions.TopKFunctions.requireIntegralId(idType,
      "capped bucket posting lists")
    keyed.groupBy(bucketCols.map(col): _*)
      .agg(top_k_by_score(lit(0.0), col("id").cast("long"), maxBucket + 1)
        .as("members"))
      .withColumn("ids",
        transform(col("members"), _.getField("id").cast(idType)))
      .filter(size(col("ids")).between(2, maxBucket))
  }

  /** All in-bucket candidate pairs (id_a < id_b, distinct), expanded
    * in-array from the capped posting lists — no self-join: one shuffle
    * (the bucket groupBy), pair fan-out bounded by maxBucket² per
    * bucket. NOTE the memory contract: the Generate evaluates one full
    * pair array per bucket row (≈ maxBucket²/2 × 16 B — 320 KB at the
    * 200 default, 2 MB at 500), so caps in the low hundreds are the
    * intended operating range; a larger cap should raise executor
    * memory headroom along with it.
    */
  def pairs(keyed: DataFrame, bucketCols: Seq[String],
            maxBucket: Int): DataFrame =
    capped(keyed, bucketCols, maxBucket)
      .select(explode(flatten(transform(col("ids"), a =>
        transform(filter(col("ids"), b => b > a),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
}
