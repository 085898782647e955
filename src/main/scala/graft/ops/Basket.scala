package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MARKET-BASKET association rules — support / confidence / lift over
  * item co-occurrence in transactions (Agrawal–Srikant semantics,
  * pair rules): the classic OLAP+mining readout of a co-occurrence
  * structure, and for a training-data pipeline the "which sources /
  * tags / domains travel together" dashboard behind mixing decisions.
  * Complements the graph family: t192/t200 summarize the SHAPE of the
  * co-occurrence graph; this ranks its strongest EDGES with
  * interpretable probabilities.
  */
object Basket {

  /** Pair rules {a} → {b} (a < b, both directions derivable:
    * confidence is emitted for a→b; lift is symmetric):
    * support = n_ab/N, confidence = n_ab/n_a,
    * lift = n_ab·N/(n_a·n_b), filtered to co-occurrence count ≥
    * `minSupportCount` and ranked top-`topK` by (lift DESC, a, b).
    *
    * Determinism: every metric is ONE IEEE divide of exact BIGINTs —
    * bit-identical across engines — so the rank order (unrounded
    * lift, then the id tiebreak) is reproducible; 6dp only at the
    * output boundary.
    *
    * Scale shape: one (txn, item) DISTINCT collapse; pair expansion
    * per transaction bounded by basket size (the t192 contract —
    * co-occurrence pairs, never row pairs); pair counts and item
    * counts are map-side-combinable 8-byte-key reductions; the
    * min-support HAVING prunes the long tail BEFORE the metric join;
    * and the top-k is a TakeOrdered (per-partition heap + driver
    * merge of k·partitions rows), never a global sort.
    *
    * Output: (a, b, c_ab, c_a, c_b, support, confidence, lift) —
    * metrics 6dp, top-k by lift.
    */
  def associationRules(df: DataFrame, txnCol: String, itemCol: String,
                       minSupportCount: Long = 5,
                       topK: Int = 20): DataFrame = {
    require(minSupportCount >= 1, "minSupportCount must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val op = df
      .filter(col(txnCol).isNotNull && col(itemCol).isNotNull)
      .select(col(txnCol).as("__t"), col(itemCol).as("__i"))
      .distinct()
      .localCheckpoint(true) // feeds N, item counts, and pair counts
    val n = op.agg(countDistinct(col("__t")).as("__n"))
    val ic = op.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = op.select(col("__t"), col("__i").as("a"))
      .join(op.select(col("__t"), col("__i").as("b")), "__t")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupportCount)
    // exact integer products cast ONCE: (c_ab·N) and (c_a·c_b) stay
    // integral before the single IEEE divide, mirroring the oracle
    val lift = (col("c_ab") * col("__n")).cast("double") /
      (col("c_a") * col("c_b")).cast("double")
    pairs
      .join(ic.select(col("__i").as("a"), col("__c").as("c_a")), "a")
      .join(ic.select(col("__i").as("b"), col("__c").as("c_b")), "b")
      .crossJoin(broadcast(n))
      .withColumn("__lift", lift)
      .orderBy(col("__lift").desc, col("a"), col("b"))
      .limit(topK)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("c_ab").cast("double") / col("__n"), 6).as("support"),
        round(col("c_ab").cast("double") / col("c_a"), 6).as("confidence"),
        round(col("__lift"), 6).as("lift"))
  }
}
