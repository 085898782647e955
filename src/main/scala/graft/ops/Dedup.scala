package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three deduplication strategies plus the audit query,
  * generalized over any DataFrame (SURVEY.md §2.4). All are pure
  * transforms — the reference's in-place DELETEs become read→transform→
  * overwrite (SURVEY §3 EP3), which is the only sane shape on immutable
  * columnar storage at 100 TB anyway.
  *
  * Scale notes: every variant is one hash shuffle on the dedup key
  * (window or aggregate), no self-joins, no sorts beyond the in-partition
  * window sort. Skewed keys inherit AQE skew handling.
  */
object Dedup {

  /** D1 — keep exactly one row per key (btcolap.sql:1-15). The reference
    * ordered by the partition key itself, making the survivor arbitrary;
    * callers wanting determinism pass a real tiebreak order.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D1 with arbitrary survivor — semantically what the reference's
    * ORDER-BY-the-key version computes (SURVEY §2.4 D1): Spark's native
    * dropDuplicates is one partial+final aggregate, cheaper than a
    * window because it needs no in-partition sort.
    */
  def keepAny(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** D2 — remove EVERY row of any duplicated key (btcolap.sql:289-298).
    * Not keep-first: duplicated keys vanish entirely. A windowed count
    * replaces the reference's subquery-semi-join — one shuffle, not two.
    */
  def removeAllDuplicated(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") === 1)
      .drop("__cnt")
  }

  /** D3 — NULL-masking dedup (dupedeleter.sql:1-15): preserve the row,
    * null out `maskCols` on duplicates of `keys` so later SUMs don't
    * double-count. The reference repeats the identical window spec per
    * CASE arm; one window expression serves all masked columns here
    * (Catalyst would collapse them anyway — SURVEY §4).
    */
  def nullMaskDuplicates(df: DataFrame, keys: Seq[String], order: Seq[Column],
                         maskCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val masked = df.withColumn("__rn", row_number().over(w))
    maskCols.foldLeft(masked) { (d, c) =>
      d.withColumn(c, when(col("__rn") > 1, lit(null)).otherwise(col(c)))
    }.drop("__rn")
  }

  /** D4 — duplicate audit (btcolap.sql:17-31): keys occurring more than
    * once, most-duplicated first. Empty result ⇒ dedup invariant holds.
    */
  def audit(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("occurrence_count"))
      .filter(col("occurrence_count") > 1)
      .orderBy(desc("occurrence_count") +: keys.map(col): _*)
}
