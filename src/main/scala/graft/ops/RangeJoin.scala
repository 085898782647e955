package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) join: pairs within `toleranceSec` of each
  * other on their event times, optionally within equi-keys — the other
  * join kind absent from both the reference and stock Spark's efficient
  * plans (SURVEY.md §2.5): a naive `abs(lts-rts) <= tol` condition
  * plans as a nested-loop join.
  *
  * Implementation: bin both sides by `tolerance`-sized buckets; a pair
  * within tolerance differs by at most one bucket, so exploding the
  * right side into (bin-1, bin, bin+1) turns the range predicate into
  * an equi-join on (keys, bin) with an exact post-filter. Each
  * qualifying pair matches in exactly one exploded bin — no duplicate
  * elimination needed. Cost: 3× the right side through one hash
  * shuffle, instead of |L|×|R| comparisons.
  */
object RangeJoin {

  def withinTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      toleranceSec: Long): DataFrame = {
    val tolMicros = toleranceSec * 1000000L
    val lb = left.withColumn("__bin",
      floor(unix_micros(col(leftTs)) / tolMicros))
    val rb = right
      .withColumn("__rbin", floor(unix_micros(col(rightTs)) / tolMicros))
      .withColumn("__bin",
        explode(array(col("__rbin") - 1, col("__rbin"), col("__rbin") + 1)))
      .drop("__rbin")
    lb.join(rb, keys :+ "__bin")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolMicros)
      .drop("__bin")
  }
}
