package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * lakehouse answer to "which column do I sort by when scans filter on
  * BOTH x and y". A linear sort gives perfect min/max pruning on the
  * sort key and none on everything else; the Morton curve interleaves
  * the two key spaces bit-by-bit, so every Z-contiguous file covers a
  * ~√B fraction of EACH dimension instead of 1/B of one and 100% of
  * the other (Delta Lake's OPTIMIZE ZORDER BY, Databricks 2021).
  *
  * At 100 TB this decides scan cost: parquet row-group and file-level
  * min/max stats prune only as tightly as the layout clusters, and the
  * writer picks the layout exactly once. The key computation here is
  * pure expression arithmetic (codegen'd shifts/masks, no shuffle of
  * its own); writers range-partition on the key — same shuffle they
  * were already paying for the linear sort.
  *
  * `zorderAudit` is the measurable witness: bucket the SAME rows by
  * Z-prefix and by the linear key, and report each layout's average
  * per-bucket fractional coverage of both dimensions — the quantity
  * min/max pruning divides scan cost by.
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,…,30) —
    * the classic mask-shift ladder, 4 codegen-friendly ops. Input must
    * be a long in [0, 65535].
    */
  private def spread(v: Column): Column = {
    val a = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Normalize a numeric column to a 16-bit integer rank given its
    * global [min, max]: floor((v − min)/(max − min) · 65536), clamped
    * to 65535 (degenerate max = min maps everything to 0). Linear
    * scaling — not an exact quantile rank — which is the standard
    * writer-side choice: it needs only a broadcast 1-row min/max, not
    * a corpus sort.
    */
  def normalize16(v: Column, vMin: Column, vMax: Column): Column =
    when(vMax <= vMin, lit(0L)).otherwise(
      least(floor((v.cast("double") - vMin) / (vMax - vMin) * 65536.0),
            lit(65535.0)).cast("long"))

  /** 32-bit Morton key of two 16-bit normalized ranks: x on even bits,
    * y on odd.
    */
  def mortonKey(x16: Column, y16: Column): Column =
    spread(x16).bitwiseOR(shiftleft(spread(y16), 1))

  /** Layout quality audit: bucket rows into `buckets` files by (a) the
    * Morton key prefix and (b) the linear x-key prefix, and for each
    * layout report the average per-bucket fractional span of each raw
    * dimension — avg((max−min)/global range) over buckets — plus
    * `worst_dim_frac`, the max of the two. min/max pruning on a
    * predicate over dimension d touches ~avg_d_frac of the files, so
    * worst_dim_frac is the layout's worst-case prunability. Z-order's
    * value proposition in one number: both dims near 1/√B instead of
    * one dim at 1/B and the other at ~1.
    *
    * `buckets` must be a power of 4 ≤ 4^8 (so the prefix cut is
    * bit-aligned in both layouts: log2(B)/2 bits per dim on the curve,
    * log2(B) bits linear).
    */
  def zorderAudit(df: DataFrame, xCol: String, yCol: String,
                  buckets: Int = 16): DataFrame = {
    val log2b = (math.log(buckets) / math.log(2)).round.toInt
    require((1 << log2b) == buckets && log2b % 2 == 0 && log2b <= 16,
      s"buckets must be a power of 4 (got $buckets)")
    val stats = df.agg(
      min(col(xCol).cast("double")).as("x_min"),
      max(col(xCol).cast("double")).as("x_max"),
      min(col(yCol).cast("double")).as("y_min"),
      max(col(yCol).cast("double")).as("y_max"))
    val keyed = df.crossJoin(broadcast(stats))
      .withColumn("x16", normalize16(col(xCol), col("x_min"), col("x_max")))
      .withColumn("y16", normalize16(col(yCol), col("y_min"), col("y_max")))
      .withColumn("zb", shiftright(mortonKey(col("x16"), col("y16")),
        32 - log2b))
      .withColumn("lb", shiftright(col("x16"), 16 - log2b))
    def layoutStats(name: String, bucket: Column) = keyed
      .groupBy(bucket.as("bucket"))
      .agg(min(col(xCol).cast("double")).as("bx_min"),
           max(col(xCol).cast("double")).as("bx_max"),
           min(col(yCol).cast("double")).as("by_min"),
           max(col(yCol).cast("double")).as("by_max"),
           first(col("x_min")).as("x_min"), first(col("x_max")).as("x_max"),
           first(col("y_min")).as("y_min"), first(col("y_max")).as("y_max"))
      .agg(count(lit(1)).as("n_buckets"),
        round(avg(when(col("x_max") > col("x_min"),
          (col("bx_max") - col("bx_min")) / (col("x_max") - col("x_min")))
          .otherwise(lit(0.0))), 6).as("avg_x_frac"),
        round(avg(when(col("y_max") > col("y_min"),
          (col("by_max") - col("by_min")) / (col("y_max") - col("y_min")))
          .otherwise(lit(0.0))), 6).as("avg_y_frac"))
      .select(lit(name).as("layout"), col("n_buckets"),
        col("avg_x_frac"), col("avg_y_frac"),
        greatest(col("avg_x_frac"), col("avg_y_frac")).as("worst_dim_frac"))
    layoutStats("zorder", col("zb"))
      .unionByName(layoutStats("linear_x", col("lb")))
  }
}
