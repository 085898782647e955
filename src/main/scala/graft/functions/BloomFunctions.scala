package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column wrappers over Spark's own Catalyst Bloom-filter expressions
  * (the machinery behind runtime row-group filtering, exposed here for
  * data-pipeline use): a serialized-sketch aggregate and its membership
  * probe. Both operate on 64-bit hashes (pair with `xxhash64`), so the
  * sketch build shuffles 8-byte values and the probe is a codegen'd
  * per-row bit test.
  *
  * `might_contain` requires its sketch operand to be CONSTANT (Catalyst
  * rejects a per-row bloom column), so the intended flow is: aggregate
  * the history side to ONE serialized-sketch row, collect it — a
  * bounded driver boundary, the sketch is `numBits/8` bytes regardless
  * of corpus size — and probe via a binary literal embedded in the
  * plan. Size the sketch to stay shippable: ~1.2 GB bounds a billion
  * items at 1% fpp; relax fpp before growing past what task broadcast
  * comfortably carries.
  */
object BloomFunctions {
  import ColumnOps._

  /** Aggregate a LONG hash column into one serialized Bloom sketch
    * (binary). `expectedItems` + `fpp` pick the optimal bit count.
    *
    * Spark's BloomFilterAggregate SILENTLY clamps both parameters to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` /
    * `.maxNumItems` (defaults 67,108,864 bits = 8 MB / 4M items) —
    * past that, the sketch saturates and fpp degrades toward 1 with no
    * error, which would quietly erase the bloom-negative fast path of
    * IncrementalDedup/IngestDedup at exactly the scales it exists for.
    * This wrapper fails fast instead: raise those confs alongside the
    * sketch size (the ~1.2 GB-per-billion-items guidance above assumes
    * you have).
    */
  /** Whether [[bloom_agg]] at these parameters passes Spark's runtime
    * bloom-filter conf clamp (maxNumBits/maxNumItems) — the SAME check
    * bloom_agg enforces, exposed so callers with a fallback path (e.g.
    * IngestDedup's exact-verify-only mode) can choose it up front
    * instead of crashing on the first sketch build.
    */
  def fitsRuntimeCaps(expectedItems: Long, fpp: Double = 0.01): Boolean = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    numBits <= maxBits && expectedItems <= maxItems
  }

  def bloom_agg(hashCol: Column, expectedItems: Long,
                fpp: Double = 0.01): Column = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(numBits <= maxBits && expectedItems <= maxItems,
      s"sketch for $expectedItems items at fpp=$fpp needs $numBits bits, but " +
      s"Spark clamps to maxNumItems=$maxItems/maxNumBits=$maxBits and the " +
      "sketch would silently saturate (fpp → 1). Raise " +
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits or " +
      "relax fpp/expectedItems.")
    toColumn(new BloomFilterAggregate(toExpr(hashCol),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Per-row membership probe of a LONG hash column against a
    * serialized sketch (as produced by [[bloom_agg]] and collected).
    * False positives at the sketch's fpp; NEVER false negatives.
    */
  def might_contain(sketch: Array[Byte], hashCol: Column): Column =
    toColumn(BloomFilterMightContain(Literal(sketch, BinaryType),
                                     toExpr(hashCol)))

  /** Union two serialized sketches (same expectedItems/fpp build
    * parameters — enforced by the underlying compatibility check).
    * Null-tolerant so a running sketch can fold in per-batch sketches
    * where either side may be empty-input null.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null) return b
    if (b == null) return a
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}
