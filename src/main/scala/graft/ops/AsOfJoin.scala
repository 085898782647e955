package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the latest right row
  * with right.ts <= left.ts within the same key — the time-series
  * operator Spark's DataFrame API lacks (SURVEY.md §2.5 "absent join
  * kinds"; provided beyond parity for event/flow analysis).
  *
  * Preference order (a) from the build spec — COMPOSED from built-ins,
  * no custom LogicalPlan needed: tag both sides, union on (key, ts),
  * and carry the right side's values forward with last(ignoreNulls)
  * over an unbounded-preceding window. One shuffle on the key (the
  * window), both inputs scanned once, fully codegen-compatible. Right
  * rows sort before left rows at equal ts, giving the inclusive
  * (>=) match DuckDB's ASOF JOIN uses.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` get attached)
    * @param key       equi-join key column name (both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param valueCols right-side columns to carry onto left rows
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // The right-side payload rides as ONE struct column: a right row's
    // struct is non-null even when every field inside is null, so
    // last(ignoreNulls) tracks the latest matched ROW — carrying bare
    // value columns instead would skip a matched row's legitimately
    // NULL value (returning a stale older value) and, with several
    // valueCols, could stitch fields from different right rows into a
    // row that never existed.
    val payload = struct(valueCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    // union schema: key, __ts, __side, left cols (null on right rows),
    // __v payload struct (null on left rows)
    val l = left.select(
      col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (leftCols.map(c => col(c)) :+
         lit(null).cast(payloadType).as("__v")): _*)
    val r = right.select(
      col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
         payload.as("__v")): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(c)) ++
              valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
