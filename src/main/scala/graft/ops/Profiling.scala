package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One-pass column profiling — the data-quality summary every ingest
  * pipeline runs before expensive stages: per column, the null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * column types share one result schema.
  *
  * Scale shape: a single global aggregate — map-side partials, one
  * 1-row exchange. The only scale caveat is `profile`'s EXACT distinct
  * counts, which plan as one Expand branch per profiled column (rows ×
  * |columns| before partial aggregation); `profileApprox` swaps in
  * HyperLogLog sketches (`approx_count_distinct`) — same plan minus
  * the Expand, the form to run at 100 TB. The exact form is kept
  * because the oracle checks exact values (q42); the approx form is
  * bounds-checked in ProfilingSpec and timed against it in
  * StageProfile.
  *
  * Both variants build the result with the Column API only — column
  * names are carried as struct-field literals, never interpolated into
  * generated SQL, so names containing quotes/backticks/dots profile
  * fine.
  */
object Profiling {

  private def renderer(df: DataFrame, c: String): Column => Column =
    df.schema(c).dataType match {
      // floating-point min/max render through DECIMAL(18,2) so the
      // string form is engine-portable (raw double→string is not)
      case DoubleType | FloatType => _.cast("decimal(18,2)").cast("string")
      case _ => _.cast("string")
    }

  /** Reference a top-level column by its LITERAL name: backtick-quoted
    * (embedded backticks doubled), so dots/quotes in the name are data,
    * not attribute-path syntax.
    */
  private def byName(c: String): Column =
    col("`" + c.replace("`", "``") + "`")

  private def profileWith(df: DataFrame, columns: Seq[String],
                          distinctAgg: Column => Column): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    // one struct-valued aggregate per column, aliased positionally —
    // the data column name never enters an identifier or SQL string
    val aggs = columns.zipWithIndex.map { case (c, i) =>
      val toStr = renderer(df, c)
      val src = byName(c)
      struct(
        count(when(src.isNull, 1)).as("n_nulls"),
        distinctAgg(src).as("n_distinct"),
        toStr(min(src)).as("min_str"),
        toStr(max(src)).as("max_str")).as(s"__p$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(columns.zipWithIndex.map { case (c, i) =>
        struct(
          lit(c).as("col_name"),
          col(s"__p$i").getField("n_nulls").as("n_nulls"),
          col(s"__p$i").getField("n_distinct").as("n_distinct"),
          col(s"__p$i").getField("min_str").as("min_str"),
          col(s"__p$i").getField("max_str").as("max_str"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Profile `columns` of `df` into one row per column:
    * (col_name, n_nulls, n_distinct, min_str, max_str) with EXACT
    * distinct counts.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    profileWith(df, columns, count_distinct(_))

  /** `profile` with approximate (HLL) distinct counts — identical
    * schema, no per-column Expand branch: the variant to run at corpus
    * scale. `rsd` is the HLL relative standard deviation (Spark's
    * default 0.05).
    */
  def profileApprox(df: DataFrame, columns: Seq[String],
                    rsd: Double = 0.05): DataFrame =
    profileWith(df, columns, approx_count_distinct(_, rsd))
}
