package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explode / lateral-flatten operators — the signature operator of the
  * reference workload (SURVEY.md §2.3). BigQuery's correlated UNNEST in
  * FROM is an INNER lateral join (rows with empty/NULL arrays drop),
  * which is exactly Spark's `explode`; `explode_outer` would be the LEFT
  * variant the reference never uses.
  *
  * Each explode is a Catalyst `Generate` node — no shuffle; fan-out
  * happens within partitions, so upstream partitioning is preserved.
  */
object ExplodeOps {

  /** E1 — flatten a top-level array column (UNNEST(addresses),
    * btcolap.sql:52-53): one output row per element.
    */
  def flatten(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.select(col("*"), explode(col(arrayCol)).as(as)).drop(arrayCol)

  /** E2 — double lateral explode of ARRAY<STRUCT<addresses ARRAY<STRING>,
    * value>> (`FROM tx, tx.inputs AS input, UNNEST(input.addresses)`,
    * btcolap.sql:109-111): first explode the struct array, then the
    * inner address array, keeping the struct's scalar fields.
    */
  def explodeLeg(df: DataFrame, legCol: String,
                 addrAs: String, valueAs: String): DataFrame =
    df.select(col("*"), explode(col(legCol)).as("__leg")).drop(legCol)
      .select(col("*"),
              col("__leg.value").as(valueAs),
              explode(col("__leg.addresses")).as(addrAs))
      .drop("__leg")

  /** E3 — re-nest (inverse of explode): ARRAY_AGG after GROUP BY
    * (btcolap.sql:226-229). `sorted=true` wraps in array_sort for
    * deterministic output under parallel aggregation (the reference,
    * running single-stream, got whatever order BigQuery produced).
    */
  def renest(df: DataFrame, keys: Seq[String], valueCol: Column, as: String,
             sorted: Boolean = true): DataFrame = {
    val agg = collect_list(valueCol)
    df.groupBy(keys.map(col): _*)
      .agg((if (sorted) sort_array(agg) else agg).as(as))
  }
}
