package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator battery — one named query per operator family in
  * SURVEY.md §2, expressed over the driver's synthetic tables so the
  * DuckDB oracle can check them (Verify.scala / CORRECTNESS_r{N}.json).
  *
  * Conventions (required by the driver's hash compare):
  *   - every computed column is aliased identically here and in
  *     [[Oracle.sql]];
  *   - double-typed SUMs go through DECIMAL(18,2) so Spark's partial
  *     (map-side) aggregation order cannot produce ulp drift vs DuckDB's
  *     sequential sum — both engines sum exactly, then cast to double;
  *   - no LIMIT without a total ORDER BY (SURVEY §7.3).
  */
object RelationalQueries {

  /** Exact money sum: double column → decimal sum → double result.
    * Deterministic under any aggregation/partitioning order at any scale
    * (decimal addition is associative), unlike a raw double sum.
    */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** q1_agg — pricing-summary aggregate (SURVEY A1/A5, P1).
    * Mirrors the reference's daily-sum shape (btcolap.sql:459) over the
    * lineitem fact: group on two low-cardinality keys, sum measures.
    * Scale: map-side partial agg → tiny shuffle (|groups| ≈ 6).
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))

  /** q2_filter_project — scan + range/equality predicates + scalar
    * arithmetic (SURVEY P1-P6, S2). The negate-and-scale projection is
    * the reference's satoshi→BTC idiom (-value/1e8, btcolap.sql:107).
    * Filters and the 4-column projection push down to the parquet scan.
    */
  def q2FilterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1999-01-01").cast("timestamp") &&
              col("l_returnflag") === "R")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (-col("l_extendedprice") / lit(1e2)).as("val"),
        col("l_shipdate"))

  /** q3_case_label — CASE WHEN sign→label + literal tag columns
    * (SURVEY P7/P10; btcolap.sql:214,106).
    */
  def q3CaseLabel(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        lit("event").as("kind"),
        when(col("value") < 100.0, "small").otherwise("big").as("bucket"),
        col("event_type"))
      .groupBy(col("kind"), col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
}
