package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): the
    * reference's daily-flow aggregate (btcolap.sql:453-463 ≡
    * btc_logregression_pre.py:14-26) re-expressed on the `events` table —
    * timestamp-range filter + type filter + day bucket + signed sum.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.events(spark, sfDir)
      .filter(col("ts") > lit("2024-01-01").cast("timestamp") &&
              col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("daily_value"))
      .orderBy(col("day"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (RelationalQueries.q1Agg _),
    "q2_filter_project" -> (RelationalQueries.q2FilterProject _),
    "q3_case_label"     -> (RelationalQueries.q3CaseLabel _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
