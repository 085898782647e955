package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string surface (SURVEY.md §1.4: the reference's "API" is SQL text
  * executed on a connection — btc_logregression_pre.py:14-26). Register
  * the synthetic tables as temp views and any reference-shaped query
  * runs verbatim through `spark.sql`; Catalyst plans it identically to
  * the DataFrame forms (SqlFacadeSpec asserts result equality).
  */
object SqlFacade {

  /** Register every table under `sfDir` as a session temp view, plus
    * the engine's native SQL functions (cosine_sim, minhash_sig,
    * top_k_by_score, …) and optimizer/planner extensions.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    graft.plans.GraftExtensions.install(spark)
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Run a query written in the reference's BigQuery dialect: the
    * scoped textual translation (BigQueryDialect — backticked paths,
    * OFFSET/ORDINAL subscripts, ARRAY_AGG IGNORE NULLS, comma-lateral
    * UNNEST) bridges the constructs Spark's parser rejects; everything
    * else flows through `spark.sql` untouched.
    */
  def bigQuerySql(spark: SparkSession, query: String): DataFrame =
    spark.sql(BigQueryDialect.translate(query))

  /** The daily-flow analysis query (btcolap.sql:453-463 ≡ the flagship
    * entry) in SQL form.
    */
  val dailyFlowSql: String =
    """SELECT date_trunc('day', ts) AS day,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-01' AND event_type = 'purchase'
      |GROUP BY 1 ORDER BY day""".stripMargin
}
