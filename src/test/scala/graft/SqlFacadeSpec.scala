package graft

import org.apache.spark.sql.DataFrame

/** The SQL dialect surface must agree with the DataFrame forms — the
  * dual-surface posture of the reference (SQL text) vs this engine
  * (declarative API).
  */
class SqlFacadeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("daily-flow SQL twin matches the flagship entry DataFrame query") {
    SqlFacade.registerTables(spark, sfDir)
    val viaSql = SqlFacade.sql(spark, SqlFacade.dailyFlowSql)
    assert(rows(viaSql) == rows(SparkEntry.entry(spark)))
    assert(viaSql.count() == 30)
  }

  test("window-dedup SQL twin matches ops.Dedup.keepFirst") {
    SqlFacade.registerTables(spark, sfDir)
    val viaSql = SqlFacade.sql(spark,
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin)
    val viaDf = queries.RelationalQueries.q6DedupKeepFirst(spark, sfDir)
    assert(rows(viaSql) == rows(viaDf))
  }

  test("operator views: each registered relational op is reachable " +
       "through spark.sql text and agrees with its Scala form") {
    import org.apache.spark.sql.functions._
    SqlFacade.registerTables(spark, sfDir)
    SqlFacade.registerOperatorViews(spark, sfDir)
    // quota_mix == the Scala sampler's exact output
    val mixSql = SqlFacade.sql(spark,
      "SELECT doc_id, source FROM quota_mix")
    val mixDf = ops.Mixing.sampleQuotas(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
      "source", "doc_id",
      (0 to 4).map(i => s"src$i" -> 10).toMap ++
        (5 to 9).map(i => s"src$i" -> 5).toMap, defaultQuota = 2)
    assert(rows(mixSql) == rows(mixDf))
    // minhash_near_dups: SQL-side filtering composes with the view
    val dupSql = SqlFacade.sql(spark,
      "SELECT count(*) FROM minhash_near_dups WHERE jaccard >= 0.8")
    assert(dupSql.head().getLong(0) ==
      SqlFacade.sql(spark, "SELECT count(*) FROM minhash_near_dups")
        .head().getLong(0))
    // quality_flags + drift_ks resolve and carry their contract columns
    assert(SqlFacade.sql(spark,
      "SELECT count(*) FROM quality_flags WHERE keep").head().getLong(0) > 0)
    assert(SqlFacade.sql(spark,
      "SELECT count(*) FROM drift_ks WHERE ks_d >= 0").head().getLong(0) > 0)
  }

  test("double-explode SQL (LATERAL VIEW-free, Spark 4 UNNEST-style) matches ExplodeOps") {
    SqlFacade.registerTables(spark, sfDir)
    // token explode over documents via SQL
    val viaSql = SqlFacade.sql(spark,
      "SELECT token, count(*) AS n FROM (SELECT explode(split(text, ' ')) AS token FROM documents) GROUP BY token HAVING count(*) > 10")
    val viaDf = queries.RelationalQueries.q4Explode(spark, sfDir)
    assert(rows(viaSql) == rows(viaDf))
  }
}
