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

  test("double-explode SQL (LATERAL VIEW-free, Spark 4 UNNEST-style) matches ExplodeOps") {
    SqlFacade.registerTables(spark, sfDir)
    // token explode over documents via SQL
    val viaSql = SqlFacade.sql(spark,
      "SELECT token, count(*) AS n FROM (SELECT explode(split(text, ' ')) AS token FROM documents) GROUP BY token HAVING count(*) > 10")
    val viaDf = queries.RelationalQueries.q4Explode(spark, sfDir)
    assert(rows(viaSql) == rows(viaDf))
  }
}
