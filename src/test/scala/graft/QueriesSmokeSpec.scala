package graft

/** Smoke guard over the whole driver contract: every query in
  * SparkEntry.queries must execute and produce rows on the sf0.001
  * tables (the driver's t1 smoke scale), and the flagship entry too.
  * Catches regressions that the per-operator specs don't see (wiring,
  * table schemas, empty-result drift).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("every oracle key corresponds to a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("approx_percentile (the cluster-scale substitute for q32) lands near the exact value") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
        percentile(col("l_quantity"), lit(0.5)).as("exact"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("approx"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(exact - approx) <= 0.05 * math.max(1.0, exact),
      s"approx $approx too far from exact $exact")
  }
}
