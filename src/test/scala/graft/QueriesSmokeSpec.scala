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
  test("session_window boundary is INCLUSIVE: exactly-gap event merges; one tick past splits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def plusMs(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val hour = 3600000L
    // +0 and exactly +1h merge (inclusive boundary — the q38 oracle's
    // strictly-greater break mirrors this); +1h+1ms past that splits
    val ev = Seq((1L, t0), (1L, plusMs(hour)), (1L, plusMs(2 * hour + 1)))
      .toDF("user_id", "ts")
    val sessions = ev.groupBy(session_window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"n")
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
    assert(sessions.map(_._2).toSeq == Seq(2L, 1L))
    assert(sessions(1)._1 == plusMs(2 * hour + 1))
  }

}
