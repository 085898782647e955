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
}
