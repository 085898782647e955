package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortAnalysisSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic located ledger: 40 days straddling the split; China
    * input magnitudes follow x, abroad outputs follow c·x^1.5 — the
    * log-log fit must recover slope 1.5 on each cohort.
    */
  private def ledger = {
    val base = java.time.LocalDate.parse("2021-09-04")
    (0 until 40).flatMap { d =>
      val day = java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay.plusHours(12))
      val x = 10.0 + d
      Seq(
        (day, s"tx$d-in", "input", "China", s"w$d", s"a$d", -x),
        (day, s"tx$d-out", "output", "Russia", s"w$d", s"b$d", 2.0 * math.pow(x, 1.5)),
        // noise rows the filters must exclude:
        (day, s"tx$d-n1", "input", "Russia", s"w$d", s"c$d", -5.0),
        (day, s"tx$d-n2", "output", "China", s"w$d", s"d$d", 7.0))
    }.toDF("block_timestamp", "txid", "type", "location", "wallet", "addr", "val")
  }

  test("prePost recovers the power-law slope on both cohorts and splits days correctly") {
    val (pre, post) = CohortAnalysis.prePost(ledger, "2021-09-24",
      outLocation = "China", inLocationNot = "China")
    // pre: days < 09-24 midnight → d 0..19; post: the noon timestamp on
    // the split day itself is > midnight, so d 20..39
    assert(pre.fit.n == 20 && post.fit.n == 20)
    assert(math.abs(pre.fit.slope - 1.5) < 1e-9)
    assert(math.abs(post.fit.slope - 1.5) < 1e-9)
    assert(pre.fit.r2 > 0.999999)
    // prediction columns present and residuals ~0 on the exact power law
    assert(pre.daily.columns.contains("yhat"))
    assert(pre.daily.selectExpr("max(abs(residual))").head().getDouble(0) < 1e-9)
  }

  test("minFlow filter drops low-activity days like the reference's txid_input > 1") {
    val r = CohortAnalysis.run(ledger, "China", "China", minFlow = 25.0)
    // outflow = x = 10..49 daily; > 25 keeps x in 26..49
    assert(r.fit.n == 24)
  }
}
