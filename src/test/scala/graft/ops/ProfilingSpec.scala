package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("b"), Some(1.5)),
    (Some(2L), None, Some(2.25)),
    (Some(2L), Some("a"), None),
    (None, Some("a"), Some(10.0))).toDF("k", "s", "x")

  test("per-column nulls, distincts, and portable min/max strings") {
    val got = Profiling.profile(df, Seq("k", "s", "x"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k") == ("k", 1L, 2L, "1", "2"))
    assert(got("s") == ("s", 1L, 2L, "a", "b"))
    // doubles render through DECIMAL(18,2): engine-portable formatting
    assert(got("x") == ("x", 1L, 3L, "1.50", "10.00"))
  }

  test("profiling a single column yields a single row") {
    val got = Profiling.profile(df, Seq("k")).collect()
    assert(got.length == 1)
  }

  test("profileApprox: same schema, HLL distincts within documented rsd bounds") {
    val wide = (1 to 5000).map(i => (i.toLong, (i % 937).toString))
      .toDF("id", "mod")
    val exact = Profiling.profile(wide, Seq("id", "mod"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Profiling.profileApprox(wide, Seq("id", "mod"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // everything but the distinct estimate matches exactly
    for (c <- Seq("id", "mod")) {
      assert(approx(c)._2 == exact(c)._2)
      assert(approx(c)._4 == exact(c)._4 && approx(c)._5 == exact(c)._5)
      // HLL at rsd=0.05: allow a generous 5-sigma band
      val (est, truth) = (approx(c)._3.toDouble, exact(c)._3.toDouble)
      assert(math.abs(est - truth) <= 0.25 * truth,
        s"$c: approx distinct $est vs exact $truth")
    }
  }

  test("hostile column names (quotes, backticks, dots) profile fine") {
    val hostile = Seq((1L, "x"), (2L, "y"), (2L, null))
      .toDF("a'b`c", "d.e\"f")
    val got = Profiling.profile(hostile, Seq("a'b`c", "d.e\"f"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a'b`c") == ("a'b`c", 0L, 2L, "1", "2"))
    assert(got("d.e\"f") == ("d.e\"f", 1L, 2L, "x", "y"))
  }

  test("empty input: zero counts, null min/max") {
    val got = Profiling.profile(df.filter(lit(false)), Seq("k", "s"))
      .as[(String, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("k") == ("k", 0L, 0L, None, None))
    assert(got("s") == ("s", 0L, 0L, None, None))
  }

  test("benfordAudit: a perfectly Benford-weighted sample scores near 0; single-digit data is penalized on all 9 digits") {
    import org.apache.spark.sql.functions.col
    def benford(d: Int) = math.log10(1.0 + 1.0 / d)
    // counts proportional to Benford out of 1000 (rounded): close fit
    val close = (1 to 9).flatMap(d =>
      Seq.fill(math.rint(benford(d) * 1000).toInt)(("close", d + 0.005)))
    // all values lead with digit 4
    val flat = Seq.fill(50)(("flat", 4.2))
    val out = Profiling.benfordAudit((close ++ flat).toDF("g", "v"),
        Seq("g"), "v")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_values"), r.getAs[Long]("k_digits"),
          r.getAs[Double]("mad")))).toMap
    val (nC, kC, madC) = out("close")
    assert(kC == 9L && madC < 0.001)
    // flat: digit 4 deviates |1 - P(4)|, the other 8 score their full P(d)
    val microSum = math.rint(math.abs(1.0 - benford(4)) * 1e6).toLong +
      (1 to 9).filter(_ != 4)
        .map(d => math.rint(benford(d) * 1e6).toLong).sum
    assert(out("flat") ==
      ((50L, 1L, math.rint(microSum.toDouble / 1e6 / 9.0 * 1e6) / 1e6)))
  }

  test("fdAudit: a holding dependency scores confidence 1; a broken one counts violators and majority mass") {
    import org.apache.spark.sql.functions.col
    val holds = Seq((1L, "a"), (2L, "b"), (1L, "a")).toDF("l", "r")
    val h = Profiling.fdAudit(holds, "l", "r").collect().head
    assert(h.getAs[Long]("n_groups") == 2L)
    assert(h.getAs[Long]("n_violating") == 0L)
    assert(h.getAs[Double]("confidence") == 1.0)
    assert(h.getAs[Boolean]("holds"))
    // group 1: a,a,b (majority 2); group 2: c (1) -> conf = 3/4
    val broken = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("l", "r")
    val b = Profiling.fdAudit(broken, "l", "r").collect().head
    assert(b.getAs[Long]("n_violating") == 1L)
    assert(b.getAs[Long]("n_rows") == 4L)
    assert(b.getAs[Double]("confidence") == 0.75)
    assert(!b.getAs[Boolean]("holds"))
  }

  test("weightedQuantiles picks the left-continuous weighted order statistic") {
    import org.apache.spark.sql.functions.col
    // values 1..4, weights 1,1,6,2 (W=10): cum 1,2,8,10
    // p25: cw*4>=10 -> v=3; p50: cw*2>=10 -> v=3; p75: cw*4>=30 -> v=3 (cw=8, 32>=30)
    val rows = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 6L),
      ("g", 4.0, 2L))
    val out = Profiling.weightedQuantiles(rows.toDF("g", "v", "w"),
      Seq("g"), "v", "w").collect().head
    assert(out.getAs[Long]("total_weight") == 10L)
    assert(out.getAs[Double]("p25") == 3.0)
    assert(out.getAs[Double]("p50") == 3.0)
    assert(out.getAs[Double]("p75") == 3.0)
  }

  test("weightedQuantiles: uniform weights reproduce the unweighted order statistic") {
    import org.apache.spark.sql.functions.col
    val rows = (1 to 8).map(i => ("g", i.toDouble, 1L))
    val out = Profiling.weightedQuantiles(rows.toDF("g", "v", "w"),
      Seq("g"), "v", "w").collect().head
    assert(out.getAs[Double]("p25") == 2.0) // cw*4 >= 8 at v=2
    assert(out.getAs[Double]("p50") == 4.0)
    assert(out.getAs[Double]("p75") == 6.0)
  }

  test("benfordAudit: leading digit comes from BIGINT cents — sub-cent and non-positive rows drop") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("g", 0.004), ("g", -5.0), ("g", 0.0), ("g", 9.5))
      .toDF("g", "v")
    val out = Profiling.benfordAudit(df, Seq("g"), "v").collect().head
    // only 9.5 survives (950 cents -> digit 9)
    assert(out.getAs[Long]("n_values") == 1L)
    assert(out.getAs[Long]("k_digits") == 1L)
  }

  test("robustOutliers: median/MAD flag only the planted extreme; " +
       "constant groups flag nothing; even-n uses the left-continuous stat") {
    import org.apache.spark.sql.functions.col
    val rows = Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L, "a" -> 100L) ++
      Seq("c" -> 5L, "c" -> 5L, "c" -> 5L) ++
      Seq("e" -> 1L, "e" -> 2L, "e" -> 3L, "e" -> 4L)
    val out = Profiling.robustOutliers(rows.toDF("g", "v"), Seq("g"),
        col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")   // med 3, devs {0,1,1,2,97} -> mad 1; only 100 flagged
    assert(a.getAs[Long]("med") == 3L && a.getAs[Long]("mad") == 1L)
    assert(a.getAs[Long]("n_outliers") == 1L)
    assert(a.getAs[Double]("outlier_frac") == 0.2)
    val c = out("c")   // mad 0: |x-med|*10000 > 0 never fires at x == med
    assert(c.getAs[Long]("mad") == 0L && c.getAs[Long]("n_outliers") == 0L)
    val e = out("e")   // even n: med = smallest v with 2*cum >= 4 -> 2
    assert(e.getAs[Long]("med") == 2L && e.getAs[Long]("mad") == 1L)
  }
}
