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

  // ---- cramersV ---------------------------------------------------

  test("cramersV: perfect association gives 1, independence gives 0") {
    val perfect = (1 to 40).map(i =>
      ("g", if (i % 2 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
    val p = Profiling.cramersV(perfect.toDF("g", "r", "c"), Seq("g"),
      "r", "c").collect().head
    assert(p.getAs[Double]("v") == 1.0)
    // exact independence: every (r, c) cell equally filled
    val indep = for (i <- 0 until 10; r <- Seq("a", "b"); c <- Seq("x", "y"))
      yield ("g", r, c)
    val q = Profiling.cramersV(indep.toDF("g", "r", "c"), Seq("g"),
      "r", "c").collect().head
    assert(q.getAs[Double]("v") == 0.0)
  }

  test("cramersV: constant margin yields NULL; absent cells count") {
    val const = (1 to 10).map(i => ("g", "only", if (i <= 5) "x" else "y"))
    val out = Profiling.cramersV(const.toDF("g", "r", "c"), Seq("g"),
      "r", "c").collect().head
    assert(out.getAs[Long]("n_rows") == 1 && out.isNullAt(out.fieldIndex("v")))
    // a 2x2 with one EMPTY cell: chi2 must include its expected mass
    // hand: cells (a,x)=4 (a,y)=4 (b,x)=4 (b,y)=0 -> n=12,
    // chi2 = sum over 4 cells = 12*(4*12-8*8)^2/(12*8*8) ... compute:
    val rows = Seq.fill(4)(("g","a","x")) ++ Seq.fill(4)(("g","a","y")) ++
      Seq.fill(4)(("g","b","x"))
    val r2 = Profiling.cramersV(rows.toDF("g", "r", "c"), Seq("g"),
      "r", "c").collect().head
    // phi for 2x2 = |ad - bc| / sqrt(r1*r2*c1*c2) = |4*0-4*4|/sqrt(8*4*8*4)
    val expected = math.rint(16.0 / math.sqrt(8.0*4*8*4) * 1e6) / 1e6
    assert(r2.getAs[Double]("v") == expected)
  }

  // ---- skewKurtosis -----------------------------------------------

  test("skewKurtosis: symmetric series has zero skewness") {
    val rows = Seq(1L, 2L, 2L, 3L, 3L, 3L, 4L, 4L, 5L).map(("g", _))
    val out = Profiling.skewKurtosis(rows.toDF("g", "x"), Seq("g"), "x")
      .collect().head
    assert(out.getAs[Double]("skewness") == 0.0)
  }

  test("skewKurtosis matches a direct two-pass computation") {
    val xs = Seq(3L, 7L, 7L, 19L, 2L, 5L, 11L, 2L, 31L, 6L)
    val n = xs.size
    val mean = xs.sum.toDouble / n
    val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
    val sk = math.rint(m3 / math.pow(m2, 1.5) * 1e6) / 1e6
    val ku = math.rint((m4 / (m2 * m2) - 3.0) * 1e6) / 1e6
    val out = Profiling.skewKurtosis(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), "x").collect().head
    assert(out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("skewness") - sk) <= 1e-6)
    assert(math.abs(out.getAs[Double]("kurtosis") - ku) <= 1e-6)
  }

  test("skewKurtosis: constant series yields NULL shape stats") {
    val out = Profiling.skewKurtosis(Seq.fill(5)(("g", 7L)).toDF("g", "x"),
      Seq("g"), "x").collect().head
    assert(out.isNullAt(out.fieldIndex("skewness")))
    assert(out.isNullAt(out.fieldIndex("kurtosis")))
  }

  // ---- trimmedMean ------------------------------------------------

  test("trimmedMean: drops exactly floor(n/10) from each side incl. partial ties") {
    // n=10, k=1: drop min and max -> mean of the middle 8
    val xs = Seq(100L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, -50L)
    val out = Profiling.trimmedMean(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.1).collect().head
    val mid = xs.sorted.slice(1, 9)
    assert(out.getAs[Long]("n") == 10 && out.getAs[Long]("k_trim") == 1)
    assert(out.getAs[Double]("trimmed_mean") ==
      math.rint(mid.sum.toDouble / 8 * 1e6) / 1e6)
    // partial tie block: n=20, k=2, value 1 appears 5 times at the
    // bottom -> 3 of the 5 survive
    val ys = Seq.fill(5)(1L) ++ (2L to 16L)
    val out2 = Profiling.trimmedMean(ys.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.1).collect().head
    val sorted = ys.sorted
    val mid2 = sorted.slice(2, 18)
    assert(out2.getAs[Double]("trimmed_mean") ==
      math.rint(mid2.sum.toDouble / 16 * 1e6) / 1e6)
  }

  test("trimmedMean: zero trim is the plain mean; tiny groups yield NULL-free mean") {
    val xs = Seq(1L, 2L, 3L, 4L)
    val out = Profiling.trimmedMean(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.0).collect().head
    assert(out.getAs[Long]("k_trim") == 0)
    assert(out.getAs[Double]("trimmed_mean") == 2.5)
  }

  // ---- theilIndex -------------------------------------------------

  test("theilIndex: perfectly even masses give 0; concentration raises it") {
    val even = (1 to 8).map(i => ("g", i.toLong, 10L))
    val z = Profiling.theilIndex(even.toDF("g", "u", "x"), Seq("g"), "x")
      .collect().head
    assert(z.getAs[Double]("theil") == 0.0)
    val skewed = Seq(("g", 1L, 93L)) ++ (2 to 8).map(i => ("g", i.toLong, 1L))
    val s = Profiling.theilIndex(skewed.toDF("g", "u", "x"), Seq("g"), "x")
      .collect().head
    // micro-unit contract reference
    val xs = Seq(93L) ++ Seq.fill(7)(1L)
    val n = xs.size; val total = xs.sum
    val ssum = xs.map(x => math.rint(1e6 * x *
      math.log(x.toDouble * n / total))).sum
    assert(s.getAs[Double]("theil") == math.rint(ssum / 1e6 / total * 1e6) / 1e6)
    assert(s.getAs[Double]("theil") > 1.0) // near-maximal for n=8
  }

  // ---- medianCI ---------------------------------------------------

  test("medianCI: odd/even medians and hand-checked CI ranks") {
    val xs = (1L to 25L)
    val out = Profiling.medianCI(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x")).collect().head
    assert(out.getAs[Long]("median") == 13)
    // n=25: lo = floor((25 - 1.96*5)/2) = floor(7.6) = 7, hi = 19
    assert(out.getAs[Long]("ci_lo") == 7 && out.getAs[Long]("ci_hi") == 19)
    val even = (1L to 24L)
    val out2 = Profiling.medianCI(even.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x")).collect().head
    assert(out2.getAs[Long]("median") == 12) // lower median
  }

  test("medianCI: a NULL group key is a real group (the cumulativeCells " +
       "offsets join must be null-safe, not a silent drop)") {
    val xs = (1L to 25L).map(v => ("g", v)) ++
      (1L to 9L).map(v => (null.asInstanceOf[String], v))
    val out = Profiling.medianCI(xs.toDF("g", "x"), Seq("g"), col("x"))
      .collect().map(r => Option(r.getAs[String]("g")) ->
        r.getAs[Long]("median")).toMap
    assert(out(Some("g")) == 13L)
    assert(out(None) == 5L) // the NULL group survives with its median
  }

  test("medianCI: ties collapse into blocks without shifting ranks") {
    // blocks cum to 10, 18, 25: lo=7 -> 5, mid=13 -> 7, hi=19 -> 9
    val xs = Seq.fill(10)(5L) ++ Seq.fill(8)(7L) ++ Seq.fill(7)(9L)
    val out = Profiling.medianCI(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x")).collect().head
    assert(out.getAs[Long]("median") == 7)
    assert(out.getAs[Long]("ci_lo") == 5 && out.getAs[Long]("ci_hi") == 9)
  }

  // ---- lorenzDeciles ----------------------------------------------

  test("lorenzDeciles: equal masses give the diagonal; L(10) = 1") {
    val cells = (1L to 20L).map(u => ("g", u, 5L))
    val out = Profiling.lorenzDeciles(cells.toDF("g", "u", "x"),
      Seq("g"), "x").orderBy("decile").collect()
    assert(out.map(_.getAs[Double]("mass_share")).toSeq ==
      (1 to 10).map(_ / 10.0))
  }

  test("lorenzDeciles: concentrated mass bends the curve below the diagonal") {
    // 9 users with 1, one user with 91: bottom 90% hold 9/100
    val cells = (1L to 9L).map(u => ("g", u, 1L)) :+ ("g", 10L, 91L)
    val out = Profiling.lorenzDeciles(cells.toDF("g", "u", "x"),
      Seq("g"), "x").orderBy("decile").collect()
    val shares = out.map(_.getAs[Double]("mass_share")).toSeq
    assert(shares(8) == 0.09 && shares(9) == 1.0)
    assert(shares.take(9).zipWithIndex.forall { case (s, i) =>
      s == (i + 1) * 0.01 })
  }

  test("lorenzDeciles: partial tie blocks clip exactly") {
    // 15 equal masses: decile boundaries fall INSIDE the tie block
    val cells = (1L to 15L).map(u => ("g", u, 2L))
    val out = Profiling.lorenzDeciles(cells.toDF("g", "u", "x"),
      Seq("g"), "x").orderBy("decile").collect()
    // k_d = floor(15d/10): 1,3,4,6,7,9,10,12,13,15 -> share = k_d/15
    val want = Seq(1, 3, 4, 6, 7, 9, 10, 12, 13, 15)
      .map(k => math.rint(k * 2.0 / 30.0 * 1e6) / 1e6)
    assert(out.map(_.getAs[Double]("mass_share")).toSeq == want)
  }

  // ---- columnEntropy ----------------------------------------------

  test("columnEntropy: constant column scores 0; uniform scores 1") {
    val rows = (1 to 32).map(i => ("same", (i % 4).toString))
    val out = Profiling.columnEntropy(rows.toDF("konst", "uniform"),
      Seq("konst", "uniform")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("konst").getAs[Long]("k_distinct") == 1)
    assert(out("konst").getAs[Double]("entropy") == 0.0)
    assert(out("konst").getAs[Double]("norm_entropy") == 0.0)
    assert(out("uniform").getAs[Double]("norm_entropy") == 1.0)
    // uniform over 4 values: H = ln 4 (micro-rounded)
    val h = out("uniform").getAs[Double]("entropy")
    assert(math.abs(h - math.log(4)) < 1e-5)
  }

  test("columnEntropy matches the micro-log reference on a skewed column") {
    val vals = Seq.fill(8)("a") ++ Seq.fill(2)("b") ++ Seq.fill(6)("c")
    val n = vals.size
    val tm = vals.groupBy(identity).values
      .map(g => math.rint(1e6 * g.size * math.log(g.size.toDouble / n))).sum
    val expected = math.rint(-tm / 1e6 / n * 1e6) / 1e6
    val out = Profiling.columnEntropy(vals.map(v => Tuple1(v)).toDF("c"),
      Seq("c")).collect().head
    assert(out.getAs[Double]("entropy") == expected)
  }

  // ---- fdMine -----------------------------------------------------

  test("fdMine: detects exact dependencies and scores violations") {
    // b = f(a) exactly; a does NOT determine c; c -> a holds
    val rows = Seq(
      (1L, "x", "p"), (1L, "x", "q"), (2L, "y", "p"), (2L, "y", "q"),
      (3L, "x", "r"))
    val out = Profiling.fdMine(rows.toDF("a", "b", "c"),
      Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    assert(out("a->b").getAs[Boolean]("holds")) // 1->x, 2->y, 3->x
    assert(!out("a->c").getAs[Boolean]("holds"))
    assert(out("a->c").getAs[Long]("n_violating") == 2) // a=1 and a=2
    // a->c confidence: groups a=1 keeps 1 of 2, a=2 keeps 1 of 2, a=3 1/1
    assert(out("a->c").getAs[Double]("confidence") == 0.6)
    assert(!out("b->a").getAs[Boolean]("holds")) // x -> {1, 3}
  }

  // ---- winsorizedMean ---------------------------------------------

  test("winsorizedMean clips tails to boundary order statistics") {
    // n=10, k=1: -50 clips to 1's neighbor... sorted: -50,1..8,100
    // lo = 2nd smallest = 1, hi = 9th = 8 -> mean of 1,1..8,8
    val xs = Seq(100L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, -50L)
    val out = Profiling.winsorizedMean(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.1).collect().head
    val sorted = xs.sorted
    val w = Seq(sorted(1)) ++ sorted.slice(1, 9) ++ Seq(sorted(8))
    assert(out.getAs[Long]("k_winsor") == 1)
    assert(out.getAs[Double]("winsorized_mean") ==
      math.rint(w.sum.toDouble / 10 * 1e6) / 1e6)
    // zero frac = plain mean
    val o2 = Profiling.winsorizedMean(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.0).collect().head
    assert(o2.getAs[Double]("winsorized_mean") ==
      math.rint(xs.sum.toDouble / 10 * 1e6) / 1e6)
  }

  test("winsorizedMean: tie blocks at the fence clip exactly") {
    // n=20, k=2: bottom five 1s -> two of them clip to lo=1 (no-op),
    // top value 100 x3 -> two clip to hi boundary
    val xs = Seq.fill(5)(1L) ++ (2L to 13L) ++ Seq.fill(3)(100L)
    val sorted = xs.sorted; val n = xs.size; val k = n / 10
    val w = Seq.fill(k)(sorted(k)) ++ sorted.slice(k, n - k) ++
      Seq.fill(k)(sorted(n - k - 1))
    val out = Profiling.winsorizedMean(xs.map(("g", _)).toDF("g", "x"),
      Seq("g"), col("x"), 0.1).collect().head
    assert(out.getAs[Double]("winsorized_mean") ==
      math.rint(w.sum.toDouble / n * 1e6) / 1e6)
  }

  // ---- chiSquareResiduals -----------------------------------------

  test("chiSquareResiduals: independence gives zero residuals; deviations sign correctly") {
    val indep = for (i <- 1 to 10; a <- Seq("x", "y"); b <- Seq("p", "q"))
      yield ("g", a, b)
    val z = Profiling.chiSquareResiduals(indep.toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect()
    assert(z.length == 4 && z.forall(_.getAs[Double]("residual") == 0.0))
    // (x,p) over-represented -> positive residual; (x,q) starved -> negative
    val skew = Seq.fill(18)(("g", "x", "p")) ++ Seq.fill(2)(("g", "x", "q")) ++
      Seq.fill(2)(("g", "y", "p")) ++ Seq.fill(18)(("g", "y", "q"))
    val out = Profiling.chiSquareResiduals(skew.toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r).toMap
    assert(out(("x", "p")).getAs[Double]("residual") > 0)
    assert(out(("x", "q")).getAs[Double]("residual") < 0)
    assert(out(("x", "p")).getAs[Boolean]("notable"))
    // hand value with n=40, cr=cc=20, o=18: r = (720-400)/sqrt(16000)
    val expect = math.rint((18.0 * 40 - 20 * 20) /
      math.sqrt(40.0 * 20 * 20) * 1e6) / 1e6
    assert(out(("x", "p")).getAs[Double]("residual") == expect)
  }

  test("chiSquareResiduals: absent cells still score (their expected mass)") {
    val rows = Seq.fill(6)(("g", "x", "p")) ++ Seq.fill(6)(("g", "y", "q"))
    val out = Profiling.chiSquareResiduals(rows.toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect()
    assert(out.length == 4) // full 2x2 grid despite 2 observed cells
    val absent = out.find(r => r.getString(1) == "x" && r.getString(2) == "q").get
    assert(absent.getAs[Long]("o") == 0 && absent.getAs[Double]("residual") < 0)
  }

  // ---- infoGain ---------------------------------------------------

  test("infoGain: a perfectly predictive feature recovers H(label); noise gains ~0") {
    val rows = (1 to 60).map { i =>
      val label = (i % 3).toString
      ("g" + label, label, (i % 2).toString) // feat1 = label alias, feat2 = coin
    }
    val out = Profiling.infoGain(rows.toDF("alias", "label", "coin"),
      "label", Seq("alias", "coin")).collect()
      .map(r => r.getString(0) -> r).toMap
    val h = out("alias").getAs[Double]("h_label")
    assert(math.abs(h - math.log(3)) < 1e-5)
    assert(out("alias").getAs[Double]("info_gain") == h) // h_cond = 0
    assert(math.abs(out("coin").getAs[Double]("info_gain")) < 1e-5)
  }

  // ---- leaveOneOutInfluence ---------------------------------------

  test("leaveOneOutInfluence: a heavy group moves the mean; a representative one does not") {
    val rows = Seq.fill(50)(("bulk", 100L)) ++ Seq.fill(5)(("spike", 1000L)) ++
      Seq.fill(45)(("match", 100L))
    val out = Profiling.leaveOneOutInfluence(rows.toDF("g", "v"),
      Seq("g"), col("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    // removing the spike drops the mean: influence positive and large
    assert(out("spike").getAs[Double]("influence") > 40)
    // removing a BELOW-average group raises the without-mean:
    // influence = 145 - 10000/55 = -36.818182
    assert(out("match").getAs[Double]("influence") ==
      math.rint((145.0 - 10000.0 / 55) * 1e6) / 1e6)
    // hand check: mean_all = (95*100 + 5*1000)/100 = 145
    assert(out("spike").getAs[Double]("mean_all") == 145.0)
    assert(out("spike").getAs[Double]("mean_without") == 100.0)
    assert(out("spike").getAs[Double]("influence") == 45.0)
  }

  // ---- concentrationProfile ---------------------------------------

  test("concentrationProfile: uniform masses hit the 1/n floor; a monopoly hits 1") {
    val even = (1L to 10L).map(u => ("g", u, 5L))
    val o1 = Profiling.concentrationProfile(even.toDF("g", "u", "x"),
      Seq("g"), "u", "x", topK = 4).collect().head
    assert(o1.getAs[Double]("hhi") == 0.1) // 1/n
    assert(o1.getAs[Double]("cr_k") == 0.4) // 4/10 of equal shares
    val mono = Seq(("g", 1L, 100L)) ++ (2L to 5L).map(u => ("g", u, 0L))
    val o2 = Profiling.concentrationProfile(mono.toDF("g", "u", "x"),
      Seq("g"), "u", "x", topK = 4).collect().head
    assert(o2.getAs[Double]("hhi") == 1.0) // zero-mass entities drop
    assert(o2.getAs[Double]("cr_k") == 1.0)
  }

  test("concentrationProfile matches the closed forms on a skewed fixture") {
    val xs = Seq(40L, 25L, 15L, 10L, 5L, 3L, 2L)
    val cells = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
    val out = Profiling.concentrationProfile(cells.toDF("g", "u", "x"),
      Seq("g"), "u", "x", topK = 4).collect().head
    val total = xs.sum.toDouble
    val hhi = xs.map(x => x.toDouble * x).sum / (total * total)
    val cr4 = xs.sorted.reverse.take(4).sum / total
    assert(out.getAs[Double]("hhi") == math.rint(hhi * 1e6) / 1e6)
    assert(out.getAs[Double]("cr_k") == math.rint(cr4 * 1e6) / 1e6)
    assert(out.getAs[Long]("total") == xs.sum)
  }

  test("hillTailIndex matches the hand-computed power sequence; " +
       "all-equal tails give NULL; short groups drop") {
    // 51 values 2^10..2^60 (k = 50): x_(k+1) = 2^10 and
    // ln(x_(i)/x_(51)) = i*ln2 for the i-th largest, i = 1..50
    val pow = (10 to 60).map(e => ("g", 1L << e))
    // filler below the top-51 must not move the statistic
    val filler = (1 to 30).map(_ => ("g", 3L))
    val out = Profiling.hillTailIndex((pow ++ filler).toDF("g", "v"),
      Seq("g"), col("v"), k = 50).collect().head
    assert(out.getAs[Long]("x_k1") == (1L << 10))
    assert(out.getAs[Long]("n_rows") == 81)
    val lsum = (1 to 50).map(i =>
      math.rint(math.log(math.pow(2.0, i)) * 1e6).toLong).sum
    val expected = math.rint(50.0 / (lsum / 1e6) * 1e6) / 1e6
    assert(out.getAs[Double]("hill_alpha") == expected)
    // degenerate: top-51 all equal -> every log term 0 -> NULL alpha
    val flat = (1 to 60).map(_ => ("f", 100L))
    val f = Profiling.hillTailIndex(flat.toDF("g", "v"), Seq("g"),
      col("v"), k = 50).collect().head
    assert(f.isNullAt(f.fieldIndex("hill_alpha")))
    // fewer than k+1 positive rows: the group drops entirely
    val short = (1 to 50).map(i => ("s", i.toLong))
    assert(Profiling.hillTailIndex(short.toDF("g", "v"), Seq("g"),
      col("v"), k = 50).collect().isEmpty)
  }
}
