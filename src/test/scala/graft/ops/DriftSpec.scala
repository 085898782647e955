package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("ksStatistic: identical samples give D = 0") {
    val rows = (1 to 50).flatMap(i =>
      Seq(("g", true, i.toDouble), ("g", false, i.toDouble)))
    val df = rows.toDF("g", "sa", "v")
    val out = Drift.ksStatistic(df, Seq("g"), col("sa"), "v").collect().head
    assert(out.getAs[Double]("ks_d") == 0.0)
    assert(!out.getAs[Boolean]("drifted"))
    assert(out.getAs[Long]("n_a") == 50 && out.getAs[Long]("n_b") == 50)
  }

  test("ksStatistic: disjoint supports give D = 1 and drifted") {
    val rows = (1 to 40).map(i => ("g", true, i.toDouble)) ++
      (1 to 40).map(i => ("g", false, 100.0 + i))
    val out = Drift.ksStatistic(rows.toDF("g", "sa", "v"), Seq("g"),
      col("sa"), "v").collect().head
    assert(out.getAs[Double]("ks_d") == 1.0)
    assert(out.getAs[Boolean]("drifted"))
  }

  test("ksStatistic matches a brute-force ECDF sup on a mixed sample") {
    val a = Seq(1.0, 1.0, 2.0, 3.5, 3.5, 7.0, 9.0)
    val b = Seq(1.0, 2.0, 2.0, 2.0, 6.0, 8.0, 8.0, 10.0)
    val df = (a.map(("g", true, _)) ++ b.map(("g", false, _)))
      .toDF("g", "sa", "v")
    val pts = (a ++ b).distinct
    val expect = pts.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.size -
        b.count(_ <= x).toDouble / b.size)
    }.max
    val got = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .collect().head.getAs[Double]("ks_d")
    assert(math.abs(got - BigDecimal(expect).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("ksStatistic: a group with an empty side is dropped") {
    val df = Seq(("g1", true, 1.0), ("g1", false, 2.0), ("g2", true, 1.0))
      .toDF("g", "sa", "v")
    val groups = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .select("g").as[String].collect().toSet
    assert(groups == Set("g1"))
  }

  test("psi: identical distributions give psi = 0 and stable") {
    val rows = (1 to 100).flatMap(i =>
      Seq(("g", true, i.toDouble), ("g", false, i.toDouble)))
    val out = Drift.psi(rows.toDF("g", "sa", "v"), Seq("g"), col("sa"), "v",
      Seq(25.0, 50.0, 75.0)).collect().head
    assert(out.getAs[Double]("psi") == 0.0)
    assert(out.getAs[Boolean]("stable"))
  }

  test("psi: a shifted distribution reads unstable, matches hand formula") {
    // A all below 10, B all above 90: bins (0, >=50) fully separate
    val rows = (1 to 20).map(i => ("g", true, 5.0)) ++
      (1 to 20).map(i => ("g", false, 95.0))
    val out = Drift.psi(rows.toDF("g", "sa", "v"), Seq("g"), col("sa"), "v",
      Seq(50.0)).collect().head
    // pa = (1, eps), pb = (eps, 1) -> psi = 2 * (1 - 1e-6) * ln(1/1e-6)
    val expect = 2.0 * (1.0 - 1e-6) * math.log(1.0 / 1e-6)
    assert(math.abs(out.getAs[Double]("psi") - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(!out.getAs[Boolean]("stable"))
  }

  test("madOutliers: hand-computed median/MAD/z on a small group") {
    // values 1..9 plus an outlier 100: med = 5.5, deviations
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5} -> mad = 2.5,
    // z(100) = 94.5/2.5 = 37.8, only 100 exceeds 3*mad = 7.5
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("g", "v")
    val out = Drift.madOutliers(df, Seq("g"), "v").collect().head
    assert(out.getAs[Long]("n") == 10)
    assert(out.getAs[Double]("med") == 5.5)
    assert(out.getAs[Double]("mad") == 2.5)
    assert(out.getAs[Long]("n_outliers") == 1)
    assert(out.getAs[Double]("max_z") == 37.8)
  }

  test("madOutliers: constant group -> mad 0, any deviation flags") {
    val df = (Seq.fill(5)(7.0) :+ 8.0).map(("g", _)).toDF("g", "v")
    val out = Drift.madOutliers(df, Seq("g"), "v").collect().head
    assert(out.getAs[Double]("mad") == 0.0)
    assert(out.getAs[Long]("n_outliers") == 1)
    assert(out.isNullAt(out.fieldIndex("max_z")))
  }

  test("rollingAnomalies: a planted spike flags, the window excludes itself") {
    // 10 flat days then a spike: trailing window stats come from the
    // flat days only, so the spike's z is huge; the spike day must not
    // dilute its own baseline
    val rows = (1 to 10).map(d => ("g", d, 100.0)) :+ (("g", 11, 500.0))
    val df = rows.toDF("g", "d", "v")
    val out = Drift.rollingAnomalies(df, Seq("g"), "d", "v", window = 7, k = 3.0)
      .orderBy("d").collect()
    // days 1..7 lack a full window: no verdict
    (0 until 7).foreach(i => assert(!out(i).getAs[Boolean]("anomaly")))
    (0 until 7).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("z"))))
    // flat days with full windows: std 0, value == mean -> calm
    assert(!out(8).getAs[Boolean]("anomaly"))
    // the spike: flagged (constant baseline, deviation > 0)
    assert(out(10).getAs[Boolean]("anomaly"))
  }

  test("rollingAnomalies: z matches hand arithmetic on a varying series") {
    val vals = Seq(10.0, 12.0, 8.0, 11.0, 9.0, 13.0, 7.0, 30.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i, v) }
      .toDF("g", "d", "v")
    val out = Drift.rollingAnomalies(df, Seq("g"), "d", "v", window = 7, k = 3.0)
      .orderBy("d").collect().last
    val w = vals.take(7)
    val m = w.sum / 7
    val sd = math.sqrt(w.map(x => x * x).sum / 7 - m * m)
    val z = (30.0 - m) / sd
    assert(math.abs(out.getAs[Double]("z") -
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out.getAs[Boolean]("anomaly") == (math.abs(z) > 3.0))
  }

  test("psi rejects unsorted or duplicate edges") {
    val df = Seq(("g", true, 1.0)).toDF("g", "sa", "v")
    intercept[IllegalArgumentException](
      Drift.psi(df, Seq("g"), col("sa"), "v", Seq(2.0, 1.0)))
    intercept[IllegalArgumentException](
      Drift.psi(df, Seq("g"), col("sa"), "v", Seq(1.0, 1.0)))
  }

  test("ksStatisticBinned: edges at every distinct value reproduce exact KS") {
    // bin boundaries = the full support -> the binned sup scans the
    // same evaluation points as the exact sup, so D must be identical
    val a = Seq(1.0, 1.0, 2.0, 3.5, 3.5, 7.0, 9.0)
    val b = Seq(1.0, 2.0, 2.0, 2.0, 6.0, 8.0, 8.0, 10.0)
    val df = (a.map(("g", true, _)) ++ b.map(("g", false, _)))
      .toDF("g", "sa", "v")
    val edges = (a ++ b).distinct.sorted
    val exact = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .collect().head
    val binned = Drift.ksStatisticBinned(df, Seq("g"), col("sa"), "v", edges)
      .collect().head
    assert(binned.getAs[Double]("ks_d") == exact.getAs[Double]("ks_d"))
    assert(binned.getAs[Long]("n_a") == exact.getAs[Long]("n_a"))
    assert(binned.getAs[Long]("n_b") == exact.getAs[Long]("n_b"))
    assert(binned.getAs[Boolean]("drifted") == exact.getAs[Boolean]("drifted"))
  }

  test("ksStatisticBinned: coarse bins bound D from below within bin mass") {
    // resolution contract: D_binned <= D_exact, and the gap is at most
    // the largest single-bin probability mass of either sample
    val rng = new scala.util.Random(7)
    val a = Seq.fill(200)(rng.nextDouble() * 100)
    val b = Seq.fill(300)(rng.nextDouble() * 100 + 15)   // shifted sample
    val df = (a.map(("g", true, _)) ++ b.map(("g", false, _)))
      .toDF("g", "sa", "v")
    val edges = Seq(20.0, 40.0, 60.0, 80.0, 100.0)
    val exact = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .collect().head.getAs[Double]("ks_d")
    val binned = Drift.ksStatisticBinned(df, Seq("g"), col("sa"), "v", edges)
      .collect().head.getAs[Double]("ks_d")
    assert(binned <= exact + 1e-9)
    def maxBinMass(s: Seq[Double]): Double = {
      val bins = s.groupBy(v => edges.count(v >= _)).values.map(_.size)
      bins.max.toDouble / s.size
    }
    val bound = math.max(maxBinMass(a), maxBinMass(b))
    assert(exact - binned <= bound + 1e-9,
      s"gap ${exact - binned} exceeds max bin mass $bound")
  }

  test("ksStatisticQuantileBinned: lower-bounds exact D within 1/nBins " +
       "and makes equal-mass reference bins") {
    val rng = new scala.util.Random(11)
    val a = Seq.fill(400)(rng.nextDouble() * 100)
    val b = Seq.fill(300)(rng.nextDouble() * 100 + 20)
    val df = (a.map(("g", true, _)) ++ b.map(("g", false, _)))
      .toDF("g", "sa", "v")
    val exact = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .collect().head.getAs[Double]("ks_d")
    val binned = Drift.ksStatisticQuantileBinned(df, Seq("g"), col("sa"),
      "v", nBins = 10).collect().head.getAs[Double]("ks_d")
    assert(binned <= exact + 1e-9)
    // decile edges on the reference side -> every reference bin holds
    // ~n/10 mass, so the resolution bound is ~1/10 (+ tie slack)
    assert(exact - binned <= 0.1 + 1e-6,
      s"gap ${exact - binned} exceeds the 1/nBins resolution bound")
  }

  test("ksStatisticQuantileBinned approx edges: lower-bounds exact D and " +
       "matches exact edges at high accuracy on small samples") {
    val rng = new scala.util.Random(13)
    val a = Seq.fill(300)(rng.nextDouble() * 100)
    val b = Seq.fill(250)(rng.nextDouble() * 100 + 10)
    val df = (a.map(("g", true, _)) ++ b.map(("g", false, _)))
      .toDF("g", "sa", "v")
    val full = Drift.ksStatistic(df, Seq("g"), col("sa"), "v")
      .collect().head.getAs[Double]("ks_d")
    val approx = Drift.ksStatisticQuantileBinned(df, Seq("g"), col("sa"),
      "v", nBins = 10, approx = true).collect().head.getAs[Double]("ks_d")
    assert(approx <= full + 1e-9)           // any-edge binned lower bound
    // GK at accuracy 10000 over 300 reference points is rank-exact, so
    // the sketch edges select the same evaluation points
    val exactE = Drift.ksStatisticQuantileBinned(df, Seq("g"), col("sa"),
      "v", nBins = 10).collect().head.getAs[Double]("ks_d")
    assert(math.abs(approx - exactE) <= 0.1 + 1e-9)
  }

  test("ksStatisticQuantileBinned: a group with no reference rows drops") {
    val df = (Seq(("g1", true, 1.0), ("g1", false, 2.0), ("g1", true, 3.0),
      ("g2", false, 1.0), ("g2", false, 2.0))).toDF("g", "sa", "v")
    val groups = Drift.ksStatisticQuantileBinned(df, Seq("g"), col("sa"),
      "v", nBins = 4).select("g").as[String].collect().toSet
    assert(groups == Set("g1"))
  }

  test("chiSquareDrift matches the 2x2 closed form and flags at the " +
       "3.841 critical value") {
    // A: 10 x / 20 y, B: 20 x / 10 y -> chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    // = 60*(10*10-20*20)^2/(30*30*30*30) = 20/3
    val rows = Seq.fill(10)(("g", true, "x")) ++ Seq.fill(20)(("g", true, "y")) ++
      Seq.fill(20)(("g", false, "x")) ++ Seq.fill(10)(("g", false, "y"))
    val out = Drift.chiSquareDrift(rows.toDF("g", "sa", "c"), Seq("g"),
      col("sa"), "c").collect().head
    assert(out.getAs[Long]("n_a") == 30 && out.getAs[Long]("n_b") == 30)
    assert(out.getAs[Long]("dof") == 1)
    assert(math.abs(out.getAs[Double]("chi2") - 20.0 / 3) < 1e-6)
    assert(out.getAs[Double]("chi2_crit") == 3.841459)
    assert(out.getAs[Boolean]("drifted"))
  }

  test("chiSquareDrift: identical mixes give chi2 = 0; degenerate groups drop") {
    val same = (1 to 30).flatMap(i =>
      Seq(("ok", true, s"c${i % 3}"), ("ok", false, s"c${i % 3}")))
    val oneSided = (1 to 5).map(i => ("empty_b", true, s"c$i"))
    val oneCat = Seq(("single", true, "only"), ("single", false, "only"))
    val out = Drift.chiSquareDrift(
      (same ++ oneSided ++ oneCat).toDF("g", "sa", "c"),
      Seq("g"), col("sa"), "c").collect()
    assert(out.map(_.getAs[String]("g")).toSet == Set("ok"))
    assert(out.head.getAs[Double]("chi2") == 0.0)
    assert(!out.head.getAs[Boolean]("drifted"))
  }

  test("chiSquareDrift: dof > 30 takes the Wilson-Hilferty critical value") {
    // 40 categories, perfectly balanced -> chi2 = 0, dof = 39;
    // chi2_0.95(39) = 54.572; WH is within ~0.1% there
    val rows = (0 until 40).flatMap(i =>
      Seq.fill(3)(("g", true, s"c$i")) ++ Seq.fill(3)(("g", false, s"c$i")))
    val out = Drift.chiSquareDrift(rows.toDF("g", "sa", "c"), Seq("g"),
      col("sa"), "c").collect().head
    assert(out.getAs[Long]("dof") == 39)
    assert(math.abs(out.getAs[Double]("chi2_crit") - 54.572) < 0.2)
    assert(out.getAs[Double]("chi2") == 0.0)
  }

  test("ksStatisticBinned: identical samples give D = 0; empty side drops") {
    val rows = (1 to 50).flatMap(i =>
      Seq(("g", true, i.toDouble), ("g", false, i.toDouble))) :+
      (("lone", true, 1.0))
    val out = Drift.ksStatisticBinned(rows.toDF("g", "sa", "v"), Seq("g"),
      col("sa"), "v", Seq(10.0, 20.0, 30.0, 40.0))
    val byG = out.collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(byG.keySet == Set("g"))         // lone group has no B side
    assert(byG("g").getAs[Double]("ks_d") == 0.0)
    assert(!byG("g").getAs[Boolean]("drifted"))
  }

  test("wasserstein1: identical samples give 0; a constant shift gives exactly the shift") {
    val same = (1 to 30).flatMap(i =>
      Seq(("g", true, i.toDouble), ("g", false, i.toDouble)))
    val out0 = Drift.wasserstein1(same.toDF("g", "sa", "v"), Seq("g"),
      col("sa"), "v").collect().head
    assert(out0.getAs[Double]("w1") == 0.0)
    // b = a + 2.5 -> W1 = 2.5 regardless of a's shape
    val a = Seq(1.0, 2.0, 2.0, 5.0, 9.0)
    val shifted = a.map(("g", true, _)) ++ a.map(v => ("g", false, v + 2.5))
    val out = Drift.wasserstein1(shifted.toDF("g", "sa", "v"), Seq("g"),
      col("sa"), "v").collect().head
    assert(out.getAs[Double]("w1") == 2.5)
    assert(out.getAs[Double]("v_range") == 10.5)  // 11.5 - 1.0
  }

  test("wasserstein1: hand example and one-sided/NULL handling") {
    // a={0,1}, b={1,2}: W1 = |.5-0|*1 + |1-.5|*1 = 1.0
    val rows = Seq(("g", true, Some(0.0)), ("g", true, Some(1.0)),
      ("g", false, Some(1.0)), ("g", false, Some(2.0)),
      ("g", true, Option.empty[Double]),      // NULL value ignored
      ("lone", true, Some(3.0)))              // no B side -> dropped
    val out = Drift.wasserstein1(rows.toDF("g", "sa", "v"), Seq("g"),
      col("sa"), "v").collect()
    assert(out.map(_.getAs[String]("g")).toSet == Set("g"))
    assert(out.head.getAs[Double]("w1") == 1.0)
    assert(out.head.getAs[Long]("n_a") == 2 && out.head.getAs[Long]("n_b") == 2)
  }

  test("ksPValue: D=0 gives p=1 (clamped), huge D*n gives p~0, matches the 3-term tail") {
    val df = Seq((0.0, 100L, 100L), (1.0, 100L, 100L), (0.1, 200L, 300L))
      .toDF("d", "na", "nb")
    val got = df.select(Drift.ksPValue(col("d"), col("na"), col("nb")))
      .collect().map(_.getDouble(0))
    assert(got(0) == 1.0)                    // 2*(1-1+1)=2 clamps to 1
    assert(got(1) < 1e-40)
    val ne = 200.0 * 300.0 / 500.0
    val l2 = 0.1 * 0.1 * ne
    val exp3 = 2.0 * (math.exp(-2 * l2) - math.exp(-8 * l2) + math.exp(-18 * l2))
    assert(math.abs(got(2) - exp3) < 1e-12)
  }

  test("bhCorrect: step-up flags a rank whose own p exceeds its cutoff when a later rank passes") {
    // m=4, alpha=0.05 -> cutoffs .0125 .025 .0375 .05; p=(.001,.02,.03,.9):
    // k=1 passes, k=2 (.02<=.025) passes, k=3 (.03<=.0375) passes, k=4 fails
    // -> kmax=3, so ranks 1..3 flag — including none above their own cutoff
    // here; now p2=.013 > .0125 but k=3 still passes -> rank 2 flags anyway.
    val tests = Seq(("a", 0.001), ("b", 0.013), ("c", 0.03), ("d", 0.9))
      .toDF("g", "p")
    val out = Drift.bhCorrect(tests, "p", 0.05, Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("p_rank"), r.getAs[Boolean]("fdr_flag"))).toMap
    assert(out("a") == (1L, true))
    assert(out("b") == (2L, true))   // own cutoff .025 — passes; but see "c"
    assert(out("c") == (3L, true))
    assert(out("d") == (4L, false))
    // the step-up case proper: p2 fails ITS cutoff but rank 3 passes
    val out2 = Drift.bhCorrect(
        Seq(("a", 0.001), ("b", 0.026), ("c", 0.03), ("d", 0.9)).toDF("g", "p"),
        "p", 0.05, Seq("g"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Boolean]("fdr_flag")).toMap
    assert(out2 == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false))
    // and when nothing passes, nothing flags
    val none = Drift.bhCorrect(
        Seq(("a", 0.5), ("b", 0.9)).toDF("g", "p"), "p", 0.05, Seq("g"))
      .collect().map(_.getAs[Boolean]("fdr_flag"))
    assert(none.forall(!_))
  }
}
