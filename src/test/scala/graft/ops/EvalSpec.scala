package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- aucRank ----------------------------------------------------

  test("aucRank: perfect separation gives AUC 1, inverted gives 0") {
    val rows = (1 to 20).map(i => ("g", i > 10, i.toDouble))
    val up = Eval.aucRank(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(up.getAs[Double]("auc") == 1.0)
    assert(up.getAs[Long]("n_pos") == 10 && up.getAs[Long]("n_neg") == 10)
    val down = Eval.aucRank(rows.toDF("g", "y", "s"), Seq("g"),
      !col("y"), "s").collect().head
    assert(down.getAs[Double]("auc") == 0.0)
  }

  test("aucRank: all-tied scores give exactly 0.5 via midranks") {
    val rows = (1 to 30).map(i => ("g", i % 3 == 0, 42.0))
    val out = Eval.aucRank(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(out.getAs[Double]("auc") == 0.5)
  }

  test("aucRank matches the brute-force pair count with ties") {
    val pos = Seq(1.0, 3.0, 3.0, 7.0, 9.0)
    val neg = Seq(1.0, 2.0, 3.0, 5.0, 5.0, 8.0)
    val df = (pos.map(("g", true, _)) ++ neg.map(("g", false, _)))
      .toDF("g", "y", "s")
    // AUC = P(pos > neg) + 0.5 P(pos == neg), counted over all pairs
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expect = math.rint(wins / (pos.size * neg.size) * 1e6) / 1e6
    val got = Eval.aucRank(df, Seq("g"), col("y"), "s")
      .collect().head.getAs[Double]("auc")
    assert(got == expect)
  }

  test("aucRank: empty-side groups drop") {
    val rows = Seq(("a", true, 1.0), ("a", false, 2.0), ("b", true, 1.0))
    val out = Eval.aucRank(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
  }

  // ---- calibrationReport -------------------------------------------

  test("calibrationReport: a perfectly calibrated bin has gap 0") {
    // bin [0.2, 0.3): all p = 0.25, exactly 1 in 4 positive
    val rows = (1 to 40).map(i => ("g", i % 4 == 0, 0.25))
    val out = Eval.calibrationReport(rows.toDF("g", "y", "p"), Seq("g"),
      "p", col("y"), 10).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("bin") == 2)
    assert(r.getAs[Double]("acc") == 0.25)
    assert(r.getAs[Double]("conf") == 0.25)
    assert(r.getAs[Double]("gap") == 0.0)
    assert(r.getAs[Double]("ece") == 0.0)
  }

  test("calibrationReport: ece is the bin-weighted gap sum; p=1 lands in the last bin") {
    val rows =
      (1 to 30).map(_ => ("g", false, 0.05)) ++ // bin 0: acc 0, conf .05
      (1 to 10).map(_ => ("g", true, 1.0))      // bin 9 (capped): acc 1, conf 1
    val out = Eval.calibrationReport(rows.toDF("g", "y", "p"), Seq("g"),
      "p", col("y"), 10).collect().sortBy(_.getAs[Long]("bin"))
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 9L))
    assert(out(0).getAs[Double]("gap") == 0.05)
    assert(out(1).getAs[Double]("gap") == 0.0)
    // ece = (30*0.05 + 10*0) / 40
    assert(out.forall(_.getAs[Double]("ece") == 0.0375))
  }

  // ---- kaplanMeier -------------------------------------------------

  test("kaplanMeier: no censoring reproduces the empirical survival") {
    // 4 subjects dying at 1, 2, 2, 4: S = 3/4, 1/4, then 0 at d=4
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 1L),
      ("g", 4L, 1L))
    val out = Eval.kaplanMeier(rows.toDF("g", "dur", "died"), Seq("g"),
      "dur", "died").collect().sortBy(_.getAs[Long]("d"))
    assert(out.map(_.getAs[Long]("d")).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[Double]("survival")).toSeq ==
      Seq(0.75, 0.25, 0.0))
    assert(out.map(_.getAs[Long]("at_risk")).toSeq == Seq(4L, 3L, 1L))
  }

  test("kaplanMeier: censored subjects leave the risk set without a death") {
    // deaths at 1 and 3; a censored subject at 2 shrinks the risk set:
    // S(1) = 3/4; at d=3 at_risk = 2 (censored one gone) -> S = 3/8
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 0L), ("g", 3L, 1L),
      ("g", 5L, 0L))
    val out = Eval.kaplanMeier(rows.toDF("g", "dur", "died"), Seq("g"),
      "dur", "died").collect().sortBy(_.getAs[Long]("d"))
    assert(out.map(_.getAs[Long]("d")).toSeq == Seq(1L, 3L))
    assert(out.map(_.getAs[Long]("at_risk")).toSeq == Seq(4L, 2L))
    assert(out.map(_.getAs[Double]("survival")).toSeq == Seq(0.75, 0.375))
  }

  test("kaplanMeier: a death-free group emits nothing") {
    val rows = Seq(("g", 1L, 0L), ("g", 2L, 0L))
    assert(Eval.kaplanMeier(rows.toDF("g", "dur", "died"), Seq("g"),
      "dur", "died").count() == 0)
  }

  // ---- averagePrecision -------------------------------------------

  test("averagePrecision: perfect ranking gives AP 1, no positives drops") {
    val rows = (1 to 20).map(i => ("g", i > 15, i.toDouble))
    val out = Eval.averagePrecision(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(out.getAs[Double]("ap") == 1.0)
    assert(out.getAs[Long]("n_pos") == 5L)
    assert(Eval.averagePrecision(rows.toDF("g", "y", "s"), Seq("g"),
      lit(false), "s").count() == 0)
  }

  test("averagePrecision matches the tie-blocked brute force") {
    val data = Seq((true, 9.0), (false, 9.0), (true, 7.0), (true, 5.0),
      (false, 5.0), (false, 5.0), (true, 2.0), (false, 1.0))
    val got = Eval.averagePrecision(data.map { case (y, s) => ("g", y, s) }
      .toDF("g", "y", "s"), Seq("g"), col("y"), "s")
      .collect().head.getAs[Double]("ap")
    // blocks by distinct score DESC; every tied row sees end-of-block
    // precision: AP = sum_b (cp_b / n_pos) * (P_b / T_b)
    val nPos = data.count(_._1)
    var (p, t, ap) = (0, 0, 0.0)
    for ((s, rows) <- data.groupBy(_._2).toSeq.sortBy(-_._1)) {
      val cp = rows.count(_._1)
      p += cp; t += rows.size
      ap += cp.toDouble / nPos * (p.toDouble / t)
    }
    assert(got == math.rint(ap * 1e6) / 1e6)
  }

  test("mannWhitney matches the brute-force U and the tie-corrected z") {
    val pos = Seq(1.0, 3.0, 3.0, 7.0, 9.0)
    val neg = Seq(1.0, 2.0, 3.0, 5.0, 5.0, 8.0)
    val df = (pos.map(("g", true, _)) ++ neg.map(("g", false, _)))
      .toDF("g", "y", "s")
    val out = Eval.mannWhitney(df, Seq("g"), col("y"), "s").collect().head
    val u = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    assert(out.getAs[Double]("u") == u)
    val all = pos ++ neg
    val (n1, n2, n) = (pos.size, neg.size, all.size)
    val ties = all.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val sigma = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((n + 1) - ties.toDouble / (n.toDouble * (n - 1))))
    val z = (2 * u - n1.toDouble * n2) / (2.0 * sigma)
    assert(math.abs(out.getAs[Double]("z") - z) < 1e-6)
  }

  test("mannWhitney: balanced identical sides give z 0") {
    val rows = Seq(1.0, 2.0, 3.0).flatMap(v =>
      Seq(("g", true, v), ("g", false, v)))
    val out = Eval.mannWhitney(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(out.getAs[Double]("z") == 0.0)
    assert(out.getAs[Double]("u") == 4.5) // 3*3/2 midrank wins
  }

  test("cliffsDelta matches the brute-force pair count; ties count " +
       "neither side; labels follow the Romano thresholds") {
    val pos = Seq(3.0, 4.0, 5.0)
    val neg = Seq(1.0, 2.0, 3.0)
    val df = (pos.map(("g", true, _)) ++ neg.map(("g", false, _)))
      .toDF("g", "y", "s")
    val out = Eval.cliffsDelta(df, Seq("g"), col("y"), "s").collect().head
    // gt = 8, lt = 0, tie (3,3) counts neither: delta = 8/9
    assert(out.getAs[Double]("delta") == 0.888889)
    assert(out.getAs[String]("magnitude") == "large")
    assert(out.getAs[Long]("n_pos") == 3 && out.getAs[Long]("n_neg") == 3)
    // identical sides: full overlap, delta 0, negligible
    val same = Seq(1.0, 2.0, 3.0).flatMap(v =>
      Seq(("g", true, v), ("g", false, v)))
    val z = Eval.cliffsDelta(same.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(z.getAs[Double]("delta") == 0.0)
    assert(z.getAs[String]("magnitude") == "negligible")
    // inverted separation: delta -1, large; empty-side group drops
    val inv = (Seq(1.0, 2.0).map(("i", true, _)) ++
      Seq(3.0, 4.0).map(("i", false, _))) :+ ("e", true, 5.0)
    val outs = Eval.cliffsDelta(inv.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(outs("i").getAs[Double]("delta") == -1.0)
    assert(outs("i").getAs[String]("magnitude") == "large")
    assert(!outs.contains("e"))
  }

  test("medianOfMeans: constant data reproduces the constant; one " +
       "extreme outlier moves the mean but barely moves MoM; the " +
       "collect stays bucket-bounded") {
    // constant column: every shard mean is exactly 7.00
    val const = (1 to 200).map(i => ("g", i.toLong, 700L))
    val c = Eval.medianOfMeans(const.toDF("g", "id", "cents"), Seq("g"),
      col("cents"), "id", buckets = 16, scale = 100.0).collect().head
    assert(c.getAs[Double]("mom") == 7.0 && c.getAs[Double]("mean") == 7.0)
    assert(c.getAs[Long]("k_buckets") <= 16)
    assert(c.getAs[Long]("n_rows") == 200)
    // one 1e9-cent outlier: the mean explodes, MoM stays near 7 —
    // the outlier corrupts exactly ONE shard's mean, and the median
    // of 16 means ignores one corrupted shard
    val dirty = const :+ (("g", 9999L, 1000000000L))
    val d = Eval.medianOfMeans(dirty.toDF("g", "id", "cents"), Seq("g"),
      col("cents"), "id", buckets = 16, scale = 100.0).collect().head
    assert(d.getAs[Double]("mean") > 1000.0)
    assert(math.abs(d.getAs[Double]("mom") - 7.0) < 0.01,
      d.getAs[Double]("mom"))
    intercept[IllegalArgumentException](
      Eval.medianOfMeans(const.toDF("g", "id", "cents"), Seq("g"),
        col("cents"), "id", buckets = 1))
  }

  test("rollingMedianOfMeans: windows merge per-day shard sums; a " +
       "window covering everything equals the plain MoM") {
    val day1 = (1 to 100).map(i =>
      ("2024-01-01 10:00:00", i.toLong, 100L))
    val day2 = (1 to 100).map(i =>
      ("2024-01-02 10:00:00", (1000 + i).toLong, 300L))
    val df = (day1 ++ day2).toDF("ts", "id", "cents")
      .select(col("ts").cast("timestamp").as("ts"), col("id"),
        col("cents"))
    // w = 1: each day stands alone — constant shard means
    val w1 = Eval.rollingMedianOfMeans(df, "ts", col("cents"), "id",
      windowDays = 1, buckets = 8, scale = 100.0)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(w1("2024-01-01").getAs[Double]("mom") == 1.0)
    assert(w1("2024-01-02").getAs[Double]("mom") == 3.0)
    assert(w1("2024-01-02").getAs[Long]("n_rows") == 100)
    // w = 2: day 2's window merges both days' shard sums — its MoM
    // equals the PLAIN MoM over all 200 rows (same shard coins)
    val w2 = Eval.rollingMedianOfMeans(df, "ts", col("cents"), "id",
      windowDays = 2, buckets = 8, scale = 100.0)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    val plain = Eval.medianOfMeans(df.withColumn("g", lit("all")),
        Seq("g"), col("cents"), "id", buckets = 8, scale = 100.0)
      .collect().head
    assert(w2("2024-01-02").getAs[Double]("mom") ==
      plain.getAs[Double]("mom"))
    assert(w2("2024-01-02").getAs[Long]("n_rows") == 200)
    assert(w2("2024-01-01").getAs[Double]("mom") == 1.0) // no prior day
  }

  test("conformalThreshold: picks the ceil((n+1)(1-alpha))-th smallest calibration score and measures test coverage") {
    // calibration scores 1..9 (n=9): rank = ceil(10 * 0.8) = 8 -> thr 8
    val cal = (1 to 9).map(i => ("g", true, i.toDouble))
    val test = (1 to 10).map(i => ("g", false, i.toDouble)) // 8 of 10 <= 8
    val out = Eval.conformalThreshold((cal ++ test).toDF("g", "cal", "s"),
        Seq("g"), "s", col("cal"), alpha = 0.2, coveredAt = 0.75)
      .collect().head
    assert(out.getAs[Long]("n_cal") == 9L)
    assert(out.getAs[Double]("threshold") == 8.0)
    assert(out.getAs[Long]("n_test") == 10L)
    assert(out.getAs[Double]("coverage") == 0.8)
    assert(out.getAs[Boolean]("covered"))
  }

  test("conformalThreshold: tied calibration scores collapse into one block; rank lands inside the tie") {
    // cal: 1, 5, 5, 5 (n=4): rank = ceil(5 * 0.5) = 3 -> cum hits 4 at
    // score 5 -> thr 5
    val cal = Seq(1.0, 5.0, 5.0, 5.0).map(("g", true, _))
    val test = Seq(4.0, 5.0, 6.0).map(("g", false, _))
    val out = Eval.conformalThreshold((cal ++ test).toDF("g", "cal", "s"),
        Seq("g"), "s", col("cal"), alpha = 0.5, coveredAt = 0.9)
      .collect().head
    assert(out.getAs[Double]("threshold") == 5.0)
    assert(out.getAs[Double]("coverage") == 0.666667)
    assert(!out.getAs[Boolean]("covered"))
  }

  test("conformalThreshold: groups missing a side drop") {
    val rows = Seq(("calOnly", true, 1.0), ("testOnly", false, 1.0))
    assert(Eval.conformalThreshold(rows.toDF("g", "cal", "s"),
      Seq("g"), "s", col("cal"), 0.1, 0.9).count() == 0)
  }

  test("averagePrecision: positives ranked last score the random floor") {
    // 1 positive at the bottom of 10: only block 10 contributes
    // (1/1) * (1/10) = 0.1
    val rows = (1 to 10).map(i => ("g", i == 1, i.toDouble))
    val out = Eval.averagePrecision(rows.toDF("g", "y", "s"), Seq("g"),
      col("y"), "s").collect().head
    assert(out.getAs[Double]("ap") == 0.1)
  }

  test("kruskalWallis: hand-computed separated two-sample H = 3.857143 " +
       "crosses the df=1 critical value; fully-tied group yields NULL") {
    val sep = Seq(("s", "A", 1.0), ("s", "A", 2.0), ("s", "A", 3.0),
      ("s", "B", 4.0), ("s", "B", 5.0), ("s", "B", 6.0))
    val tied = Seq(("t", "A", 9.0), ("t", "A", 9.0),
      ("t", "B", 9.0), ("t", "B", 9.0))
    val out = Eval.kruskalWallis((sep ++ tied).toDF("g", "trt", "v"),
        Seq("g"), "trt", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // ranks A = 1,2,3 (R=6), B = 4,5,6 (R=15); H = 12/42*(12+75)-21
    assert(out("s").getAs[Long]("k") == 2L)
    assert(out("s").getAs[Long]("n") == 6L)
    assert(out("s").getAs[Double]("h") == 3.857143)
    assert(out("s").getAs[Double]("h_crit") == 3.841459)
    assert(out("s").getAs[Boolean]("significant"))
    assert(out("t").isNullAt(out("t").fieldIndex("h")))
    assert(!out("t").getAs[Boolean]("significant"))
  }

  test("kruskalWallis matches a direct midrank recomputation with ties") {
    val rows = for (i <- 0 until 90) yield
      ("g", s"t${i % 3}", ((i * 29 + 7) % 11).toDouble)
    val out = Eval.kruskalWallis(rows.toDF("g", "trt", "v"),
      Seq("g"), "trt", "v").collect().head
    val data = rows.map(r => (r._2, r._3))
    val cnt = data.groupBy(_._1).view.mapValues(_.size).toMap
    val vcnt = data.groupBy(_._2).view.mapValues(_.size).toMap
    val ranks = {
      var cum = 0.0
      vcnt.toSeq.sortBy(_._1).map { case (v, c) =>
        val r = cum + (c + 1) / 2.0; cum += c; v -> r
      }.toMap
    }
    val rsum = data.groupBy(_._1).view
      .mapValues(_.map(p => ranks(p._2)).sum).toMap
    val n = data.size
    val h = 12.0 / (n * (n + 1)) *
      rsum.map { case (t, r) => r * r / cnt(t) }.sum - 3 * (n + 1)
    val c = 1.0 - vcnt.values.map(t => t.toDouble * t * t - t).sum /
      (n.toDouble * n * n - n)
    assert(math.abs(out.getAs[Double]("h") - h / c) < 5e-5)
  }

  // ---- spearman ---------------------------------------------------

  test("spearman: perfect monotone gives 1, reversed gives -1") {
    val rows = (1 to 25).map(i => ("g", i.toLong, (i * i).toLong))
    val up = Eval.spearman(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    assert(up.getAs[Long]("n") == 25 && up.getAs[Double]("rho") == 1.0)
    val down = Eval.spearman(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), -col("y")).collect().head
    assert(down.getAs[Double]("rho") == -1.0)
  }

  test("spearman: constant margin yields NULL rho") {
    val rows = (1 to 10).map(i => ("g", i.toLong, 7L))
    val out = Eval.spearman(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    assert(out.isNullAt(out.fieldIndex("rho")))
  }

  test("spearman matches a direct midrank Pearson with ties") {
    val data = Seq((1L, 3L), (1L, 5L), (2L, 5L), (2L, 2L), (3L, 8L),
      (3L, 8L), (4L, 1L), (5L, 9L), (5L, 5L), (6L, 4L))
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val c = vs.groupBy(identity).view.mapValues(_.size).toMap
      var bef = 0
      c.keys.toSeq.sorted.map { v =>
        val r = v -> (bef + (c(v) + 1) / 2.0); bef += c(v); r
      }.toMap
    }
    val rx = midranks(data.map(_._1)); val ry = midranks(data.map(_._2))
    val a = data.map(d => rx(d._1)); val b = data.map(d => ry(d._2))
    val n = data.size
    val num = n * a.zip(b).map { case (x, y) => x * y }.sum - a.sum * b.sum
    val den = math.sqrt((n * a.map(x => x * x).sum - a.sum * a.sum) *
      (n * b.map(y => y * y).sum - b.sum * b.sum))
    val expected = math.rint(num / den * 1e6) / 1e6
    val out = Eval.spearman(data.map(d => ("g", d._1, d._2))
        .toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().head
    assert(out.getAs[Double]("rho") == expected)
  }

  // ---- isotonicCalibration ----------------------------------------

  test("isotonicCalibration: already-monotone bins pass through unchanged") {
    // bins 0/1/2 with accuracies 0.2 < 0.5 < 0.8 — no pooling
    val rows =
      (1 to 10).map(i => ("g", 0.05, i <= 2)) ++
      (1 to 10).map(i => ("g", 0.15, i <= 5)) ++
      (1 to 10).map(i => ("g", 0.25, i <= 8))
    val out = Eval.isotonicCalibration(rows.toDF("g", "p", "y"), Seq("g"),
        col("p"), col("y"), 10)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso")).toSeq == Seq(0.2, 0.5, 0.8))
    assert(out.map(_.getAs[Double]("acc")).toSeq == Seq(0.2, 0.5, 0.8))
  }

  test("isotonicCalibration pools violators to the weighted average (hand PAV)") {
    // accs 0.8, 0.2 with weights 10, 30 violate monotonicity →
    // both pool to (8+6)/40 = 0.35; the third bin (0.9) stands
    val rows =
      (1 to 10).map(i => ("g", 0.05, i <= 8)) ++
      (1 to 30).map(i => ("g", 0.15, i <= 6)) ++
      (1 to 10).map(i => ("g", 0.25, i <= 9))
    val out = Eval.isotonicCalibration(rows.toDF("g", "p", "y"), Seq("g"),
        col("p"), col("y"), 10)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso")).toSeq == Seq(0.35, 0.35, 0.9))
  }

  test("isotonicCalibration: fitted curve is nondecreasing within every group") {
    val rows = (1 to 400).map { i =>
      val p = (i % 97) / 97.0
      ("g" + (i % 3), p, (i * 7919) % 13 < 5 || p > 0.7)
    }
    val out = Eval.isotonicCalibration(rows.toDF("g", "p", "y"),
      Seq("g"), col("p"), col("y"), 10).orderBy("g", "bin").collect()
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val isos = rs.sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("iso"))
      assert(isos.zip(isos.tail).forall { case (x, y) => x <= y })
    }
  }

  // ---- kendallTauB ------------------------------------------------

  test("kendallTauB: perfect monotone gives 1, reversed gives -1, constant NULL") {
    val rows = (1 to 20).map(i => ("g", i.toLong, (i * 3).toLong))
    val up = Eval.kendallTauB(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    assert(up.getAs[Long]("n") == 20 && up.getAs[Double]("tau_b") == 1.0)
    val down = Eval.kendallTauB(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), -col("y")).collect().head
    assert(down.getAs[Double]("tau_b") == -1.0)
    val const = Eval.kendallTauB(rows.map(r => (r._1, r._2, 5L))
      .toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).collect().head
    assert(const.isNullAt(const.fieldIndex("tau_b")))
  }

  test("kendallTauB matches the brute-force pair count with ties") {
    val data = Seq((1L, 3L), (1L, 5L), (2L, 5L), (2L, 2L), (3L, 8L),
      (3L, 8L), (4L, 1L), (5L, 9L), (5L, 5L), (6L, 4L))
    var cc = 0L; var dd = 0L
    for (i <- data.indices; j <- (i + 1) until data.size) {
      val s = (data(i)._1 - data(j)._1) * (data(i)._2 - data(j)._2)
      if (s > 0) cc += 1 else if (s < 0) dd += 1
    }
    val n = data.size.toLong
    val n0 = n * (n - 1) / 2
    def ties(vs: Seq[Long]) = vs.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val t1 = ties(data.map(_._1)); val t2 = ties(data.map(_._2))
    val expected = math.rint((cc - dd).toDouble /
      math.sqrt((n0 - t1).toDouble * (n0 - t2).toDouble) * 1e6) / 1e6
    val out = Eval.kendallTauB(data.map(d => ("g", d._1, d._2))
      .toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).collect().head
    assert(out.getAs[Double]("tau_b") == expected)
  }

  // ---- balanceSmd -------------------------------------------------

  test("balanceSmd: identical sides give 0; known shift matches hand calc") {
    // both sides see the identical multiset {0..9} twice
    val same = (1 to 40).map(i => ("g", (i % 10).toLong, i <= 20))
    val z = Eval.balanceSmd(same.toDF("g", "x", "sa"), Seq("g"),
      col("x"), col("sa")).collect().head
    assert(z.getAs[Double]("smd") == 0.0)
    // side A = {1..10}, side B = {3..12}: dmean = -2, equal variances
    val xa = (1L to 10L); val xb = (3L to 12L)
    val rows = xa.map(x => ("g", x, true)) ++ xb.map(x => ("g", x, false))
    val ma = xa.sum.toDouble / 10; val mb = xb.sum.toDouble / 10
    val va = xa.map(x => (x - ma) * (x - ma)).sum / 9
    val vb = xb.map(x => (x - mb) * (x - mb)).sum / 9
    val expected = math.rint((ma - mb) / math.sqrt((va + vb) / 2) * 1e6) / 1e6
    val out = Eval.balanceSmd(rows.toDF("g", "x", "sa"), Seq("g"),
      col("x"), col("sa")).collect().head
    assert(out.getAs[Long]("n_a") == 10 && out.getAs[Long]("n_b") == 10)
    assert(out.getAs[Double]("smd") == expected)
  }

  test("balanceSmd: groups missing a side drop; constant sides give NULL") {
    val rows = (1 to 10).map(i => ("onlyA", i.toLong, true)) ++
      (1 to 10).map(i => ("both", 5L, i % 2 == 0))
    val out = Eval.balanceSmd(rows.toDF("g", "x", "sa"), Seq("g"),
      col("x"), col("sa")).collect()
    assert(out.map(_.getString(0)).toSet == Set("both"))
    assert(out.head.isNullAt(out.head.fieldIndex("smd")))
  }

  // ---- mcNemar ----------------------------------------------------

  test("mcNemar: hand-computed discordant cells and significance") {
    // 30 items: b = 12 (r1 only), c = 2 (r2 only) -> (10)^2/14 = 7.142857
    val rows = Seq.fill(10)(("g", true, true)) ++
      Seq.fill(12)(("g", true, false)) ++
      Seq.fill(2)(("g", false, true)) ++
      Seq.fill(6)(("g", false, false))
    val out = Eval.mcNemar(rows.toDF("g", "r1", "r2"), Seq("g"),
      col("r1"), col("r2")).collect().head
    assert(out.getAs[Long]("b") == 12 && out.getAs[Long]("c") == 2)
    assert(out.getAs[Double]("stat") == math.rint(100.0 / 14 * 1e6) / 1e6)
    assert(out.getAs[Boolean]("significant"))
    // balanced discordance: stat 0, not significant
    val bal = Seq.fill(5)(("g", true, false)) ++ Seq.fill(5)(("g", false, true))
    val o2 = Eval.mcNemar(bal.toDF("g", "r1", "r2"), Seq("g"),
      col("r1"), col("r2")).collect().head
    assert(o2.getAs[Double]("stat") == 0.0 && !o2.getAs[Boolean]("significant"))
  }

  test("mcNemar: all-concordant groups yield NULL stat") {
    val rows = Seq.fill(8)(("g", true, true)) ++ Seq.fill(4)(("g", false, false))
    val out = Eval.mcNemar(rows.toDF("g", "r1", "r2"), Seq("g"),
      col("r1"), col("r2")).collect().head
    assert(out.isNullAt(out.fieldIndex("stat")))
  }

  // ---- cuped ------------------------------------------------------

  test("cuped: perfectly predictive covariate removes all variance") {
    // y = 2x exactly: theta = 2, adjusted y constant -> var_reduction 1
    val units = (1 to 30).map(i => (i % 2 == 0, i.toLong, 2L * i))
    val out = Eval.cuped(units.toDF("arm", "x", "y"), col("arm"),
      col("x"), col("y")).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("theta") == 2.0)
      assert(r.getAs[Double]("var_reduction") == 1.0)
    }
  }

  test("cuped: independent covariate leaves means unchanged-ish and theta from moments") {
    val units = (1 to 40).map(i =>
      ("a", (i % 7).toLong, (100 + (i * 13) % 29).toLong))
    val n = units.size
    val xs = units.map(_._2); val ys = units.map(_._3)
    val th = (n.toLong * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum).toDouble /
      (n.toLong * xs.map(x => x * x).sum - xs.sum * xs.sum)
    val out = Eval.cuped(units.toDF("arm", "x", "y"), col("arm"),
      col("x"), col("y")).collect().head
    assert(out.getAs[Double]("theta") == math.rint(th * 1e6) / 1e6)
    assert(out.getAs[Long]("n_units") == 40)
    // mean of y is exact
    assert(out.getAs[Double]("mean_y") ==
      math.rint(ys.sum.toDouble / n * 1e6) / 1e6)
  }

  // ---- sequentialAbMonitor ----------------------------------------

  test("sequentialAbMonitor: a real effect drives p down and stops; p is monotone") {
    // arm A shifted by +50 every day, 40 units/day/arm, 10 days
    val rows = for {
      d <- 1L to 10L; u <- 1 to 40; a <- Seq(true, false)
    } yield (d, a, (100 + (u * 7) % 23 + (if (a) 50 else 0)).toLong)
    val out = Eval.sequentialAbMonitor(rows.toDF("d", "a", "v"),
      col("d"), col("a"), col("v"), alpha = 0.05)
      .orderBy("period").collect()
    val ps = out.map(_.getAs[Double]("p_always")).toSeq
    assert(ps.zip(ps.tail).forall { case (x, y) => y <= x }) // monotone
    assert(out.last.getAs[Boolean]("stopped")) // effect detected
    assert(out.last.getAs[Double]("delta") > 45 &&
      out.last.getAs[Double]("delta") < 55)
  }

  test("sequentialAbMonitor: identical arms never stop") {
    val rows = for {
      d <- 1L to 10L; u <- 1 to 30; a <- Seq(true, false)
    } yield (d, a, (100 + (u * 13) % 37).toLong)
    val out = Eval.sequentialAbMonitor(rows.toDF("d", "a", "v"),
      col("d"), col("a"), col("v")).collect()
    assert(out.forall(!_.getAs[Boolean]("stopped")))
    // identical arms: delta exactly 0, Lambda = sqrt(V/(V+s2)) < 1, p = 1
    assert(out.forall(_.getAs[Double]("p_always") == 1.0))
  }

  test("sequentialAbMonitor: periods missing an arm drop") {
    val rows = Seq((1L, true, 10L), (1L, true, 12L), (1L, false, 11L),
      (1L, false, 13L), (2L, true, 10L), (2L, true, 14L))
    val out = Eval.sequentialAbMonitor(rows.toDF("d", "a", "v"),
      col("d"), col("a"), col("v")).collect()
    assert(out.map(_.getAs[Long]("period")).toSeq == Seq(1L))
  }

  // ---- srmCheck ---------------------------------------------------

  test("srmCheck: balanced arms pass, a real imbalance flags") {
    val rows = (1 to 100).map(i => (1L, i % 2 == 0)) ++
      (1 to 100).map(i => (2L, i <= 80))
    val out = Eval.srmCheck(rows.toDF("d", "a"), col("d"), col("a"))
      .orderBy("period").collect()
    assert(out(0).getAs[Double]("chi2") == 0.0)
    assert(!out(0).getAs[Boolean]("mismatch"))
    // day 2: 80 vs 20 -> 3600/100 = 36
    assert(out(1).getAs[Double]("chi2") == 36.0)
    assert(out(1).getAs[Boolean]("mismatch"))
  }

  // ---- winRateMatrix ----------------------------------------------

  test("winRateMatrix matches the brute-force pairwise theta with ties") {
    val data = Map(
      "a" -> Seq(1L, 3L, 3L, 7L),
      "b" -> Seq(2L, 3L, 5L),
      "c" -> Seq(1L, 1L, 9L))
    val df = data.toSeq.flatMap { case (g, vs) => vs.map((g, _)) }
      .toDF("g", "v")
    val out = Eval.winRateMatrix(df, "g", col("v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("win_rate"))).toMap
    for (Seq(ga, gb) <- data.keys.toSeq.sorted.combinations(2)) {
      val wins = (for (x <- data(ga); y <- data(gb))
        yield if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
      val expect = math.rint(wins / (data(ga).size * data(gb).size) * 1e6) / 1e6
      val (na, nb, wr) = out((ga, gb))
      assert(na == data(ga).size && nb == data(gb).size)
      assert(wr == expect, s"pair ($ga, $gb)")
    }
  }

  test("winRateMatrix: identical distributions sit at 0.5") {
    val rows = Seq("a", "b").flatMap(g => (1L to 10L).map((g, _)))
    val out = Eval.winRateMatrix(rows.toDF("g", "v"), "g", col("v"))
      .collect().head
    assert(out.getAs[Double]("win_rate") == 0.5)
  }

  // ---- ratioMetricCI ----------------------------------------------

  test("ratioMetricCI: constant per-unit ratio gives a zero-width interval") {
    // y = 3x exactly for every unit -> R = 3, delta-method variance 0
    val units = (1 to 30).map(i => ("g", (i % 5 + 1).toLong, 3L * (i % 5 + 1)))
    val out = Eval.ratioMetricCI(units.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    assert(out.getAs[Double]("ratio") == 3.0)
    assert(out.getAs[Double]("ci_lo") == 3.0 && out.getAs[Double]("ci_hi") == 3.0)
  }

  test("ratioMetricCI matches the hand delta-method computation") {
    val units = Seq((2L, 10L), (4L, 13L), (1L, 2L), (3L, 11L), (5L, 12L))
    val n = units.size
    val sx = units.map(_._1).sum.toDouble; val sy = units.map(_._2).sum.toDouble
    val r = sy / sx; val xbar = sx / n
    def v(f: ((Long, Long)) => Double, m: Double) =
      units.map(u => (f(u) - m) * (f(u) - m)).sum / (n - 1)
    val vx = v(_._1.toDouble, xbar); val vy = v(_._2.toDouble, sy / n)
    val cxy = units.map { case (x, y) =>
      (x - xbar) * (y - sy / n) }.sum / (n - 1)
    val se = math.sqrt((vy - 2 * r * cxy + r * r * vx) / (xbar * xbar) / n)
    val z = 1.959963984540054
    val out = Eval.ratioMetricCI(units.map(u => ("g", u._1, u._2))
      .toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).collect().head
    assert(out.getAs[Double]("ratio") == math.rint(r * 1e6) / 1e6)
    assert(out.getAs[Double]("ci_lo") == math.rint((r - z * se) * 1e6) / 1e6)
    assert(out.getAs[Double]("ci_hi") == math.rint((r + z * se) * 1e6) / 1e6)
  }

  // ---- mdeTable ---------------------------------------------------

  test("mdeTable: MDE shrinks with sqrt(n) and matches the closed form") {
    val small = (1 to 20).map(i => ("g", ((i * 13) % 37).toLong))
    val big = (1 to 2000).map(i => ("g", ((i * 13) % 37).toLong))
    val o1 = Eval.mdeTable(small.toDF("g", "y"), Seq("g"), col("y"))
      .collect().head
    val o2 = Eval.mdeTable(big.toDF("g", "y"), Seq("g"), col("y"))
      .collect().head
    assert(o1.getAs[Double]("mde_abs") > o2.getAs[Double]("mde_abs"))
    // closed form on the small fixture
    val ys = small.map(_._2); val n = ys.size
    val mean = ys.sum.toDouble / n
    val sigma = math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / (n - 1))
    val mde = (1.959963984540054 + 0.8416212335729143) * sigma *
      math.sqrt(2.0 / (n / 2.0))
    assert(o1.getAs[Double]("mde_abs") == math.rint(mde * 1e6) / 1e6)
  }
}
