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
}
