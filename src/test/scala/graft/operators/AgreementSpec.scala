package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohensKappa matches the textbook 2x2 example") {
    // the classic table: both yes 20, A-yes/B-no 5, A-no/B-yes 10,
    // both no 15 -> po = 0.7, pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("g", "y", "y")) ++ Seq.fill(5)(("g", "y", "n")) ++
      Seq.fill(10)(("g", "n", "y")) ++ Seq.fill(15)(("g", "n", "n"))
    val out = Agreement.cohensKappa(rows.toDF("g", "a", "b"), Seq("g"),
      col("a"), col("b")).collect().head
    assert(out.getAs[Long]("n_rows") == 50)
    assert(out.getAs[Double]("po") == 0.7)
    assert(out.getAs[Double]("pe") == 0.5)
    assert(out.getAs[Double]("kappa") == 0.4)
    assert(!out.getAs[Boolean]("reliable"))   // 0.4 < the 0.6 floor
  }

  test("cohensKappa: perfect agreement gives kappa 1; independent raters ~0") {
    val perfect = (1 to 40).map(i => ("p", s"c${i % 3}", s"c${i % 3}"))
    // independence: a cycles mod 2, b cycles mod 2 with offset pattern
    // chosen so the joint counts factorize exactly (kappa = 0)
    val indep = (0 until 40).map(i =>
      ("i", s"c${i % 2}", s"c${(i / 2) % 2}"))
    val out = Agreement.cohensKappa((perfect ++ indep).toDF("g", "a", "b"),
        Seq("g"), col("a"), col("b"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("p").getAs[Double]("kappa") == 1.0)
    assert(out("p").getAs[Boolean]("reliable"))
    assert(out("i").getAs[Double]("kappa") == 0.0)
  }

  test("cohensKappa: a label one rater never uses still enters pe via the " +
       "full-outer marginals; degenerate groups yield NULL kappa") {
    // rater A uses {x, y}; rater B only ever says x
    val rows = Seq(("g", "x", "x"), ("g", "x", "x"), ("g", "y", "x"),
      ("g", "y", "x"))
    val out = Agreement.cohensKappa(rows.toDF("g", "a", "b"), Seq("g"),
      col("a"), col("b")).collect().head
    // po = 0.5; pe = P_A(x)P_B(x) + P_A(y)P_B(y) = 0.5*1 + 0.5*0 = 0.5
    assert(out.getAs[Double]("po") == 0.5)
    assert(out.getAs[Double]("pe") == 0.5)
    assert(out.getAs[Double]("kappa") == 0.0)
    // both raters constant and identical -> pe = 1 -> NULL kappa
    val deg = Seq(("d", "x", "x"), ("d", "x", "x")).toDF("g", "a", "b")
    val dout = Agreement.cohensKappa(deg, Seq("g"), col("a"), col("b"))
      .collect().head
    assert(dout.isNullAt(dout.fieldIndex("kappa")))
    assert(!dout.getAs[Boolean]("reliable"))
  }

  test("fleissKappa matches the hand-computed 3-item 2-rater table and " +
       "pins the single-category group to 1.0") {
    import org.apache.spark.sql.functions.col
    // items: (a,a), (a,b), (b,b) -> P_i = 1, 0, 1; Pbar = 2/3;
    // margins 3/3 -> pe = 0.5; kappa = (2/3 - 1/2)/(1/2) = 1/3
    val mixed = Seq(("m", 1, "a"), ("m", 1, "a"), ("m", 2, "a"),
      ("m", 2, "b"), ("m", 3, "b"), ("m", 3, "b"))
    // every rating one category -> pe = 1 -> kappa pinned 1.0
    val const = Seq(("c", 1, "x"), ("c", 1, "x"), ("c", 2, "x"), ("c", 2, "x"))
    val out = Agreement.fleissKappa((mixed ++ const).toDF("g", "item", "cat"),
        Seq("g"), "item", "cat")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("m").getAs[Long]("n_items") == 3L)
    assert(out("m").getAs[Long]("n_raters") == 2L)
    assert(out("m").getAs[Double]("kappa") == 0.333333)
    assert(out("c").getAs[Double]("kappa") == 1.0)
  }

  test("fleissKappa matches a direct recomputation on a varied fixture") {
    val ratings = for (i <- 0 until 30; r <- 0 until 3) yield
      ("g", i, s"c${(i * (r + 1) + r * 7) % 4}")
    val out = Agreement.fleissKappa(ratings.toDF("g", "item", "cat"),
      Seq("g"), "item", "cat").collect().head
    // direct Fleiss computation
    val byItem = ratings.groupBy(_._2).view.mapValues(
      _.groupBy(_._3).view.mapValues(_.size).toMap).toMap
    val nI = byItem.size; val nR = 3
    val pbar = byItem.values.map(m =>
      (m.values.map(c => c * c).sum - nR).toDouble / (nR * (nR - 1))).sum / nI
    val tot = ratings.groupBy(_._3).view.mapValues(_.size).toMap
    val pe = tot.values.map(v => math.pow(v.toDouble / (nI * nR), 2)).sum
    val expected = math.rint((pbar - pe) / (1 - pe) * 1e6) / 1e6
    assert(math.abs(out.getAs[Double]("kappa") - expected) < 2e-6)
  }

  test("cochranQ matches the hand-computed 3-rater table; unanimous " +
       "groups are NULL and never flag") {
    // 6 items, raters (r1, r2, r3):
    //   (1,1,0) x3, (1,0,0) x2, (0,1,1) x1
    // C = (5, 4, 1), T = 10, sumR2 = 3*4 + 2*1 + 1*4 = 18
    // Q = 2*(3*(25+16+1) - 100) / (3*10 - 18) = 2*26/12 = 4.333333
    val items = Seq.fill(3)(("g", true, true, false)) ++
      Seq.fill(2)(("g", true, false, false)) ++ Seq(("g", false, true, true))
    // unanimous group: every item rated identically by all raters
    val unan = Seq(("u", true, true, true), ("u", false, false, false))
    val out = Agreement.cochranQ((items ++ unan).toDF("g", "a", "b", "c"),
        Seq("g"), Seq(col("a"), col("b"), col("c")))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g").getAs[Long]("n_items") == 6)
    assert(out("g").getAs[Int]("k") == 3)
    assert(out("g").getAs[Double]("q") == 4.333333)
    assert(out("g").getAs[Double]("q_crit") == 5.991465)
    assert(!out("g").getAs[Boolean]("significant"))
    assert(out("u").isNullAt(out("u").fieldIndex("q")))
    assert(!out("u").getAs[Boolean]("significant"))
  }

  test("cochranQ: a rule that flags everything vs two that flag " +
       "nothing is maximally significant; NULL raters drop the row") {
    val items: Seq[(String, Boolean, Option[Boolean], Boolean)] =
      (1 to 20).map(_ => ("g", true, Some(false), false))
    val withNull = items :+ (("g", true, Option.empty[Boolean], false))
    val df = withNull.toDF("g", "a", "b", "c")
    val out = Agreement.cochranQ(df, Seq("g"),
      Seq(col("a"), col("b"), col("c"))).collect().head
    assert(out.getAs[Long]("n_items") == 20) // the NULL-rated row dropped
    // Q = 2*(3*400 - 400)/(3*20 - 20) = 1600/40 = 40 >> crit
    assert(out.getAs[Double]("q") == 40.0)
    assert(out.getAs[Boolean]("significant"))
    intercept[IllegalArgumentException](
      Agreement.cochranQ(df, Seq("g"), Seq(col("a"))))
  }

  test("krippendorffAlpha matches the canonical two-observer example " +
       "and its structural edges") {
    // Krippendorff's tutorial data: A rates units 1-9, B rates 1-10;
    // one disagreement (unit 6: 1 vs 2), unit 10 has a single rating
    // (B only) and must DROP. By the coincidence form:
    // Do*n = 2, De*n(n-1) = 18^2 - (25+49+16+4) = 230,
    // alpha = 1 - 17*2/230 = 0.852174
    val a = Seq(1, 2, 3, 3, 2, 1, 4, 1, 2).zipWithIndex
      .map { case (v, u) => ("g", u.toLong, v.toString) }
    val b = Seq(1, 2, 3, 3, 2, 2, 4, 1, 2, 5).zipWithIndex
      .map { case (v, u) => ("g", u.toLong, v.toString) }
    val out = Agreement.krippendorffAlpha((a ++ b).toDF("g", "u", "k"),
      Seq("g"), "u", "k").collect().head
    assert(out.getAs[Long]("n_units") == 9)   // unit 10 dropped
    assert(out.getAs[Long]("n_ratings") == 18)
    assert(out.getAs[Long]("n_categories") == 4)
    assert(out.getAs[Double]("alpha") == 0.852174)
    // perfect agreement -> alpha exactly 1
    val perfect = (1 to 8).flatMap(u =>
      Seq(("p", u.toLong, s"c${u % 3}"), ("p", u.toLong, s"c${u % 3}")))
    val p = Agreement.krippendorffAlpha(perfect.toDF("g", "u", "k"),
      Seq("g"), "u", "k").collect().head
    assert(p.getAs[Double]("alpha") == 1.0)
    // one-category group: De = 0 -> NULL alpha
    val const = (1 to 5).flatMap(u =>
      Seq(("c", u.toLong, "same"), ("c", u.toLong, "same")))
    val c = Agreement.krippendorffAlpha(const.toDF("g", "u", "k"),
      Seq("g"), "u", "k").collect().head
    assert(c.isNullAt(c.fieldIndex("alpha")))
  }
}
