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
}
