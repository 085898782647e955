package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight draws a unit-mean Poisson: mean ~ 1, P(0) ~ 1/e") {
    val draws = spark.range(10000).toDF("id")
      .withColumn("b", lit(0))
      .select(Bootstrap.poissonWeight(col("id"), col("b"), "s").as("w"))
      .as[Long].collect()
    val mean = draws.sum.toDouble / draws.length
    assert(math.abs(mean - 1.0) < 0.05, s"mean $mean")
    val p0 = draws.count(_ == 0).toDouble / draws.length
    assert(math.abs(p0 - math.exp(-1)) < 0.03, s"P(0) $p0")
    assert(draws.forall(w => w >= 0 && w <= 9))
  }

  test("meanCI: bounds straddle the point mean and shrink with n") {
    // group "big" has 4x the rows of "small" from the same value
    // stream -> its CI should be about half as wide (1/sqrt(n))
    val rows = (0 until 2000).map(i => ("big", i.toLong, (i % 100).toLong)) ++
      (0 until 500).map(i => ("small", 10000L + i, (i % 100).toLong))
    val out = Bootstrap.meanCI(rows.toDF("g", "id", "v"), Seq("g"), "id", "v",
        reps = 100, conf = 0.95, salt = "t")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    Seq("big", "small").foreach { s =>
      val r = out(s)
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean"), s)
      assert(r.getAs[Double]("mean") <= r.getAs[Double]("ci_hi"), s)
      assert(r.getAs[Long]("n_reps") == 100, s)
    }
    val wBig = out("big").getAs[Double]("ci_hi") -
      out("big").getAs[Double]("ci_lo")
    val wSmall = out("small").getAs[Double]("ci_hi") -
      out("small").getAs[Double]("ci_lo")
    val ratio = wSmall / wBig
    assert(ratio > 1.3 && ratio < 3.2,
      s"width ratio $ratio, expected ~2 (1/sqrt(4x))")
  }

  test("meanCI: constant column gives a degenerate CI at the constant") {
    val df = (0 until 50).map(i => ("g", i.toLong, 7L)).toDF("g", "id", "v")
    val r = Bootstrap.meanCI(df, Seq("g"), "id", "v", reps = 50).collect().head
    assert(r.getAs[Double]("mean") == 7.0)
    assert(r.getAs[Double]("ci_lo") == 7.0 && r.getAs[Double]("ci_hi") == 7.0)
  }

  test("diffCI: a planted +50 shift is significant; a null split is not") {
    val base = (0 until 400).map(i => (i % 100).toLong)
    val shifted = base.map(_ + 50)
    val rows =
      base.zipWithIndex.map { case (v, i) => ("effect", i.toLong, true, v) } ++
      shifted.zipWithIndex.map { case (v, i) =>
        ("effect", 1000L + i, false, v) } ++
      base.zipWithIndex.map { case (v, i) => ("null", 2000L + i, true, v) } ++
      base.zipWithIndex.map { case (v, i) => ("null", 3000L + i, false, v) }
    val out = Bootstrap.diffCI(rows.toDF("g", "id", "sa", "v"), Seq("g"),
        col("sa"), "id", "v", reps = 100, conf = 0.95, salt = "t")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val eff = out("effect")
    assert(eff.getAs[Double]("diff") == -50.0)
    assert(eff.getAs[Boolean]("significant"))
    assert(eff.getAs[Double]("ci_hi") < 0)
    val nul = out("null")
    assert(nul.getAs[Double]("diff") == 0.0)
    assert(!nul.getAs[Boolean]("significant"))
    assert(nul.getAs[Double]("ci_lo") <= 0 && nul.getAs[Double]("ci_hi") >= 0)
  }

  test("diffCI drops groups with an empty side") {
    val df = Seq(("g", 1L, true, 5L), ("g", 2L, true, 6L)).toDF("g", "id", "sa", "v")
    assert(Bootstrap.diffCI(df, Seq("g"), col("sa"), "id", "v", reps = 10)
      .count() == 0)
  }

  test("meanCI rejects non-integral value columns") {
    val df = Seq(("g", 1L, 1.5)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException](
      Bootstrap.meanCI(df, Seq("g"), "id", "v"))
    assert(e.getMessage.contains("integral"))
  }
}
