package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic anisotropic cloud: strong dim-0 variance, weaker
    * correlated dim-1, tiny dim-2..3 — known principal structure. */
  private def cloud = (0 until 400).map { i =>
    val a = math.sin(i * 0.7) * 10.0
    val b = a * 0.5 + math.cos(i * 1.3) * 2.0
    (i.toLong, Array(a.toFloat, b.toFloat,
      (math.sin(i * 2.9) * 0.3).toFloat, (math.cos(i * 3.7) * 0.2).toFloat))
  }.toDF("id", "vec")

  test("fitCovariance matches a direct two-pass computation") {
    val (n, mean, cov) = Pca.fitCovariance(cloud, "vec", 4)
    assert(n == 400)
    val rows = cloud.select("vec").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val m2 = Array.tabulate(4)(j => rows.map(_(j)).sum / rows.length)
    (0 until 4).foreach(j => assert(math.abs(mean(j) - m2(j)) < 1e-9))
    val c01 = rows.map(r => (r(0) - m2(0)) * (r(1) - m2(1))).sum / rows.length
    assert(math.abs(cov(0)(1) - c01) < 1e-9)
  }

  test("fit: eigvals descending, eigvecs orthonormal, Cv = λv") {
    val model = Pca.fit(cloud, "vec", d = 4, k = 3)
    assert(model.eigVals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.eigVals.forall(_ > 0))
    val (_, _, cov) = Pca.fitCovariance(cloud, "vec", 4)
    for (e <- 0 until 3) {
      val v = model.eigVecs(e)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9)
      val cv = Array.tabulate(4)(i => (0 until 4).map(j => cov(i)(j) * v(j)).sum)
      val resid = cv.zip(v.map(_ * model.eigVals(e)))
        .map { case (a, b) => math.abs(a - b) }.max
      assert(resid < 1e-6, s"eig $e residual $resid")
      for (p <- 0 until e)
        assert(math.abs(v.zip(model.eigVecs(p)).map { case (a, b) => a * b }.sum) < 1e-9)
    }
  }

  test("whiten: projected corpus has identity covariance on the kept dims") {
    val model = Pca.fit(cloud, "vec", d = 4, k = 2)
    val proj = Pca.whiten(cloud, "vec", model)
      .select("whitened").collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length
    val mean = Array.tabulate(2)(j => proj.map(_(j)).sum / n)
    for (i <- 0 until 2; j <- 0 until 2) {
      val c = proj.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      if (i == j) assert(math.abs(c - 1.0) < 1e-6)
      else assert(math.abs(c) < 1e-6)
    }
  }

  test("dimStats: exact stats on a hand-built frame") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)))
      .toDF("id", "vec")
    val rows = Pca.dimStats(df, "vec").orderBy("dim").collect()
    assert(rows(0).getAs[Double]("mean") == 2.0)
    assert(rows(0).getAs[Double]("std") == 1.0)
    assert(rows(0).getAs[Double]("frac_zero") == 0.0)
    assert(rows(1).getAs[Double]("mean") == 0.0)
    assert(rows(1).getAs[Double]("frac_zero") == 1.0)
  }

  test("CovMoments skips null and wrong-length rows") {
    val df = Seq(Some(Array(1.0f, 2.0f)), None, Some(Array(1.0f)),
      Some(Array(3.0f, 4.0f))).toDF("vec")
    val flat = df.agg(graft.functions.CovFunctions.cov_moments(col("vec"), 2))
      .head().getSeq[Double](0)
    assert(flat(0) == 2.0) // only the two well-formed rows counted
    assert(flat(1) == 4.0 && flat(2) == 6.0)
  }

  test("removeTop: residuals orthogonal to removed directions, " +
    "dominant variance gone") {
    val model = Pca.fit(cloud, "vec", d = 4, k = 1)
    val resid = Pca.removeTop(cloud, "vec", model, "residual")
    // per-row orthogonality: residual · v_1 == 0 up to float epsilon
    val maxDot = resid.select(
      abs(aggregate(zip_with(col("residual"),
        typedLit(model.eigVecs(0).toSeq), (x, c) => x * c),
        lit(0.0), (a, x) => a + x)).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(maxDot <= 1e-10)
    // variance along the removed direction is the corpus top; the
    // residual top must drop to (at most) the second eigenvalue
    val after = Pca.fit(resid.select(col("residual")), "residual",
      d = 4, k = 1)
    assert(after.eigVals(0) <= model.eigVals(0))
    val two = Pca.fit(cloud, "vec", d = 4, k = 2)
    assert(after.eigVals(0) <= two.eigVals(1) * 1.01 + 1e-9)
  }

  test("embeddingCard: defect counts and exact micro-norm stats") {
    val good = (0 until 7).map(i =>
      (i.toLong, Array(3.0f, 4.0f), 1)) // norm exactly 5
    val bad = Seq(
      (100L, null.asInstanceOf[Array[Float]], 2),
      (101L, Array(0.0f, 0.0f), 2),
      (102L, Array(1.0f), 2),
      (103L, Array(Float.NaN, 1.0f), 2))
    val df = (good ++ bad).toDF("id", "vec", "label")
    val out = Pca.embeddingCard(df, Seq("label"), "vec", d = 2)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    val g = out(1)
    assert(g.getAs[Long]("n") == 7 && g.getAs[Long]("n_ok") == 7)
    assert(g.getAs[Double]("p50_norm") == 5.0)
    assert(g.getAs[Double]("mean_norm") == 5.0)
    val b = out(2)
    assert(b.getAs[Long]("n") == 4)
    assert(b.getAs[Long]("n_null") == 1)
    assert(b.getAs[Long]("n_bad_dim") == 1)
    assert(b.getAs[Long]("n_nonfinite") == 1)
    assert(b.getAs[Long]("n_zero") == 1)
    assert(b.getAs[Long]("n_ok") == 1) // the zero vector is well-formed
    assert(b.getAs[Double]("p50_norm") == 0.0)
  }
}
