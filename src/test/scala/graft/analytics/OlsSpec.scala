package graft.analytics

import graft.SparkSpec

class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("exact fit on a perfect line: slope/intercept recovered, r2=1, rmse=0") {
    val df = (1 to 20).map(i => (i.toDouble, 3.5 * i + 2.0)).toDF("x", "y")
    val fit = Ols.fit(df, "x", "y")
    assert(math.abs(fit.slope - 3.5) < 1e-9)
    assert(math.abs(fit.intercept - 2.0) < 1e-9)
    assert(math.abs(fit.r2 - 1.0) < 1e-12)
    assert(fit.rmse < 1e-9)
    assert(fit.n == 20)
  }

  test("log-log fit recovers a power law y = c * x^k") {
    val (k, c) = (1.7, 4.2)
    val df = (1 to 50).map { i =>
      val x = i * 10.0; (x, c * math.pow(x, k))
    }.toDF("x", "y")
    val fit = Ols.fit(df, "x", "y", logLog = true)
    assert(math.abs(fit.slope - k) < 1e-9)          // exponent
    assert(math.abs(fit.intercept - math.log(c)) < 1e-9)
  }

  test("noisy fit matches closed-form computed locally; dropna applied") {
    val xs = (1 to 100).map(_.toDouble)
    val ys = xs.map(x => 2.0 * x + 5.0 + math.sin(x) * 10.0)
    val rows = xs.zip(ys).map { case (x, y) => (Some(x), Some(y)) } :+
      ((None: Option[Double], Some(1.0))) // null row dropped
    val df = rows.toDF("x", "y")
    val fit = Ols.fit(df, "x", "y")
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum / n
    assert(fit.n == n)
    assert(math.abs(fit.slope - sxy / sxx) < 1e-9)
    assert(fit.tStat > 10) // strongly significant slope on near-linear data
  }

  test("withPrediction emits yhat and residual") {
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val fit = Ols.fit(df, "x", "y")
    val out = Ols.withPrediction(df, "x", "y", fit)
    assert(out.columns.toSet == Set("x", "y", "yhat", "residual"))
    assert(out.selectExpr("max(abs(residual))").head().getDouble(0) < 1e-9)
  }

  test("M3 stratifiedSample caps rows per quantile bin deterministically") {
    val df = (1 to 1000).map(i => (i, i.toDouble)).toDF("id", "v")
    val out = Ols.stratifiedSample(df, "v", bins = 20, capPerBin = 5)
    assert(out.count() == 100) // 20 bins × 5
    val out2 = Ols.stratifiedSample(df, "v", bins = 20, capPerBin = 5)
    assert(out.select("id").as[Int].collect().sorted.toSeq ==
           out2.select("id").as[Int].collect().sorted.toSeq)
  }

  test("M3 two-level cap selects exactly the global per-bin top-cap (salt count irrelevant)") {
    val df = (1 to 2000).map(i => (i, (i % 997).toDouble)).toDF("id", "v")
    // different salt counts (1 = the old single-window plan) must agree:
    // both levels order by the same hash, so salting is plan-only
    val sampled = Seq(1, 4, 64).map(s =>
      Ols.stratifiedSample(df, "v", bins = 10, capPerBin = 7, salts = s)
        .select("id").as[Int].collect().sorted.toSeq)
    assert(sampled.distinct.size == 1)
  }

  test("M3 exact variant: ntile bins + md5-keyed cap match a local reference") {
    val df = (1 to 1000).map(i => (i.toLong, (i % 321).toDouble)).toDF("id", "v")
    val out = Ols.stratifiedSampleExact(df, "v", "id", bins = 10, capPerBin = 8)
      .select("id").as[Long].collect().sorted.toSeq
    // local replay: total order (v, id), ntile(10) = first (n mod 10)
    // bins get ceil(n/10) rows, md5(id-string) picks the per-bin keep set
    val rows = (1 to 1000).map(i => (i.toLong, (i % 321).toDouble))
      .sortBy { case (id, v) => (v, id) }
    val base = rows.size / 10
    val extra = rows.size % 10
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0 until 10).flatMap { b =>
      val start = b * base + math.min(b, extra)
      val size = base + (if (b < extra) 1 else 0)
      rows.slice(start, start + size).map(_._1)
        .sortBy(id => md5hex(id.toString)).take(8)
    }.sorted
    assert(out == expected)
  }

  test("M3 plan shape: the wide exchange is salted, not bins-only") {
    val df = (1 to 1000).map(i => (i, i.toDouble)).toDF("id", "v")
    val plan = Ols.stratifiedSample(df, "v", bins = 20, capPerBin = 5)
      .queryExecution.executedPlan.toString
    // the first (full-data) window partitions by (__bin, __salt); only
    // the capped survivors flow through the per-bin re-cap window
    assert(plan.contains("__salt"),
      s"expected a salted first-level window in:\n$plan")
  }
}
