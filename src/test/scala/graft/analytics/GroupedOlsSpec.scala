package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupedOlsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls: recovers an exact line per group") {
    // g1: y = 3x + 2 exactly (r2 = 1); g2: y = -x + 10 exactly
    val rows = (1L to 10L).map(x => ("g1", x, 3 * x + 2)) ++
      (1L to 10L).map(x => ("g2", x, 10 - x))
    val out = Ols.groupedOls(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[Double]("slope") == 3.0)
    assert(out("g1").getAs[Double]("intercept") == 2.0)
    assert(out("g1").getAs[Double]("r2") == 1.0)
    assert(out("g2").getAs[Double]("slope") == -1.0)
    assert(out("g2").getAs[Double]("intercept") == 10.0)
  }

  test("groupedOls: drops degenerate groups (n < 2 or zero x-variance)") {
    val df = Seq(("a", 1L, 5L), ("b", 2L, 1L), ("b", 2L, 9L))
      .toDF("g", "x", "y")
    assert(Ols.groupedOls(df, Seq("g"), "x", "y").count() == 0)
  }

  test("pairCorrelation: perfectly correlated and anti-correlated series") {
    val rows = (1L to 8L).flatMap(t =>
      Seq(("up", t, t), ("up2", t, 2 * t + 1), ("down", t, 100 - t)))
    val out = Ols.pairCorrelation(rows.toDF("g", "t", "v"), "g", "t", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr"))
      .toMap
    assert(out(("up", "up2")) == 1.0)
    assert(out(("down", "up")) == -1.0)
    assert(out(("down", "up2")) == -1.0)
  }

  test("pairCorrelation: only shared time points count") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 2L, 5L), ("b", 3L, 6L), ("b", 9L, 0L)).toDF("g", "t", "v")
    val r = Ols.pairCorrelation(df, "g", "t", "v").collect().head
    assert(r.getAs[Long]("n") == 2)
  }
}
