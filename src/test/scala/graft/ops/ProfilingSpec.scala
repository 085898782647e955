package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("b"), Some(1.5)),
    (Some(2L), None, Some(2.25)),
    (Some(2L), Some("a"), None),
    (None, Some("a"), Some(10.0))).toDF("k", "s", "x")

  test("per-column nulls, distincts, and portable min/max strings") {
    val got = Profiling.profile(df, Seq("k", "s", "x"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k") == ("k", 1L, 2L, "1", "2"))
    assert(got("s") == ("s", 1L, 2L, "a", "b"))
    // doubles render through DECIMAL(18,2): engine-portable formatting
    assert(got("x") == ("x", 1L, 3L, "1.50", "10.00"))
  }

  test("profiling a single column yields a single row") {
    val got = Profiling.profile(df, Seq("k")).collect()
    assert(got.length == 1)
  }

  test("empty input: zero counts, null min/max") {
    val got = Profiling.profile(df.filter(lit(false)), Seq("k", "s"))
      .as[(String, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("k") == ("k", 0L, 0L, None, None))
    assert(got("s") == ("s", 0L, 0L, None, None))
  }
}
