package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("check: one row per rule, NULL predicate counts as a violation") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, Some("c")), (Some(4L), Some(""))
    ).toDF("id", "s")
    val out = Validate.check(df, Seq(
        "id_not_null" -> $"id".isNotNull,
        "s_nonempty" -> (length($"s") > 0)))
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id_not_null") == (("id_not_null", 1L, 4L, 0.25, false)))
    // row 2's predicate is NULL (length(NULL) > 0) → a violation, plus
    // the genuinely empty row 4
    assert(out("s_nonempty") == (("s_nonempty", 2L, 4L, 0.5, false)))
  }

  test("check: all-green suite and rule-name guards") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val out = Validate.check(df, Seq("ok" -> $"id".isNotNull))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(out == (("ok", 0L, 2L, 0.0, true)))
    intercept[IllegalArgumentException] { Validate.check(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Validate.check(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("checkUnique: counts rows beyond the first per key; NULL keys group") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val out = Validate.checkUnique(df, Seq("k"), "k_unique")
      .as[(String, Long, Long, Double, Boolean)].head()
    // 3 copies of 1 → 2 extra; 2 NULLs → 1 extra; total 3 of 6
    assert(out == (("k_unique", 3L, 6L, 0.5, false)))
    val ok = Validate.checkUnique(Seq(1L, 2L).toDF("k"), Seq("k"), "u")
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(ok._2 == 0L && ok._5)
  }
}
