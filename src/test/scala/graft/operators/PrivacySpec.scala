package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),   // group of 3
    (4L, "en", "b"), (5L, "en", "b"),                    // group of 2
    (6L, "fr", "a")                                      // singleton
  ).toDF("id", "lang", "source")

  test("kAnonymize: suppression flags exactly the small groups") {
    val out = Privacy.kAnonymize(rows, Seq("lang", "source"), k = 3)
      .select($"id", $"group_size", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false),
      (6L, 1L, false)))
    // the released subset satisfies k-anonymity: every kept group >= k
    val released = Privacy.kAnonymize(rows, Seq("lang", "source"), 3)
      .filter($"kept")
    val minGroup = released.groupBy($"lang", $"source").count()
      .agg(org.apache.spark.sql.functions.min($"count")).as[Long].head()
    assert(minGroup >= 3L)
  }

  test("kAnonymityAudit: suppressed shares sum to the suppressed fraction") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("lang", "source"), k = 3)
      .select($"kept", $"n_rows", $"suppressed_share")
      .as[(Boolean, Long, Double)].collect()
    assert(audit.filter(_._1).map(_._3).forall(_ == 0.0))
    assert(math.abs(audit.filterNot(_._1).map(_._3).sum - 0.5) < 1e-9) // 3 of 6
  }

  test("k = 1 keeps everything") {
    val out = Privacy.kAnonymize(rows, Seq("lang", "source"), k = 1)
    assert(out.filter(!$"kept").count() == 0L)
  }
}
