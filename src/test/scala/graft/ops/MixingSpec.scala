package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 600).map(i =>
    (i.toLong, s"g${i % 3}")).toDF("id", "grp")

  test("per-group quotas honored; unlisted groups take the default") {
    val out = Mixing.sampleQuotas(corpus, "grp", "id",
      Map("g0" -> 10, "g1" -> 25), defaultQuota = 5)
    val counts = out.groupBy($"grp").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("g0" -> 10L, "g1" -> 25L, "g2" -> 5L))
  }

  test("quota larger than the group keeps the whole group") {
    val out = Mixing.sampleQuotas(corpus, "grp", "id",
      Map("g0" -> 10000), defaultQuota = 1)
    val counts = out.groupBy($"grp").count()
      .as[(String, Long)].collect().toMap
    assert(counts("g0") == 200L && counts("g1") == 1L && counts("g2") == 1L)
  }

  test("salted two-level cap selects exactly the single-window set") {
    val picks = Seq(1, 4, 64).map(s =>
      Mixing.sampleQuotas(corpus, "grp", "id",
          Map("g0" -> 7, "g2" -> 13), defaultQuota = 3, salts = s)
        .select($"id").as[Long].collect().sorted.toSeq)
    assert(picks.distinct.size == 1)
  }

  test("selection matches the md5-order reference computed locally") {
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (1 to 600).map(i => (i.toLong, s"g${i % 3}"))
      .groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy(r => md5hex(r._1.toString)).take(4).map(_._1)
      }.toSet
    val got = Mixing.sampleQuotas(corpus, "grp", "id", Map.empty, 4)
      .select($"id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("weight-budget selection is the greedy md5-order prefix") {
    val weighted = corpus.withColumn("w", ($"id" % 7 + 1).cast("int"))
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (1 to 600).map(i => (i.toLong, s"g${i % 3}", i % 7 + 1))
      .groupBy(_._2).flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => md5hex(r._1.toString)).takeWhile { r =>
          cum += r._3; cum <= 40L
        }.map(_._1)
      }.toSet
    val got = Mixing.sampleWeightBudget(weighted, "grp", "id", $"w",
        Map.empty, defaultBudget = 40L)
      .select($"id").as[Long].collect().toSet
    assert(got == expected)
    // per-group kept weight never exceeds the budget
    val sums = Mixing.sampleWeightBudget(weighted, "grp", "id", $"w",
        Map("g0" -> 15L), defaultBudget = 40L)
      .groupBy($"grp").agg(sum($"wt").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums("g0") <= 15L && sums("g1") <= 40L && sums("g2") <= 40L)
  }

  test("weight-budget rejects negative and null weights loudly") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val negative = corpus.withColumn("w",
      when($"id" === 17, -3).otherwise(1).cast("int"))
    val e1 = intercept[Exception] {
      Mixing.sampleWeightBudget(negative, "grp", "id", $"w",
        Map.empty, defaultBudget = 1000L).count()
    }
    assert(messages(e1).exists(_.contains("negative weight")),
      s"expected the guard message, got: ${messages(e1)}")
    // a NULL weight would ride free (window sum skips nulls) — guarded
    val withNull = corpus.withColumn("w",
      when($"id" === 17, lit(null)).otherwise(lit(1)).cast("int"))
    val e2 = intercept[Exception] {
      Mixing.sampleWeightBudget(withNull, "grp", "id", $"w",
        Map.empty, defaultBudget = 1000L).count()
    }
    assert(messages(e2).exists(_.contains("null or negative weight")),
      s"expected the guard message, got: ${messages(e2)}")
  }
}
