package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("withinTolerance matches the brute-force inequality join exactly") {
    val left = (0 until 50).map(i =>
      (i.toLong, s"u${i % 3}", t(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00")))
      .toDF("lid", "user", "lts")
    val right = (0 until 50).map(i =>
      (i.toLong + 100, s"u${i % 3}", t(f"2024-01-01 ${(i * 3) % 24}%02d:${(i * 11) % 60}%02d:30")))
      .toDF("rid", "user", "rts")

    val fast = RangeJoin.withinTolerance(left, right, Seq("user"),
        "lts", "rts", toleranceSec = 1800)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = left.join(right, Seq("user"))
      .filter(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.unix_micros($"lts") -
        org.apache.spark.sql.functions.unix_micros($"rts")) <= 1800L * 1000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(fast == brute)
    assert(fast.nonEmpty)
  }

  test("boundary: exactly-at-tolerance pairs included, one-microsecond-past excluded") {
    val left = Seq((1L, "k", t("2024-01-01 10:00:00"))).toDF("lid", "k", "lts")
    val right = Seq(
      (10L, "k", t("2024-01-01 10:30:00")),                       // exactly +30min
      (11L, "k", java.sql.Timestamp.from(
        t("2024-01-01 10:30:00").toInstant.plusNanos(1000)))      // +30min +1µs
    ).toDF("rid", "k", "rts")
    val got = RangeJoin.withinTolerance(left, right, Seq("k"),
        "lts", "rts", toleranceSec = 1800)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(10L))
  }
}
