package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionAgg merges within-gap events and finalizes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamingSessions.sessionAgg(input.toDF(),
      "user_id", "ts", "event_type", gapSeconds = 3600L)
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: two events 30 min apart (one session), then a 2 h gap
      // (new session); user 2: one event
      input.addData(
        Ev(1L, t("2021-09-20 10:00:00"), "click"),
        Ev(1L, t("2021-09-20 10:30:00"), "view"),
        Ev(1L, t("2021-09-20 13:00:00"), "click"),
        Ev(2L, t("2021-09-20 10:00:00"), "click"))
      q.processAllAvailable()
      // advance the watermark far past every session close
      input.addData(Ev(99L, t("2021-09-22 00:00:00"), "click"))
      q.processAllAvailable()
      input.addData(Ev(98L, t("2021-09-24 00:00:00"), "click"))
      q.processAllAvailable()

      val rows = spark.table("sess")
        .select("user_id", "n_events", "start_us", "duration_us", "n_types")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val us = (s: String) => t(s).getTime * 1000L
      // user 1 session 1: 2 events, 30 min duration, 2 types
      assert(rows.contains((1L, 2L, us("2021-09-20 10:00:00"), 1800000000L, 2L)))
      // user 1 session 2 (2 h > 1 h gap broke it): singleton
      assert(rows.contains((1L, 1L, us("2021-09-20 13:00:00"), 0L, 1L)))
      assert(rows.contains((2L, 1L, us("2021-09-20 10:00:00"), 0L, 1L)))
    } finally q.stop()
  }

  test("sessionAgg matches the batch sessionizer under the emission predicate") {
    // deterministic synthetic events: 20 users, bursts with 2h gaps
    val evs = for {
      u <- 1L to 20L
      s <- 0 to 2
      i <- 0 to (u % 3).toInt
    } yield Ev(u, new java.sql.Timestamp(
      1632100000000L + s * 7200000L + i * 60000L + u * 1000L), s"t$i")
    val batch = graft.operators.Behavior.sessionize(
        evs.toDF().withColumn("event_id", monotonically_increasing_id()),
        "user_id", "ts", "event_type", "event_id", gapSeconds = 3600L)
      .select("user_id", "n_events", "start_us", "duration_us", "n_types")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamingSessions.sessionAgg(input.toDF(),
      "user_id", "ts", "event_type", gapSeconds = 3600L)
    val q = agg.writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      // push the watermark past every close
      input.addData(Ev(999L, new java.sql.Timestamp(1632700000000L), "x"))
      q.processAllAvailable()
      input.addData(Ev(998L, new java.sql.Timestamp(1633000000000L), "x"))
      q.processAllAvailable()
      val got = spark.table("sess2")
        .filter(col("user_id") <= 20)
        .select("user_id", "n_events", "start_us", "duration_us", "n_types")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val want = batch.as[(Long, Long, Long, Long, Long)]
        .collect().sorted.toSeq
      assert(got == want)
    } finally q.stop()
  }
}

class StreamingSrmSpec extends SparkSpec {
  import spark.implicits._

  test("srmAgg flags an imbalanced finalized day and withholds open days") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val agg = StreamingSrm.srmAgg(input.toDF(), "ts",
      col("user_id") % 2 === 0)
    val q = agg.writeStream.format("memory").queryName("srm")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // day 1: 8 even vs 2 odd (chi2 = 36/10); day 2 balanced
      val d1 = (1 to 8).map(i => Ev(2L * i, t("2021-09-20 10:00:00"), "c")) ++
        (1 to 2).map(i => Ev(2L * i + 1, t("2021-09-20 11:00:00"), "c"))
      val d2 = (1 to 4).map(i => Ev(i.toLong, t("2021-09-21 10:00:00"), "c"))
      input.addData(d1 ++ d2: _*)
      q.processAllAvailable()
      // watermark = day2 10:00 - 1 day -> only day 1 could finalize;
      // push it past day 2's end too
      input.addData(Ev(99L, t("2021-09-23 01:00:00"), "c"))
      q.processAllAvailable()
      input.addData(Ev(98L, t("2021-09-25 01:00:00"), "c"))
      q.processAllAvailable()
      val rows = spark.table("srm")
        .filter(col("day") < "2021-09-22")
        .orderBy("day").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_a") == 8 && rows(0).getAs[Long]("n_b") == 2)
      assert(rows(0).getAs[Double]("chi2") == 3.6)
      assert(!rows(0).getAs[Boolean]("mismatch"))
      assert(rows(1).getAs[Double]("chi2") == 0.0)
    } finally q.stop()
  }
}
