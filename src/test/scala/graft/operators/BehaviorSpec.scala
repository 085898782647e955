package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "ts", "event_type")
      .withColumn("ts", $"ts".cast("timestamp"))

  test("funnel: strictly-after ordering — pre-step events don't count") {
    val events = ev(
      // u1 full ordered funnel
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2: purchase BEFORE click → converts to click only
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:30:00", "purchase"),
      (2L, "2024-01-01 11:00:00", "click"),
      // u3: click before view → view only
      (3L, "2024-01-01 09:00:00", "click"),
      (3L, "2024-01-01 10:00:00", "view"),
      // u4: never views → not even step 1
      (4L, "2024-01-01 10:00:00", "click"))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy($"step")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 2L, BigDecimal(2.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (3, "purchase", 1L, 0.5)))
  }

  test("funnel: same-timestamp step events do NOT convert (strict >)") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy($"step").as[(Int, String, Long, Double)].collect()
    assert(out.map(r => (r._1, r._3)).toSeq == Seq((1, 1L), (2, 0L)))
  }

  test("funnel: an empty mid-funnel step yields conversion 0.0, not " +
       "NULL/NaN") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy($"step").as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "view", 1L, 1.0),
      (2, "click", 0L, 0.0),
      (3, "purchase", 0L, 0.0)))
  }

  test("retention: cohort-week cells and ratios") {
    val events = ev(
      // u1, u2 first seen Mon 2024-01-01 week; u1 returns next week
      (1L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-03 10:00:00", "view"),
      (1L, "2024-01-09 10:00:00", "click"),
      // u3 first seen the following week
      (3L, "2024-01-10 10:00:00", "view"))
    val out = Behavior.retention(events, "user_id", "ts")
      .orderBy($"cohort_week", $"week_no")
      .select($"cohort_week".cast("string"), $"week_no", $"n_active",
        $"retention")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L, 1.0),    // cohort of u1,u2 — both week 0
      ("2024-01-01", 1, 1L, 0.5),    // u1 returned
      ("2024-01-08", 0, 1L, 1.0)))   // u3's cohort
  }
}
