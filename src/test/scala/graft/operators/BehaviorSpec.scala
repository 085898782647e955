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

  private def seqEv(rows: (Long, Int, String)*) =
    rows.toSeq.map { case (u, i, t) =>
      (u, f"2024-01-01 00:$i%02d:00", t, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", $"ts".cast("timestamp"))

  test("transitionEntropy: deterministic successor gives 0, uniform gives ln k normalized to 1") {
    // one user, a b a b c: a -> b always (twice); b -> a or c equally
    val events = seqEv((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "a"),
      (1L, 3, "b"), (1L, 4, "c"))
    val out = Behavior.transitionEntropy(events, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => r.getAs[String]("prev_type") ->
        (r.getAs[Long]("n_out"), r.getAs[Long]("k_next"),
         r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))).toMap
    assert(out("a") == ((2L, 1L, 0.0, 0.0)))          // a -> b, b
    val (nB, kB, hB, normB) = out("b")
    assert(nB == 2L && kB == 2L)
    // two successors at p = 1/2 each: H = ln 2 on the micro contract
    val micro = math.rint(0.5 * math.log(0.5) * 1e6).toLong
    assert(hB == math.rint(-(2 * micro).toDouble / 1e6 * 1e6) / 1e6)
    assert(normB == math.rint(-(2 * micro).toDouble / 1e6
      / math.log(2.0) * 1e6) / 1e6)
    assert(math.abs(hB - math.log(2.0)) < 1e-5 && math.abs(normB - 1.0) < 1e-5)
  }

  test("sessionize: strict-gt gap boundary, tie ordering, per-session stats") {
    import org.apache.spark.sql.functions.{col, expr}
    // u1: t=0, t=+100s (gap == gapSeconds -> SAME session), t=+201s
    // (gap 101 > 100 -> break); u2: two events at the SAME ts (tie ->
    // gap 0, same session)
    val rows = Seq(
      (1L, 0L, "a", 1L), (1L, 100L, "b", 2L), (1L, 201L, "a", 3L),
      (2L, 50L, "a", 4L), (2L, 50L, "b", 5L))
    val df = rows.toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
    val out = Behavior.sessionize(df, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 100L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_no")) -> r).toMap
    assert(out.size == 3)
    val s11 = out((1L, 1L))
    assert(s11.getAs[Long]("n_events") == 2L)
    assert(s11.getAs[Long]("start_us") == 0L)
    assert(s11.getAs[Long]("duration_us") == 100L * 1000000L)
    assert(s11.getAs[Long]("n_types") == 2L)
    val s12 = out((1L, 2L))
    assert(s12.getAs[Long]("n_events") == 1L)
    assert(s12.getAs[Long]("duration_us") == 0L)
    val s21 = out((2L, 1L))
    assert(s21.getAs[Long]("n_events") == 2L && s21.getAs[Long]("n_types") == 2L)
  }

  test("rfmSegments: tertile thresholds score ties together and counts conserve") {
    // 9 users, distinct frequencies/moneys/recencies
    val base = java.sql.Timestamp.valueOf("2021-09-20 10:00:00").getTime
    val evs = for {
      u <- 1L to 9L
      i <- 1L to u // user u has u events
    } yield (u, new java.sql.Timestamp(base + u * 86400000L + i * 1000L),
      "click", u * 10.0, u * 100 + i)
    val df = evs.toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = graft.operators.Behavior.rfmSegments(df, "user_id", "ts",
      "value").collect()
    assert(out.map(_.getAs[Long]("n_users")).sum == 9)
    // user 9: most recent (rec=0), most frequent, highest value -> (3,3,3)
    val top = out.find(r => r.getAs[Long]("r_score") == 3 &&
      r.getAs[Long]("f_score") == 3 && r.getAs[Long]("m_score") == 3)
    assert(top.isDefined && top.get.getAs[Long]("n_users") >= 1)
    // scores stay in 1..3
    out.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 3) }
    }
  }

  test("rfmSegments: all-identical users land in one segment") {
    val ts = java.sql.Timestamp.valueOf("2021-09-20 10:00:00")
    val evs = (1L to 6L).map(u => (u, ts, "click", 50.0))
    val out = graft.operators.Behavior.rfmSegments(
      evs.toDF("user_id", "ts", "event_type", "value"),
      "user_id", "ts", "value").collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_users") == 6)
    // every metric is a full tie at q1=q2 -> nothing exceeds either cut
    assert(out.head.getAs[Long]("r_score") == 3) // rec <= cuts -> best
    assert(out.head.getAs[Long]("f_score") == 1)
    assert(out.head.getAs[Long]("m_score") == 1)
  }
}
