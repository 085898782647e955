package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (ts, user): day 1 has users 1,2; day 2 has 2,3; day 4 has 9
    ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L),
    ("2024-01-01 12:00:00", 2L),
    ("2024-01-02 10:00:00", 2L), ("2024-01-02 11:00:00", 3L),
    ("2024-01-04 09:00:00", 9L)
  ).toDF("ts", "user_id").withColumn("ts", $"ts".cast("timestamp"))

  test("dailyKeySketches: one sketch row per day") {
    val daily = Sketches.dailyKeySketches(events, "ts", "user_id")
    assert(daily.count() == 3L)
    assert(daily.columns.toSeq == Seq("day", "sk"))
  }

  test("rollingDistinct: window unions match exact distinct counts " +
       "(small cardinalities sit in the sketch's exact regime)") {
    val daily = Sketches.dailyKeySketches(events, "ts", "user_id")
    val out = Sketches.rollingDistinct(daily, windowDays = 3)
      .select($"day".cast("string"), $"window_days", $"approx_distinct")
      .as[(String, Int, Long)].collect().toSet
    // day1: {1,2}; day2: {1,2,3} (d1..d2); day4: {2,3,9} (d2..d4)
    assert(out == Set(
      ("2024-01-01", 3, 2L),
      ("2024-01-02", 3, 3L),
      ("2024-01-04", 3, 3L)))
  }

  test("rollingDistinct window=1 degenerates to per-day distinct") {
    val daily = Sketches.dailyKeySketches(events, "ts", "user_id")
    val out = Sketches.rollingDistinct(daily, 1)
      .select($"day".cast("string"), $"approx_distinct")
      .as[(String, Long)].collect().toSet
    assert(out == Set(("2024-01-01", 2L), ("2024-01-02", 2L),
                      ("2024-01-04", 1L)))
  }

  test("rollingDistinct estimate stays within HLL error at larger " +
       "cardinality") {
    val big = spark.range(20000)
      .select(
        concat(lit("2024-01-0"), (col("id") % 3 + 1).cast("string"),
               lit(" 10:00:00")).cast("timestamp").as("ts"),
        (col("id") * 7919 % 5000).as("user_id"))
    val daily = Sketches.dailyKeySketches(big, "ts", "user_id")
    val approx = Sketches.rollingDistinct(daily, 3)
      .filter($"day" === "2024-01-03")
      .select($"approx_distinct").as[Long].head()
    val exact = big.select($"user_id").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("rollingQuantiles: below first compaction KLL is exact — " +
       "returned values are true order statistics of the window") {
    // day1: values 1..99 ; day2: values 101..199 (all < k=200 items)
    val ev = spark.range(1, 100)
      .select(lit("2024-01-01 10:00:00").cast("timestamp").as("ts"),
              col("id").cast("double").as("value"))
      .union(spark.range(101, 200)
        .select(lit("2024-01-02 10:00:00").cast("timestamp").as("ts"),
                col("id").cast("double").as("value")))
    val daily = Sketches.dailyQuantileSketches(ev, "ts", "value")
    val out = Sketches.rollingQuantiles(daily, 2, Seq(0.5, 0.95))
      .select($"day".cast("string"), $"p50", $"p95")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // day1 window = {1..99}: median 50; day2 window = {1..99,101..199}
    val (d1p50, d1p95) = out("2024-01-01")
    val (d2p50, d2p95) = out("2024-01-02")
    assert(d1p50 == 50.0 && d1p95 == 95.0)
    // 198 items; exact rank picks are elements of the union
    assert(d2p50 == 99.0 || d2p50 == 101.0)
    assert(d2p95 >= 188.0 && d2p95 <= 190.0)
  }

  test("groupedRollingDistinct: windows never mix groups") {
    val ev = Seq(
      ("a", "2024-01-01 10:00:00", 1L), ("a", "2024-01-02 10:00:00", 2L),
      ("b", "2024-01-01 10:00:00", 1L), ("b", "2024-01-02 10:00:00", 1L)
    ).toDF("g", "ts", "user_id").withColumn("ts", $"ts".cast("timestamp"))
    val daily = Sketches.groupedDailyKeySketches(ev, "g", "ts", "user_id")
    val out = Sketches.groupedRollingDistinct(daily, 2)
      .select($"g", $"day".cast("string"), $"approx_distinct")
      .as[(String, String, Long)].collect().toSet
    // group a accumulates {1},{1,2}; group b stays {1} both days —
    // user 2 from group a must never leak into b's window
    assert(out == Set(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("b", "2024-01-01", 1L), ("b", "2024-01-02", 1L)))
  }

  test("groupedRollingDistinct keeps the NULL dimension group " +
       "(null-safe join)") {
    val ev = Seq(
      (Some("a"), "2024-01-01 10:00:00", 1L),
      (Option.empty[String], "2024-01-01 10:00:00", 1L),
      (Option.empty[String], "2024-01-02 10:00:00", 2L)
    ).toDF("g", "ts", "user_id").withColumn("ts", $"ts".cast("timestamp"))
    val out = Sketches.groupedRollingDistinct(
        Sketches.groupedDailyKeySketches(ev, "g", "ts", "user_id"), 2)
      .select($"g", $"day".cast("string"), $"approx_distinct")
      .as[(Option[String], String, Long)].collect().toSet
    assert(out == Set(
      (Some("a"), "2024-01-01", 1L),
      (None, "2024-01-01", 1L),
      (None, "2024-01-02", 2L)))
  }

  test("dailyNewKeys excludes NULL keys (COUNT DISTINCT parity — " +
       "xxhash64(NULL) is a constant, not NULL)") {
    val ev = Seq(
      ("2024-01-01 10:00:00", Some(1L)),
      ("2024-01-01 11:00:00", Option.empty[Long]),
      ("2024-01-02 10:00:00", Option.empty[Long])
    ).toDF("ts", "user_id").withColumn("ts", $"ts".cast("timestamp"))
    val out = Sketches.dailyNewKeys(ev, "ts", "user_id")
      .select($"day".cast("string"), $"n_day", $"n_new")
      .as[(String, Double, Double)].collect().toSet
    // day2 has ONLY null keys → no sketch row at all; day1 counts 1
    assert(out == Set(("2024-01-01", 1.0, 1.0)))
  }

  test("dailyNewKeys: first-seen counts via theta difference") {
    val out = Sketches.dailyNewKeys(events, "ts", "user_id")
      .select($"day".cast("string"), $"n_day", $"n_new")
      .as[(String, Double, Double)].collect().toSet
    // day1 users {1,2} all new; day2 {2,3} → 1 new; day4 {9} → 1 new
    assert(out == Set(
      ("2024-01-01", 2.0, 2.0),
      ("2024-01-02", 2.0, 1.0),
      ("2024-01-04", 1.0, 1.0)))
  }

  private def docs = Seq(
    ("s1", "a b c d"), ("s1", "a b"),       // s1 vocab {a,b,c,d}
    ("s2", "c d e"),                        // s2 vocab {c,d,e}
    ("s3", "x y")                           // s3 vocab {x,y} — disjoint
  ).toDF("source", "text")

  test("groupOverlap: exact-mode theta set algebra is exact") {
    val toks = docs.select($"source",
      explode(split(lower($"text"), "\\s+")).as("tok"))
    val out = Sketches.groupOverlap(toks, "source", "tok")
      .select($"g_a", $"g_b", $"n_a", $"n_b", $"n_both", $"jaccard")
      .as[(String, String, Double, Double, Double, Double)]
      .collect().toSet
    assert(out == Set(
      ("s1", "s2", 4.0, 3.0, 2.0, 0.4),    // {c,d} / {a,b,c,d,e}
      ("s1", "s3", 4.0, 2.0, 0.0, 0.0),
      ("s2", "s3", 3.0, 2.0, 0.0, 0.0)))
  }

  test("groupOverlap emits every unordered pair exactly once") {
    val toks = docs.select($"source",
      explode(split(lower($"text"), "\\s+")).as("tok"))
    val out = Sketches.groupOverlap(toks, "source", "tok")
    assert(out.count() == 3L) // C(3,2)
    assert(out.filter($"g_a" >= $"g_b").count() == 0L)
  }
}
