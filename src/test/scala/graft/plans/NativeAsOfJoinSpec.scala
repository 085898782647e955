package graft.plans

import graft.SparkSpec
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class NativeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def clicks = Seq(
    (1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L), (4L, 20L, 500L),
    (5L, 30L, 10L) // key with no purchases at all
  ).toDF("event_id", "user_id", "ts")

  private def purchases = Seq(
    (10L, 90L, 1.0), (10L, 100L, 2.0), (10L, 240L, 3.0), // ts=100 exact tie
    (20L, 60L, 4.0), (20L, 400L, 5.0),
    (40L, 1L, 9.0) // key with no clicks
  ).toDF("user_id", "pts", "value")

  test("native as-of matches hand-computed backward semantics (inclusive ties, left join)") {
    val out = NativeAsOfJoin.backward(clicks, purchases, "user_id",
        "ts", "pts", Seq("value"))
      .select($"event_id", $"asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) == Some(2.0)) // tie at ts=100 is inclusive
    assert(out(2L) == Some(3.0))
    assert(out(3L) == None)      // first purchase for 20 is at 60 > 50
    assert(out(4L) == Some(5.0))
    assert(out(5L) == None)      // no purchases for key 30
  }

  test("native as-of equals the composed union+window form on a larger randomized set") {
    val n = 5000
    val l = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % 97).as("user_id"),
      ((col("id") * 7919) % 10000).as("ts"))
    val r = spark.range(n / 2).select(
      (col("id") % 101).as("user_id"),
      ((col("id") * 6271) % 10000).as("pts"),
      (col("id") % 1000).cast("double").as("value"))
    val native = NativeAsOfJoin.backward(l, r, "user_id", "ts", "pts", Seq("value"))
      .select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect().toMap
    val composed = AsOfJoin.backward(l, r, "user_id", "ts", "pts", Seq("value"))
      .select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("physical plan is the custom exec with planner-inserted exchanges and sorts") {
    val out = NativeAsOfJoin.backward(clicks, purchases, "user_id",
      "ts", "pts", Seq("value"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected the AsOfJoin exec in:\n$plan")
    assert(plan.contains("Sort"), s"expected planner-inserted sorts in:\n$plan")
    assert(plan.contains("Exchange"), s"expected key exchanges in:\n$plan")
  }
}
