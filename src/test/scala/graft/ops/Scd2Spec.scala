package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, String, String, Long)*) =
    rows.toSeq.map { case (k, a, t, id) => (k, a, ts(t), id) }
      .toDF("key", "attr", "t", "id")

  private def build(df: org.apache.spark.sql.DataFrame) =
    Scd2.build(df, "key", "attr", "t", Seq("id"))
      .select($"key", $"attr", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect().toSet

  test("consecutive identical values collapse; intervals tile the timeline") {
    val got = build(log(
      (1L, "x", "2024-01-01 00:00:00", 1L),
      (1L, "x", "2024-01-02 00:00:00", 2L), // no change — collapsed
      (1L, "y", "2024-01-03 00:00:00", 3L),
      (1L, "x", "2024-01-04 00:00:00", 4L))) // value returns — new version
    assert(got == Set(
      (1L, "x", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "y", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "x", ts("2024-01-04 00:00:00"), None, true)))
  }

  test("null attributes are null-safe: null→null collapses, null→value opens") {
    val got = build(log(
      (1L, null, "2024-01-01 00:00:00", 1L),
      (1L, null, "2024-01-02 00:00:00", 2L),
      (1L, "a", "2024-01-03 00:00:00", 3L)))
    assert(got == Set(
      (1L, null, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "a", ts("2024-01-03 00:00:00"), None, true)))
  }

  test("same-timestamp changes order deterministically by the tie column") {
    val got = build(log(
      (1L, "a", "2024-01-01 00:00:00", 2L),
      (1L, "b", "2024-01-01 00:00:00", 1L))) // same ts: id 1 first
    assert(got == Set(
      (1L, "b", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00")), false),
      (1L, "a", ts("2024-01-01 00:00:00"), None, true)))
  }

  test("keys are independent; single-version keys are current from the start") {
    val got = build(log(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (2L, "b", "2024-01-05 00:00:00", 2L)))
    assert(got == Set(
      (1L, "a", ts("2024-01-01 00:00:00"), None, true),
      (2L, "b", ts("2024-01-05 00:00:00"), None, true)))
  }
}
