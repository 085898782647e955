package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: latest right row at or before each left ts, per key") {
    val clicks = Seq(
      (1L, "u1", t("2024-01-01 10:00:00")),
      (2L, "u1", t("2024-01-01 12:00:00")),
      (3L, "u1", t("2024-01-01 09:00:00")), // before any purchase
      (4L, "u2", t("2024-01-01 11:00:00")),
      (5L, "u3", t("2024-01-01 11:00:00"))  // user with no purchases
    ).toDF("click_id", "user", "cts")
    val purchases = Seq(
      ("u1", t("2024-01-01 09:30:00"), 10.0),
      ("u1", t("2024-01-01 11:30:00"), 20.0),
      ("u2", t("2024-01-01 11:00:00"), 30.0)  // equal ts → inclusive match
    ).toDF("user", "pts", "amount")

    val out = AsOfJoin.backward(clicks, purchases, "user", "cts", "pts",
        valueCols = Seq("amount"))
      .select("click_id", "asof_amount")
      .as[(Long, Option[Double])].collect().toMap

    assert(out(1L) == Some(10.0)) // 10:00 → 09:30 purchase
    assert(out(2L) == Some(20.0)) // 12:00 → 11:30 purchase
    assert(out(3L) == None)       // nothing before 09:00
    assert(out(4L) == Some(30.0)) // equal timestamps match (>= semantics)
    assert(out(5L) == None)       // no purchases for u3
    assert(out.size == 5)         // every left row survives
  }

  test("matched row's NULL value is returned as NULL, never a stale older value") {
    // ASOF semantics pick the latest ROW; its value being NULL must not
    // fall through to an earlier row's value, and with two value
    // columns the output must never stitch fields of different rows
    val clicks = Seq((1L, "u1", t("2024-01-01 12:00:00"))).toDF("click_id", "user", "cts")
    val purchases = Seq(
      ("u1", t("2024-01-01 10:00:00"), Some(5.0), Some("early")),
      ("u1", t("2024-01-01 11:00:00"), None: Option[Double], Some("late"))
    ).toDF("user", "pts", "amount", "tag")
    val r = AsOfJoin.backward(clicks, purchases, "user", "cts", "pts",
        valueCols = Seq("amount", "tag"))
      .select("asof_amount", "asof_tag")
      .as[(Option[Double], Option[String])].head()
    assert(r == ((None, Some("late")))) // the 11:00 row, exactly as stored
    // the native operator agrees (long-keyed variant of the same data —
    // it rejects non-integral keys by contract)
    val clicksL = clicks.withColumn("uid", lit(1L))
    val purchasesL = purchases.withColumn("uid", lit(1L))
    val n = graft.plans.NativeAsOfJoin.backward(clicksL, purchasesL, "uid",
        "cts", "pts", valueCols = Seq("amount", "tag"))
      .select("asof_amount", "asof_tag")
      .as[(Option[Double], Option[String])].head()
    assert(n == ((None, Some("late"))))
    val e = intercept[IllegalArgumentException] {
      graft.plans.NativeAsOfJoin.backward(clicks, purchases, "user",
        "cts", "pts", valueCols = Seq("amount"))
    }
    assert(e.getMessage.contains("integral key"))
  }
}
