package graft.ops

import graft.SparkSpec

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
}
