package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("deltaAttribution: cell deltas sum exactly to the total; shares sum to 1") {
    val rows = Seq(
      ("a", true, 100L), ("a", false, 150L),   // delta +50
      ("b", true, 200L), ("b", false, 120L),   // delta -80
      ("c", true, 50L), ("c", false, 80L))     // delta +30
    val out = Attribution.deltaAttribution(rows.toDF("cell", "pre", "v"),
      Seq("cell"), col("pre"), col("v")).collect()
    val deltas = out.map(_.getAs[Long]("delta"))
    assert(deltas.sum == 0L) // +50 - 80 + 30
    // total delta is 0 -> shares NULL (nothing to attribute)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("share"))))
    val rows2 = rows :+ (("d", false, 100L)) // total becomes +100
    val out2 = Attribution.deltaAttribution(rows2.toDF("cell", "pre", "v"),
      Seq("cell"), col("pre"), col("v")).collect()
    assert(out2.map(_.getAs[Long]("delta")).sum == 100L)
    assert(math.abs(out2.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val d = out2.find(_.getString(0) == "d").get
    assert(d.getAs[Long]("pre") == 0 && d.getAs[Long]("post") == 100)
    assert(d.getAs[Double]("share") == 1.0)
  }

  test("deltaAttribution: a cell present in only one period still contributes") {
    val rows = Seq(("only_pre", true, 70L), ("only_post", false, 30L))
    val out = Attribution.deltaAttribution(rows.toDF("cell", "pre", "v"),
      Seq("cell"), col("pre"), col("v")).collect()
    val m = out.map(r => r.getString(0) -> r.getAs[Long]("delta")).toMap
    assert(m == Map("only_pre" -> -70L, "only_post" -> 30L))
  }
}
