package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("associationRules: hand-computed support/confidence/lift") {
    // 10 baskets; {1,2} together in 4, 1 alone in 2 more, 2 alone in 1
    val rows =
      (1 to 4).flatMap(t => Seq((t.toLong, 1L), (t.toLong, 2L))) ++
      Seq((5L, 1L), (6L, 1L), (7L, 2L)) ++
      (8 to 10).map(t => (t.toLong, 3L))
    val out = Basket.associationRules(rows.toDF("txn", "item"),
      "txn", "item", minSupportCount = 2, topK = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("c_ab") == 4 && r.getAs[Long]("c_a") == 6 &&
      r.getAs[Long]("c_b") == 5)
    assert(r.getAs[Double]("support") == 0.4)
    assert(r.getAs[Double]("confidence") == math.rint(4.0/6*1e6)/1e6)
    assert(r.getAs[Double]("lift") == math.rint(40.0/30*1e6)/1e6)
  }

  test("associationRules: duplicate (txn, item) rows collapse; min support prunes") {
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L))
    val out = Basket.associationRules(rows.toDF("txn", "item"),
      "txn", "item", minSupportCount = 2, topK = 10).collect()
    // only {1,2} co-occurs twice; {3,4} once -> pruned
    assert(out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq ==
      Seq((1L, 2L)))
    assert(out.head.getAs[Long]("c_a") == 2) // dup row did not inflate
  }

  test("associationRules: topK ranks by lift with id tiebreak") {
    // pair (1,2): lift > 1 (always together); pairs (3,4),(3,5): lower
    val rows = (1 to 4).flatMap(t => Seq((t.toLong, 1L), (t.toLong, 2L))) ++
      (5 to 8).flatMap(t => Seq((t.toLong, 3L), (t.toLong, if (t % 2 == 0) 4L else 5L))) ++
      Seq((9L, 4L), (9L, 5L))
    val out = Basket.associationRules(rows.toDF("txn", "item"),
      "txn", "item", minSupportCount = 2, topK = 2).collect()
    assert(out.length == 2)
    assert(out.head.getAs[Double]("lift") >= out.last.getAs[Double]("lift"))
    assert(out.head.getAs[Long]("a") == 1L)
  }
}
