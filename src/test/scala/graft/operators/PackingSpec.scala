package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long, shards: Int) =
    Packing.packGreedy(rows.toDF("id", "w"), "id", "w", budget, shards)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3))

  test("greedy contiguous fill within one shard") {
    // budget 10: [3,4] fill bin 0 (7), 5 overflows -> bin 1, [5,2] (7),
    // 9 overflows -> bin 2
    val got = pack(Seq((0L, 3L), (1L, 4L), (2L, 5L), (3L, 2L), (4L, 9L)),
      budget = 10, shards = 1)
    assert(got.map { case (_, bin, id, _) => id -> bin } ==
      Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("oversize doc occupies its own bin; packing continues after it") {
    val got = pack(Seq((0L, 50L), (1L, 2L), (2L, 2L)), budget = 10, shards = 1)
    assert(got.map { case (_, bin, id, _) => id -> bin } ==
      Seq(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("bins never cross shards and numbering restarts per shard") {
    val rows = (0L until 20L).map(i => (i, 3L))
    val got = pack(rows, budget = 7, shards = 4)
    // shard = id % 4 -> 5 docs each, 2 per bin (3+3=6 <= 7, +3 > 7)
    assert(got.groupBy(_._1).keySet == Set(0L, 1L, 2L, 3L))
    got.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(_._2).distinct.sorted == Seq(0L, 1L, 2L))
    }
    // every doc is in the shard its id hashes to
    got.foreach { case (shard, _, id, _) => assert(shard == id % 4) }
  }

  test("no bin exceeds budget unless it holds a single oversize doc") {
    val rows = (0L until 500L).map(i => (i, (i * 37 % 120) + 1))
    val packed = Packing.packGreedy(rows.toDF("id", "w"), "id", "w",
      budget = 256, shards = 8)
    val over = Packing.packStats(packed, 256)
      .filter(col("bin_weight") > 256 && col("n_docs") > 1)
    assert(over.count() == 0)
    // and every doc survives packing exactly once
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
  }

  test("packStats reports fill fractions capped at 1") {
    val packed = Packing.packGreedy(
      Seq((0L, 50L), (1L, 4L), (2L, 4L)).toDF("id", "w"), "id", "w",
      budget = 10, shards = 1)
    val stats = Packing.packStats(packed, 10)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(stats.map(s => (s._2, s._3, s._4, s._5)).toSeq ==
      Seq((0L, 1L, 50L, 1.0), (1L, 2L, 8L, 0.8)))
  }
}
