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

  private def packFfd(rows: Seq[(Long, Long)], budget: Long, shards: Int,
                      maxOpenBins: Int = 64) =
    Packing.packFirstFitDecreasing(rows.toDF("id", "w"), "id", "w",
        budget, shards, maxOpenBins)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3))

  test("FFD backfills gaps the greedy scan wastes") {
    // weights desc: 6,5,4,3,2 at budget 10 -> FFD: [6,4] [5,3,2] = 2 bins;
    // greedy in id order (6,5,4,3,2) -> [6] [5,4] [3,2] = 3 bins
    val rows = Seq((0L, 6L), (1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L))
    val ffd = packFfd(rows, budget = 10, shards = 1)
    assert(ffd.map(_._2).distinct.size == 2)
    assert(pack(rows, budget = 10, shards = 1).map(_._2).distinct.size == 3)
    assert(ffd.map { case (_, bin, id, _) => id -> bin }.toMap ==
      Map(0L -> 0L, 2L -> 0L, 1L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("FFD: no bin exceeds budget, every doc packed exactly once") {
    val rows = (0L until 500L).map(i => (i, (i * 37 % 120) + 1))
    val packed = Packing.packFirstFitDecreasing(rows.toDF("id", "w"),
      "id", "w", budget = 256, shards = 8)
    val over = Packing.packStats(packed, 256)
      .filter(col("bin_weight") > 256 && col("n_docs") > 1)
    assert(over.count() == 0)
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
  }

  test("FFD needs no more bins than greedy on the same corpus") {
    val rows = (0L until 500L).map(i => (i, (i * 37 % 120) + 1))
    def bins(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "bin").distinct().count()
    val g = bins(Packing.packGreedy(rows.toDF("id", "w"), "id", "w", 256, 8))
    val f = bins(Packing.packFirstFitDecreasing(rows.toDF("id", "w"),
      "id", "w", 256, 8))
    assert(f <= g, s"FFD used $f bins vs greedy $g")
  }

  test("FFD oversize docs close immediately and never block the open list") {
    // open-bin cap of 1: the oversize doc must not evict the usable bin
    val rows = Seq((0L, 50L), (1L, 4L), (2L, 4L), (3L, 4L))
    val got = packFfd(rows, budget = 10, shards = 1, maxOpenBins = 1)
    // desc order: 50 (own bin, closed), then 4,4 share a bin, 4 overflows
    val byId = got.map { case (_, bin, id, _) => id -> bin }.toMap
    assert(byId(0L) != byId(1L))
    assert(byId(1L) == byId(2L))
    assert(byId(3L) != byId(1L))
  }

  test("FFD bounded open-bin list still packs when the cap saturates") {
    // many half-full bins force evictions at maxOpenBins=2; correctness
    // (coverage + budget) must survive the quality loss
    val rows = (0L until 40L).map(i => (i, 6L)) // budget 10: one per bin... 6+6>10
    val packed = Packing.packFirstFitDecreasing(rows.toDF("id", "w"),
      "id", "w", budget = 10, shards = 2, maxOpenBins = 2)
    assert(packed.count() == 40)
    val over = Packing.packStats(packed, 10)
      .filter(col("bin_weight") > 10 && col("n_docs") > 1)
    assert(over.count() == 0)
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

  test("lengthBuckets: quartile edges, per-bucket waste, single-bucket degenerate") {
    // weights 1..8: quartile edges 2.75 / 4.5 / 6.25 → buckets
    // {1,2} {3,4} {5,6} {7,8}
    val docs = (1L to 8L).map(i => (i, i)).toDF("doc_id", "w")
    val out = Packing.lengthBuckets(docs, "doc_id", "w", numBuckets = 4)
      .orderBy($"bucket")
      .as[(Int, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) == Seq(
      (0, 2L, 1L, 2L, 3L, 1L),    // waste: 2·2 − 3 = 1
      (1, 2L, 3L, 4L, 7L, 1L),
      (2, 2L, 5L, 6L, 11L, 1L),
      (3, 2L, 7L, 8L, 15L, 1L)))
    assert(out.forall(r => r._7 == math.rint(
      r._6.toDouble / (r._2 * r._4) * 1e6) / 1e6))
    // numBuckets = 1: the whole corpus pads to the global max
    val one = Packing.lengthBuckets(docs, "doc_id", "w", numBuckets = 1)
      .as[(Int, Long, Long, Long, Long, Long, Double)].collect()
    assert(one.toSeq == Seq((0, 8L, 1L, 8L, 36L, 28L, 0.4375)))
    // bucketing strictly reduces total waste vs the single bucket
    assert(out.map(_._6).sum < 28L)
  }
}
