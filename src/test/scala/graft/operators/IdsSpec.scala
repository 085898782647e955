package graft.operators

import graft.SparkSpec

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("denseIds equals the global rank across many input partitions") {
    // 7919 is coprime with 1000, so v is a bijection of k — a total
    // order with values scattered across 13 input partitions
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("v", ($"k" * 7919) % 1000)
      .repartition(13)
    val got = Ids.denseIds(df, "id", Seq($"v".asc, $"k".asc),
        numPartitions = Some(7))
      .select($"v", $"k", $"id").collect()
    val sorted = got.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(sorted.map(_.getLong(2)).toSeq == (0L until 1000L).toSeq)
    assert(got.map(_.getLong(2)).toSet.size == 1000) // dense, no gaps
  }

  test("denseIds: descending order, empty frame, arg guard") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id0", "n")
    val got = Ids.denseIds(df, "rank", Seq($"n".desc, $"id0".asc))
      .select($"id0", $"rank").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 0L, 3L -> 1L, 1L -> 2L))
    val empty = Ids.denseIds(df.filter($"n" > 100), "rank", Seq($"n".asc))
    assert(empty.count() == 0 && empty.columns.contains("rank"))
    intercept[IllegalArgumentException] {
      Ids.denseIds(df, "rank", Seq.empty)
    }
  }

  test("epochShuffle: dense per-epoch permutations, distinct across epochs, reproducible") {
    val df = (0L until 100L).toDF("id")
    val out = Ids.epochShuffle(df, "id", epochs = 3)
      .as[(Long, Int, Long)].collect()
    val byEpoch = out.groupBy(_._2)
    assert(byEpoch.keySet == Set(0, 1, 2))
    byEpoch.values.foreach { rows =>
      // every epoch is a dense permutation of [0, N)
      assert(rows.map(_._3).sorted.toSeq == (0L until 100L))
      assert(rows.map(_._1).sorted.toSeq == (0L until 100L))
    }
    // different epochs produce different orders
    def orderOf(e: Int) = byEpoch(e).sortBy(_._3).map(_._1).toSeq
    assert(orderOf(0) != orderOf(1) && orderOf(1) != orderOf(2))
    // and the order is a pure function of (epoch, id): re-running agrees
    val again = Ids.epochShuffle(df, "id", epochs = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.toSet == again.toSet)
  }

  test("shardAssign: balanced shards, in-shard ranks reconstruct the global order") {
    val df = (0L until 250L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val assigned = Ids.shardAssign(df,
      Seq(org.apache.spark.sql.functions.md5($"id".cast("string")), $"id"),
      rowsPerShard = 64)
    val rows = assigned.select($"id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect()
    // every shard except the last is exactly full; the last takes the rest
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(0 -> 64, 1 -> 64, 2 -> 64, 3 -> 58))
    // shard * 64 + shard_pos is a dense permutation of [0, N) that
    // agrees with the reference md5 global order
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 250L).sortBy(i => (md5hex(i.toString), i))
      .zipWithIndex.map { case (id, pos) => id -> pos.toLong }.toMap
    rows.foreach { case (id, shard, pos) =>
      assert(shard * 64L + pos == expected(id), s"id $id")
    }
    // manifest aggregates per shard: counts and weight sums
    val manifest = Ids.shardManifest(assigned, "id", "w")
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(manifest.keySet == Set(0, 1, 2, 3))
    assert(manifest.values.map(_._2).sum == 250L)
    assert(manifest.values.map(_._5).sum ==
      (0L until 250L).map(_ % 7 + 1).sum)
    intercept[IllegalArgumentException] {
      Ids.shardAssign(df, Seq($"id"), rowsPerShard = 0)
    }
  }

  test("epochShuffle projects payload away; epochShuffleRows carries it; same permutation") {
    val df = (0L until 50L).map(i => (i, s"payload$i")).toDF("id", "text")
    val proj = Ids.epochShuffle(df, "id", epochs = 2)
    // the permutation table never carries payload columns — that is
    // the epochs× write-amplification the projected form exists to avoid
    assert(proj.columns.toSeq == Seq("id", "epoch", "epoch_pos"))
    val full = Ids.epochShuffleRows(df, "id", epochs = 2)
    assert(full.columns.toSet == Set("id", "text", "epoch", "epoch_pos"))
    val p = proj.as[(Long, Int, Long)].collect().toSet
    val f = full.select($"id", $"epoch", $"epoch_pos")
      .as[(Long, Int, Long)].collect().toSet
    assert(p == f) // identical permutation either way
    // joining the permutation back reconstructs the full-row form
    val rejoined = proj.join(df, "id")
      .select($"id", $"text", $"epoch", $"epoch_pos")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(rejoined ==
      full.select($"id", $"text", $"epoch", $"epoch_pos")
        .as[(Long, String, Int, Long)].collect().toSet)
  }

  test("rendezvousShards: growing N moves ~1/(N+1) of ids, all onto the " +
       "new shard, and keeps shards balanced") {
    val ids = (0L until 2000L).toDF("id")
    val b = Ids.rendezvousShards(ids, "id", 10, "s10")
    val a = Ids.rendezvousShards(b, "id", 11, "s11")
    val rows = a.select($"id", $"s10", $"s11")
      .as[(Long, Int, Int)].collect()
    assert(rows.length == 2000)
    // every assignment in range
    assert(rows.forall(r => r._2 >= 0 && r._2 < 10 && r._3 >= 0 && r._3 < 11))
    // HRW invariant: an id moves iff the NEW shard's score wins, so
    // every mover's destination is shard 10 — structural, not statistical
    val movers = rows.filter(r => r._2 != r._3)
    assert(movers.nonEmpty && movers.forall(_._3 == 10))
    // expected movement = 1/11 ≈ 0.0909 of 2000 ids (binomial sd ≈ 0.0064)
    val frac = movers.length.toDouble / rows.length
    assert(math.abs(frac - 1.0 / 11) < 0.03, s"moved frac $frac")
    // balance: each of the 10 old shards holds ~200 ids
    val counts = rows.groupBy(_._2).view.mapValues(_.size)
    assert(counts.values.forall(c => c > 120 && c < 280), counts.toMap)
    // non-movers keep their shard (consistency for the 10/11 overlap)
    assert(rows.filter(r => r._2 == r._3).forall(r => r._2 == r._3))
  }

  test("rendezvousShardsTwoLevel: movement stays ~1/N, movers land on the " +
       "new shard, other groups untouched") {
    val ids = (0L until 20000L).toDF("id")
    val b = Ids.rendezvousShardsTwoLevel(ids, "id", 100, 10, "s100")
    val a = Ids.rendezvousShardsTwoLevel(b, "id", 101, 10, "s101")
    val rows = a.select($"id", $"s100", $"s101").as[(Long, Int, Int)].collect()
    assert(rows.forall(r => r._2 >= 0 && r._2 < 100 && r._3 >= 0 && r._3 < 101))
    val movers = rows.filter(r => r._2 != r._3)
    // shard 100 joins group 100 % 10 = 0 — ids whose old shard is in
    // any OTHER group cannot move (structural: their candidate set is
    // unchanged), and every mover lands on the new shard
    assert(movers.forall(_._3 == 100))
    assert(movers.forall(_._2 % 10 == 0))
    val frac = movers.length.toDouble / rows.length
    // expected 1/101 ≈ 0.0099 (binomial sd ≈ 0.0007)
    assert(frac > 0.004 && frac < 0.018, s"moved frac $frac")
    // group assignment is id-stable: rerunning gives identical shards
    val again = Ids.rendezvousShardsTwoLevel(ids, "id", 100, 10, "s100")
      .as[(Long, Int)].collect().toMap
    assert(rows.forall(r => again(r._1) == r._2))
  }
}
