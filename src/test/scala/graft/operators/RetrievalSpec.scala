package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join join join"),      // tf(join)=3, dl=4
    (2L, "join hash"),                 // tf(join)=1 tf(hash)=1, dl=2
    (3L, "scan filter scan filter"),   // no query terms
    (4L, "hash hash hash spark")       // tf(hash)=3, dl=4
  ).toDF("doc_id", "text")

  test("bm25: only matching docs scored; higher tf of rarer term wins") {
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("join", "hash"))
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 matches nothing
    // docs 1 and 4 are symmetric (same tf, same dl, both terms df=2):
    // identical scores; doc 2 has lower tf but much shorter dl
    assert(math.abs(out(1L) - out(4L)) < 1e-9)
    assert(out.values.forall(_ > 0.0))
  }

  test("bm25 matches the closed-form hand computation") {
    // single term, single doc: idf = ln(1 + (1-1+0.5)/(1+0.5)),
    // w = idf * tf*2.2 / (tf + 1.2*(0.25 + 0.75*dl/avgdl))
    val one = Seq((7L, "x x y")).toDF("doc_id", "text")
    val got = Retrieval.bm25(one, "doc_id", "text", Seq("x"))
      .as[(Long, Double)].head()._2
    val idf = math.log(1.0 + 0.5 / 1.5)
    val expect = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    assert(math.abs(got - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("rrfFuse: ids in both lists outrank single-list ids; ranks dense") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 60)
      .select($"id", $"rrf", $"n_lists", $"fused_rank")
      .as[(Long, Double, Long, Int)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(11L)._4 == 1)               // 1/62 + 1/61 beats any single
    assert(byId(11L)._3 == 2L)
    assert(out.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4))
    // exact values: rank-1 single list = 1/61
    assert(math.abs(byId(10L)._2 - BigDecimal(1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("rankingMetrics: hand-computed recall/precision/MRR/nDCG; " +
       "zero-hit lists get zeros, not dropped rows") {
    // relevant = {1, 2, 3}; k = 3
    // good: ranks 1..3 = [1, 9, 2]  → hits {1@1, 2@3}
    // bad:  ranks 1..3 = [7, 8, 9]  → no hits
    val ranked = Seq(
      ("good", 1L, 1), ("good", 9L, 2), ("good", 2L, 3),
      ("good", 3L, 4), // outside k, must not count
      ("bad", 7L, 1), ("bad", 8L, 2), ("bad", 9L, 3)
    ).toDF("leg", "id", "rank")
    val rel = Seq(1L, 2L, 3L).toDF("id")
    val out = Retrieval.rankingMetrics(ranked, "leg", "id", "rank",
        rel, "id", k = 3)
      .collect().map(r => r.getAs[String]("list") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("hits"),
          r.getAs[Double]("recall"), r.getAs[Double]("precision"),
          r.getAs[Double]("mrr"), r.getAs[Double]("ndcg")))).toMap
    val (nRel, hits, recall, prec, mrr, ndcg) = out("good")
    assert(nRel == 3 && hits == 2)
    assert(recall == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(prec == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(mrr == 1.0) // first relevant at rank 1
    // micro-term DCG: rank1 → 1e6, rank3 → round(1e6/log2(4)) = 5e5;
    // IDCG over ideal ranks 1..3: 1e6 + round(1e6/log2(3)) + 5e5
    val t3 = math.round(1e6 / (math.log(4.0) / math.log(2.0)))
    val i2 = math.round(1e6 / (math.log(3.0) / math.log(2.0)))
    val expNdcg = BigDecimal((1000000.0 + t3) / (1000000L + i2 + t3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ndcg == expNdcg)
    val zero = out("bad")
    assert(zero._2 == 0 && zero._3 == 0.0 && zero._5 == 0.0 &&
      zero._6 == 0.0)
  }

  test("proximityScore: adjacency beats scattered coverage; NULL text " +
       "scores as empty; single-term query has no phrase signal") {
    val scored = Seq(
      (1L, "the hash join window plan"),        // 2 adjacencies, 3 terms, 5 toks
      (2L, "hash scan join scan window scan"),  // 0 adjacencies, 3 terms, 6 toks
      (3L, "hash join here"),                   // 1 adjacency, 2 terms, 3 toks
      (4L, null.asInstanceOf[String])           // empty: score 0
    ).toDF("id", "text")
      .select(col("id"), Retrieval.proximityScore(col("text"),
        Seq("hash", "join", "window")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(scored(1L) === 2L * 1000000 + 3 * 1000 - 5)
    assert(scored(2L) === 3 * 1000 - 6)
    assert(scored(3L) === 1L * 1000000 + 2 * 1000 - 3)
    assert(scored(4L) === 0L)
    val single = Seq((1L, "hash hash"))
      .toDF("id", "text")
      .select(Retrieval.proximityScore(col("text"), Seq("hash")).as("s"))
      .as[Long].head()
    assert(single === 1000 - 2) // coverage only, no pairs
  }

  test("rerank: re-orders the candidate set by the pair score with " +
       "rank-shift audit, per query partition") {
    val cands = Seq(
      // query 0: first stage ranked scattered doc above phrase doc
      (0L, 10L, 1L, "hash scan join scan window"),
      (0L, 20L, 2L, "the hash join window plan"),
      (0L, 30L, 3L, "nothing relevant at all"),
      // query 1: independent partition
      (1L, 10L, 1L, "hash join"),
      (1L, 20L, 2L, "window")
    ).toDF("query_id", "id", "first_rank", "text")
    val out = Retrieval.rerank(cands, Seq("query_id"), "id", "first_rank",
        Retrieval.proximityScore(col("text"),
          Seq("hash", "join", "window")), topK = 2)
      .orderBy("query_id", "rerank")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // query 0: the phrase doc (id 20, first_rank 2) is promoted to 1
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq((0L, 1L, 20L), (0L, 2L, 10L), (1L, 1L, 10L), (1L, 2L, 20L)))
    val promoted = out.head
    assert(promoted._5 === 2L && promoted._6 === 1L) // first_rank 2, shift +1
    // topK enforced: id 3 (rank 3 by score) is cut
    assert(!out.exists(_._3 == 3L))
  }

  test("rerank requires a query partition (no single-task sorts)") {
    val cands = Seq((1L, 1L, "x")).toDF("id", "first_rank", "text")
    intercept[IllegalArgumentException] {
      Retrieval.rerank(cands, Seq.empty, "id", "first_rank", lit(1), 1)
    }
  }
}
