package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed rule sequence, early exhaustion") {
    // word freqs: abab ×3, abc ×2
    // step 1: (a,b) = 3·2 + 2·1 = 8 → abab=[ab,ab], abc=[ab,c]
    // step 2: (ab,ab) = 3 beats (ab,c) = 2
    // step 3: (ab,c) = 2; then no pairs remain → stops at 3 of 10
    val docs = Seq("abab abab abc", "abab abc").toDF("text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 10)
      .orderBy($"step")
      .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "b", "ab", 8L, 8L, 0L),
      (2, "ab", "ab", "abab", 3L, 3L, 0L),
      (3, "ab", "c", "abc", 2L, 2L, 0L)))
  }

  test("learnMerges: overlapping runs count pairs but merge non-overlapping") {
    // "aaa" has TWO (a,a) pairs but a left-to-right pass merges ONE:
    // applied < pair_count, and no (a,a) adjacency survives ([aa, a])
    val docs = Seq("aaa").toDF("text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", "aa", 2L, 1L, 0L)))
  }

  test("learnMerges: equal counts tie-break by (left, right) ascending") {
    val docs = Seq("xy zw").toDF("text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, String, Long, Long, Long)].collect().head
    assert((got._2, got._3) == (("x", "y"))) // (x,y) < (z,w)
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(docs, "text", numMerges = 0)
    }
  }

  test("bpe_merge column: left-to-right non-overlapping application") {
    val got = Seq(Seq("a", "b", "a", "b", "b")).toDF("syms")
      .select(graft.functions.TextFunctions.bpe_merge($"syms", "a", "b").as("m"))
      .as[Seq[String]].collect().head
    assert(got == Seq("ab", "ab", "b"))
  }

  test("bpe_merge column: null symbols pass through unmerged") {
    val got = Seq(Seq("a", null, "a", "b")).toDF("syms")
      .select(graft.functions.TextFunctions.bpe_merge($"syms", "a", "b").as("m"))
      .as[Seq[String]].collect().head
    assert(got == Seq("a", null, "ab"))
  }
}
