package graft.operators

import graft.SparkSpec

class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minLen: Int,
                    seedLen: Int = 4): Seq[(Long, Long, Long, Long)] =
    SubstrDedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "text", "doc_id",
        minLen = minLen, seedLen = seedLen)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  // a deterministic "unique filler" alphabet so non-planted regions
  // can never accidentally repeat a minLen window
  private def filler(seed: Int, n: Int): String =
    Iterator.iterate(seed.toLong)(x => x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(x => ('a' + math.floorMod(x, 26L).toInt).toChar)
      .take(n).mkString

  test("cross-doc duplicated substring is found with exact boundaries") {
    val dup = "THE-QUICK-BROWN-FOX!"  // 20 chars, planted in both docs
    val a = filler(1, 30) + dup + filler(2, 25)
    val b = filler(3, 10) + dup + filler(4, 45)
    val out = spans(Seq((1L, a), (2L, b)), minLen = 20)
    // windows of length 20 at exactly the planted offsets (filler is
    // unique), so each doc gets one span [off, off+20) of 1 window
    assert(out === Seq((1L, 30L, 50L, 1L), (2L, 10L, 30L, 1L)))
  }

  test("exact duplicate docs cover their full text as ONE merged span") {
    val t = filler(7, 100)
    val out = spans(Seq((1L, t), (2L, t)), minLen = 40)
    // every window start 0..60 is covered -> one island per doc,
    // span [0, 100), 61 window starts
    assert(out === Seq((1L, 0L, 100L, 61L), (2L, 0L, 100L, 61L)))
  }

  test("self-repeat within one doc is covered; gap > minLen splits islands") {
    val motif = filler(11, 24)
    // motif at offsets 0 and 84 (gap 60 > 24): two islands
    val t = motif + filler(12, 60) + motif
    val out = spans(Seq((1L, t)), minLen = 24)
    assert(out === Seq((1L, 0L, 24L, 1L), (1L, 84L, 108L, 1L)))
  }

  test("non-power-of-two minLen: the overlapping cap level is exact " +
       "(a 39-char shared prefix does NOT qualify at minLen 40)") {
    val shared39 = filler(21, 39)
    val a = shared39 + "X" + filler(22, 20)
    val b = shared39 + "Y" + filler(23, 20)
    assert(spans(Seq((1L, a), (2L, b)), minLen = 40) === Seq.empty)
    // one more shared char and it qualifies, at exactly one window
    val a2 = shared39 + "Z" + filler(24, 20)
    val b2 = shared39 + "Z" + filler(25, 20)
    assert(spans(Seq((1L, a2), (2L, b2)), minLen = 40)
      === Seq((1L, 0L, 40L, 1L), (2L, 0L, 40L, 1L)))
  }

  test("multibyte text: offsets and lengths count CHARACTERS, not " +
       "bytes (the zh-document contract shared with the oracle)") {
    // 20 CJK chars (60 UTF-8 bytes) planted in two docs; minLen 20
    // must find exactly the 20-CHAR window at char offsets
    val dup = "数据重复检测前缀倍增排名类子串覆盖合并精"
    assert(dup.length === 20)
    val a = filler(51, 12) + dup + filler(52, 9)
    val b = dup + filler(53, 30)
    val out = spans(Seq((1L, a), (2L, b)), minLen = 20)
    assert(out === Seq((1L, 12L, 32L, 1L), (2L, 0L, 20L, 1L)))
  }

  test("docs shorter than minLen never participate") {
    val t = filler(31, 50)
    assert(spans(Seq((1L, t), (2L, t.take(20)), (3L, t.take(20))),
      minLen = 40) === Seq.empty)
  }

  test("adjacent coverage merges: two disjoint dup windows touching " +
       "end-to-start form one contiguous span") {
    // plant motif of exactly 2*minLen so windows at starts 0..minLen
    // are all duplicated -> one span of length 2*minLen
    val motif = filler(41, 32)
    val a = motif + filler(42, 30)
    val b = filler(43, 15) + motif + filler(44, 12)
    val out = spans(Seq((1L, a), (2L, b)), minLen = 16)
    assert(out === Seq((1L, 0L, 32L, 17L), (2L, 15L, 47L, 17L)))
  }
}
