package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val longText =
    ("the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts calibrate the orbital spectrometer against a field of " +
      "reference stars and the ground station logs every correction " +
      "burst into the nightly telemetry archive for later replay").trim

  test("contentChunks: concatenation round-trips the original text") {
    val docs = Seq((1L, longText), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val back = Chunking.contentChunks(docs, "doc_id", "text")
      .groupBy(col("doc_id"))
      .agg(concat_ws("", array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val m = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == longText)
    assert(m(2L) == "short")
    assert(!m.contains(3L)) // empty text -> zero chunks
  }

  test("contentChunks: sizes within [minLen, maxLen] except the last, starts contiguous") {
    val docs = Seq((1L, longText)).toDF("doc_id", "text")
    val rows = Chunking.contentChunks(docs, "doc_id", "text")
      .orderBy(col("chunk_idx")).collect()
    assert(rows.length > 1)
    var expectStart = 1
    rows.zipWithIndex.foreach { case (r, i) =>
      val start = r.getAs[Int]("start")
      val len = r.getAs[Int]("len")
      assert(start == expectStart, s"chunk $i start")
      assert(len <= 96, s"chunk $i over maxLen")
      if (i < rows.length - 1) assert(len >= 24, s"chunk $i under minLen")
      assert(len == r.getAs[String]("chunk").length)
      expectStart += len
    }
  }

  test("contentChunks: boundaries resynchronize after an inserted prefix") {
    val docs = Seq((1L, longText),
      (2L, "THIS ENTIRELY NEW PREFIX SHIFTS EVERYTHING " + longText))
      .toDF("doc_id", "text")
    val sets = Chunking.contentChunks(docs, "doc_id", "text")
      .select(col("doc_id"), col("chunk"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val sharedFrac = (sets(1L) & sets(2L)).size.toDouble / sets(1L).size
    // a 43-char insert can only perturb the chunks overlapping it; CDC
    // recovers every boundary at least one window past the edit
    assert(sharedFrac >= 0.5, s"only $sharedFrac of chunks survived the shift")
  }

  test("contentChunks: a fixed-stride splitter loses what CDC keeps") {
    val shifted = "X " + longText
    def strideChunks(s: String): Set[String] =
      s.grouped(56).toSet
    val fixedShared = (strideChunks(longText) & strideChunks(shifted)).size
    assert(fixedShared == 0) // every fixed-offset window moved
  }

  test("chunkNearDups: recovers a planted shifted duplicate and nothing else") {
    val unrelated = "completely different content about maritime navigation " +
      "charts and the tidal tables used by harbor pilots every morning " +
      "before the first container vessel clears the breakwater channel"
    val docs = Seq(
      (1L, longText),
      (2L, "INSERTED PREFACE " + longText),
      (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Chunking.chunkNearDups(docs, "doc_id", "text", minJaccard = 0.3)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val j = pairs.head.getAs[Double]("jaccard")
    assert(j >= 0.3 && j <= 1.0)
  }

  test("contentChunks: anchor rule matches an independent window-hash replay") {
    // recompute every boundary's trailing-window hash directly and
    // assert the cut either satisfies hash%32==0 or was forced by
    // maxLen / end-of-text — the FastCDC contract, independent of the
    // kernel's incremental rolling update
    val docs = Seq((1L, longText)).toDF("doc_id", "text")
    val rows = Chunking.contentChunks(docs, "doc_id", "text")
      .orderBy(col("chunk_idx")).collect()
    def windowHash(endExclusive: Int): Long = {
      var h = 0L
      (endExclusive - 16 until endExclusive).foreach { i =>
        h = (h * 257 + longText.codePointAt(i)) % 2147483647L
      }
      h
    }
    var pos = 0
    rows.dropRight(1).foreach { r =>
      pos += r.getAs[Int]("len")
      val forced = r.getAs[Int]("len") == 96
      assert(forced || windowHash(pos) % 32 == 0,
        s"cut at $pos neither anchor nor forced")
    }
  }
}
