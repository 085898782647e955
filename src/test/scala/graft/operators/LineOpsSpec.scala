package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def lines(text: String, len: Int): Seq[String] =
    Seq((0L, text)).toDF("id", "text")
      .select(LineOps.lineArray(col("text"), len).as("l"))
      .as[Seq[String]].head()

  test("lineArray: exact windows, short remainder, empty text") {
    assert(lines("a b c d e f", 3) == Seq("a b c", "d e f"))
    assert(lines("a b c d e", 3) == Seq("a b c", "d e"))
    assert(lines("a", 3) == Seq("a"))
    assert(lines("", 3) == Seq.empty)
    assert(lines("   ", 3) == Seq.empty)
    // padded whitespace produces the same lines as single-spaced text
    assert(lines("  a   b  c ", 2) == Seq("a b", "c"))
  }

  test("c4LineFilter: per-line word-count + terminal rule, doc rule") {
    val docs = Seq(
      // line 1 "w w w w end" keeps (5 words, terminal); line 2 "x y" short
      (0L, "w w w w end x y"),
      // both lines keep -> doc kept at minKeptLines=2
      (1L, "a b c d end p q r s end"),
      // 5 words but non-terminal last word -> dropped
      (2L, "a b c d nope")
    ).toDF("doc_id", "text")
    val out = LineOps.c4LineFilter(docs, "doc_id", "text",
        lineLen = 5, minWords = 5, terminals = Seq("end"), minKeptLines = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Boolean, String)].collect()
    assert(out(0) == ((0L, 2, 1, false, "w w w w end")))
    assert(out(1) == ((1L, 2, 2, true, "a b c d end p q r s end")))
    assert(out(2) == ((2L, 1, 0, false, "")))
  }

  test("crossDocLineDedup: corpus boilerplate removed, rare lines kept") {
    // "spam spam" appears in docs 0,1,2 (3 docs > maxDocs=2) -> removed
    // "rare line" appears in docs 0,1 (2 docs) -> kept
    val docs = Seq(
      (0L, "spam spam rare line own words"),
      (1L, "rare line spam spam more text"),
      (2L, "spam spam unique tail"),
      (3L, "entirely distinct body here")
    ).toDF("doc_id", "text")
    val out = LineOps.crossDocLineDedup(docs, "doc_id", "text",
        lineLen = 2, maxDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((0L, 3, 2, "rare line own words")))
    assert(out(1) == ((1L, 3, 2, "rare line more text")))
    assert(out(2) == ((2L, 2, 1, "unique tail")))
    assert(out(3) == ((3L, 2, 2, "entirely distinct body here")))
  }

  test("crossDocLineDedup: fully-boilerplate doc survives with empty text") {
    val docs = Seq(
      (0L, "b b"), (1L, "b b"), (2L, "b b"),
      (3L, "b b x y")
    ).toDF("doc_id", "text")
    val out = LineOps.crossDocLineDedup(docs, "doc_id", "text",
        lineLen = 2, maxDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((0L, 1, 0, "")))
    assert(out(3) == ((3L, 2, 1, "x y")))
  }

  test("dedupLinesWithinDoc: first occurrence survives, order preserved") {
    val docs = Seq(
      // lines (len 2): "a b","c d","a b","e f" -> "a b","c d","e f"
      (0L, "a b c d a b e f"),
      (1L, "x y x y x y"),
      (2L, "solo")
    ).toDF("doc_id", "text")
    val out = LineOps.dedupLinesWithinDoc(docs, "doc_id", "text", lineLen = 2)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((0L, 4, 3, "a b c d e f")))
    assert(out(1) == ((1L, 3, 1, "x y")))
    assert(out(2) == ((2L, 1, 1, "solo")))
  }

  test("crossDocLineDedup: line order preserved through reassembly") {
    // no duplicates at all -> clean_text must equal the line-joined input
    val docs = (0L until 5L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i")).toDF("doc_id", "text")
    val out = LineOps.crossDocLineDedup(docs, "doc_id", "text",
        lineLen = 2, maxDocs = 1)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    for ((row, i) <- out.zipWithIndex) {
      assert(row._2 == 3 && row._3 == 3)
      assert(row._4 ==
        s"alpha$i beta$i gamma$i delta$i epsilon$i")
    }
  }
}
