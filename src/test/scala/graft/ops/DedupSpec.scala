package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("w1", "a1", 1), ("w1", "a1", 2), ("w1", "a1", 3), // triple dup
    ("w1", "a2", 4),
    ("w2", "a1", 5), ("w2", "a1", 6),                  // double dup
    ("w3", "a3", 7)                                    // unique
  ).toDF("wallet", "address", "seq")

  test("D1 keepFirst keeps exactly one row per key, deterministic survivor") {
    val out = Dedup.keepFirst(df, Seq("wallet", "address"), Seq(col("seq")))
      .orderBy("seq").as[(String, String, Int)].collect()
    assert(out.toSeq == Seq(("w1", "a1", 1), ("w1", "a2", 4), ("w2", "a1", 5), ("w3", "a3", 7)))
  }

  test("D1 keepAny keeps one row per key (survivor arbitrary)") {
    val out = Dedup.keepAny(df, Seq("wallet", "address"))
    assert(out.count() == 4)
    assert(Dedup.audit(out, Seq("wallet", "address")).isEmpty)
  }

  test("D2 removeAllDuplicated removes every row of a duplicated key — not keep-first") {
    val out = Dedup.removeAllDuplicated(df, Seq("wallet", "address"))
      .as[(String, String, Int)].collect()
    // w1/a1 (3 rows) and w2/a1 (2 rows) vanish entirely
    assert(out.toSet == Set(("w1", "a2", 4), ("w3", "a3", 7)))
  }

  test("D3 nullMaskDuplicates preserves row count and masks dup measures") {
    val out = Dedup.nullMaskDuplicates(df, Seq("wallet", "address"),
      Seq(col("seq")), maskCols = Seq("seq"))
    assert(out.count() == 7)
    // nulled rows = total - distinct keys = 7 - 4
    assert(out.filter(col("seq").isNull).count() == 3)
    // sum over masked column counts each key once
    assert(out.agg(sum("seq")).head().getLong(0) == (1 + 4 + 5 + 7))
  }

  test("D4 audit reports duplicated keys, most-duplicated first") {
    val out = Dedup.audit(df, Seq("wallet", "address"))
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("w1", "a1", 3L), ("w2", "a1", 2L)))
  }
}
