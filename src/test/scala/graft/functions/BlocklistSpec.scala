package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: per-term greedy indexOf-advance counting. */
  private def naiveCounts(text: String, terms: Seq[String]): Map[String, Long] =
    terms.map { t =>
      var i = 0
      var n = 0L
      var at = text.indexOf(t, i)
      while (at >= 0) { n += 1; i = at + t.length; at = text.indexOf(t, i) }
      t -> n
    }.toMap

  test("AhoCorasick.scan matches indexOf-advance on nested/overlapping terms") {
    val terms = Array("merge", "merge slow", "aa", "ab", "b", "never")
    val ac = new AhoCorasick(terms)
    val texts = Seq(
      "merge slow merge fast merge slowly",
      "aaaa abab baab",
      "", "b", "merge", "xmerge slowx",
      "aa merge slow aa b merge")
    texts.foreach { tx =>
      val ref = naiveCounts(tx, terms.toSeq)
      val (nTerms, total) = ac.scan(tx)
      assert(nTerms == ref.count(_._2 > 0), s"n_terms for '$tx'")
      assert(total == ref.values.sum, s"total for '$tx'")
    }
  }

  test("non-overlapping rule: 'aa' in 'aaaaa' counts 2, not 4") {
    val ac = new AhoCorasick(Array("aa"))
    assert(ac.scan("aaaaa") == ((1, 2L)))
  }

  test("stamp reset: repeated scans on one thread do not leak state") {
    val ac = new AhoCorasick(Array("x", "yz"))
    assert(ac.scan("x yz x") == ((2, 3L)))
    assert(ac.scan("nothing here") == ((0, 0L)))
    assert(ac.scan("yz") == ((1, 1L)))
  }

  test("multi_contains as a column: struct fields and null text") {
    val df = Seq((1L, Some("alpha beta alpha")), (2L, None: Option[String]))
      .toDF("id", "text")
      .select(col("id"),
        BlocklistFunctions.multi_contains(col("text"),
          Seq("alpha", "beta", "gamma")).as("s"))
      .select(col("id"), col("s.n_terms"), col("s.total_hits"), col("s.blocked"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getInt(1) == 2 && rows(0).getLong(2) == 3L && rows(0).getBoolean(3))
    assert(rows(1).isNullAt(1)) // null text -> null struct
  }

  test("rejects empty and duplicate term lists") {
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty[String]))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "a")))
  }
}
