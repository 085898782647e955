package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("candidates: each record pairs with exactly its window successors") {
    // distinct texts with distinct min-keys → candidate count is
    // exactly Σ min(window, n-1-rank) — the fixed budget SNM promises
    val d = docs((1L to 8L).map(i =>
      i -> s"unique document number $i with its own words $i$i"): _*)
    val c = Blocking.sortedNeighborhoodCandidates(d, "text", "doc_id",
      window = 3).collect()
    assert(c.length == 7 + 6 + 5) // n=8, w=3: (n-1)+(n-2)+(n-3)
    assert(c.map(r => (r.getLong(0), r.getLong(1))).distinct.length == c.length)
    c.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("exact duplicates collapse before blocking") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon", // exact copy of 1
      3L -> "alpha beta gamma delta epsilon", // exact copy of 1
      4L -> "zeta eta theta iota kappa")
    val c = Blocking.sortedNeighborhoodCandidates(d, "text", "doc_id",
      window = 3).collect()
    // two reps (min-id 1 and 4) → exactly one candidate pair
    assert(c.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 4L)))
  }

  test("near-duplicates share the min shingle and land adjacent") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d = docs(
      10L -> base,
      11L -> (base + " extra"), // near-dup: shares the min shingle whp
      12L -> "completely different content about spark catalyst optimizer rules",
      13L -> "another unrelated document mentioning parquet column pruning")
    val pairs = Blocking.sortedNeighborhoodPairs(d, "text", "doc_id",
      window = 1, minJaccard = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((10L, 11L)))
  }

  test("verified pairs match a brute-force jaccard over the same window") {
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "p q r s t u v w",
      4L -> "p q r s t u v y")
    val got = Blocking.sortedNeighborhoodPairs(d, "text", "doc_id",
        window = 3, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // window 3 over 4 reps covers every pair → equals the full
    // all-pairs jaccard >= 0.3 result
    assert(got == Set((1L, 2L), (3L, 4L)))
  }
}
