package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 10000L).toDF("id")

  test("arithmetic split: every row gets exactly one label, deterministically") {
    val out = Splits.assignArithmetic(ids, "id").cache()
    assert(out.count() == 10000)
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // pure function of the key: a second run assigns identically
    val again = Splits.assignArithmetic(ids, "id")
    assert(out.join(again.withColumnRenamed("split", "split2"), "id")
      .filter(col("split") =!= col("split2")).count() == 0)
    out.unpersist()
  }

  test("arithmetic bucket matches the published formula") {
    val got = Splits.assignArithmetic(Seq(0L, 1L, 42L, 999999999L).toDF("id"), "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    def f(id: Long) = ((id % 1000000007L) * 2654435761L) % 1000000007L % 1000L
    for (id <- Seq(0L, 1L, 42L, 999999999L)) assert(got(id) == f(id))
  }

  test("hash split: proportions near the scheme, order-independent") {
    val out = Splits.assignByHash(ids, Seq("id")).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(out("train") - 8000) < 400)   // ±5% absolute
    assert(math.abs(out("val") - 1000) < 200)
    assert(math.abs(out("test") - 1000) < 200)
    // reversing input order moves nothing
    val rev = Splits.assignByHash(ids.orderBy(col("id").desc), Seq("id"))
    assert(Splits.assignByHash(ids, Seq("id"))
      .join(rev.withColumnRenamed("split", "split2"), "id")
      .filter(col("split") =!= col("split2")).count() == 0)
  }

  test("different salts re-deal the assignment") {
    val a = Splits.assignByHash(ids, Seq("id"), salt = "a")
      .withColumnRenamed("split", "sa")
    val b = Splits.assignByHash(ids, Seq("id"), salt = "b")
      .withColumnRenamed("split", "sb").drop("bucket")
    val moved = a.join(b, "id").filter(col("sa") =!= col("sb")).count()
    assert(moved > 1000)  // independent 80/10/10 deals agree ~66% of the time
  }

  test("leak-free split: near-dup pairs never straddle splits; per-doc split does") {
    // 2000 docs in 1000 near-dup pairs (2k, 2k+1) — enough pairs that a
    // per-document split straddles some with overwhelming probability
    val docs = (0L until 2000L).toDF("doc_id")
    val pairs = (0L until 1000L).map(k => (2 * k, 2 * k + 1))
      .toDF("id_a", "id_b")
    val safe = Splits.assignLeakFree(docs, "doc_id", pairs, "id_a", "id_b")
    assert(safe.count() == 2000L) // every doc assigned exactly once
    val safeMap = safe.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val straddleSafe = (0L until 1000L).count(k =>
      safeMap(2 * k) != safeMap(2 * k + 1))
    assert(straddleSafe == 0)
    // contrast: the per-document assignment leaks across pairs
    val leakyMap = Splits.assignArithmetic(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val straddleLeaky = (0L until 1000L).count(k =>
      leakyMap(2 * k) != leakyMap(2 * k + 1))
    assert(straddleLeaky > 0)
    // singleton docs (no pairs) split exactly as the per-doc arithmetic
    val singles = Seq(5001L, 5002L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val s = Splits.assignLeakFree(singles, "doc_id", noPairs, "id_a", "id_b")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val ref = Splits.assignArithmetic(singles, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(s == ref)
  }

  test("scheme validation: shares must be positive permille summing to 1000") {
    intercept[IllegalArgumentException] {
      Splits.assignArithmetic(ids, "id", Seq("train" -> 500, "val" -> 100))
    }
    intercept[IllegalArgumentException] {
      Splits.assignByHash(ids, Seq("id"), Seq("all" -> 1100, "none" -> -100))
    }
  }
}
