package graft.operators

import graft.SparkSpec
import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bloom sketch: no false negatives, bounded false positives") {
    val members = (0L until 2000L).map(i => s"doc-$i").toDF("s")
    val sketch = members
      .agg(BloomFunctions.bloom_agg(xxhash64($"s"), 2000L, fpp = 0.01))
      .head().getAs[Array[Byte]](0)
    // every inserted value must probe positive
    val missed = members
      .filter(!BloomFunctions.might_contain(sketch, xxhash64($"s"))).count()
    assert(missed == 0)
    // non-members probe positive at ~fpp, not wholesale
    val others = (0L until 2000L).map(i => s"other-$i").toDF("s")
    val fp = others
      .filter(BloomFunctions.might_contain(sketch, xxhash64($"s"))).count()
    assert(fp < 100, s"false-positive count $fp far above the 1% design point")
  }

  test("newDocs equals the brute-force text set difference") {
    // texts 0..49 in history; batch carries 25 dups (text 0..24 again
    // under new ids) and 25 genuinely new texts
    val history = (0 until 50).map(i => (i.toLong, s"text number $i")).toDF("doc_id", "text")
    val batch = ((100 until 125).map(i => (i.toLong, s"text number ${i - 100}")) ++
                 (125 until 150).map(i => (i.toLong, s"fresh text $i"))).toDF("doc_id", "text")
    val got = IncrementalDedup.newDocs(batch, history, "text", expectedItems = 50L)
      .select("doc_id").as[Long].collect().toSet
    val expected = batch.join(history.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got == (125L until 150L).toSet)
  }

  test("a digest collision is routed to verify, not declared a dup") {
    // force the worst case by making the verify path compare texts:
    // two DIFFERENT texts in batch vs history — even if their digests
    // collided, the text re-check must keep the batch row
    val history = Seq((1L, "alpha")).toDF("doc_id", "text")
    val batch = Seq((2L, "alpha"), (3L, "beta")).toDF("doc_id", "text")
    val got = IncrementalDedup.newDocs(batch, history, "text", expectedItems = 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("empty history passes the whole batch through") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = IncrementalDedup.newDocs(batch, history, "text", expectedItems = 10L)
    assert(got.count() == 2)
  }
}
