package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha body text", "a"), (2L, "alpha body text", "a"),
    (3L, "beta text", "a"), (4L, "gamma text", "b"),
    (5L, "delta", "b"), (6L, "epsilon text", "b"), (7L, "zeta text", "c")
  ).toDF("doc_id", "text", "source")

  // a DIFFERENT composition than t48: dedup first, then a length
  // filter, then a per-source cap — proving stages are order-pluggable
  private def stages: Seq[Curation.Stage] = Seq(
    "exact_dedup" -> { (in: DataFrame) =>
      in.groupBy($"text")
        .agg(min($"doc_id").as("doc_id"), first($"source").as("source"))
    },
    "len_filter" -> { (in: DataFrame) => in.filter(length($"text") >= 9) },
    "source_cap" -> { (in: DataFrame) =>
      graft.ops.Mixing.sampleQuotas(in, "source", "doc_id",
        Map.empty, defaultQuota = 1)
    })

  test("runner output equals the hand-wired composition") {
    val run = Curation.run(corpus, stages)
    val manual = stages.foldLeft(corpus) { case (df, (_, f)) => f(df) }
    assert(run.output.select($"doc_id").as[Long].collect().sorted.toSeq ==
           manual.select($"doc_id").as[Long].collect().sorted.toSeq)
  }

  test("ledger chains: docs_in of stage k = docs_out of stage k-1") {
    val rows = Curation.run(corpus, stages).ledger
      .select($"step", $"stage", $"docs_in", $"docs_out")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("exact_dedup", "len_filter", "source_cap"))
    assert(rows.head._3 == 7L) // raw corpus in
    assert(rows.head._4 == 6L) // one exact dup dropped
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next._3 == prev._4,
        s"stage ${next._2} docs_in ${next._3} != prior docs_out ${prev._4}")
    case _ => ()
    }
    // per-source cap of 1 over the filtered survivors
    val last = rows.last
    assert(last._4 <= 3L && last._4 > 0L)
  }

  test("empty stage list is rejected") {
    intercept[IllegalArgumentException] {
      Curation.run(corpus, Seq.empty)
    }
  }

  test("custom materializer runs once per stage (warehouse write-table hook)") {
    var calls = 0
    val run = Curation.run(corpus, stages, df => { calls += 1; df })
    run.ledger.collect()
    assert(calls == stages.size)
    // identity materializer changes no results, only the boundary
    assert(run.output.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Curation.run(corpus, stages).output
        .select($"doc_id").as[Long].collect().sorted.toSeq)
  }
}
