package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate (score,id) pairs occupy one slot, not several") {
    val df = Seq(("g", 1.0, 10L), ("g", 1.0, 10L), ("g", 1.0, 10L),
      ("g", 0.5, 20L), ("g", 0.2, 30L)).toDF("g", "s", "id")
    val got = df.groupBy("g")
      .agg(TopKFunctions.top_k_distinct_by_score(col("s"), col("id"), 2).as("p"))
      .select(explode(col("p")).as("p"))
      .select(col("p.id")).as[Long].collect().toSeq
    // plain top_k_by_score would return (10, 10); distinct keeps 20
    assert(got == Seq(10L, 20L))
  }

  test("matches top_k_by_score on duplicate-free input, best-first with id tiebreak") {
    val rows = (1L to 50L).map(i => ("g", (i % 7).toDouble, i))
    val df = rows.toDF("g", "s", "id")
    def run(c: org.apache.spark.sql.Column) = df.groupBy("g").agg(c.as("p"))
      .select(explode(col("p")).as("p"))
      .select(col("p.score"), col("p.id")).as[(Double, Long)].collect().toSeq
    assert(run(TopKFunctions.top_k_distinct_by_score(col("s"), col("id"), 8)) ==
      run(TopKFunctions.top_k_by_score(col("s"), col("id"), 8)))
  }

  test("merge across partitions preserves the bound and dedup") {
    val df = (1L to 1000L).map(i => ("g", (i % 10).toDouble, i % 5))
      .toDF("g", "s", "id").repartition(13)
    val got = df.groupBy("g")
      .agg(TopKFunctions.top_k_distinct_by_score(col("s"), col("id"), 100).as("p"))
      .select(size(col("p"))).as[Int].head()
    // only 5 distinct ids × at most 10 distinct scores each, but a
    // given id only ever appears with scores congruent to it mod 5:
    // pairs = {(s, id): s ≡ id (mod 5)} over s in 0..9 → 2 per id = 10
    assert(got == 10)
  }
}
