package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: measure the flat-vs-two-level semCells crossover as
  * nlist grows with the corpus (nlist = N/250, the production sizing).
  * The flat path's assign is O(N · nlist · dim) — quadratic in N once
  * nlist tracks N — while the two-level path is O(N · 2√nlist · dim)
  * plus ~4-5 s of fixed job overhead; this harness times BOTH paths on
  * the SAME corpus at increasing scale so the crossover is a measured
  * number, not an asymptotic argument.
  *
  *   bash scripts/run_main.sh graft.tools.T46Crossover [baseSfDir]
  */
object T46Crossover {
  private def time(f: => DataFrame): Double = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** k× corpus of all-DISTINCT vectors (dimension 0 perturbed per
    * copy): assign cost depends on N × nlist only, so no dup collapse
    * is needed and the build stays trivial.
    */
  private def buildKx(spark: SparkSession, base: String, k: Int,
                      out: String): Unit = {
    graft.Tables.embeddings(spark, base)
      .crossJoin(spark.range(k).toDF("k"))
      .select((col("vec_id") * k + col("k")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + when(i === 0, col("k").cast("float") / 1e4f).otherwise(0f))
            .cast("float")).as("embedding"),
        col("label"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, base)
    println("| vectors | nlist | flat assign s | two-level assign s |")
    println("|---|---|---|---|")
    for (k <- Seq(10, 50, 125)) {
      val dir = graft.io.TempDirs.create(s"graft_t46x_$k").toString
      buildKx(spark, base, k, dir)
      val emb = graft.Tables.embeddings(spark, dir)
      val n = emb.count()
      val nlist = math.max(8, math.ceil(n / 250.0).toInt)
      // warm pass each (parquet footer/codegen), then timed pass
      def flat() = Similarity.semCells(emb, "vec_id", "embedding",
        nlist, refineIters = 1, maxDriver = Int.MaxValue)
      def twoLevel() = Similarity.semCells(emb, "vec_id", "embedding",
        nlist, refineIters = 1, maxDriver = Similarity.MaxDriverNlist)
      time(flat()); time(twoLevel()) // warm passes
      val tF = time(flat())
      val tT = time(twoLevel())
      println(f"| $n | $nlist | $tF%.2f | $tT%.2f |")
    }
    spark.stop()
  }
}
