package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Dev tool: bin-count and fill-fraction comparison of greedy
  * contiguous vs first-fit-decreasing packing at the t32 params
  * (2048-token budget, 8 shards) on the documents table.
  *
  *   bash scripts/run_main.sh graft.tools.PackCompare [sfDir]
  */
object PackCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.bpeish_token_count(col("text")).as("w"))
      .persist()
    docs.count()
    for ((name, packed) <- Seq(
        "greedy" -> Packing.packGreedy(docs, "doc_id", "w", 2048L, 8),
        "ffd"    -> Packing.packFirstFitDecreasing(docs, "doc_id", "w", 2048L, 8))) {
      val s = Packing.packStats(packed, 2048L)
        .agg(count(lit(1)).as("bins"), avg(col("fill_frac")).as("mean_fill"),
             min(col("fill_frac")).as("min_fill"))
        .head()
      println(f"[pack] $name%-8s bins=${s.getLong(0)} mean_fill=${s.getDouble(1)}%.3f min_fill=${s.getDouble(2)}%.3f")
    }
    docs.unpersist()
    spark.stop()
  }
}
