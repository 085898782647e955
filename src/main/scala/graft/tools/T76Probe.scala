package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.Tables

/** Dev probe: do t76's two mine-checkpoint chains actually overlap
  * under Par.par2, or does something serialize them? Times each chain
  * alone (warm), then both under par2.
  */
object T76Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 2000)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 =!= 0)
    def mine(topK: Similarity.TopKProvider) =
      Similarity.marginMine(src, "vec_id", "embedding",
        tgt, "vec_id", "embedding", k = 4, threshold = 1.0, topK = topK)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t76] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (p <- 1 to 2) {
      println(s"--- pass $p ---")
      t("bf mine ckpt alone") {
        mine(Similarity.bruteForceTopK).localCheckpoint(true) }
      t("ann mine ckpt alone") {
        mine(Similarity.lshProvider(bits = 2, tables = 32))
          .localCheckpoint(true) }
      t("par2 both") {
        graft.util.Par.par2(
          mine(Similarity.bruteForceTopK).localCheckpoint(true),
          mine(Similarity.lshProvider(bits = 2, tables = 32))
            .localCheckpoint(true)) }
    }
    spark.stop()
  }
}
