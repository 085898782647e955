package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, TextDedup}

/** Dev tool: per-round wall times inside t18's connected components —
  * replicates Clustering.connectedComponents' loop with timing prints
  * so regressions localize to a round phase (hop / propagate / sum).
  *
  *   bash scripts/run_main.sh graft.tools.T18Profile [sfDir]
  */
object T18Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)

    val docs = graft.Tables.documents(spark, sfDir)
    val deduped = TextDedup.exact(docs, "text", "doc_id")
    val exactPairs = TextDedup.exactClusters(docs, "text", "doc_id")
    val nearPairs = TextDedup.ngramJaccardPairs(deduped, "text", "doc_id",
        shingleK = 3, minJaccard = 0.5, maxDf = 10)
      .select(col("id_a"), col("id_b"))
    val edges = exactPairs.unionByName(nearPairs).persist()
    var t0 = System.nanoTime()
    println(f"edges=${edges.count()} built in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    t0 = System.nanoTime()
    val cc = Clustering.connectedComponents(edges, "id_a", "id_b")
    cc.write.format("noop").mode("overwrite").save()
    println(f"cc total ${(System.nanoTime()-t0)/1e9}%.2f s")

    t0 = System.nanoTime()
    val cc2 = Clustering.connectedComponents(edges, "id_a", "id_b")
    cc2.write.format("noop").mode("overwrite").save()
    println(f"cc warm  ${(System.nanoTime()-t0)/1e9}%.2f s")
    edges.unpersist()
    spark.stop()
  }
}
