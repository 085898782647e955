package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry.queries by name (same session
  * config + warm-up discipline as graft.Bench, noop sink) so a single
  * query can be iterated on without paying the full battery.
  *
  * Usage: scripts/run_main.sh graft.tools.QuickTime t7_embed_neardup t23_streaming_upsert
  * (SPARK_GRAFT_SF_DIR selects the scale factor; defaults to sf0.1.)
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    graft.queries.TrainingQueries.prewarmFixtures(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[quicktime] unknown query: $name")
        case Some(fn) =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[quicktime] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
