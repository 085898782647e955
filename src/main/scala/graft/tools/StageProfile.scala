package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Dev tool: stage-by-stage wall times for the expensive dedup queries
  * (run via scripts/run_main.sh graft.tools.StageProfile [sfDir]) —
  * each stage materializes through the noop sink after a warm-up pass,
  * so the deltas localize where a pipeline's time actually goes.
  */
object StageProfile {
  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, sfDir)
    val deduped = TextDedup.exact(docs, "text", "doc_id")

    // t4 internals, mirrored stage by stage
    val sets = deduped.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.hashed_shingles(col("text"), 3).as("sh"))
    time("t4 sets")(sets)
    val posting = sets.select(col("id"), explode(col("sh")).as("shash"))
    time("t4 posting")(posting)
    val cands = graft.operators.Buckets.pairs(posting, Seq("shash"), 10)
    time("t4 cands")(cands)
    time("t4 full")(TextDedup.ngramJaccardPairs(deduped, "text", "doc_id",
      shingleK = 3, minJaccard = 0.5, maxDf = 10))
    println("cands=" + cands.count() + " sets=" + sets.count())

    // t2 internals
    time("t2 signatures")(TextDedup.minhashSignatures(deduped, "text", "doc_id", 3, 64))
    time("t2 candidates")(TextDedup.minhashCandidates(deduped, "text", "doc_id"))
    time("t2 full")(TextDedup.minhashNearDups(deduped, "text", "doc_id", threshold = 0.8))
    println("t2 cands=" +
      TextDedup.minhashCandidates(deduped, "text", "doc_id").count())
    spark.stop()
  }
}
