package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, TextDedup}

/** Dev tool: stage wall times for the Moore–Lewis selection pipeline
  * (run via scripts/run_main.sh graft.tools.T53Profile [sfDir]) —
  * localizes where t53's time goes relative to t36, which shares the
  * per-(doc,bigram) reduction and the model-join scoring shape.
  */
object T53Profile {
  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)

    // the SAME reduction the operator runs (shared front-end, so the
    // profiler can never drift from the production pipeline)
    def perDoc = CorpusStats.bigramPerDoc(docs, "doc_id", "text",
      extra = Seq("__in" -> (col("lang") === "en")))._2
    def cnt = perDoc.groupBy(col("b")).agg(
      sum(col("n")).as("c_all"),
      coalesce(sum(when(col("__in"), col("n"))), lit(0L)).as("c_in"))

    time("warm perDoc")(perDoc)
    time("perDoc")(perDoc)
    time("cnt (recomputes perDoc)")(cnt)
    time("ctx")(cnt.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c_all")).as("cc_all"), sum(col("c_in")).as("cc_in")))
    time("vocab 2x count_distinct")(cnt
      .select(explode(split(col("b"), " ")).as("tok"), col("c_in"))
      .agg(count_distinct(col("tok")).as("v_all"),
           count_distinct(when(col("c_in") > 0, col("tok"))).as("v_in")))
    time("t53 full")(CorpusStats.crossEntropySelect(
      docs, "doc_id", "text", inDomain = col("lang") === "en"))
    time("t36 full")(CorpusStats.bigramLmScore(docs, "doc_id", "text"))
    spark.stop()
  }
}
