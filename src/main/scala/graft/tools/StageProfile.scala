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
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)

    val docs = graft.Tables.documents(spark, sfDir)
    val deduped = TextDedup.exact(docs, "text", "doc_id")

    // t9 internals: one metric column at a time over the raw docs
    val t = col("text")
    val toks = split(t, "\\s+")
    time("t9 base scan")(docs)
    time("t9 n_chars")(docs.withColumn("m", length(t)))
    time("t9 n_tokens")(docs.withColumn("m", size(toks)))
    time("t9 punct_ratio")(docs.withColumn("m",
      (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double") / length(t)))
    time("t9 stopword_ratio")(docs.withColumn("m",
      graft.operators.TextAnalysis.stopwordRatio(t)))
    time("t9 full")(graft.operators.TextAnalysis.qualityMetrics(docs, "text"))

    // q42 internals: exact count_distinct (one Expand branch per
    // column: rows×6 before partial agg) vs the HLL approx variant —
    // the documented 100 TB swap, quantified on the biggest local table
    val lin = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pcols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus", "l_extendedprice")
    time("profile exact (lineitem)")(graft.ops.Profiling.profile(lin, pcols))
    time("profile approx (lineitem)")(graft.ops.Profiling.profileApprox(lin, pcols))

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

    // t18 internals: pair generation vs the iterative CC rounds
    val exactPairs = TextDedup.exactClusters(docs, "text", "doc_id")
    val nearPairs = TextDedup.ngramJaccardPairs(deduped, "text", "doc_id",
      shingleK = 3, minJaccard = 0.5, maxDf = 10)
      .select(col("id_a"), col("id_b"))
    val edges = exactPairs.unionByName(nearPairs)
    time("t18 edges")(edges)
    val edgesP = edges.persist()
    edgesP.count()
    time("t18 cc only")(
      graft.operators.Clustering.connectedComponents(edgesP, "id_a", "id_b"))
    time("t18 full")(graft.operators.Clustering.labelCorpus(
      docs, "doc_id", edges, "id_a", "id_b"))
    edgesP.unpersist()

    // t7 internals
    val emb = graft.Tables.embeddings(spark, sfDir)
    val ids = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val reps = ids.groupBy(col("vec")).agg(min(col("id")).as("id"))
    time("t7 reps")(reps)
    time("t7 memberPairs")(ids
      .join(reps.select(col("vec"), col("id").as("rep_id")), "vec")
      .filter(col("id") =!= col("rep_id")))
    time("t7 full")(graft.operators.Similarity.cosineNearDups(
      emb, "vec_id", "embedding", threshold = 0.95))
    spark.stop()
  }
}
