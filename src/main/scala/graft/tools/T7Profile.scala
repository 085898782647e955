package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Buckets

/** Dev tool: stage deltas inside t7 (cosineNearDups at the driver-query
  * params: threshold 0.4, bits 4, tables 16) — localizes whether the
  * time is stage 1 (exact-collapse member join), candidate generation,
  * the candidate distinct, or the vector rejoin + verify.
  *
  *   bash scripts/run_main.sh graft.tools.T7Profile [sfDir]
  */
object T7Profile {
  private def time(name: String)(df: => DataFrame): Unit = {
    // two passes: warm (codegen/datasource init) then measured
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[t7] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    val (bits, tables, threshold, maxBucket) = (4, 16, 0.4, 500)

    val emb = graft.Tables.embeddings(spark, sfDir)
    val ids = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val reps = ids.groupBy(col("vec")).agg(min(col("id")).as("id")).persist()
    println("reps=" + reps.count())

    time("memberPairs (hash-keyed)")(ids
      .withColumn("h", xxhash64(col("vec")))
      .join(reps.select(xxhash64(col("vec")).as("h"),
                        col("vec").as("rep_vec"), col("id").as("rep_id")),
            Seq("h"))
      .filter(col("vec") === col("rep_vec") && col("id") =!= col("rep_id")))
    time("memberPairs (vec-keyed)")(ids
      .join(reps.select(col("vec"), col("id").as("rep_id")), "vec")
      .filter(col("id") =!= col("rep_id")))

    val sigs = (0 until tables).map(t =>
      hyperplane_sig(col("vec"), bits, seed = 42L + t))
    val b = reps.select(col("id"),
      posexplode(array(sigs: _*)).as(Seq("table", "bucket")))
    time("signatures")(b)
    val pairs = Buckets.pairs(b, Seq("table", "bucket"), maxBucket)
    println("candidate pairs=" + pairs.count())
    time("bucket pairs (incl distinct)")(pairs)
    val vecs = reps.select(col("id"), col("vec"))
    val verified = pairs
      .join(vecs.toDF("id_a", "vec_a"), "id_a")
      .join(vecs.toDF("id_b", "vec_b"), "id_b")
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    time("rejoin+verify")(verified)
    println("verified pairs=" + verified.count())
    time("t7 full")(graft.operators.Similarity.cosineNearDups(
      emb, "vec_id", "embedding", threshold, bits, tables))
    reps.unpersist()
    spark.stop()
  }
}
