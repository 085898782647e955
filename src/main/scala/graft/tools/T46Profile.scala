package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Buckets, Similarity}
import graft.functions.VectorFunctions.cosine_sim

/** Dev tool: stage times for semDedup (t46) on the sf0.1 corpus and on
  * the ScaleStress-shaped 10× variant corpus, to localize where the
  * within-cell pair stage's time goes as cells fill with near-dup
  * mass. Run: scripts/run_main.sh graft.tools.T46Profile [baseSfDir]
  */
object T46Profile {
  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[stage] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  private def build10x(spark: SparkSession, base: String, out: String): Unit = {
    val k = col("k")
    val emb = graft.Tables.embeddings(spark, base)
      .crossJoin(spark.range(10).toDF("k"))
      .select(
        (col("vec_id") * 10 + k).as("vec_id"),
        when(k < 5, col("embedding"))
          .when(k < 7, transform(col("embedding"),
            x => (x * (lit(1.0f) + k.cast("float") / 100f)).cast("float")))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x + when(i === 0, (k.cast("float") - 6f) / 500f).otherwise(0f))
              .cast("float")))
          .as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, base)
    val big = graft.io.TempDirs.create("graft_t46").toString
    build10x(spark, base, big)

    for ((label, dir) <- Seq("sf0.1" -> base, "10x" -> big)) {
      val emb = graft.Tables.embeddings(spark, dir)
      val n = emb.count()
      val nlist = math.max(8, math.ceil(n / 250.0).toInt)
      println(s"== $label: $n vectors, nlist=$nlist")
      time("semCells")(
        Similarity.semCells(emb, "vec_id", "embedding", nlist, 1))
      val cells = Similarity.semCells(emb, "vec_id", "embedding", nlist, 1)
        .localCheckpoint(true)
      // cell-size distribution — the quantity pair fan-out squares in
      cells.groupBy(col("cell")).agg(count(lit(1)).as("sz"))
        .agg(max(col("sz")).as("max"), expr("percentile(sz, 0.9)").as("p90"),
             count(lit(1)).as("cells")).show()
      time("capped posting")(
        Buckets.capped(cells.select(col("id"), col("cell")), Seq("cell"),
          Similarity.DefaultSemDedupBucket))
      val bucketMembers = Buckets.capped(
          cells.select(col("id"), col("cell")), Seq("cell"),
          Similarity.DefaultSemDedupBucket)
        .select(col("cell"), explode(col("ids")).as("id"))
        .join(cells.select(col("id"), col("vec")), "id")
        .groupBy(col("cell"))
        .agg(collect_list(struct(col("id"), col("vec"))).as("m"))
      time("bucket regroup")(bucketMembers)
      val pairs = bucketMembers
        .select(col("cell"), explode(col("m")).as("a"), col("m"))
        .select(col("cell"), col("a"), explode(col("m")).as("b"))
        .filter(col("a.id") < col("b.id"))
      time("pair expand (no score)")(pairs.select(col("a.id"), col("b.id")))
      time("pair expand + cosine")(
        pairs.filter(cosine_sim(col("a.vec"), col("b.vec")) >= 0.4)
          .select(col("a.id"), col("b.id")))
      time("full semDedupFromCells")(
        Similarity.semDedupFromCells(cells, 0.4, Similarity.DefaultSemDedupBucket))
    }
    spark.stop()
  }
}
