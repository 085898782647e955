package graft.tools

import org.apache.spark.sql.functions._

/** Dev micro-measure for the round-12 refineCentroids rewrite: Lloyd
  * training (seed + 2 refinement passes + assign, via semCells) timed
  * at dim 64 / 256 / 512 on the same synthetic 20k-vector corpus.
  *
  * The old posexplode form amplified the corpus-sized assign stage
  * ×dim rows (20k × 512 = 10.2M exploded rows per iteration at
  * dim 512); the dim-column-sum form keeps one row per vector with
  * O(cells × dim) aggregate state, so wall time should grow roughly
  * with the arithmetic (∝ dim), not with a row-allocation storm.
  * Numbers are recorded in docs/BENCH_SF1.md.
  *
  *   bash scripts/run_main.sh graft.tools.DimScale
  */
object DimScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(20000)
    println("| dim | semCells(nlist=16, refineIters=2) s | per-dim ms |")
    println("|---|---|---|")
    for (dim <- Seq(64, 256, 512)) {
      val vecs = spark.range(n.toLong).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)), i =>
            (pmod(xxhash64(col("id") * dim + i), lit(1000L)).cast("double")
              / 500.0 - 1.0).cast("float")).as("embedding"))
        .localCheckpoint(true)
      // warm pass (codegen init), then the timed pass
      graft.operators.Similarity
        .semCells(vecs, "vec_id", "embedding", 16, refineIters = 2)
        .write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      graft.operators.Similarity
        .semCells(vecs, "vec_id", "embedding", 16, refineIters = 2)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"| $dim | $t%.2f | ${t * 1000 / dim}%.2f |")
    }
    spark.stop()
  }
}
