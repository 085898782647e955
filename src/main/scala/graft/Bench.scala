package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] is the benchmark contract; SPARK_GRAFT_CPUS overrides
    // for dev boxes with fewer cores.
    val spark = GraftSession.toolSession(defaultCpus = "32")
    // warm-up: one-time session costs (codegen/datasource init) stay
    // outside any query's timing. warmUp failing means the sfDir
    // itself is broken — fail LOUDLY rather than emit a silently
    // cold-skewed benchmark; only the streaming-fixture prewarm is
    // tolerated (its consumers t23/t24 then fail individually and land
    // in the recorded `failed` list).
    GraftSession.warmUp(spark, sfDir)
    try graft.queries.TrainingQueries.prewarmFixtures(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] fixture prewarm failed: ${e.getMessage}")
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every projected column (count() lets
      // Catalyst prune unreferenced projections, under-measuring
      // expression-heavy queries) without paying any write cost
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a crashed query must not masquerade as a fast one: record it
        // and keep its (misleading) elapsed time out of the totals
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val ok = results.view.filterKeys(k => !failed.contains(k)).toMap
    // millisecond precision keeps the one-line JSON short enough to
    // survive log-tail capture intact (sub-ms digits are noise anyway)
    def f(v: Double): String = "%.3f".format(v)
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","sink":"noop","failed":$fs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
