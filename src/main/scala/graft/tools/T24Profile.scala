package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: split t24's wall time into fixture / streaming run /
  * batch tail, run twice (cold + warm) to separate session init from
  * steady-state micro-batch overhead.
  *
  *   bash scripts/run_main.sh graft.tools.T24Profile [sfDir]
  */
object T24Profile {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[t24] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    timed("prewarmFixtures")(
      graft.queries.TrainingQueries.prewarmFixtures(spark, sfDir))

    for ((pass, nPart) <- Seq(("cold", 8), ("warm8", 8), ("warm4", 4),
                              ("warm2", 2), ("warm1", 1))) {
      import graft.streaming.StatefulFlows
      import spark.implicits._
      val ev = graft.Tables.events(spark, sfDir)
      val fixture = timed(s"$pass fixture lookup")(
        graft.queries.TrainingQueries.rangedEventsFixture(spark, sfDir))
      val stream = spark.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(fixture)
        .select(col("user_id").cast("string").as("wallet"),
                col("ts"), col("value"))
        .as[StatefulFlows.FlowEvent]
      val balances = StatefulFlows.runningBalances(stream).toDF()
      val emitted = timed(s"$pass streaming run ($nPart part)") {
        graft.streaming.StreamingFlows.withStatePartitions(spark, nPart) {
          graft.streaming.StreamingFlows.runAvailableNow(spark,
            balances, s"t24p_${pass}_${System.nanoTime}")
        }
      }
      if (pass == "warm8") {
        // batch-by-batch duration breakdown straight from the engine
        val q = graft.streaming.StreamingFlows.withStatePartitions(spark, 8) {
          balances.writeStream
            .format("memory").queryName(s"t24p_prog_${System.nanoTime}")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        q.awaitTermination(120000)
        q.recentProgress.foreach { p =>
          println(s"[t24] batch ${p.batchId} total=${p.batchDuration}ms " +
            s"durations=${p.durationMs}")
        }
      }
      timed(s"$pass batch tail") {
        graft.ops.Dedup.keepFirst(emitted, Seq("wallet"),
            Seq(col("n_events").desc))
          .select(col("wallet"), round(col("net"), 2).as("net_r"),
                  col("n_events"), col("last_ts"))
          .orderBy(col("wallet"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
