package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: per-query ACTION/STAGE/TASK census — how many sequential
  * Spark jobs a query pays between construction and its noop sink.
  * At bench scale (sf0.1, 17 MB) every query is latency-bound, so
  * wall ≈ Σ per-job floor: the job count IS the cost model, and this
  * census ranks where §2.6 overlap / job-fusion can pay.
  *
  * Usage: scripts/run_main.sh graft.tools.JobCount [sfDir] [names...]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val (sfDir, names0) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.1", rest)
    }
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    graft.queries.TrainingQueries.prewarmFixtures(spark, sfDir)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    val names = if (names0.nonEmpty) names0
                else graft.SparkEntry.queries.keys.toList
    // warm pass first (codegen/IO caches), then the measured pass —
    // mirrors Bench's best-of-two discipline
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobcount] unknown query: $name")
        case Some(fn) =>
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Thread.sleep(60) // let the async listener bus drain
            jobs.set(0); stages.set(0); tasks.set(0)
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val w = (System.nanoTime() - t0) / 1e9
            Thread.sleep(60)
            println(f"[jobcount] $name%-28s ${w}%8.2f s  jobs=${jobs.get}%-4d " +
              f"stages=${stages.get}%-5d tasks=${tasks.get}%-6d")
          } catch { case e: Throwable =>
            System.err.println(s"[jobcount] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
