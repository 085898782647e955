package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for named queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * plans/<round>/.
  *
  * Usage:
  *   scripts/run_main.sh graft.tools.PlanDump <outDir> <suffix> [sfDir] q1 q2 ...
  * writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> [sfDir] names...")
    val outDir = args(0)
    val suffix = args(1)
    val (sfDir, names) =
      if (args(2).startsWith("/")) (args(2), args.drop(3))
      else ("/root/testdata/sf0.01", args.drop(2))
    val spark = graft.GraftSession.toolSession(defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt " +
            s"(${plan.linesIterator.size} lines)")
      }
    }
    spark.stop()
  }
}
