package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: run a SUBSET of SparkEntry.queries through the Verify
  * dump (parquet + a filtered oracle_sql.json) so a single new query
  * can be oracle-checked without paying the full battery:
  *
  *   scripts/run_main.sh graft.tools.VerifyOne /root/testdata/sf0.01 \
  *     /tmp/v1 t59_upsample
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/v1
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    try graft.queries.TrainingQueries.prewarmFixtures(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verifyone] fixture prewarm failed: ${e.getMessage}")
    }
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[verifyone] unknown query: $name")
        case Some(fn) =>
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
