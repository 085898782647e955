package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: drives SparkEntry.entry (the driver's t1 smoke)
  * and optionally prints a named query's formatted physical plan.
  *
  *   java -cp ... graft.Smoke            → run entry, show rows
  *   java -cp ... graft.Smoke q1_agg sf  → explain + run one query
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case name :: rest =>
        val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
        df.show(20, truncate = false)
        println(s"ROWS=${df.count()}")
      case Nil =>
        val df = SparkEntry.entry(spark)
        df.show(10, truncate = false)
        println(s"ROWS=${df.count()}")
    }
    spark.stop()
  }
}
