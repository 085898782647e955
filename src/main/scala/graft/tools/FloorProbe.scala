package graft.tools

import org.apache.spark.sql.functions._

/** Dev micro-probe: what does ONE tiny Spark action cost in the bench
  * session, and does overlapping actions (§2.6) actually divide the
  * floor? Times N sequential vs N 4-way-concurrent noop actions over
  * (a) a cached 1-partition frame (pure scheduler floor), (b) a fresh
  * small aggregate plan each time (plan+codegen+schedule floor), and
  * (c) a 32-partition shuffle (stage floor at core count).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, "/root/testdata/sf0.1")
    val cached = spark.range(1000).toDF("id").localCheckpoint(true)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, n: Int)(f: Int => Unit): Unit = {
      f(0) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(f)
      println(f"[floor] $name%-34s ${(System.nanoTime() - t0) / 1e9 / n * 1000}%8.1f ms/action")
    }
    def conc(name: String, n: Int)(f: Int => Unit): Unit = {
      f(0)
      val t0 = System.nanoTime()
      (1 to n).grouped(4).foreach { g =>
        val ts = g.map(i => new Thread(() => f(i)))
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      println(f"[floor] $name%-34s ${(System.nanoTime() - t0) / 1e9 / n * 1000}%8.1f ms/action (4-way)")
    }
    time("cached count (reused plan)", 40)(_ => { cached.count(): Unit })
    time("cached noop (fresh plan)", 40)(i => noop(cached.filter(col("id") >= i)))
    time("fresh agg plan noop", 40)(i =>
      noop(spark.range(1000 + i).toDF("id").agg(sum(col("id")))))
    time("32-part shuffle noop", 40)(i =>
      noop(spark.range(10000 + i).toDF("id")
        .groupBy((col("id") % 97).as("k")).agg(count(lit(1)))))
    conc("cached noop (fresh plan)", 40)(i => noop(cached.filter(col("id") >= i)))
    conc("fresh agg plan noop", 40)(i =>
      noop(spark.range(1000 + i).toDF("id").agg(sum(col("id")))))
    conc("32-part shuffle noop", 40)(i =>
      noop(spark.range(10000 + i).toDF("id")
        .groupBy((col("id") % 97).as("k")).agg(count(lit(1)))))
    time("localCheckpoint(true) tiny", 20)(i =>
      { spark.range(100 + i).toDF("id").localCheckpoint(true); () })
    conc("localCheckpoint(true) tiny", 20)(i =>
      { spark.range(100 + i).toDF("id").localCheckpoint(true); () })
    spark.stop()
  }
}
