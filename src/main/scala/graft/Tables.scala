package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor directory
  * (e.g. `/root/testdata/sf0.01`) and reads the tables it needs through
  * these helpers, so the parquet scan (with Catalyst column pruning +
  * predicate pushdown) is the single entry point for all data access.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw long (spark.sql.legacy.parquet.nanosAsLong=true, set
    * in Verify/Bench). Convert to a microsecond TimestampType here with
    * integer division (ns epoch values overflow double precision, so no
    * float math). The DuckDB oracle applies the same truncation via
    * CAST(ts AS TIMESTAMP).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // defensive: the flag is a runtime SQL conf and the caller's session
    // (e.g. the driver's own smoke harness) may not have set it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
