package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks (SURVEY.md §2.1 S4/S5) with the layouts that matter at 100 TB.
  *
  * Bucketing is the standing answer to "this join shuffles the fact
  * table every night": write both sides bucketed by the join key and
  * subsequent equi-joins/aggregations on that key run with NO exchange
  * — the scan itself is the partitioning proof. (Bucketed tables
  * require the session catalog, hence saveAsTable rather than bare
  * parquet paths.)
  */
object Writers {

  /** CTAS analog: materialize to parquet files (naturally multi-part —
    * the reference's "multiple parquet files" export, README.md:2).
    */
  def parquet(df: DataFrame, path: String,
              partitionBy: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }

  /** Bucketed CTAS: hash-bucket rows by `bucketCols` into `numBuckets`
    * files per partition, sorted within buckets. Equi-joins between
    * tables bucketed the same way skip the shuffle on BOTH sides;
    * aggregations on the bucket key skip their exchange too.
    */
  def bucketed(df: DataFrame, table: String, numBuckets: Int,
               bucketCols: Seq[String],
               sortCols: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
    df.sparkSession.table(table)
  }
}
