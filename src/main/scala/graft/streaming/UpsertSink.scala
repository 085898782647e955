package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** foreachBatch upsert sink — the incremental-materialized-view
  * pattern: each micro-batch MERGEs into a keyed state table so the
  * sink always holds the latest row per key. This is what a Delta/
  * Iceberg `MERGE INTO` does per batch; on plain parquet it becomes
  * copy-on-write versions (state_v{batch}), which is also the
  * time-travel-friendly layout.
  *
  * Correctness is ORDER-INDEPENDENT: "latest" is decided by the data
  * (`orderCols`, e.g. ts desc + id desc), not by arrival order, so any
  * batch split of the same rows converges to the same state — the
  * property that makes the sink safe under source reordering/replay.
  *
  * Scale shape: per batch, one keep-first window (the shared
  * Dedup.keepFirst operator) over state ∪ batch. State never exceeds
  * |distinct keys| rows; the window partitions by key (high
  * cardinality — no funnel). At warehouse scale the same foreachBatch
  * body targets a real MERGE-capable table format.
  */
object UpsertSink {

  /** Run `stream` to completion (AvailableNow), merging each batch into
    * the latest-per-key state under `stateBase`; returns the final
    * state. `orderCols` must totally order rows within a key.
    *
    * `keepVersions` bounds the copy-on-write history: after each
    * successful write, state versions older than the newest
    * `keepVersions` are deleted — without a cap a long-running stream
    * accumulates batches × |distinct keys| rows of dead state. Minimum
    * 2 (the new version plus the one it was derived from, so a crash
    * mid-write never strands the stream without a readable parent).
    */
  def runLatestPerKey(spark: SparkSession, stream: DataFrame,
                      keys: Seq[String], orderCols: Seq[String],
                      stateBase: String, timeoutMs: Long = 120000,
                      keepVersions: Int = 2): DataFrame = {
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    val schema = stream.schema
    @volatile var version = -1L
    // foreachBatch bodies run sequentially, so plain mutable state is safe
    val written = scala.collection.mutable.Queue.empty[Long]
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev =
          if (version < 0) spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else spark.read.schema(schema).parquet(s"$stateBase/state_v$version")
        graft.ops.Dedup.keepFirst(prev.unionByName(batch), keys,
            orderCols.map(c => col(c).desc))
          .write.mode("overwrite").parquet(s"$stateBase/state_v$batchId")
        version = batchId
        written.enqueue(batchId)
        while (written.size > keepVersions) {
          val old = new org.apache.hadoop.fs.Path(
            s"$stateBase/state_v${written.dequeue()}")
          old.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(old, true)
        }
      }
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"upsert stream did not finish within ${timeoutMs}ms")
    }
    require(version >= 0, "stream produced no batches")
    spark.read.schema(schema).parquet(s"$stateBase/state_v$version")
  }
}
