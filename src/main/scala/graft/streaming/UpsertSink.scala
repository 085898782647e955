package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.io.MutableTable

/** foreachBatch upsert sink — the incremental-materialized-view
  * pattern: each micro-batch MERGEs into a keyed state table so the
  * sink always holds the latest row per key. The state table is a
  * [[graft.io.MutableTable]] (versioned-parquet copy-on-write with
  * bounded history) — the same DELETE/MERGE verbs are available to
  * batch callers directly; this sink is just the streaming loop around
  * `mergeLatest`.
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
  * body targets a real MERGE-capable table format (MutableTable is the
  * integration point).
  */
object UpsertSink {

  /** Run `stream` to completion (AvailableNow), merging each batch into
    * the latest-per-key state table under `stateBase`; returns the
    * final state. `orderCols` must totally order rows within a key.
    * `keepVersions` bounds the retained copy-on-write history (≥ 2 so
    * a crash mid-write never strands the stream without a readable
    * parent version).
    */
  def runLatestPerKey(spark: SparkSession, stream: DataFrame,
                      keys: Seq[String], orderCols: Seq[String],
                      stateBase: String, timeoutMs: Long = 120000,
                      keepVersions: Int = 2): DataFrame = {
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    // openOrInit: a rerun over a surviving state dir resumes merging
    // into it (mergeLatest is order-independent, so replayed rows
    // converge) instead of failing on the existing-table guard
    val table = MutableTable.openOrInit(spark, stateBase, stream.schema,
      keepVersions)
    @volatile var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        table.mergeLatest(batch, keys, orderCols)
        batches += 1
        ()
      }
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"upsert stream did not finish within ${timeoutMs}ms")
    }
    require(batches > 0, "stream produced no batches")
    table.read()
  }
}
