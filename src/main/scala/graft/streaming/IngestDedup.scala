package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.functions.BloomFunctions
import graft.io.MutableTable
import graft.operators.IncrementalDedup
import graft.ops.Dedup
import org.apache.spark.sql.functions.col

/** Streaming keep-first ingest dedup — the continuous form of
  * [[graft.operators.IncrementalDedup]]: every micro-batch first
  * collapses to one row per text WITHIN the batch (min `idCol` — the
  * deterministic keep-first survivor), then drops rows whose text the
  * accumulated state already holds, and appends the remainder to the
  * state table. The state always contains exactly one document per
  * distinct text ever seen: the first arrival.
  *
  * The cross-batch membership check never rescans the state: a running
  * Bloom sketch is maintained driver-side across batches — each
  * batch's survivors aggregate to their own sketch (distributed) and
  * fold into the running one ([[BloomFunctions.merge]]), so over the
  * stream's lifetime the history is scanned zero times for
  * membership; only the bloom-positive sliver of each batch rides the
  * exact verify anti-join against the state table. Appends go through
  * the text-keyed upsert, so a replayed batch converges instead of
  * duplicating (foreachBatch's at-least-once contract).
  */
object IngestDedup {

  /** Run `stream` to completion (AvailableNow), keep-first-deduping
    * into the state table under `stateBase`; returns the final state.
    * `expectedItems` sizes the sketch for the total distinct-text
    * count the state may reach.
    *
    * DRIVER-MEMORY CONTRACT: the running sketch lives on the driver at
    * `IncrementalDedup.sketchBytes(expectedItems, fpp)` bytes
    * (~1.2 B/item at fpp 1e-2 — 1.2 GB per 10⁹ distinct texts), and
    * each batch's fold transiently holds a second full-size sketch, so
    * the PEAK is 2× the cap — `maxSketchBytes` bounds ONE sketch;
    * provision the driver for twice it. The bloom path engages only
    * when the sized sketch fits BOTH the cap and Spark's runtime
    * bloom-filter conf clamp (`BloomFunctions.fitsRuntimeCaps` — past
    * the clamp bloom_agg fails fast rather than silently saturating);
    * otherwise the operator drops the bloom fast path entirely and
    * runs every batch through the exact verify anti-join
    * ([[IncrementalDedup.filterNewExact]]), which is the identical
    * answer at per-batch join cost (at warehouse scale, against a
    * digest-bucketed state table). Results are byte-identical either
    * way; the sketch is an optimization, never the verdict.
    */
  def runKeepFirst(spark: SparkSession, stream: DataFrame,
                   textCol: String, idCol: String, stateBase: String,
                   expectedItems: Long, fpp: Double = 0.01,
                   timeoutMs: Long = 120000,
                   keepVersions: Int = 2,
                   maxSketchBytes: Long = 256L << 20): DataFrame = {
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    val table = MutableTable.openOrInit(spark, stateBase, stream.schema,
      keepVersions)
    val useSketch =
      IncrementalDedup.sketchBytes(expectedItems, fpp) <= maxSketchBytes &&
      BloomFunctions.fitsRuntimeCaps(expectedItems, fpp)
    if (!useSketch)
      System.err.println(s"[ingest-dedup] sketch for $expectedItems items " +
        s"at fpp=$fpp exceeds maxSketchBytes=$maxSketchBytes; running " +
        "exact-verify-only (same results, no bloom fast path)")
    // resuming over surviving state: seed the sketch from it (one
    // scan) so replays of already-absorbed texts drop correctly
    @volatile var sketch: Array[Byte] =
      if (useSketch)
        IncrementalDedup.sketchOf(table.read(), textCol, expectedItems, fpp)
      else null
    @volatile var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val firstInBatch = Dedup.keepFirst(batch, Seq(textCol),
          Seq(col(idCol).asc))
        val survivors = (if (useSketch)
            IncrementalDedup.filterNew(firstInBatch, table.read(), textCol,
              sketch)
          else
            IncrementalDedup.filterNewExact(firstInBatch, table.read(),
              textCol))
          .localCheckpoint()  // upsert + sketch both consume it; and it
                              // must not lazily re-read state mid-mutation
        table.upsert(survivors, Seq(textCol))
        if (useSketch)
          sketch = BloomFunctions.merge(sketch,
            IncrementalDedup.sketchOf(survivors, textCol, expectedItems, fpp))
        batches += 1
        ()
      }
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"ingest-dedup stream did not finish within ${timeoutMs}ms")
    }
    require(batches > 0, "stream produced no batches")
    table.read()
  }
}
