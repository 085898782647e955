package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest — the reference's stated-but-unbuilt
  * fourth stage (README.md:3: Bitcoin Core + BitcoinETL streaming in
  * place of BigQuery; SURVEY.md §2.10/§7.5). The batch operators in
  * graft.ops are all DataFrame→DataFrame and stateless per-row, so they
  * compose unchanged onto a readStream frame; this module adds the
  * stateful pieces: watermarked windowed aggregation and
  * within-watermark dedup.
  */
object StreamingFlows {

  /** File-based streaming source (the BitcoinETL-drop-directory shape):
    * new parquet files under `dir` become micro-batches.
    */
  def source(spark: SparkSession, dir: String, schema: StructType,
             globFilter: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).parquet(dir)
  }

  /** Daily flow aggregation as a streaming query: the batch
    * `groupBy(date_trunc)` becomes a watermarked 1-day window —
    * late rows beyond the watermark drop, state is bounded.
    */
  def dailyFlowAgg(stream: DataFrame, tsCol: String, typeCol: String,
                   valCol: String, watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day_window"), col(typeCol))
      .agg(sum(col(valCol)).as("total"), count(lit(1)).as("n"))
      .select(col("day_window.start").as("day"), col(typeCol),
              col("total"), col("n"))

  /** Watermarked windowed QUANTILES — streaming latency/size-percentile
    * monitoring (the p50/p95/p99-per-window readout every ingest
    * pipeline watches): per finalized 1-day window and key, quantiles
    * of `valCol` via `percentile_approx`, whose Greenwald–Khanna
    * sketch lives IN the streaming aggregation state — buffer size is
    * bounded by `accuracy`, never by window row count, and partials
    * merge across shuffle/micro-batches like any imperative aggregate
    * (the t71 Misra–Gries pattern, with Spark's own built-in).
    *
    * Exactness contract: GK's rank error is ≤ n/accuracy, so whenever
    * a window holds fewer than `accuracy` rows the error bound is
    * < 1 rank — the returned elements are EXACT order statistics and
    * the t86 oracle replays them as plain rank picks. At true scale
    * the same query holds `accuracy` as the state bound and the
    * result is rank-bounded approximate; the accuracy knob IS the
    * state-vs-precision trade, stated rather than hidden.
    */
  /** Streaming mergeable-sketch maintenance (the t91 daily HLL table
    * kept current by the stream itself): a watermarked 1-day window
    * whose aggregation state IS the HLL sketch — fixed ≤ ~2^lgK bytes
    * per day regardless of event volume, partial-merged across
    * micro-batches like any imperative aggregate. Because HLL union
    * is a register-wise max (commutative/associative/idempotent), the
    * accreted sketch is register-identical to a one-shot batch build
    * over the same rows — t96 enforces estimate EQUALITY, not mere
    * closeness. Downstream rolling windows read this sketch table
    * (Sketches.rollingDistinct) and never rescan history.
    */
  def dailyKeySketch(stream: DataFrame, tsCol: String, keyCol: String,
                     watermark: String = "1 day",
                     lgK: Int = 12): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day_window"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sk"))
      .select(to_date(col("day_window.start")).as("day"), col("sk"))

  def dailyQuantiles(stream: DataFrame, tsCol: String, typeCol: String,
                     valCol: String, watermark: String = "1 day",
                     accuracy: Int = 10000): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day_window"), col(typeCol))
      .agg(percentile_approx(col(valCol),
             array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("qs"),
           count(lit(1)).as("n"))
      .select(col("day_window.start").as("day"), col(typeCol),
              col("qs").getItem(0).as("p50"),
              col("qs").getItem(1).as("p95"),
              col("qs").getItem(2).as("p99"),
              col("n"))

  /** Watermarked session-window aggregation — the streaming form of
    * the batch gaps-and-islands sessionization (q38): events for a key
    * merge into one session while each lands within `gap` of the
    * session so far, and session end = last event + gap. Append mode
    * emits a session only once the watermark passes its end, then
    * drops its state — so state is bounded by (keys with an open
    * session) × session width, never by stream length.
    */
  def sessionAgg(stream: DataFrame, tsCol: String, keyCol: String,
                 valCol: String, gap: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valCol)).as("sum_value"))
      .select(col(keyCol),
              col("sw").getField("start").as("session_start"),
              col("sw").getField("end").as("session_end"),
              col("n_events"), col("sum_value"))

  /** Streaming D1 dedup: drop duplicate keys arriving within the
    * watermark horizon (SURVEY §7.5 — `dropDuplicatesWithinWatermark`
    * is the streaming analog of keep-first).
    */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
                     keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static dimension enrichment — the streaming form of the J4
    * broadcast enrich: each micro-batch inner-joins the (small) static
    * dimension with a broadcast hash join, so the stream side never
    * shuffles for the join and NO join state accumulates across
    * batches (stream-static inner joins are stateless by
    * construction — only downstream stateful operators hold state).
    * The static plan is re-resolved per micro-batch; at cluster scale
    * keep the dimension broadcast-sized or pre-materialize a compact
    * projection of it, exactly as here.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "inner")

  /** Stream-stream interval join: `left` rows match `right` rows with
    * the same `key` whose event time falls in
    * [leftTime - before, leftTime]. Both sides carry watermarks, and
    * the two-sided time bound lets Spark expire join state on BOTH
    * sides — the configuration where stream-stream inner join state
    * stays bounded forever (an unbounded-range join would buffer one
    * side indefinitely). Callers pass pre-watermarked frames with
    * distinct column names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   before: String): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $before") &&
        col(rightTime) <= col(leftTime),
      "inner")

  /** Run `body` with the session's shuffle-partition count (which also
    * sets a stateful query's state-partition count — fixed at the
    * query's FIRST start for its whole life) temporarily set to `n`,
    * restoring the previous value after. State partitioning is a
    * per-query sizing decision: every micro-batch commits one
    * state-store delta per partition, so a low-cardinality keyed stream
    * on a wide session default pays batches × partitions tiny commits
    * for rows that fit in a handful of stores. Size to expected key
    * cardinality / executor count, not to the batch-shuffle default.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Run a streaming frame to a named in-memory sink, processing
    * everything currently available, then stop. Returns the result
    * table. (Local harness: AvailableNow ≡ batch-complete semantics.)
    */
  def runAvailableNow(spark: SparkSession, streamed: DataFrame,
                      name: String, outputMode: String = "append",
                      timeoutMs: Long = 120000): DataFrame = {
    val q: StreamingQuery = streamed.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      // a partially-filled sink silently masquerading as the complete
      // result is worse than failing — stop and say so
      q.stop()
      throw new IllegalStateException(
        s"streaming query $name did not finish within ${timeoutMs}ms; " +
        "partial sink contents discarded")
    }
    spark.table(name)
  }
}
