package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING gap-based sessionization — the live form of
  * [[graft.operators.Behavior.sessionize]]: Structured Streaming's
  * `session_window` merges each user's events whose gaps stay within
  * the threshold and emits a session row once the watermark passes
  * the session's close. The engagement pipeline's unit-of-analysis
  * (events per session, session length) computed AS the stream
  * arrives, with state bounded per open session, not per event.
  *
  * Semantics contract with the batch operator: batch breaks when the
  * microsecond gap is STRICTLY greater than `gapSeconds`;
  * `session_window` with gap duration D merges while the next event
  * starts before `prev + D`, i.e. breaks when gap ≥ D — so D =
  * gapSeconds·10⁶ + 1 µs reproduces the batch break exactly.
  * Append-mode emission follows the t14 watermark contract: a session
  * [first, last + D) emits iff its end ≤ watermark = max(event time)
  * − delay, which with delay 0 and whole-second event times is
  * `last_us + gapSeconds·10⁶ < max_us` — plain SQL, so the DuckDB
  * oracle replays the emitted set exactly (hash-green, not just
  * gated).
  *
  * Scale shape: state is one open session struct per (user, session)
  * — merged eagerly by the state store, evicted at watermark — and
  * the aggregation shuffles on the user key (the same distribution
  * the batch window uses). `n_types` comes from `collect_set`
  * (bounded by the type vocabulary); timestamps aggregate as exact
  * epoch microseconds.
  *
  * Output: (userCol, n_events, start_us, duration_us, n_types) — one
  * row per FINALIZED session.
  */
object StreamingSessions {

  def sessionAgg(stream: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapMicros = gapSeconds * 1000000L + 1L
    stream
      .withWatermark(tsCol, "0 seconds")
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapMicros microseconds").as("__sw"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"),
        size(collect_set(col(typeCol))).cast("long").as("n_types"))
      .select(col(userCol), col("n_events"), col("start_us"),
        col("duration_us"), col("n_types"))
  }
}

/** STREAMING sample-ratio-mismatch monitor — t218's A/B validity
  * gate kept current by a watermarked streaming aggregation: one
  * (day-window) row with both arm counts and the χ² verdict emits
  * once the watermark passes the day. State is days × 2 exact longs.
  * Append emission follows the t14 contract (window end ≤ watermark
  * = max event time − delay), so the finalized set replays in plain
  * SQL — hash-exact, not just gated.
  */
object StreamingSrm {

  def srmAgg(stream: org.apache.spark.sql.DataFrame, tsCol: String,
             armA: org.apache.spark.sql.Column):
      org.apache.spark.sql.DataFrame = {
    val agg = stream
      .withWatermark(tsCol, "1 day")
      .groupBy(window(col(tsCol), "1 day").as("__w"))
      .agg(sum(when(armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!armA, 1L).otherwise(0L)).as("n_b"))
    val chi2 = round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / (col("n_a") + col("n_b")), 6)
    agg.select(col("__w.start").as("day"), col("n_a"), col("n_b"),
      chi2.as("chi2"), (chi2 > 3.841458821).as("mismatch"))
  }
}
