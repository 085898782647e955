package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics — the incremental-maintenance answer to
  * "distinct users this rolling week" and "how much do two sources
  * overlap" at warehouse scale.
  *
  * The scale contract both operators share: the raw table is read
  * ONCE, reduced to per-group sketches (map-side combinable, fixed
  * bytes per group), and every downstream question — rolling unions,
  * pairwise intersections, re-aggregation to coarser grains — is
  * answered from the sketch table alone. A 100 TB history never gets
  * re-scanned to answer a new window; yesterday's sketches are state,
  * today's partition appends one row per group. This is the
  * datasketches design point (Apache DataSketches, the library behind
  * Spark's hll_ and theta_ functions): sketches are associative and
  * commutative, so partial aggregation and incremental appends give
  * bit-identical results to a full rescan.
  *
  * Eager-pin trade-off: operators that self-join their sketch table
  * `localCheckpoint(true)` it first, so constructing the frame runs
  * the (one) raw scan immediately and holds the |days|-or-|groups| ×
  * kilobyte result in block storage for the session. That is the
  * point — the state table IS the product; a warehouse deployment
  * writes it to a real table (the t97 shape) and the checkpoint
  * disappears. Callers composing many one-shot calls in one
  * long-lived driver can reclaim blocks via
  * `spark.sharedState.cacheManager` / session restart.
  *
  * Reference behavioral anchor: the reference's COUNT(DISTINCT …)
  * daily rollups (btcolap.sql:200-210) are exact single-shot
  * aggregates; these operators are the beyond-parity incremental form
  * (SURVEY.md §2.12 "beyond the reference").
  */
object Sketches {

  /** Per-day HLL sketches of `keyCol` — the mergeable state table.
    * One shuffle at |days| cardinality; each sketch is ≤ ~2^lgK
    * bytes regardless of row count (lgK=12 → ≤ 4 KB, ~1.6% standard
    * error). Map-side combine does the heavy lifting: executors
    * pre-merge register arrays, so the shuffle moves |partitions·days|
    * sketches, never raw keys.
    */
  def dailyKeySketches(events: DataFrame, tsCol: String, keyCol: String,
                       lgK: Int = 12): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sk"))

  /** Grouped daily HLL sketches — [[dailyKeySketches]] with a
    * dimension column riding the group key: one row per (group, day),
    * still ≤ ~2^lgK bytes each. The shuffle carries
    * |groups|·|days| sketches; the raw keys never move.
    */
  def groupedDailyKeySketches(events: DataFrame, groupCol: String,
                              tsCol: String, keyCol: String,
                              lgK: Int = 12): DataFrame =
    events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sk"))

  /** Rolling distinct per (group, day) from the grouped sketch table —
    * the per-dimension rollup (distinct users per source per rolling
    * week) warehouses actually serve. Same bounded-state pin and
    * range-join shape as [[rollingDistinct]], with the join keyed on
    * the group so windows never mix dimensions.
    */
  def groupedRollingDistinct(daily: DataFrame,
                             windowDays: Int): DataFrame = {
    val d = daily.localCheckpoint(true)
    val other = d.select(col("g").as("g2"), col("day").as("d2"),
      col("sk").as("sk2"))
    // null-safe group match: groupBy keeps a NULL dimension as its own
    // group, and plain equality would silently drop every (NULL, day)
    // cell from the rollup (the MutableTable <=> convention)
    d.select(col("g"), col("day"))
      .join(other, col("g2") <=> col("g") && col("d2").between(
        date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("g"), col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk2")))
        .as("approx_distinct"))
      .withColumn("window_days", lit(windowDays))
      .select(col("g"), col("day"), col("window_days"),
        col("approx_distinct"))
  }

  /** Rolling `windowDays`-day distinct estimate per day, computed
    * ENTIRELY from the sketch table: day d unions the sketches of
    * days (d-windowDays+1 … d). The range join fans the sketch table
    * out windowDays× — |days|·windowDays rows of ≤ 4 KB each, O(MB)
    * for years of history — then one |days|-cardinality union
    * aggregate. The raw events table is not an input: at 100 TB the
    * window re-slides nightly against kilobytes of state.
    *
    * HLL union is a register-wise max — commutative and associative —
    * so the estimate is deterministic for a given input set (no
    * order dependence), which is what lets the t92 audit pin exact
    * relative-error values.
    */
  def rollingDistinct(daily: DataFrame, windowDays: Int): DataFrame = {
    // pin the bounded sketch table (|days| × ≤ 4 KB) before the
    // range self-join: both join sides then read the materialized
    // state instead of re-running the raw scan that produced it —
    // without this the committed plan scans the events table twice
    val d = daily.localCheckpoint(true)
    val other = d.select(col("day").as("d2"), col("sk").as("sk2"))
    d.select(col("day"))
      .join(other, col("d2").between(
        date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk2")))
        .as("approx_distinct"))
      .withColumn("window_days", lit(windowDays))
      .select(col("day"), col("window_days"), col("approx_distinct"))
  }

  /** Per-day KLL quantile sketches of `valCol` — the mergeable-state
    * analog of dailyKeySketches for ORDER STATISTICS (DataSketches
    * KLL, Karnin-Lang-Liberty FOCS'16): each day reduces to a
    * ~k·log(n) item summary with a distribution-free normalized rank
    * error bound (~1.65% two-sided at k=200), and summaries merge
    * without revisiting raw rows.
    */
  def dailyQuantileSketches(events: DataFrame, tsCol: String,
                            valCol: String, k: Int = 200): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(kll_sketch_agg_double(col(valCol).cast("double"), k).as("qsk"))

  /** Rolling `windowDays`-day quantiles per day from the KLL sketch
    * table — same range-join + union-aggregate shape as
    * rollingDistinct, so a re-slide touches kilobytes of summaries,
    * never the raw history. Emits one column per requested percentile
    * (p50/p95-style names); returned values are actual retained data
    * items at the requested normalized rank (KLL's contract), which
    * the t100 audit verifies by exact rank counting.
    */
  def rollingQuantiles(daily: DataFrame, windowDays: Int,
                       percentiles: Seq[Double]): DataFrame = {
    // same bounded-state pin as rollingDistinct: one raw scan total
    val d = daily.localCheckpoint(true)
    val other = d.select(col("day").as("d2"), col("qsk").as("qsk2"))
    val merged = d.select(col("day"))
      .join(other, col("d2").between(
        date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day"))
      .agg(kll_merge_agg_double(col("qsk2")).as("m"))
    val qCols = percentiles.map { p =>
      kll_sketch_get_quantile_double(col("m"), lit(p))
        .as("p" + math.round(p * 100))
    }
    merged.select(col("day") +: lit(windowDays).as("window_days") +: qCols: _*)
  }

  /** Per-day NEW-key counts (the first-seen/growth metric) from the
    * daily theta-sketch table: new(d) = |sketch(d) \ ∪sketch(<d)| via
    * theta set difference — the historical min-over-every-event
    * shuffle never runs; each day needs one union of prior summaries
    * and one difference, all on kilobyte objects. day 1 of the table
    * reports its full cardinality (no prior history), matching the
    * first-seen SQL semantics.
    *
    * In the exact regime (history under the sketch's nominal
    * capacity) the counts are EXACT and the driver row hash-matches a
    * DuckDB min-first-seen replay; beyond it the standard ~1.6%
    * theta estimate contract applies (the t93 two-tier shape).
    */
  def dailyNewKeys(events: DataFrame, tsCol: String,
                   keyCol: String): DataFrame = {
    // NULL keys are excluded BEFORE hashing: xxhash64(NULL) is a
    // constant (not NULL), so an unfiltered sketch would count a
    // phantom key where COUNT(DISTINCT) semantics count nothing
    val daily = events
      .filter(col(keyCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(theta_sketch_agg(xxhash64(col(keyCol))).as("sk"))
      // bounded-state pin (|days| × ≤ 32 KB): the history union and
      // the per-day join both read the materialized sketch table —
      // one raw scan total, not three
      .localCheckpoint(true)
    val prior = daily.select(col("day").as("d2"), col("sk").as("sk2"))
    val history = daily.select(col("day"))
      .join(prior, col("d2") < col("day"), "left")
      .groupBy(col("day"))
      .agg(theta_union_agg(col("sk2")).as("hist"))
    daily.join(history, "day")
      .select(col("day"),
        // cast before round: Spark's theta_sketch_estimate returns LONG;
        // the output contract (and oracle) is DOUBLE — without the cast
        // the driver's typed hash diverges on identical values
        round(theta_sketch_estimate(col("sk")).cast("double"), 6)
          .as("n_day"),
        round(when(col("hist").isNull,
            theta_sketch_estimate(col("sk")))
          .otherwise(theta_sketch_estimate(
            theta_difference(col("sk"), col("hist"))))
          .cast("double"), 6).as("n_new"))
  }

  /** Pairwise distinct-key overlap between groups via theta sketches —
    * |A|, |B|, |A ∩ B|, Jaccard — without ever joining the raw rows.
    * One scan reduces to |groups| sketches (default lgK=12: exact
    * below 4096 distinct keys per group, ~1.6% error above); the
    * pairwise comparison is a self-join of that |groups|-row table,
    * O(groups²) sketch-merge operations on kilobyte objects — the
    * group count is bounded (sources, languages, snapshots), the key
    * count is not, and only the key count rides the scan.
    *
    * Estimates are emitted as DOUBLE rounded to 6dp. In the exact
    * regime (every group under 4096 distinct keys) theta sketches
    * ARE exact, so the t93 driver row hash-matches a DuckDB
    * COUNT(DISTINCT) replay; beyond it the t93-gate bounds relative
    * error — same two-tier contract as the ANN family (exact oracle
    * at the gate regime, enforced floor for the estimate regime).
    */
  def groupOverlap(df: DataFrame, groupCol: String,
                   keyCol: String): DataFrame = {
    // NULL keys excluded before hashing (COUNT(DISTINCT) parity — see
    // dailyNewKeys); NULL groups drop out of the a < b pairing on both
    // the engine and oracle sides, consistently
    val sketches = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(theta_sketch_agg(xxhash64(col(keyCol))).as("sk"))
      // bounded-state pin (|groups| × ≤ 32 KB): both sides of the
      // pairwise self-join read the materialized sketch table — the
      // corpus-sized input is scanned ONCE, not once per join side
      .localCheckpoint(true)
    val a = sketches.select(col("g").as("g_a"), col("sk").as("sk_a"))
    val b = sketches.select(col("g").as("g_b"), col("sk").as("sk_b"))
    a.join(b, col("g_a") < col("g_b"))
      .select(
        col("g_a"), col("g_b"),
        // LONG→DOUBLE casts: the declared output type is DOUBLE (see
        // scaladoc above); Spark's estimate builtin returns LONG
        round(theta_sketch_estimate(col("sk_a")).cast("double"), 6)
          .as("n_a"),
        round(theta_sketch_estimate(col("sk_b")).cast("double"), 6)
          .as("n_b"),
        round(theta_sketch_estimate(
            theta_intersection(col("sk_a"), col("sk_b"))).cast("double"),
          6).as("n_both"),
        round(theta_sketch_estimate(
            theta_intersection(col("sk_a"), col("sk_b"))) /
          theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b"))), 6)
          .as("jaccard"))
  }
}
