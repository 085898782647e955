package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams — ordered funnels and
  * retention cohorts, the two query classes every product-analytics
  * warehouse (Amplitude/Mixpanel-style) is built around and plain
  * GROUP BY cannot express: both depend on each user's FIRST
  * qualifying times, not on unordered event sets.
  *
  * Scale shape: everything reduces user-first — conditional-min
  * aggregates and user-keyed joins on the high-cardinality user id
  * (partitions spread; no corpus-wide window, no sessionless
  * self-join of raw events against raw events). Step chains join the
  * per-user timestamp table (|users| rows) back to the one filtered
  * event slice they need, so each funnel step costs one
  * events-of-that-type scan plus a user-keyed shuffle.
  */
object Behavior {

  /** Ordered funnel: for steps (s₁ … sₙ), a user converts through
    * step i when an sᵢ event exists STRICTLY AFTER their first
    * qualifying sᵢ₋₁ time (the standard first-touch funnel
    * semantics; re-orderable events that happened earlier do not
    * count). Emits one row per step: (step, step_name, n_users,
    * conversion) — conversion = n_users / previous step's n_users,
    * 6dp, 1.0 for the first step.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol).as("u")
    // fold: per-user first qualifying time per step
    // each per-step frame is PINNED (bounded at |users| rows): step
    // i's lineage chains through every earlier step, so without the
    // pin counting n steps re-scans events O(n²) times — and the
    // conversion self-join would re-run the whole union again
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t"))
      .localCheckpoint(true)
    val perStep = steps.tail.foldLeft(List(first)) { (acc, s) =>
      val prev = acc.head
      val next = events.filter(col(typeCol) === s)
        .select(col(userCol).as("u"), col(tsCol).as("ts"))
        .join(prev.select(col("u"), col("t").as("t_prev")), Seq("u"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("u")).agg(min(col("ts")).as("t"))
        .localCheckpoint(true)
      next :: acc
    }.reverse
    val counts = perStep.zip(steps).zipWithIndex.map {
      case ((df, name), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
                  col("n_users"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    // conversion from the previous step: a |steps|-row self-join
    val prevCounts = counts.select((col("step") + 1).as("step"),
      col("n_users").as("n_prev"))
    counts.join(prevCounts, Seq("step"), "left")
      .select(col("step"), col("step_name"), col("n_users"),
        when(col("n_prev").isNull, lit(1.0))
          // an empty previous step makes conversion 0/0 — define it
          // as 0.0 (the oracle mirrors; Spark NULL vs DuckDB NaN
          // would otherwise diverge)
          .when(col("n_prev") === 0, lit(0.0))
          .otherwise(round(col("n_users").cast("double") / col("n_prev"), 6))
          .as("conversion"))
  }

  /** Retention cohorts: cohort = ISO week of each user's FIRST event;
    * a cohort's week-k cell counts its users active in cohort_week +
    * k weeks. Emits (cohort_week, week_no, n_active, retention) with
    * retention = n_active / cohort size (week 0 ≡ 1.0 by
    * construction). Two user-keyed aggregates plus one join of
    * |user-weeks| against |users| — never events × events.
    */
  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    // pinned (|users| rows): consumed by both the cells join and the
    // cohort-size aggregate — one events scan for it, not two
    val firsts = events
      .groupBy(col(userCol).as("u"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
      .localCheckpoint(true)
    val active = events
      .select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    // (u, week) is distinct and a user has exactly one cohort_week,
    // so a plain count is the distinct-user count — no second dedup
    val cells = active.join(firsts, Seq("u"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_no"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_no"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** First-order Markov transition profile: for each user's event
    * sequence (ordered by time, id-tiebroken), count consecutive
    * (prev_type → type) steps and the conditional probability
    * P(next = b | current = a). The third canonical behavioral
    * readout after funnels and retention — "where do users go next"
    * — and the input to Markov churn/path models.
    *
    * Scale shape: ONE per-user ordered window (lag) — user windows
    * parallelize across the user-id shuffle, no corpus-wide ordering
    * — then a |types|²-sized count aggregate (map-side combined) with
    * row sums from a window over that tiny aggregated frame. Output:
    * (prev_type, next_type, n, p).
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    // row sums via a window over the ALREADY-AGGREGATED |types|²-row
    // frame — a separate totals aggregation would re-run the per-user
    // lag window (the expensive stage) a second time
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    steps.select(col("prev_type"), col("next_type"), col("n"),
      round(col("n").cast("double") / sum(col("n")).over(wTot), 6).as("p"))
  }

  /** Next-event entropy per state: how PREDICTABLE each event type's
    * successor is — H(next | current = a) = −Σ_b p_b ln p_b over the
    * transition row, plus the ln(k)-normalized form in [0, 1]
    * (0 = deterministic bot-like flow, 1 = uniform wandering). The
    * one-number-per-state collapse of [[transitions]], and the
    * behavioral twin of the lexical diversity report: scripted /
    * replayed / synthetic traffic shows up as near-zero entropy
    * states long before a human reads the full transition matrix.
    *
    * Arithmetic contract: each term routes through the BIGINT
    * micro-log boundary — round(p·ln(p)·10⁶) with p one IEEE divide
    * of exact counts — so the per-state entropy sum is an
    * ORDER-INDEPENDENT integer sum, not a float reduction (the t163
    * micro-log convention). Doubles reappear only at the final 6dp
    * divisions.
    *
    * Scale shape: one per-user lag window (via [[transitions]]) into
    * a |types|²-row frame; everything after is bounded by the type
    * vocabulary. Output: (prev_type, n_out, k_next, entropy,
    * norm_entropy) — entropy in nats, 6dp.
    */
  def transitionEntropy(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String): DataFrame = {
    val t = transitions(events, userCol, tsCol, typeCol, idCol)
      .select(col("prev_type"), col("next_type"), col("n"))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    val p = col("n").cast("double") / sum(col("n")).over(wTot)
    t.withColumn("__micro", round(p * log(p) * lit(1e6), 0).cast("long"))
      .groupBy(col("prev_type"))
      .agg(sum(col("n")).as("n_out"), count(lit(1)).as("k_next"),
           sum(col("__micro")).as("__msum"))
      .select(col("prev_type"), col("n_out"), col("k_next"),
        round(-col("__msum").cast("double") / 1e6, 6).as("entropy"),
        when(col("k_next") > 1,
          round(-col("__msum").cast("double") / 1e6
            / log(col("k_next").cast("double")), 6))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Gap-based SESSIONIZATION: split each user's event stream into
    * sessions wherever the gap to the previous event exceeds
    * `gapSeconds`, and emit one row per session with its size, start,
    * duration, and event-type breadth. The unit of analysis every
    * engagement / journey metric downstream expects ("events per
    * session", "session length"), and the precondition for
    * session-scoped dedup and path mining — raw event streams have no
    * session column; this derives it deterministically.
    *
    * Semantics: events order by (ts, id) per user (id breaks
    * timestamp ties deterministically); a session break fires when
    * the previous event is absent or the microsecond gap is STRICTLY
    * greater than the threshold; session_no is the per-user running
    * break count (1-based). Timestamps flow as exact epoch
    * microseconds (`unix_micros` ↔ `epoch_us`), so counts, starts,
    * and durations are all exact BIGINTs — no float boundary at all.
    *
    * Scale shape: ONE per-user ordered window carries both the lag
    * and the running break-count (same partitioning and ordering —
    * one shuffle, one sort), exactly the [[transitions]] contract:
    * user windows parallelize across the user-id shuffle and a
    * user's rows bound the window task, never the corpus. The
    * session roll-up is a map-side-combinable groupBy on the same
    * (user, session) key distribution.
    *
    * Output: (userCol, session_no, n_events, start_us, duration_us,
    * n_types), one row per session.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, idCol: String,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("__brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .groupBy(col(userCol), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        countDistinct(col(typeCol)).as("n_types"))
  }

  /** RFM SEGMENTATION — the classic recency/frequency/monetary
    * customer-value grid (Hughes), here the per-user engagement
    * segmentation a corpus/product pipeline uses to weight or stratify
    * users: each user scores 1–3 per dimension (3 = most recent /
    * most frequent / highest value) and the output is the segment
    * grid with its user counts.
    *
    * Score semantics are VALUE-THRESHOLD tertiles, not ntile: the
    * cut points q₁/q₂ are exact order statistics (smallest v with
    * 3·cum ≥ k·n — the [[graft.ops.Profiling.weightedQuantiles]]
    * integer rank test) and every user with the same metric value
    * gets the same score (ntile would split ties by arbitrary rank —
    * neither reproducible nor meaningful). Recency scores INVERTED
    * (smaller day-gap = better = 3).
    *
    * Scale shape: one per-user collapse (map-side combinable) is the
    * corpus-sized stage; the three metric cut tables compute on
    * distinct-value cells under a 3-partition (metric-keyed) window
    * (bin money first at unbounded cardinality — the t137 hatch) and
    * broadcast back as ONE 1-row frame; scoring is per-row
    * comparisons and the grid is a ≤27-row aggregate.
    *
    * Output: (r_score, f_score, m_score, n_users) — scores 1–3.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val u = events.filter(col(valueCol).isNotNull)
      .groupBy(col(userCol))
      .agg(max(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long")).as("__last"),
        count(lit(1)).as("__freq"),
        sum(round(col(valueCol) * 100, 0).cast("long")).as("__money"))
    val maxd = u.agg(max(col("__last")).as("__maxd"))
    val s = u.crossJoin(broadcast(maxd))
      .select(col(userCol), (col("__maxd") - col("__last")).as("__rec"),
        col("__freq"), col("__money"))
    val metrics = Seq("rec" -> col("__rec"), "freq" -> col("__freq"),
      "money" -> col("__money"))
    val cells = metrics.map { case (tag, c) =>
      s.groupBy(c.as("__v")).agg(count(lit(1)).as("__c"))
        .select(lit(tag).as("__metric"), col("__v"), col("__c"))
    }.reduce(_ unionAll _)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__metric"))
    val ord = whole.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val cuts = cells
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("__cw", sum(col("__c")).over(ord))
      .groupBy(col("__metric"))
      .agg(min(when(col("__cw") * 3 >= col("__n"), col("__v"))).as("__q1"),
        min(when(col("__cw") * 3 >= col("__n") * 2, col("__v"))).as("__q2"))
    // pivot the 3-row cut table into one broadcastable row
    val wide = cuts.groupBy()
      .agg(max(when(col("__metric") === "rec", col("__q1"))).as("__rq1"),
        max(when(col("__metric") === "rec", col("__q2"))).as("__rq2"),
        max(when(col("__metric") === "freq", col("__q1"))).as("__fq1"),
        max(when(col("__metric") === "freq", col("__q2"))).as("__fq2"),
        max(when(col("__metric") === "money", col("__q1"))).as("__mq1"),
        max(when(col("__metric") === "money", col("__q2"))).as("__mq2"))
    s.crossJoin(broadcast(wide))
      .select(
        (lit(3L) - (col("__rec") > col("__rq1")).cast("long") -
          (col("__rec") > col("__rq2")).cast("long")).as("r_score"),
        (lit(1L) + (col("__freq") > col("__fq1")).cast("long") +
          (col("__freq") > col("__fq2")).cast("long")).as("f_score"),
        (lit(1L) + (col("__money") > col("__mq1")).cast("long") +
          (col("__money") > col("__mq2")).cast("long")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"))
  }
}
