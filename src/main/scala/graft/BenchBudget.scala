package graft

/** Per-query wall-time budget policy for the bench battery, extracted
  * from Bench so the trip rule is spec-testable and replayable against
  * recorded batteries.
  *
  * Contract (round 11, after the round-10 rc=1 post-mortem):
  *   - a query trips when its BEST-OF-ALL-PASSES time exceeds
  *     max(3 × budget, budget + 2 s) — the min over passes means a
  *     violation only fires when EVERY pass exceeded the limit, so a
  *     one-pass scheduler hiccup cannot fail the battery;
  *   - the +2 s floor gives sub-second allocation-sensitive rows the
  *     absolute headroom that a pure 3× multiplier denies them
  *     (round 10 tripped at 1.03 s recorded vs a 6.61 s driver run —
  *     a plan defect, but the same rule would also have tripped on a
  *     2.5 s noise spike over a 0.8 s budget);
  *   - budgets are refreshed from the MAX of the last few recorded
  *     batteries (builder close runs + the driver's own run, kept
  *     under docs/bench_history/), not the single latest run —
  *     scripts/refresh_budget.py does the max-merge.
  */
object BenchBudget {
  /** Wall-time limit for a recorded budget of `b` seconds. */
  def limit(b: Double): Double = math.max(3.0 * b, b + 2.0)

  /** Battery-level machine-speed normalization (round 13, after the
    * round-12 rc=1 post-mortem — the THIRD single-row battery failure,
    * and the first that was a machine-tail false positive rather than
    * a plan defect): each of rounds 10–12 tripped exactly ONE query,
    * and `max(3×, +2 s)` gives the least absolute headroom to
    * fixed-overhead-dominated sub-3-s rows — precisely the rows with
    * the highest variance RATIO on a contended machine. A single
    * systematically slow machine should fail zero rows or many, never
    * exactly one thin one.
    *
    * The factor is the MEDIAN of per-query best/budget ratios over
    * budgeted rows with budget ≥ 0.5 s (sub-half-second rows are
    * allocation noise). Budgets are MAX-merges over recorded
    * batteries, so a normal battery medians well BELOW 1 (the r12
    * driver pass — itself 1.5–2.5× slower than builder medians on
    * every heavy query — medianed 0.72 against the pre-merge base);
    * a median above 1.2 therefore means the typical query is running
    * 20%+ over its historical WORST — unambiguous whole-machine
    * slowness, and every limit scales by that ratio. One regressed
    * query cannot move a 300-row median, so a real plan defect still
    * trips at full strength; the statistic is meaningless on a
    * handful of rows, so batteries with < 25 budgeted queries keep
    * the unscaled rule (and the small planted-regression spec cases
    * stay exact).
    */
  def machineFactor(best: collection.Map[String, Double],
                    budget: collection.Map[String, Double]): Double = {
    val ratios = best.keysIterator.flatMap { k =>
      budget.get(k).filter(_ >= 0.5).map(b => best(k) / b)
    }.toIndexedSeq.sorted
    if (ratios.size < 25) 1.0
    else {
      val mid = ratios.size / 2
      val med = if (ratios.size % 2 == 1) ratios(mid)
                else (ratios(mid - 1) + ratios(mid)) / 2.0
      if (med > 1.2) med else 1.0
    }
  }

  /** Queries whose best-of-passes time exceeds their budget limit,
    * after battery-level machine-speed normalization (limits scale by
    * [[machineFactor]] when the whole battery ran systematically over
    * its base). Queries without a budget row (new this round) are
    * skipped until the next refresh.
    */
  def violations(best: collection.Map[String, Double],
                 budget: collection.Map[String, Double]): List[String] = {
    val mf = machineFactor(best, budget)
    best.keys.filter { k =>
      budget.get(k).exists(b => best(k) > limit(b) * mf)
    }.toList.sorted
  }

  /** Parse a budget tsv (name \t seconds; # comments). */
  def parseTsv(lines: Iterable[String]): Map[String, Double] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("\t") match {
          case Array(k, v) => v.toDoubleOption.map(k -> _)
          case _ => None
        }
      }.toMap

  /** Extract the per-query seconds map from a recorded bench.json
    * line without a JSON library: the queries object is flat
    * {"name":1.234,...} by construction (Bench writes it).
    */
  def parseBenchQueries(json: String): Map[String, Double] = {
    val qIdx = json.indexOf("\"queries\":{")
    if (qIdx < 0) return Map.empty
    val start = qIdx + "\"queries\":{".length
    val end = json.indexOf("}", start)
    if (end < 0) return Map.empty
    json.substring(start, end).split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) =>
            v.toDoubleOption.map(k.stripPrefix("\"").stripSuffix("\"") -> _)
          case _ => None
        }
      }.toMap
  }

  /** Max-merge several recorded batteries into one budget map — the
    * refresh rule: a query's budget is the largest time any recent
    * recorded run needed, so machine-class drift between builder and
    * driver is inside the base, not the multiplier.
    */
  def maxMerge(runs: Seq[Map[String, Double]]): Map[String, Double] =
    runs.flatten.groupMapReduce(_._1)(_._2)(math.max)
}
