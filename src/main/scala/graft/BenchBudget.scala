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

  /** Queries whose best-of-passes time exceeds their budget limit.
    * Queries without a budget row (new this round) are skipped until
    * the next refresh.
    */
  def violations(best: collection.Map[String, Double],
                 budget: collection.Map[String, Double]): List[String] =
    best.keys.filter { k =>
      budget.get(k).exists(b => best(k) > limit(b))
    }.toList.sorted

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
