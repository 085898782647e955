package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality assertion suites — the dbt-test/Great-Expectations
  * shape: a table ships with declared expectations (non-null keys,
  * value ranges, format regexes, key uniqueness), and every refresh
  * runs them and reads one small report instead of eyeballing data.
  * For a training-data warehouse this is the release gate in front of
  * every curated-corpus hand-off.
  */
object Validate {

  /** Run per-row `rules` (name → boolean Column) over `df` in ONE
    * scan: all rules aggregate in a single pass (each is one
    * conditional-sum slot in the same partial aggregate — no shuffle
    * beyond the 1-row reduction, no per-rule job). A row where a
    * rule's predicate evaluates NULL (three-valued SQL: comparisons
    * against NULL inputs) counts as a VIOLATION — unknown is not
    * passed, the convention every expectations framework uses.
    *
    * Output: one row per rule — (rule, n_violations, n_rows,
    * violation_share 6dp, passed).
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.length == rules.length,
      "rule names must be unique")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0).otherwise(1))
        .cast("long").as(s"__v_$name")
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"),
               col(s"__v_$name").as("n_violations"),
               col("__n").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"),
              col("r.n_violations").as("n_violations"),
              col("r.n_rows").as("n_rows"))
      .withColumn("violation_share",
        when(col("n_rows") > 0,
          round(col("n_violations") / col("n_rows"), 6)).otherwise(0.0))
      .withColumn("passed", col("n_violations") === 0)
  }

  /** Key-uniqueness expectation as the same report row shape:
    * n_violations = rows beyond the first per key (so 0 ⇔ the key is
    * unique). One map-side-combinable count on the key — the
    * group-cardinality shape, never a window; NULL keys group like any
    * value (a duplicated NULL key is a duplication too).
    */
  def checkUnique(df: DataFrame, keyCols: Seq[String],
                  ruleName: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"),
           coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(lit(ruleName).as("rule"), col("n_violations"), col("n_rows"))
      .withColumn("violation_share",
        when(col("n_rows") > 0,
          round(col("n_violations") / col("n_rows"), 6)).otherwise(0.0))
      .withColumn("passed", col("n_violations") === 0)
  }
}
