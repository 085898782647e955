package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result of a [[Curation]] run: the final frame plus the per-stage
  * audit ledger (step, stage, docs_in, docs_out) a pipeline owner
  * actually reads. The ledger rows are built from AGGREGATES over the
  * materialized stage outputs — never a driver-side row funnel.
  */
case class CurationRun(output: DataFrame, ledger: DataFrame)

/** Composable curation pipelines — the generalization of the t48
  * query: a corpus flows through an ordered list of named
  * (DataFrame ⇒ DataFrame) stages (filter → dedup → decontaminate →
  * mixture, or any other order), and the runner owns the two things
  * every hand-rolled composition got subtly wrong:
  *
  *  - EAGER MATERIALIZATION between stages: stage lineages nest
  *    (stage k's plan contains stages 1..k-1), and each stage feeds
  *    both its successor and two ledger counts — without an eager
  *    `localCheckpoint` per stage, early stages recompute
  *    multiplicatively (the t48 line filter re-ran ~8× per run before
  *    this; t47/cosineNearDups hit the same trap). At warehouse scale
  *    the equivalent materialization is a real table write per stage —
  *    the runner is where that swap happens, not each call site.
  *  - THE AUDIT LEDGER: per-stage in/out counts as a union of
  *    1-row aggregates, collected once, ordered by step.
  *
  * Stages stay pure DataFrame transforms, so each keeps its
  * operator's own scale shape; the runner adds nothing but the
  * checkpoint boundary and the counting.
  */
object Curation {

  /** A named pipeline stage. */
  type Stage = (String, DataFrame => DataFrame)

  /** Run `stages` in order over `input`. Every stage output is
    * eagerly materialized before the next stage (and the ledger)
    * consumes it; `docs_in` of stage 1 counts the raw input.
    *
    * `materialize` is the stage boundary: the default eager
    * `localCheckpoint` fits a single-session run; a warehouse-scale
    * pipeline passes a real table write-and-read-back (e.g.
    * `df => { df.write.parquet(p); spark.read.parquet(p) }`) so stage
    * outputs survive the session and downstream stages read columnar
    * storage instead of checkpoint blocks.
    */
  def run(input: DataFrame, stages: Seq[Stage],
          materialize: DataFrame => DataFrame =
            _.localCheckpoint(true)): CurationRun = {
    require(stages.nonEmpty, "curation pipeline needs at least one stage")
    var cur = input
    val ledgers = stages.zipWithIndex.map { case ((name, f), i) =>
      val in = cur
      val out = materialize(f(in))
      cur = out
      in.agg(count(lit(1)).as("docs_in"))
        .crossJoin(out.agg(count(lit(1)).as("docs_out")))
        .select(lit(i + 1).as("step"), lit(name).as("stage"),
                col("docs_in"), col("docs_out"))
    }
    CurationRun(cur, ledgers.reduce(_.unionByName(_)).orderBy(col("step")))
  }
}
