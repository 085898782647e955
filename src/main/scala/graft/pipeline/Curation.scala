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

  /** [[run]] with DURABLE stage checkpoints — the restartable form a
    * 100 TB run needs: every stage output AND its ledger row persist
    * as parquet under `checkpointDir` (stage_k / ledger_k), and a
    * re-invocation with the same directory SKIPS every stage whose
    * checkpoint is already complete (atomic `_SUCCESS` marker), so a
    * run that died at stage k restarts at stage k — with stages 1..k-1
    * never recomputed and their ledger rows read back bit-identical
    * (CurationSpec kills a runner mid-chain and pins exactly this).
    *
    * Scale shape: identical to [[run]] except the stage boundary is a
    * real columnar write-and-read-back instead of `localCheckpoint` —
    * which is ALSO what a warehouse pipeline wants per se (downstream
    * stages read parquet, the session can die between stages, and a
    * completed stage is a browsable table). `checkpointDir` may be
    * any Hadoop-FS path (HDFS/S3A/local); completeness is the
    * committer's `_SUCCESS` marker, so a half-written stage from a
    * crashed run re-runs instead of being trusted.
    *
    * A checkpoint is reused only when its PIPELINE FINGERPRINT
    * matches: each stage writes `fingerprint_k` = a hash chain over
    * (inputFingerprint, every upstream stage's position + name, its
    * own) — so resuming the same directory with a reordered, renamed,
    * inserted, or removed stage list, or a different declared input,
    * re-runs from the first divergent stage instead of silently
    * trusting `_SUCCESS` alone. (Stage CLOSURES cannot be hashed —
    * same-name logic edits are the caller's responsibility: bump the
    * stage name or pass a new `inputFingerprint`, e.g. a code version
    * or an input snapshot id.) Checkpoints from before this contract
    * carry no fingerprint file and re-run — safe, never stale.
    */
  def runCheckpointed(input: DataFrame, stages: Seq[Stage],
                      checkpointDir: String,
                      inputFingerprint: String = ""): CurationRun = {
    require(stages.nonEmpty, "curation pipeline needs at least one stage")
    val spark = input.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(checkpointDir).getFileSystem(conf)
    def complete(path: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def readFp(p: org.apache.hadoop.fs.Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](256)
          var n = in.read(tmp)
          while (n > 0) { bos.write(tmp, 0, n); n = in.read(tmp) }
          Some(new String(bos.toByteArray, "UTF-8"))
        } finally in.close()
      }
    def writeFp(p: org.apache.hadoop.fs.Path, v: String): Unit = {
      val out = fs.create(p, true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    var cur = input
    var fp = md5hex(s"graft-curation:$inputFingerprint")
    // once any stage re-runs, everything after it re-runs too: a later
    // stage's _SUCCESS+fingerprint describe outputs of the OLD chain
    var upstreamReran = false
    val ledgers = stages.zipWithIndex.map { case ((name, f), i) =>
      val step = i + 1
      fp = md5hex(s"$fp:$step:$name")
      val outPath = s"$checkpointDir/stage_$step"
      val ledgerPath = s"$checkpointDir/ledger_$step"
      val fpPath = new org.apache.hadoop.fs.Path(
        s"$checkpointDir/fingerprint_$step")
      if (!upstreamReran && complete(outPath) && complete(ledgerPath) &&
          readFp(fpPath).contains(fp)) {
        cur = spark.read.parquet(outPath)
      } else {
        upstreamReran = true
        fs.delete(fpPath, false) // invalidate before touching data
        val in = cur
        f(in).write.mode("overwrite").parquet(outPath)
        val out = spark.read.parquet(outPath)
        in.agg(count(lit(1)).as("docs_in"))
          .crossJoin(out.agg(count(lit(1)).as("docs_out")))
          .select(lit(step).as("step"), lit(name).as("stage"),
                  col("docs_in"), col("docs_out"))
          .coalesce(1).write.mode("overwrite").parquet(ledgerPath)
        writeFp(fpPath, fp)
        cur = out
      }
      spark.read.parquet(ledgerPath)
    }
    CurationRun(cur, ledgers.reduce(_.unionByName(_)).orderBy(col("step")))
  }
}
