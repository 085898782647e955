package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving curation beyond per-string PII redaction
  * (TextAnalysis.redactPii): group-level protections over
  * quasi-identifier combinations — the attributes that re-identify a
  * row when JOINED together (language × source × region …) even after
  * direct identifiers are scrubbed.
  */
object Privacy {

  /** The (quasi combination → group_size) count table both entry
    * points share: one map-side-combinable groupBy on the quasi key.
    * groupBy keeps NULL keys as their own group, so a null lang/source
    * still counts — the join back must use null-safe equality to
    * match (see [[kAnonymize]]).
    */
  private def groupSizes(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("group_size"))

  /** k-anonymity by suppression: flag every row whose quasi-identifier
    * combination occurs in fewer than `k` rows (the released subset —
    * `kept = true` rows — then satisfies k-anonymity w.r.t. those
    * columns). Adds `group_size` and `kept`; callers filter or audit.
    *
    * Scale shape: one map-side-combinable groupBy on the quasi key for
    * the group sizes, joined back on the same key — the join reuses
    * the aggregate's partitioning, and the count table is
    * group-cardinality (≪ corpus), so AQE broadcasts it while it
    * fits. No window over the corpus. The join-back is NULL-SAFE
    * (`<=>` per quasi column): a plain equi-join would silently drop
    * every row whose quasi key contains a NULL — neither kept nor
    * flagged, the worst failure mode for a privacy operator — whereas
    * the count-over-window formulation the oracle replays keeps
    * NULL-keyed rows as their own group.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = quasiCols.foldLeft(groupSizes(df, quasiCols)) {
      (d, c) => d.withColumnRenamed(c, s"__k_$c")
    }
    val cond = quasiCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(sizes, cond)
      .drop(quasiCols.map(c => s"__k_$c"): _*)
      .withColumn("kept", col("group_size") >= k)
  }

  /** The release audit that ships with [[kAnonymize]]: per quasi
    * combination — size, kept flag, and the share of total rows the
    * suppression removes. Derived ENTIRELY from the group-cardinality
    * count table (each quasi combination is one audit row, so its
    * n_rows IS its group_size): one corpus aggregate total, with the
    * total-row denominator one further aggregate over the count table
    * broadcast back as a 1-row frame — never a second corpus pass.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = groupSizes(df, quasiCols)
    sizes
      .withColumn("kept", col("group_size") >= k)
      .withColumn("n_rows", col("group_size"))
      .crossJoin(broadcast(
        sizes.agg(sum(col("group_size")).cast("double").as("__total"))))
      .withColumn("suppressed_share",
        when(col("kept"), 0.0)
          .otherwise(round(col("n_rows") / col("__total"), 6)))
      .select((quasiCols.map(col) :+ col("group_size") :+ col("kept") :+
        col("n_rows") :+ col("suppressed_share")): _*)
  }
}
