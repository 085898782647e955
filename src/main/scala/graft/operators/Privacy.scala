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

  /** k-anonymity by suppression: flag every row whose quasi-identifier
    * combination occurs in fewer than `k` rows (the released subset —
    * `kept = true` rows — then satisfies k-anonymity w.r.t. those
    * columns). Adds `group_size` and `kept`; callers filter or audit.
    *
    * Scale shape: one map-side-combinable groupBy on the quasi key for
    * the group sizes, joined back on the same key — the join reuses
    * the aggregate's partitioning, and the count table is
    * group-cardinality (≪ corpus), so AQE broadcasts it while it
    * fits. No window over the corpus.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val key = quasiCols.map(col)
    val sizes = df.groupBy(key: _*)
      .agg(count(lit(1)).as("group_size"))
    df.join(sizes, quasiCols)
      .withColumn("kept", col("group_size") >= k)
  }

  /** The release audit that ships with [[kAnonymize]]: per quasi
    * combination — size, kept flag, and the share of total rows the
    * suppression removes. One aggregate over the count table.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Int): DataFrame = {
    val flagged = kAnonymize(df, quasiCols, k)
    val total = flagged.count().toDouble
    flagged.groupBy((quasiCols.map(col) :+ col("group_size") :+
        col("kept")): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("suppressed_share",
        when(col("kept"), 0.0)
          .otherwise(round(col("n_rows") / total, 6)))
  }
}
