package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelize heavy per-row work over an UNSPLITTABLE-small scan.
  *
  * A parquet file smaller than one scan split
  * (`spark.sql.files.maxPartitionBytes`, default 128 MB) reads as ONE
  * task — typically one row group, which Spark cannot subdivide — so
  * every narrow transformation downstream (per-row kernels, explode
  * fan-outs, map-side join probes) runs on one core of the machine
  * no matter how many are idle. That is the guide-§2.5 "huge
  * unsplittable file" input-skew case in miniature, and the fix is
  * the same: repartition immediately after the read.
  *
  * The repartition is GUARDED by the data size, not by the deploy
  * mode: it fires only when the frame's entire file input fits inside
  * a single scan split, so the added exchange is bounded by the split
  * size (~128 MB — trivial), and at production scale — many splits,
  * many tasks — the predicate is false and this is the identity. No
  * large scan ever gains an exchange. Frames with no file inputs
  * (checkpoints, local relations, streaming sources) are returned
  * unchanged.
  *
  * Result-safety: round-robin repartition only changes the physical
  * row layout; callers apply it ahead of key-based aggregations,
  * joins, and the deterministic bounded-heap top-k (ties broken by
  * id — "deterministic for any input order", TopKAggregate), so
  * results are unchanged.
  */
object Spread {

  /** [[ifTinyScan]] with a CAP on the fan-out. The full
    * defaultParallelism split is right when the per-row kernel swamps
    * scheduling floors; for mid-weight kernels whose output feeds
    * several more jobs (each re-reading the spread partitioning), a
    * capped split keeps most of the compute win while holding every
    * downstream stage's task count — and so its scheduling floor —
    * down. Same data-size guard: identity at production scale.
    */
  def ifTinyScanTo(df: DataFrame, maxParts: Int): DataFrame =
    spreadTo(df, math.min(maxParts,
      df.sparkSession.sparkContext.defaultParallelism))

  def ifTinyScan(df: DataFrame): DataFrame =
    spreadTo(df, df.sparkSession.sparkContext.defaultParallelism)

  private def spreadTo(df: DataFrame, parts: Int): DataFrame = {
    val spark = df.sparkSession
    val files =
      try df.inputFiles
      catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) return df
    val sizes = files.map { f =>
      try {
        val uri = new java.net.URI(f)
        if (uri.getScheme == null || uri.getScheme == "file")
          new java.io.File(uri.getPath).length()
        else -1L // remote store: size unknown here — treat as large
      } catch { case _: Throwable => -1L }
    }
    if (sizes.exists(_ < 0)) return df
    val bytes = sizes.sum
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    if (bytes < maxSplit) df.repartition(parts)
    else df
  }
}
