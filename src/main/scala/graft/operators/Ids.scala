package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense global id assignment — the scalable form of
  * `row_number() OVER (ORDER BY ...)`. Training pipelines need stable
  * contiguous sample ids (shard manifests, curriculum order, resume
  * points), but the obvious global-window rank funnels the entire
  * corpus through ONE partition, and
  * `monotonically_increasing_id()` is neither dense nor stable across
  * retries.
  */
object Ids {

  /** `idColName` = the 0-based dense global rank of `orderCols`.
    *
    * Scale shape: range-repartition on the order key [one shuffle,
    * parallelism = partition count], count rows per partition [the
    * bounded driver state: one long per partition], broadcast the
    * prefix offsets back as a map literal, and add a WITHIN-partition
    * row_number — every window partition is exactly one data
    * partition (range partitions are key-ordered, so offset +
    * local rank = global rank), and the per-partition sorts run in
    * parallel instead of funneling.
    *
    * The range boundaries Spark samples are not reproducible across
    * jobs, so the partitioned frame materializes eagerly ONCE — the
    * count job and the final pass read the SAME cached partitions —
    * and the OUTPUT is deterministic wherever the boundaries fell,
    * because the offsets correct any imbalance. Callers must pass a
    * total order (include a unique tiebreak column): with ties the
    * within-tie order would be partition-placement-dependent.
    *
    * The plan carries one more exchange than strictly necessary (the
    * window hash-partitions on `__pid`, which the cached frame is
    * already grouped by — Catalyst cannot see that equivalence), but
    * BOTH exchanges are balanced full-width shuffles; the shape this
    * operator exists to avoid is the one-partition sort the naive
    * global window degenerates to.
    */
  def denseIds(df: DataFrame, idColName: String, orderCols: Seq[Column],
               numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val parted = numPartitions
      .map(n => df.repartitionByRange(n, orderCols: _*))
      .getOrElse(df.repartitionByRange(orderCols: _*))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty)
      return parted.drop("__pid").withColumn(idColName, lit(0L))
    var acc = 0L
    val offsets: Map[Int, Long] = counts.keys.toSeq.sorted.map { p =>
      val entry = p -> acc
      acc += counts(p)
      entry
    }.toMap
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    parted
      .withColumn(idColName,
        element_at(typedLit(offsets), col("__pid")) +
          row_number().over(w).cast("long") - 1L)
      .drop("__pid")
  }

  /** Deterministic per-epoch training order: epoch `e`'s permutation
    * is the dense rank of `md5(e:id)` (id tiebreak) — a different,
    * reproducible global shuffle per epoch, the property epoch
    * reshuffling needs (same data, new order, any worker can recompute
    * its shard's order without coordination). Each epoch rides
    * [[denseIds]], so the "global sort" is a range repartition +
    * parallel in-partition ranks with one long of driver state per
    * partition — never a single-task window.
    *
    * Output is the PROJECTED permutation table — one (id, epoch,
    * epoch_pos) row per (row, epoch), epoch_pos dense in [0, N) within
    * each epoch. Consumers only need the order; materializing `epochs`
    * full copies of a 100 TB corpus just to carry a rank is epochs×
    * write amplification, so the payload columns stay behind and the
    * caller joins the permutation back on `idCol` when (and only
    * when) it actually re-materializes an epoch. [[epochShuffleRows]]
    * keeps the old full-row form for small frames where the join
    * round-trip costs more than the copies.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    (0 until epochs).map { e =>
      denseIds(
        df.select(col(idCol)).withColumn("epoch", lit(e)),
        "epoch_pos", epochOrder(idCol, e))
    }.reduce(_ unionByName _)
  }

  /** [[epochShuffle]] carrying EVERY input column through each epoch —
    * the convenience form for small/dimension-sized frames. At corpus
    * scale prefer the projected default: this one writes `epochs` full
    * copies of the input.
    */
  def epochShuffleRows(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    (0 until epochs).map { e =>
      denseIds(df.withColumn("epoch", lit(e)),
        "epoch_pos", epochOrder(idCol, e))
    }.reduce(_ unionByName _)
  }

  /** The shared epoch-`e` permutation key: md5 of "e:id" with the id
    * itself as the total-order tiebreak (denseIds requires one).
    */
  private def epochOrder(idCol: String, e: Int): Seq[Column] =
    Seq(md5(concat(lit(e.toString), lit(":"), col(idCol).cast("string"))),
        col(idCol))

  /** Size-balanced output sharding — the shard-assignment step of
    * writing a curated corpus as N reproducible files: shard =
    * ⌊global rank / rowsPerShard⌋ over the caller's total order, so
    * every shard except the last holds exactly `rowsPerShard` rows
    * and shard boundaries are a pure function of the data (stable
    * across runs, resumable, and any worker can recompute its own
    * shard's membership). Adds `shard` and `shard_pos` (the 0-based
    * rank within the shard). The rank rides [[denseIds]] — range
    * repartition + per-partition offsets, never a one-task global
    * window — and a downstream `write.partitionBy("shard")` (or a
    * per-shard repartition) turns the assignment into the physical
    * layout.
    */
  def shardAssign(df: DataFrame, orderCols: Seq[Column],
                  rowsPerShard: Long): DataFrame = {
    require(rowsPerShard >= 1, s"rowsPerShard must be >= 1, got $rowsPerShard")
    denseIds(df, "__pos", orderCols)
      .withColumn("shard", floor(col("__pos") / rowsPerShard).cast("int"))
      .withColumn("shard_pos", pmod(col("__pos"), lit(rowsPerShard)))
      .drop("__pos")
  }

  /** The manifest that ships with [[shardAssign]]'s layout: one row
    * per shard — row count, the id range it covers, and the summed
    * payload weight (token count, bytes — whatever `weightCol`
    * measures). One map-side-combinable aggregate over the assignment;
    * the manifest is shard-cardinality, the thing a training job reads
    * INSTEAD of listing 100 TB of files.
    */
  def shardManifest(assigned: DataFrame, idCol: String,
                    weightCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
           min(col(idCol)).as("min_id"),
           max(col(idCol)).as("max_id"),
           sum(col(weightCol)).as("total_weight"))

  /** Rendezvous (highest-random-weight) shard assignment — the
    * CONSISTENT counterpart of [[shardAssign]]'s rank-based layout:
    * shard(id) = argmax over s ∈ [0, numShards) of md5(s:id). The
    * property [[shardAssign]] cannot give: growing numShards → N+1
    * moves only the ids whose NEW shard's score beats their previous
    * maximum — an expected 1/(N+1) of the corpus, every moved id
    * landing ON the new shard — where rank-based sharding reflows
    * nearly every boundary. That is the incremental-reshard story: a
    * 100 TB corpus adds a shard and rewrites ~1/(N+1) of its bytes,
    * not all of them.
    *
    * Pure per-row map-side arithmetic (no shuffle, no state): one
    * md5 per (row, shard), argmax by hex-string comparison inside a
    * single codegen'd expression — engine-portable (any system with
    * md5 replays the assignment bit-for-bit). Cost is O(numShards)
    * hashes per row: fine to a few hundred shards; for thousands,
    * compose two levels (HRW over ⌈√N⌉ groups, then within the
    * group) — same movement property, O(2√N) hashes.
    */
  def rendezvousShards(df: DataFrame, idCol: String, numShards: Int,
                       shardColName: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val cand = transform(sequence(lit(0), lit(numShards - 1)),
      s => struct(
        md5(concat(s.cast("string"), lit(":"),
          col(idCol).cast("string"))).as("score"),
        s.cast("int").as("s")))
    df.withColumn(shardColName, array_max(cand).getField("s"))
  }

  /** The thousands-of-shards form of [[rendezvousShards]]: HRW over
    * `numGroups` groups first, then HRW over the group's shards
    * (shard s lives in group s mod numGroups) — O(numGroups +
    * N/numGroups) hashes per row (≈ 2√N at numGroups ≈ √N) instead of
    * O(N). The movement contract survives per level: with numGroups
    * FIXED, growing N → N+1 adds the new shard to one group, ids in
    * every other group are untouched, and within the affected group
    * the flat-HRW argument applies — expected movement
    * ≈ (1/numGroups)·(numGroups/N) = 1/N, every mover landing on the
    * new shard. (Changing numGroups IS a reshard of everything — pin
    * it per layout generation; that is why it is an explicit
    * parameter and not derived from numShards.)
    */
  def rendezvousShardsTwoLevel(df: DataFrame, idCol: String, numShards: Int,
                               numGroups: Int,
                               shardColName: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(numGroups >= 1 && numGroups <= numShards,
      s"numGroups must be in [1, numShards], got $numGroups")
    val id = col(idCol).cast("string")
    val grpCand = transform(sequence(lit(0), lit(numGroups - 1)),
      j => struct(
        md5(concat(lit("G"), j.cast("string"), lit(":"), id)).as("score"),
        j.cast("int").as("s")))
    val grp = array_max(grpCand).getField("s")
    val shardCand = transform(
      sequence(grp, lit(numShards - 1), lit(numGroups)),
      s => struct(
        md5(concat(lit("S"), s.cast("string"), lit(":"), id)).as("score"),
        s.cast("int").as("s")))
    df.withColumn(shardColName, array_max(shardCand).getField("s"))
  }
}
