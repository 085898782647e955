package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data capture between two versions of a
  * keyed table (yesterday's curated corpus vs today's): which keys
  * were inserted, deleted, updated, or untouched. The readout that
  * drives incremental downstream refreshes (re-embed only updated
  * docs, retrain dedup state only on inserts) instead of full
  * recomputes, and the audit a MutableTable DELETE/MERGE (q47) is
  * checked against.
  */
object SnapshotDiff {

  /** Classify every key across `oldDf` → `newDf`:
    *
    *   inserted  — key only in new;  deleted — key only in old;
    *   updated   — key in both, any non-key column differs;
    *   unchanged — key in both, payload identical.
    *
    * Payload comparison hashes the non-key columns (xxhash64 over a
    * canonical struct) on EACH SIDE BEFORE the join, so the join
    * carries keys + two 8-byte hashes — never two full payloads — and
    * the compare is one long equality. A 64-bit collision would
    * misread an update as unchanged (~2⁻⁶⁴ per changed key); callers
    * needing certainty re-verify the `updated = false` slice exactly,
    * the IncrementalDedup digest-router convention. NULL-safe
    * everywhere: NULL keys join via null-safe equality (a NULL-keyed
    * row still diffs), and hashing treats NULL payload values
    * distinctly.
    *
    * Scale shape: one full-outer join on the key at key cardinality —
    * both sides pre-projected to (key, hash) — map-side hashing, and
    * at warehouse scale both snapshots bucketed by key make it
    * co-located. Output: key columns + change_type; join back to
    * either snapshot for payloads.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val payload = oldDf.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "snapshots have no non-key columns to compare")
    def keyed(df: DataFrame, pfx: String) =
      df.select(
        keyCols.map(c => col(c).as(s"$pfx$c")) :+
          xxhash64(struct(payload.map(col): _*)).as(s"${pfx}hash") :+
          lit(1).as(s"${pfx}present"): _*)
    val o = keyed(oldDf, "o_")
    val n = keyed(newDf, "n_")
    val cond = keyCols.map(c => col(s"o_$c") <=> col(s"n_$c")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .select(
        keyCols.map(c => coalesce(col(s"n_$c"), col(s"o_$c")).as(c)) :+
          when(col("o_present").isNull, "inserted")
            .when(col("n_present").isNull, "deleted")
            .when(col("o_hash") =!= col("n_hash"), "updated")
            .otherwise("unchanged").as("change_type"): _*)
  }

  /** The one-line audit over [[diff]]: row counts per change_type —
    * the readout a refresh pipeline logs and alerts on.
    */
  def summary(oldDf: DataFrame, newDf: DataFrame,
              keyCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, keyCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"))

  /** APPLY the change set incrementally: bring `table` (currently
    * holding the old snapshot) to `newDf` by upserting ONLY the
    * inserted+updated keys' rows and deleting ONLY the deleted keys —
    * the incremental-refresh verb pair (MERGE upsert + MERGE delete)
    * that touches change-cardinality inputs instead of re-loading the
    * snapshot. (The copy-on-write parquet backend still rewrites the
    * version file — the price MutableTable documents; on the
    * MERGE-capable warehouse format these verbs map onto, only
    * changed rows are written.) The diff materializes EAGERLY before
    * the first mutation: its lazy plan reads the table's current
    * version directory, which retention may prune once the two
    * mutations land. Returns the per-change_type audit summary;
    * afterwards `table.read()` equals `newDf` exactly (the t89 gate).
    */
  def applyDiff(table: graft.io.MutableTable, newDf: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    val d = diff(table.read(), newDf, keyCols).localCheckpoint(true)
    val changed = d.filter(col("change_type").isin("inserted", "updated"))
      .select(keyCols.map(col): _*)
    val upCond = keyCols.map(c => newDf(c) <=> changed(c)).reduce(_ && _)
    table.upsert(newDf.join(changed, upCond, "left_semi"), keyCols)
    table.deleteMatching(
      d.filter(col("change_type") === "deleted")
        .select(keyCols.map(col): _*), keyCols)
    d.groupBy(col("change_type")).agg(count(lit(1)).as("n_keys"))
  }

  /** Engine-portable 48-bit row digest: the first 12 hex digits of
    * md5 over a '|'-joined canonical string of `cols` (NULLs
    * normalized to ''), as a BIGINT. md5 (not xxhash64) so a DuckDB /
    * any-SQL oracle replays it digit-for-digit; 48 bits keep sums of
    * per-shard digest residues far from BIGINT overflow.
    */
  def portableDigest(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit(""))): _*)), 1, 12),
      16, 10).cast("long")

  /** Order-invariant per-shard fingerprint of a snapshot: for each
    * shard, (row count, XOR of row digests, sum of digest residues
    * mod 1000003). All three are commutative-monoid aggregates —
    * map-side combinable, insensitive to row order and partitioning —
    * so a 100 TB snapshot summarizes to |shards| rows in ONE scan
    * with no sort and no join. XOR alone is blind to duplicate-pair
    * insertions (h ⊕ h = 0) and count alone to substitutions; the
    * triple (n, xor, sum-mod) requires a change to fool all three
    * simultaneously. This is the Merkle-style cheap-equality layer
    * ABOVE [[diff]]: compare fingerprints first (|shards| rows), then
    * run the row-level keyed diff only on the shards that disagree.
    */
  def fingerprint(df: DataFrame, shard: Column,
                  digest: Column): DataFrame =
    df.select(shard.as("shard"), digest.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_sig"),
        sum(col("__h") % lit(1000003L)).as("sum_sig"))

  /** Join two [[fingerprint]] tables and verdict each shard:
    * `shard_equal` iff the shard exists on both sides with identical
    * (count, xor, sum) signatures. Output is |shards|-sized — the
    * localization map telling an incremental verifier which slices of
    * a copied/refreshed snapshot need the expensive row-level check.
    */
  def fingerprintDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("shard"), col("n_rows").as("__na"),
      col("xor_sig").as("__xa"), col("sum_sig").as("__sa"))
    val r = b.select(col("shard"), col("n_rows").as("__nb"),
      col("xor_sig").as("__xb"), col("sum_sig").as("__sb"))
    l.join(r, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"),
        (col("__na").isNotNull && col("__nb").isNotNull &&
          col("__na") === col("__nb") && col("__xa") === col("__xb") &&
          col("__sa") === col("__sb")).as("shard_equal"))
  }
}
