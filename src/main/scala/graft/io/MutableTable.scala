package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Mutable table over versioned parquet — the engine-level form of the
  * reference's in-place table mutation (S6: DELETE FROM ... WHERE,
  * btcolap.sql:1-15, 289-298) plus MERGE, the two verbs a plain
  * read-only parquet layout can't express. Each mutation writes a full
  * new version directory (copy-on-write, the time-travel-friendly
  * layout a Delta/Iceberg commit produces) and old versions are pruned
  * to `keepVersions` — bounded history instead of unbounded dead state.
  *
  * Semantics:
  *  - `deleteWhere(cond)` removes exactly the rows where `cond`
  *    evaluates TRUE (SQL DELETE: NULL-valued predicates keep the row);
  *  - `upsert(updates, keys)` is MERGE ... WHEN MATCHED THEN UPDATE
  *    WHEN NOT MATCHED THEN INSERT — updates win unconditionally on
  *    key match;
  *  - `mergeLatest(updates, keys, orderCols)` is the ORDER-INDEPENDENT
  *    merge (streaming.UpsertSink's per-batch verb): keep the row with
  *    the greatest `orderCols` per key over current ∪ updates, so any
  *    batch split of the same rows converges to the same state.
  *
  * Scale shape: every verb is one distributed pass — a filter, an
  * anti-join + union, or a key-partitioned keep-first window — and the
  * rewrite cost is proportional to the CURRENT table, the price of
  * copy-on-write on a format without deletion vectors. At warehouse
  * scale the same verbs map 1:1 onto a MERGE-capable table format;
  * this class is the integration point.
  *
  * Each version directory carries a `_schema.json` sidecar (ignored by
  * parquet readers — underscore files are invisible to the file
  * index), so an EMPTY version (delete-all) reads back with its schema
  * intact instead of failing inference.
  */
final class MutableTable private (spark: SparkSession, base: String,
                                  keepVersions: Int) {
  import MutableTable._

  private def fs = new Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions only. The `_schema.json` sidecar is the COMMIT
    * MARKER: `writeVersion` writes parquet first and the sidecar last,
    * so a crash between the two leaves a v-dir without one — a partial
    * write that must not become `currentVersion` (readers would fail on
    * it, and a resuming stream would lose its readable parent state).
    */
  private def versionsOnDisk: Seq[Long] = {
    val dir = new Path(base)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .filter(s => fs.exists(new Path(s.getPath, SchemaFile)))
      .map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toLong }
      .sorted
  }

  /** All vN dirs, committed or not — for pruning partial writes. */
  private def versionDirsOnDisk: Seq[Long] = {
    val dir = new Path(base)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toLong }
      .sorted
  }

  /** Current (latest surviving) version number. */
  def currentVersion: Long = {
    val vs = versionsOnDisk
    require(vs.nonEmpty, s"mutable table at $base has no versions")
    vs.last
  }

  private def dirOf(v: Long) = s"$base/v$v"

  /** Read a specific surviving version (time travel within the
    * retention window).
    *
    * NOTE: the returned frame is LAZY and reads the version directory
    * on each action — retention deletes that directory once
    * `keepVersions` further mutations land, after which held frames
    * fail with a missing-file error. Consume (or persist) a read
    * before mutating that many more times, or raise `keepVersions`.
    */
  def readVersion(v: Long): DataFrame = {
    val schemaFile = new Path(s"${dirOf(v)}/$SchemaFile")
    val in = fs.open(schemaFile)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    spark.read
      .schema(DataType.fromJson(json).asInstanceOf[StructType])
      .parquet(dirOf(v))
  }

  /** Read the current state. */
  def read(): DataFrame = readVersion(currentVersion)

  private[io] def writeVersion(df: DataFrame, v: Long): Unit = {
    df.write.mode("overwrite").parquet(dirOf(v))
    val out = fs.create(new Path(s"${dirOf(v)}/$SchemaFile"), true)
    try out.write(df.schema.json.getBytes("UTF-8")) finally out.close()
    // prune history beyond the newest keepVersions, plus any abandoned
    // partial writes (v-dirs without the commit sidecar) older than the
    // version just committed — single-writer, so nothing else owns them
    val committed = versionsOnDisk
    val keep = committed.takeRight(keepVersions).toSet
    versionDirsOnDisk.filter(d => d < v && !keep.contains(d))
      .foreach(old => fs.delete(new Path(dirOf(old)), true))
  }

  private def mutate(f: DataFrame => DataFrame): this.type = {
    val v = currentVersion
    writeVersion(f(readVersion(v)), v + 1)
    this
  }

  /** DELETE FROM t WHERE cond — rows where `cond` is TRUE go away;
    * NULL-valued predicates keep their row (SQL three-valued DELETE).
    */
  def deleteWhere(cond: Column): this.type =
    mutate(_.filter(!coalesce(cond, lit(false))))

  /** MERGE: `updates` replace current rows sharing their `keys`
    * (WHEN MATCHED THEN UPDATE) and append otherwise (WHEN NOT MATCHED
    * THEN INSERT). Updates must be key-unique and share the table
    * schema. The key match is NULL-SAFE (`<=>`): a NULL-keyed update
    * replaces the NULL-keyed current row rather than silently
    * appending a duplicate on every call (the plain-equality anti-join
    * would never match NULL keys).
    */
  def upsert(updates: DataFrame, keys: Seq[String]): this.type =
    mutate { cur =>
      val upd = updates.select(keys.map(col): _*)
      val cond = keys.map(k => cur(k) <=> upd(k)).reduce(_ && _)
      cur.join(upd, cond, "left_anti").unionByName(updates)
    }

  /** DELETE rows whose keys appear in `keysDf` — the CDC delete verb
    * (MERGE ... WHEN MATCHED THEN DELETE): one null-safe anti-join
    * against the key set, so a NULL-keyed tombstone deletes the
    * NULL-keyed row (the [[upsert]] convention).
    */
  def deleteMatching(keysDf: DataFrame, keys: Seq[String]): this.type =
    mutate { cur =>
      val kd = keysDf.select(keys.map(col): _*)
      val cond = keys.map(k => cur(k) <=> kd(k)).reduce(_ && _)
      cur.join(kd, cond, "left_anti")
    }

  /** MERGE with per-column AGGREGATION (the ClickHouse
    * AggregatingMergeTree / Druid rollup-segment semantics): matched
    * keys COMBINE instead of replace — each column named in `merge`
    * becomes merge(current, update); unnamed non-key columns take the
    * update's value (plain UPDATE SET). Unmatched rows insert
    * unchanged on either side. This is the verb mergeable-sketch
    * state tables need: upsert would overwrite a day's sketch with a
    * partial-batch sketch, mergeAggregate unions them — and because
    * sketch union is commutative/associative/idempotent-per-item, the
    * table converges to the full-history sketch no matter how ingest
    * batches split or replay days.
    *
    * Updates must be key-unique and share the table schema (the
    * [[upsert]] contract — duplicate update keys would fan the
    * full-outer join out).
    *
    * One null-safe full-outer join per call, update-cardinality
    * shuffle; same copy-on-write version write as every other verb.
    */
  def mergeAggregate(updates: DataFrame, keys: Seq[String],
                     merge: Map[String, (Column, Column) => Column])
      : this.type =
    mutate { cur =>
      val dataCols = cur.columns.filterNot(keys.contains)
      require(merge.keySet.subsetOf(dataCols.toSet),
        s"merge columns ${merge.keySet -- dataCols} not in table")
      val c = cur.select(
        keys.map(col) ++ dataCols.map(col) :+ lit(true).as("__c"): _*)
      val u = updates.select(
        keys.map(k => col(k).as(s"__uk_$k")) ++
          dataCols.map(d => col(d).as(s"__u_$d")) :+
          lit(true).as("__u"): _*)
      val cond = keys.map(k => c(k) <=> u(s"__uk_$k")).reduce(_ && _)
      c.join(u, cond, "full_outer")
        .select(
          keys.map(k => coalesce(c(k), u(s"__uk_$k")).as(k)) ++
            dataCols.map { d =>
              val both = c("__c").isNotNull && u("__u").isNotNull
              val merged = merge.get(d) match {
                case Some(f) => f(col(d), col(s"__u_$d"))
                case None    => col(s"__u_$d")
              }
              when(both, merged)
                .when(u("__u").isNotNull, col(s"__u_$d"))
                .otherwise(col(d)).as(d)
            }: _*)
    }

  /** Order-independent merge: keep the greatest-`orderCols` row per
    * key over current ∪ updates — `orderCols` must totally order rows
    * within a key, making the result independent of how the same rows
    * are split into merge calls (safe under replay/reorder).
    */
  def mergeLatest(updates: DataFrame, keys: Seq[String],
                  orderCols: Seq[String]): this.type =
    mutate(cur => graft.ops.Dedup.keepFirst(
      cur.unionByName(updates), keys, orderCols.map(col(_).desc)))

  /** Replace the whole table content (CTAS onto the next version). */
  def overwrite(df: DataFrame): this.type = {
    writeVersion(df, currentVersion + 1)
    this
  }
}

object MutableTable {
  private val SchemaFile = "_schema.json"
  private val VersionDir = "^v(\\d+)$".r

  /** Create a new table at `base` with `df` as version 0. Fails if a
    * version already exists there.
    */
  def create(spark: SparkSession, base: String, df: DataFrame,
             keepVersions: Int = 2): MutableTable = {
    val t = new MutableTable(spark, base, keepVersions)
    require(t.versionsOnDisk.isEmpty,
      s"mutable table already exists at $base — use open()")
    t.writeVersion(df, 0L)
    t
  }

  /** Create an EMPTY table with an explicit schema (version 0 has no
    * rows — the streaming-state bootstrap).
    */
  def init(spark: SparkSession, base: String, schema: StructType,
           keepVersions: Int = 2): MutableTable =
    create(spark, base,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      keepVersions)

  /** Open an existing table. */
  def open(spark: SparkSession, base: String,
           keepVersions: Int = 2): MutableTable = {
    val t = new MutableTable(spark, base, keepVersions)
    t.currentVersion // asserts existence
    t
  }

  /** Open the table at `base` if one exists, otherwise create it empty
    * with `schema` — the restart-friendly bootstrap (a stream resuming
    * over its previous state dir keeps converging: every verb here is
    * order-independent or idempotent at the version level).
    */
  def openOrInit(spark: SparkSession, base: String,
                 schema: StructType, keepVersions: Int = 2): MutableTable = {
    val t = new MutableTable(spark, base, keepVersions)
    if (t.versionsOnDisk.isEmpty) init(spark, base, schema, keepVersions)
    else t
  }
}
