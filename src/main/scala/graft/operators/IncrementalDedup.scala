package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions

/** Incremental (cross-snapshot) deduplication — the daily-refresh
  * shape: a new batch arrives and must drop every document already in
  * the accumulated history WITHOUT re-shuffling the history per batch.
  *
  * The history compresses to one Bloom sketch over 8-byte text
  * digests — built once per snapshot (an 8-byte-per-row aggregate
  * scan), collected as a bounded binary (`numBits/8` bytes no matter
  * how many rows), and probed per-row in the batch as a codegen'd bit
  * test. The probe splits the batch:
  *
  *   - bloom-negative rows are DEFINITELY new (no false negatives) —
  *     they pass through touching no join at all;
  *   - bloom-positive rows (true dups + the fpp sliver) verify against
  *     the history by an anti-join keyed on the 8-byte digest with a
  *     full-text equality re-check — only this small fraction of the
  *     batch, and only the digest-matched slice of history, ride the
  *     verify join.
  *
  * Final semantics are EXACT text-level set difference (the digest is
  * a router, never the verdict — a 64-bit collision is caught by the
  * text re-check), so the whole operator oracle-checks against a plain
  * NOT IN. At warehouse scale the history side of the verify join
  * comes from a digest-bucketed table so the per-batch cost is the
  * batch scan + the sketch probe, not a history shuffle.
  *
  * A continuously-ingesting caller (streaming/IngestDedup) maintains
  * the sketch ACROSS batches instead of rebuilding it: [[sketchOf]]
  * each batch's survivors and [[graft.functions.BloomFunctions.merge]]
  * into the running sketch — the history is scanned exactly once over
  * its lifetime.
  */
object IncrementalDedup {

  /** Serialized Bloom sketch over `textCol`'s xxhash64 digests — null
    * when `df` is empty (Spark's bloom aggregate over zero rows).
    */
  def sketchOf(df: DataFrame, textCol: String, expectedItems: Long,
               fpp: Double = 0.01): Array[Byte] =
    df.agg(BloomFunctions.bloom_agg(xxhash64(col(textCol)),
                                    expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Driver-memory bytes ONE sketch at these parameters costs —
    * optimalNumOfBits/8 ≈ expectedItems · ln(1/fpp) / (8·ln²2), i.e.
    * ~1.2 bytes/item at fpp 1e-2 (1.2 GB per 10⁹ distinct texts).
    * Callers that HOLD a sketch across batches (streaming/IngestDedup)
    * additionally pay this transiently a second time per merge (the
    * incoming per-batch sketch is a full-size twin until the fold
    * completes) — budget 2× this value and see IngestDedup's
    * `maxSketchBytes` cap for the enforced ceiling.
    */
  def sketchBytes(expectedItems: Long, fpp: Double = 0.01): Long =
    org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp) / 8

  /** Per-shard sketch capacity when the digest space splits into
    * `nShards` hash ranges: an even split plus 50% headroom for hash
    * imbalance (xxhash64 is near-uniform, so real skew is a few
    * percent; the headroom keeps per-shard fpp at or under the
    * nominal setting instead of degrading when a shard runs slightly
    * over its even share).
    */
  def perShardItems(expectedItems: Long, nShards: Int): Long = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // one shard = the whole digest space: no imbalance, no headroom —
    // identical sizing to the historical single-sketch path
    if (nShards == 1) math.max(1L, expectedItems)
    else math.max(1L, math.ceil(expectedItems.toDouble / nShards * 1.5).toLong)
  }

  /** Total driver bytes a sharded sketch set costs: nShards sketches
    * of [[perShardItems]] capacity ≈ 1.5 × the monolithic sketch
    * (the headroom is the only overhead — bloom bits are linear in
    * capacity). Each INDIVIDUAL sketch is total/nShards: that is what
    * must fit Spark's runtime bloom clamp (default 8 MB/4M items per
    * sketch), which is the wall the monolithic sketch hits first.
    */
  def shardedSketchBytes(expectedItems: Long, nShards: Int,
                         fpp: Double = 0.01): Long =
    nShards * sketchBytes(perShardItems(expectedItems, nShards), fpp)

  /** The shard a text digest routes to — THE routing function: build
    * ([[shardedSketchOf]]) and probe ([[filterNewSharded]]) must agree
    * on it, so it lives in exactly one place.
    */
  private def shardCol(dig: org.apache.spark.sql.Column, nShards: Int) =
    pmod(dig, lit(nShards.toLong)).cast("int")

  /** One Bloom sketch per digest-hash range: index i covers texts with
    * pmod(xxhash64(text), nShards) = i; an empty shard stays null
    * (= definitely-new on probe). One distributed aggregate builds all
    * shards; the driver collects nShards bounded binaries.
    */
  def shardedSketchOf(df: DataFrame, textCol: String, expectedItems: Long,
                      fpp: Double = 0.01,
                      nShards: Int): Array[Array[Byte]] = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val dig = xxhash64(col(textCol))
    val per = perShardItems(expectedItems, nShards)
    val rows = df.groupBy(shardCol(dig, nShards).as("__s"))
      .agg(BloomFunctions.bloom_agg(dig, per, fpp).as("bf"))
      .collect()
    val out = new Array[Array[Byte]](nShards)
    rows.foreach(r => out(r.getInt(0)) = r.getAs[Array[Byte]](1))
    out
  }

  /** Element-wise union of two sharded sketch sets (same build
    * parameters — the underlying merge enforces compatibility).
    * Null-tolerant per shard and per set.
    */
  def mergeSharded(a: Array[Array[Byte]],
                   b: Array[Array[Byte]]): Array[Array[Byte]] = {
    if (a == null) return b
    if (b == null) return a
    require(a.length == b.length,
      s"shard counts differ: ${a.length} vs ${b.length}")
    a.zip(b).map { case (x, y) => BloomFunctions.merge(x, y) }
  }

  /** [[filterNew]] against a SHARDED sketch set: the probe routes each
    * row to its digest-range shard and bit-tests only that shard's
    * sketch — a guarded chain of Spark-native bloom probes (generated
    * code grows linearly in nShards, so IngestDedup bounds the count;
    * every branch is one bit test, and exactly one branch runs per
    * row). Same exactness contract as [[filterNew]]: the sketch only
    * routes; bloom-positive rows still verify against the history by
    * the digest-keyed text-equality anti-join.
    */
  def filterNewSharded(batch: DataFrame, history: DataFrame, textCol: String,
                       sketches: Array[Array[Byte]]): DataFrame = {
    if (sketches == null || sketches.forall(_ == null)) return batch
    val dig = xxhash64(col(textCol))
    val shard = shardCol(dig, sketches.length)
    val probe = sketches.zipWithIndex.foldLeft(lit(false)) {
      case (acc, (null, _)) => acc // empty shard: definitely new
      case (acc, (sk, i)) =>
        when(shard === i, BloomFunctions.might_contain(sk, dig))
          .otherwise(acc)
    }
    val definitelyNew = batch.filter(!probe)
    val maybeDup = batch.filter(probe)
    val hist = history
      .select(dig.as("__h"), col(textCol).as("__t")).distinct()
    val verifiedNew = maybeDup.join(hist,
      dig === col("__h") && col(textCol) === col("__t"), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }

  /** EXACT set-difference with no sketch at all — every batch row
    * rides the verify anti-join (digest-keyed, text-equality
    * re-checked). Same answer as [[filterNew]], none of the
    * bloom-negative fast path: the fallback when `expectedItems` would
    * cost more driver sketch memory than the caller caps at. At
    * warehouse scale the history side is a digest-bucketed table, so
    * this stays a batch-sized probe, not a history shuffle.
    */
  def filterNewExact(batch: DataFrame, history: DataFrame,
                     textCol: String): DataFrame = {
    val dig = xxhash64(col(textCol))
    // no distinct on the history side: left_anti ignores right-side
    // multiplicity, and this runs PER BATCH on the hot path — a
    // distinct would re-shuffle the ever-growing history every batch
    // (IngestDedup's state table is one-row-per-text by construction
    // anyway; a dup-heavy generic history can pre-distinct once)
    val hist = history.select(dig.as("__h"), col(textCol).as("__t"))
    batch.join(hist,
      dig === col("__h") && col(textCol) === col("__t"), "left_anti")
  }

  /** The probe + verify core: rows of `batch` whose `textCol` does not
    * appear in `history`, given `sketch` already covers every history
    * text (null sketch = empty history = whole batch passes).
    */
  def filterNew(batch: DataFrame, history: DataFrame, textCol: String,
                sketch: Array[Byte]): DataFrame = {
    if (sketch == null) return batch
    val dig = xxhash64(col(textCol))
    val definitelyNew = batch.filter(!BloomFunctions.might_contain(sketch, dig))
    val maybeDup = batch.filter(BloomFunctions.might_contain(sketch, dig))
    val hist = history
      .select(dig.as("__h"), col(textCol).as("__t")).distinct()
    val verifiedNew = maybeDup.join(hist,
      dig === col("__h") && col(textCol) === col("__t"), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }

  /** Rows of `batch` whose `textCol` value appears nowhere in
    * `history`'s `textCol`. `expectedItems` sizes the sketch (pass the
    * history row count or a safe upper bound); `fpp` trades sketch
    * bytes for verify-join traffic.
    */
  def newDocs(batch: DataFrame, history: DataFrame, textCol: String,
              expectedItems: Long, fpp: Double = 0.01): DataFrame =
    filterNew(batch, history, textCol,
      sketchOf(history, textCol, expectedItems, fpp))
}
