package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ChunkFunctions, TextFunctions}

/** Content-defined chunking (CDC) and chunk-level near-duplicate
  * detection — the dedup family member that catches SHIFTED duplicates:
  * a document that re-appears with an inserted preface, a dropped
  * header, or an edited first paragraph keeps most of its content-
  * defined chunks bit-identical, because chunk boundaries re-synchronize
  * a window past any edit (LBFS, SOSP'01; FastCDC, ATC'16). Fixed-stride
  * shingling (t2/t4) needs hash-set overlap over ALL positions to absorb
  * a shift; CDC gets resynchronization for free and stores one hash per
  * ~56 code points instead of one per position.
  *
  * Scale shape:
  *  - [[contentChunks]] is one O(n) kernel pass per document
  *    ([[graft.functions.ContentChunksExpr]], whole-stage codegen), no
  *    shuffle — the explode multiplies rows by ~n/56, each row a few
  *    dozen bytes once projected to (id, hash).
  *  - [[chunkNearDups]] shuffles 8-byte xxhash64 chunk keys through the
  *    shared saturating-bucket candidate generator ([[Buckets.pairs]],
  *    boilerplate chunks capped at `maxDf` docs), then verifies Jaccard
  *    on per-doc sorted hash sets — the t4 posting-list shape, so the
  *    corpus text never shuffles and hot chunks cannot flood a bucket.
  */
object Chunking {

  /** Explode each document into its content-defined chunks:
    * (idCol, chunk_idx 1-based, start 1-based code point, len in code
    * points, chunk text). Deterministic in document content alone.
    */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
                    w: Int = 16, base: Long = 257L,
                    mod: Long = 2147483647L, divisor: Long = 32L,
                    minLen: Int = 24, maxLen: Int = 96): DataFrame =
    docs
      .select(col(idCol),
        posexplode(ChunkFunctions.content_chunks(col(textCol), w, base, mod,
          divisor, minLen, maxLen)).as(Seq("pos", "c")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("chunk_idx"),
        col("c.start").as("start"), col("c.len").as("len"),
        col("c.chunk").as("chunk"))

  /** Near-duplicate pairs by chunk-set Jaccard: documents sharing
    * >= `minJaccard` of their DISTINCT content-defined chunks. Output
    * (id_a, id_b, shared, n_a, n_b, jaccard) with id_a < id_b,
    * jaccard rounded to 6dp (the cross-engine comparison convention).
    */
  def chunkNearDups(docs: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double = 0.3, maxDf: Int = 50,
                    w: Int = 16, base: Long = 257L,
                    mod: Long = 2147483647L, divisor: Long = 32L,
                    minLen: Int = 24, maxLen: Int = 96): DataFrame = {
    val sets = contentChunks(docs, idCol, textCol, w, base, mod, divisor,
        minLen, maxLen)
      .select(col(idCol).as("id"), xxhash64(col("chunk")).as("chash"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("chash"))).as("ch"))
    val posting = sets.select(col("id"), explode(col("ch")).as("chash"))
    val inter = TextFunctions.sorted_intersect_count(col("ch_a"), col("ch_b"))
    Buckets.pairs(posting, Seq("chash"), maxDf)
      .join(sets.select(col("id").as("id_a"), col("ch").as("ch_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("ch").as("ch_b")), "id_b")
      // size prefilter: J >= t forces t·|B| <= |A| and t·|A| <= |B|
      .filter(size(col("ch_a")).cast("double") >= lit(minJaccard) * size(col("ch_b")) &&
              size(col("ch_b")).cast("double") >= lit(minJaccard) * size(col("ch_a")))
      .withColumn("shared", inter)
      .withColumn("jaccard",
        col("shared").cast("double") /
          (size(col("ch_a")) + size(col("ch_b")) - col("shared")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("shared").cast("long").as("shared"),
        size(col("ch_a")).cast("long").as("n_a"),
        size(col("ch_b")).cast("long").as("n_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
