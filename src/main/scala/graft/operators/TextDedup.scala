package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines, scaled for the
  * 100 TB case:
  *
  *  - exact:   md5 hash-groupBy (one shuffle on the digest, not the text)
  *  - MinHash: shingle → per-permutation min-hash → LSH band buckets →
  *             candidate pairs → exact-Jaccard verification
  *  - SimHash: 64-bit fingerprint; Hamming-≤k pairs found exactly via
  *             the pigeonhole chunk trick (no O(n²) compare)
  *  - n-gram Jaccard: shared-shingle candidate join with a document-
  *             frequency cap to bound fan-out on hot shingles
  *
  * Everything composes from codegen'd builtins + the native expressions
  * in graft.functions; no driver-side loops, no UDFs in hot paths.
  */
object TextDedup {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word k-shingles: overlapping k-grams joined with a space —
    * `transform(sequence(...))` keeps it all inside Catalyst.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
  }

  /** Exact dedup (hash-groupBy): one representative row per distinct
    * text — deterministically the smallest `idCol`. Grouping happens on
    * the 128-bit digest so the shuffle carries ids+hashes, never
    * document bodies.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__digest")).orderBy(col(idCol))
    docs.withColumn("__digest", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__digest")
  }

  /** MinHash signature as ARRAY<LONG>: element i = min over shingles of
    * xxhash64(shingle, i) — seeding by index replaces the classic
    * (a·x+b) mod p permutation family and stays overflow-safe under
    * ANSI mode.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(s, i))))

  /** Candidate near-dup pairs via banded LSH over the MinHash signature:
    * docs sharing any band bucket pair up. numHashes = bands × rowsPerBand.
    * Returns (id_a, id_b) with id_a < id_b, distinct.
    */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)), b)))
        .as(Seq("band", "bucket")))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, verified: candidates whose exact
    * shingle-set Jaccard ≥ threshold. The verify join re-reads only the
    * candidate docs (semi-joined), so verification cost is proportional
    * to candidate count, not corpus size.
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      threshold: Double, shingleK: Int = 3,
                      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(docs, textCol, idCol, shingleK, numHashes, bands)
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint per document over token hashes. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      TextFunctions.simhash64(
        transform(tokens(col(textCol)), t => xxhash64(t))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found
    * EXACTLY via pigeonhole: split the 64-bit signature into
    * (maxDist+1) chunks — any pair within maxDist must agree on at
    * least one whole chunk, so an equi-join per chunk finds all pairs
    * without O(n²) comparisons.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val sh = simhash(docs, textCol, idCol)
    val chunkCols = (0 until chunks).map(c =>
      shiftright(col("simhash"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "ckey")))
    chunked.as("l").join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") &&
        col("l.ckey") === col("r.ckey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** n-gram Jaccard similarity for pairs sharing at least one rare
    * shingle. `maxDf` drops shingles present in more than that many
    * docs before the pair join — the standard guard against quadratic
    * blow-up on stop-phrase shingles at corpus scale.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, minJaccard: Double = 0.5,
                        maxDf: Int = 10): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
    val posting = sets.select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= maxDf)
    val cands = posting.as("l").join(posting.as("r"),
        col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
