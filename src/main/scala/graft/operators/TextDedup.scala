package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * text — deterministically the smallest `idCol`. The dedup decision
    * aggregates (digest → min id) over ids+hashes only; retrieving the
    * surviving rows is then a semi-join of the corpus against the
    * (small) survivor id set, which AQE broadcasts when it fits —
    * document bodies never ride the dedup shuffle. (A window over the
    * digest would exchange every full row instead.)
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val survivors = docs
      .select(col(idCol), md5(col(textCol)).as("__digest"))
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(survivors, Seq(idCol), "left_semi")
  }

  /** Unicode-CANONICAL text: NFC composition (the native
    * [[graft.functions.NfcNormalizeExpr]] kernel — "café" typed as
    * e+combining-acute equals "café" typed composed) → lowercase →
    * whitespace runs collapsed to one space → trim. The
    * normalize-before-dedup step web-corpus pipelines run so encoding
    * variants of the same document collapse under EXACT dedup instead
    * of surviving to the (much costlier) near-dup stage. Pure per-row
    * expression work, fully codegen'd; the NFC quick-check fast path
    * makes already-normalized ASCII free.
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(TextFunctions.nfc_normalize(text)),
      "[ \t\n\u000B\f\r]+", " "))

  /** Exact dedup over the CANONICAL form — [[exact]]'s keep-first
    * contract, with the digest taken on [[canonicalText]] (bodies
    * still never ride the shuffle — only (id, digest) aggregates).
    */
  def canonicalExact(docs: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    val survivors = docs
      .select(col(idCol), md5(canonicalText(col(textCol))).as("__digest"))
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(survivors, Seq(idCol), "left_semi")
  }

  /** Canonical duplicate groups: one row per canonical form with > 1
    * member — (kept_id, n_docs, canon_chars), the audit view of what
    * [[canonicalExact]] would collapse. canon_chars (code points of
    * the canonical form) rides along so a NFC-variant group is
    * distinguishable from a pure whitespace-variant group in review.
    */
  def canonicalGroups(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    docs.select(col(idCol),
        md5(canonicalText(col(textCol))).as("__digest"),
        length(canonicalText(col(textCol))).as("__chars"))
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as("kept_id"),
        count(lit(1)).as("n_docs"),
        min(col("__chars")).as("canon_chars"))
      .filter(col("n_docs") > 1)
      .select(col("kept_id"), col("n_docs"), col("canon_chars"))

  /** MinHash signatures as ARRAY<LONG>, one per doc, via the native
    * one-pass [[graft.functions.MinHashSignature]] expression: NO
    * explode, NO shuffle — the signature is a per-row map over the
    * shingle array, hashing each shingle string once and deriving all
    * numHashes permutation values from that base hash. Seeding by index
    * replaces the classic (a·x+b) mod p permutation family and stays
    * overflow-safe under ANSI mode. Values are bit-exact with the
    * explode → groupBy(id).agg(min(xxhash64(sh, i))…) formulation this
    * replaces (spec-pinned), which cost a |docs|·|shingles| row blowup
    * plus a 64-partial-minima shuffle at every call.
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int, numHashes: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      TextFunctions.minhash_sig(
        TextFunctions.hashed_shingles(col(textCol), shingleK), numHashes)
        .as("sig"))

  /** Audit for the occupancy cap: the buckets whose membership exceeds
    * maxBucket (and therefore contribute no candidate pairs), with
    * their sizes. Run it when a corpus' recall matters more than its
    * worst cluster's cost; at pipeline scale this is a tiny aggregate.
    */
  def overflowBuckets(docs: DataFrame, textCol: String, idCol: String,
                      shingleK: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, maxBucket: Int = 200): DataFrame =
    mBanded(docs, textCol, idCol, shingleK, numHashes, bands)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("occupancy"))
      .filter(col("occupancy") > maxBucket)

  /** (id, band, bucket) rows for the banded MinHash signature. */
  private def mBanded(docs: DataFrame, textCol: String, idCol: String,
                      shingleK: Int, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(docs, textCol, idCol, shingleK, numHashes)
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)), b)))
        .as(Seq("band", "bucket")))
  }

  /** Candidate near-dup pairs via banded LSH over the MinHash signature:
    * docs sharing any band bucket pair up. numHashes = bands × rowsPerBand.
    * Returns (id_a, id_b) with id_a < id_b, distinct. Buckets with more
    * than maxBucket members are dropped (see [[Buckets.capped]]) — the
    * guard that keeps a mega near-dup cluster from going quadratic.
    */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, maxBucket: Int = 200): DataFrame =
    Buckets.pairs(mBanded(docs, textCol, idCol, shingleK, numHashes, bands),
      Seq("band", "bucket"), maxBucket)

  /** Exact-duplicate clusters as (rep, member) pairs: for every doc
    * whose text equals another's, one row pairing it with the cluster
    * representative (min id). Near-dup pipelines that exact-dedup first
    * union these back in so collapsed duplicates — the strongest
    * near-dups — still appear in the pair output.
    */
  def exactClusters(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), md5(col(textCol)).as("__digest"))
    val reps = keyed.groupBy(col("__digest")).agg(min(col("id")).as("rep_id"))
    keyed.join(reps, "__digest")
      .filter(col("id") =!= col("rep_id"))
      .select(col("rep_id").as("id_a"), col("id").as("id_b"))
  }

  /** Distinct shingle-HASH set per doc: Jaccard over 8-byte hashes is
    * identical to Jaccard over the strings (collisions aside) and makes
    * the verification intersect/union long-typed — no string compares,
    * no string shuffles. Native one-pass construction (HashedShingles):
    * the lambda form `array_distinct(transform(shingles(..), xxhash64))`
    * was the hottest span in both dedup pipelines.
    */
  private[operators] def hashedShingleSets(docs: DataFrame, textCol: String,
                                idCol: String, shingleK: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      TextFunctions.hashed_shingles(col(textCol), shingleK).as("sh"))

  /** Per-document n-gram novelty against a reference corpus — the
    * memorization-risk metric decontamination pipelines report: for
    * each target document, the fraction of its DISTINCT k-token
    * shingles that already occur anywhere in `reference` (coverage
    * 1.0 = nothing new; `high_overlap` flags docs at/above `flagAt`,
    * judged on the 6dp-rounded value in both engines).
    *
    * Scale shape: both sides reduce to 8-byte shingle hashes — the
    * reference collapses to DISTINCT hashes (one shuffle at
    * reference-shingle cardinality), the target posting joins on the
    * hash (no strings ever cross the wire), and the per-doc fraction
    * is one partial-aggregable groupBy at target-shingle cardinality.
    */
  def ngramNovelty(target: DataFrame, reference: DataFrame,
                   textCol: String, idCol: String, shingleK: Int = 3,
                   flagAt: Double = 0.5): DataFrame = {
    val refSh = hashedShingleSets(reference, textCol, idCol, shingleK)
      .select(explode(col("sh")).as("shash")).distinct()
    val tgt = hashedShingleSets(target, textCol, idCol, shingleK)
      .select(col("id"), explode(col("sh")).as("shash"))
    tgt.join(refSh.withColumn("__seen", lit(1L)), Seq("shash"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce(col("__seen"), lit(0L))).as("n_seen"))
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_seen"),
        round(col("n_seen") / col("n_shingles"), 6).as("coverage"))
      .withColumn("high_overlap", col("coverage") >= flagAt)
  }

  /** MinHash+LSH near-dup pairs, verified: candidates whose exact
    * shingle-set Jaccard ≥ threshold. The verify join re-reads only the
    * candidate docs (semi-joined), so verification cost is proportional
    * to candidate count, not corpus size.
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      threshold: Double, shingleK: Int = 3,
                      numHashes: Int = 64, bands: Int = 16,
                      maxBucket: Int = 200): DataFrame = {
    val cands = minhashCandidates(docs, textCol, idCol, shingleK, numHashes,
      bands, maxBucket)
    val sets = hashedShingleSets(docs, textCol, idCol, shingleK)
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccardOfSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard of two sorted-distinct hash sets via one linear
    * merge (|∪| = |a| + |b| - |∩|) — the array_intersect/array_union
    * pair costs a per-row hash-set build each.
    */
  private[operators] def jaccardOfSorted(a: Column, b: Column): Column = {
    val inter = TextFunctions.sorted_intersect_count(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
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
                      maxDist: Int = 3, maxBucket: Int = 200): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    // Scala shifts are mod 64: 1L << 64 == 1L, which would zero the
    // mask and cross-product the whole corpus for maxDist = 0
    val chunkMask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    val sh = simhash(docs, textCol, idCol)
    val chunkCols = (0 until chunks).map(c =>
      shiftright(col("simhash"), c * bitsPer).bitwiseAND(lit(chunkMask)))
    val chunked = sh.select(col("id"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "ckey")))
    // id-only capped-bucket pairs (no self-join, occupancy bounded);
    // fingerprints rejoin on the candidate set only, so no chunk join
    // ever carries them and a hot chunk key cannot go quadratic
    Buckets.pairs(chunked, Seq("chunk", "ckey"), maxBucket)
      .join(sh.toDF("id_a", "sim_a"), "id_a")
      .join(sh.toDF("id_b", "sim_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
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
    val sets = hashedShingleSets(docs, textCol, idCol, shingleK)
    // posting-list candidate generation through the shared capped
    // buckets: ONE groupBy(shingle-hash) shuffle with a SATURATING
    // collector (a stop-phrase shingle shared by a million docs fills
    // a maxDf+1 buffer, not a million-element collect_list, before the
    // df cap drops it), pairs expanded in-array — no window pass, no
    // self-join (which would shuffle the posting list twice and
    // re-scan the corpus)
    val posting = sets.select(col("id"), explode(col("sh")).as("shash"))
    Buckets.pairs(posting, Seq("shash"), maxDf)
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      // size prefilter: J(A,B) ≥ t forces t·|B| ≤ |A| and t·|A| ≤ |B| —
      // rejects most candidate pairs before the set intersection runs
      .filter(size(col("sh_a")).cast("double") >= lit(minJaccard) * size(col("sh_b")) &&
              size(col("sh_b")).cast("double") >= lit(minJaccard) * size(col("sh_a")))
      .withColumn("jaccard", jaccardOfSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** EXACT all-pairs Jaccard similarity join via PREFIX FILTERING
    * (Bayardo–Ma–Srikant WWW'07 "Scaling Up All Pairs Similarity
    * Search"; the PPJoin prefix rule, Xiao et al. WWW'08) — the
    * df-capped posting generator's exact sibling: where
    * [[ngramJaccardPairs]] BOUNDS work by dropping hot shingles (and
    * documents whose only shared evidence was hot can be missed by
    * construction), prefix filtering keeps EVERY qualifying pair and
    * prunes candidates instead: sort each document's shingle set by
    * GLOBAL document frequency (rarest first, digest tiebreak) and
    * index only its first |d| − ⌊t·|d|⌋ + 1 positions — any pair with
    * J ≥ t provably shares a digest inside both prefixes (the prefix
    * uses floor, one slot longer than the ⌈⌉ minimum, so IEEE
    * rounding of t·|d| can never under-length it), so the candidate
    * join runs on the RAREST ~(1−t) fraction of each posting list and
    * hot shingles never generate pairs unless they are some
    * document's rarest evidence.
    *
    * Scale shape: one df aggregate (8-byte digest keys, map-side
    * combined), one posting-df join, a per-DOC rank window
    * (high-cardinality key — spreads), then the prefix-only posting
    * self-join: per-digest fan-out is bounded by the digest's
    * PREFIX-df, which rare-first ordering keeps near the qualifying
    * pair count itself (a dup cluster's quadratic candidates are the
    * OUTPUT, not overhead). Verification is the shared
    * length-prefilter + sorted-merge intersection. No caps, no
    * windows over corpus-sized partitions.
    *
    * Output: (id_a < id_b, jaccard 6dp) for jaccard ≥ `threshold` —
    * hash-exact against a NAIVE uncapped all-pairs DuckDB replay, the
    * algorithm-independent ground truth (t266).
    *
    * EXACTNESS CAVEAT: "exact" is with respect to the PRUNING — no
    * qualifying pair is missed — but Jaccard is computed over 64-bit
    * xxhash shingle digests (the library-wide convention shared with
    * [[ngramJaccardPairs]]; the t266 oracle replays the same digest
    * sets), so a 64-bit digest collision between two DIFFERENT
    * shingles of a candidate pair would inflate that pair's
    * intersection. At W shingles per document the per-pair collision
    * probability is ~W²/2⁶⁴ — negligible at any realistic document
    * length, but not zero; callers needing string-exact overlap
    * re-verify shortlisted pairs the t177 way.
    */
  def prefixFilterPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3,
                        threshold: Double = 0.6): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    val sets = hashedShingleSets(docs, textCol, idCol, shingleK)
      .withColumn("sz", size(col("sh")))
    val posting = sets.select(col("id"), explode(col("sh")).as("h"))
    val dfreq = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rank = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val prefix = posting.join(dfreq, "h")
      .withColumn("__rn", row_number().over(rank))
      .join(sets.select(col("id"), col("sz")), "id")
      // |d| − ⌊t·|d|⌋ + 1 ≥ the ⌈⌉-minimum prefix length whichever
      // way IEEE rounds t·|d| across an integer boundary (floor of
      // r±ε is r or r−1 — both keep L ≥ |d| − ⌈r⌉ + 1); a one-slot
      // over-length only adds candidates, never loses a pair
      .filter(col("__rn") <=
        col("sz") - floor(lit(threshold) * col("sz")) + 1)
      .select(col("id"), col("h"))
    val cands = prefix.select(col("id").as("id_a"), col("h"))
      .join(prefix.select(col("id").as("id_b"), col("h")), "h")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cands
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("sz").as("sz_b")), "id_b")
      .filter(col("sz_a").cast("double") >= lit(threshold) * col("sz_b") &&
              col("sz_b").cast("double") >= lit(threshold) * col("sz_a"))
      .withColumn("jaccard", jaccardOfSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact-Levenshtein VERIFICATION of an upstream candidate pair set
    * — the character-level ground-truth final stage behind every
    * shingle/minhash/simhash approximation, run where it belongs: on
    * the pairs a cheap similarity already shortlisted, never on raw
    * bucket candidates. Similarity = 1 − dist/max(len), judged on the
    * 6dp boundary.
    *
    * Scale shape: cost is candidates × O(|a|·|b|) — the DP is the
    * most expensive per-pair kernel in the repo, so the CONTRACT is
    * that `pairs` is already filtered (e.g. [[ngramJaccardPairs]]
    * output, Jaccard ≥ 0.5), making the verify set near-dup-sized.
    * Document text shuffles only for candidate ids (two id-keyed
    * joins). A zero-cost length quick-reject (dist ≥ |len a − len b|
    * ⇒ sim bound below `minSim` − 1e-6 slack) drops provably-failing
    * pairs before the DP; the slack keeps the 6dp boundary judgement
    * with the final filter, and the oracle mirrors the same reject.
    * For long-doc corpora verify chunks (t110) instead of bodies.
    * `levenshtein` is a codegen'd Spark builtin with the standard DP
    * semantics DuckDB mirrors exactly.
    *
    * Output: (id_a, id_b, dist, max_len, sim) for sim ≥ `minSim`.
    */
  def editDistanceVerify(pairs: DataFrame, docs: DataFrame,
                         textCol: String, idCol: String,
                         minSim: Double = 0.8): DataFrame = {
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("__txt"))
    pairs.select(col("id_a"), col("id_b"))
      .join(texts.select(col("id").as("id_a"), col("__txt").as("__ta")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("__txt").as("__tb")), "id_b")
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
      .filter(lit(1.0)
        - abs(length(col("__ta")) - length(col("__tb"))).cast("double")
          / col("max_len") >= minSim - 1e-6)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("dist"),
        col("max_len"))
      .withColumn("sim",
        round(lit(1.0) - col("dist").cast("double") / col("max_len"), 6))
      .filter(col("sim") >= minSim)
  }

  /** JARO–WINKLER verification of an upstream candidate pair set —
    * the record-linkage / short-text judge where [[editDistanceVerify]]
    * is the wrong instrument: edit distance charges a long doc's every
    * divergent suffix character, while JW measures alignment with a
    * shared-prefix boost — the classic fuzzy-match scorer for names,
    * titles, and URL-ish fields. Emits EVERY candidate pair with its
    * score and an `accept` verdict (jw ≥ `minSim`, judged on the 6dp
    * boundary), so callers can audit the rejected band instead of
    * having it silently vanish.
    *
    * Scale shape: cost = candidates × O(max_len · window) — cheaper
    * than the Levenshtein DP by a factor of ~max_len/4 — and texts
    * shuffle only for candidate ids (two id-keyed joins), so the
    * CONTRACT is the same as [[editDistanceVerify]]'s: feed a
    * shortlisted pair set (capped-bucket postings, SNM blocks), never
    * raw cross products. The kernel ([[TextFunctions.jaro_winkler]])
    * is a native codegen'd expression, bit-identical to DuckDB's
    * `jaro_winkler_similarity` (byte alphabet, boost threshold 0.7,
    * 4-byte prefix cap).
    *
    * Output: (id_a, id_b, jw 6dp, accept).
    */
  def jaroWinklerVerify(pairs: DataFrame, docs: DataFrame,
                        textCol: String, idCol: String,
                        minSim: Double = 0.9): DataFrame = {
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("__txt"))
    pairs.select(col("id_a"), col("id_b"))
      .join(texts.select(col("id").as("id_a"), col("__txt").as("__ta")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("__txt").as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(TextFunctions.jaro_winkler(col("__ta"), col("__tb")), 6)
          .as("jw"))
      .withColumn("accept", col("jw") >= minSim)
  }

  /** Full DAMERAU–LEVENSHTEIN verification of a candidate pair set —
    * the transposition-aware ground truth between [[editDistanceVerify]]
    * (plain Levenshtein: a swapped word costs two edits) and
    * [[jaroWinklerVerify]] (alignment score, no edit count): typo-
    * shaped corruption (adjacent transpositions) counts ONE edit, the
    * semantics record-linkage literature actually means by "edit
    * distance". Same contract as [[editDistanceVerify]]: feed a
    * shortlisted pair set; the zero-cost length quick-reject
    * (dl ≥ |Δlen| ⇒ sim bound below `minSim` − 1e-6 slack) drops
    * provably-failing pairs BEFORE the O(|a|·|b|) DP runs — on
    * random-neighbor candidate sets that is most of them — and the
    * output is the surviving near-dup pairs at sim ≥ `minSim` (6dp
    * boundary).
    *
    * The kernel ([[graft.functions.TextFunctions.damerau_levenshtein]])
    * is a native codegen'd expression, bit-identical to DuckDB's
    * `damerau_levenshtein` (full Lowrance–Wagner DL over UTF-8 bytes,
    * not the cheaper OSA restriction — verified on 4k adversarial
    * pairs including the OSA discriminators).
    *
    * Output: (id_a, id_b, dl, max_len, sim) for sim ≥ `minSim`.
    */
  def damerauVerify(pairs: DataFrame, docs: DataFrame,
                    textCol: String, idCol: String,
                    minSim: Double = 0.8): DataFrame = {
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("__txt"))
    pairs.select(col("id_a"), col("id_b"))
      .join(texts.select(col("id").as("id_a"), col("__txt").as("__ta")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("__txt").as("__tb")), "id_b")
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
      .filter(lit(1.0)
        - abs(length(col("__ta")) - length(col("__tb"))).cast("double")
          / col("max_len") >= minSim - 1e-6)
      .select(col("id_a"), col("id_b"),
        graft.functions.TextFunctions.damerau_levenshtein(
          col("__ta"), col("__tb")).cast("long").as("dl"),
        col("max_len"))
      .withColumn("sim",
        round(lit(1.0) - col("dl").cast("double") / col("max_len"), 6))
      .filter(col("sim") >= minSim)
  }

  /** Doc-level n-gram CONTAINMENT pairs — the asymmetric complement
    * of [[ngramJaccardPairs]]: containment(sub ⊆ sup) =
    * |sh_sub ∩ sh_sup| / |sh_sub| catches SUBSUMPTION (a paragraph
    * quoted inside a long article, a doc re-published with a wrapper)
    * that Jaccard structurally cannot — a 50-shingle doc fully inside
    * a 5000-shingle doc has J ≈ 0.01 but containment 1.0. The
    * doc-granular twin of the corpus-level t160 source matrix.
    *
    * Same candidate machinery as t4: distinct hashed shingle sets,
    * posting lists through the saturating df-capped buckets (one
    * 8-byte-key shuffle, no self-join), then the sorted-intersect
    * kernel on candidate pairs only. Each unordered candidate pair
    * checks BOTH directions and emits one row per direction that
    * clears `minContainment` (id_sub = the contained side).
    *
    * No size prefilter applies: containment ≥ t bounds nothing
    * between |A| and |B| (any tiny doc can sit inside any huge one) —
    * the df cap is the sole, and sufficient, candidate bound.
    *
    * Output: (id_sub, id_sup, n_sub, n_sup, n_common, containment) —
    * 6dp, distinct-shingle counts.
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
                       shingleK: Int = 3, minContainment: Double = 0.8,
                       maxDf: Int = 10): DataFrame = {
    val sets = hashedShingleSets(docs, textCol, idCol, shingleK)
    val posting = sets.select(col("id"), explode(col("sh")).as("shash"))
    val scored = Buckets.pairs(posting, Seq("shash"), maxDf)
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(col("sh_b")).cast("long").as("n_b"),
        TextFunctions.sorted_intersect_count(col("sh_a"), col("sh_b"))
          .cast("long").as("n_common"))
    val aInB = scored.select(col("id_a").as("id_sub"), col("id_b").as("id_sup"),
      col("n_a").as("n_sub"), col("n_b").as("n_sup"), col("n_common"))
    val bInA = scored.select(col("id_b").as("id_sub"), col("id_a").as("id_sup"),
      col("n_b").as("n_sub"), col("n_a").as("n_sup"), col("n_common"))
    aInB.unionByName(bInA)
      .withColumn("containment",
        round(col("n_common").cast("double") / col("n_sub"), 6))
      .filter(col("containment") >= minContainment)
  }

  /** Duplicate-span detection — the substring-level dedup of
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al., 2022), re-expressed for Spark: find every k-token
    * span that occurs in at least `minDocs` DISTINCT documents, with
    * its exact document and occurrence counts. (The paper builds a
    * suffix array; the distributed shape below finds the same
    * fixed-length repeated spans with two scans and hash-sized
    * shuffles.)
    *
    * Scale shape, two stages:
    *
    *  1. survivor discovery over HASHES only — explode the per-doc
    *     DISTINCT shingle-hash sets ([[graft.functions.HashedShingles]],
    *     8 bytes per span) and count docs per hash. Nothing wider than
    *     (hash, id) ever shuffles, and partial aggregation collapses
    *     each map partition's postings before the exchange.
    *  2. span-string regeneration for CANDIDATE DOCS only — semi-join
    *     the corpus to docs containing ≥1 surviving hash, re-emit their
    *     spans as strings ([[graft.functions.ShingleStrings]], native —
    *     the composable lambda form re-evaluates the token split per
    *     element), keep spans whose hash survived, then regroup BY THE
    *     SPAN STRING with exact distinct-doc and occurrence counts.
    *
    * Stage 1 is conservative (a 64-bit collision can only ADD a
    * candidate, never drop one — hash doc-counts dominate string
    * doc-counts), and stage 2's string-level regroup + re-filter makes
    * the final output exact, not exact-modulo-collisions: at 100 TB the
    * expensive corpus-wide shuffle carries 8-byte hashes, and span
    * text only ever shuffles for documents that contain a repeat.
    */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
                     k: Int = 6, minDocs: Int = 2): DataFrame = {
    val posting = docs.select(col(idCol).as("id"),
      explode(TextFunctions.hashed_shingles(col(textCol), k)).as("shash"))
    val survivors = posting
      .groupBy(col("shash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minDocs)
      .select(col("shash"))
    val candidateDocs = posting.join(survivors, "shash")
      .select(col("id").as(idCol)).distinct()
    docs.join(candidateDocs, Seq(idCol), "left_semi")
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingle_strings(col(textCol), k)).as("span"))
      .join(survivors, xxhash64(col("span")) === col("shash"), "left_semi")
      .groupBy(col("span"))
      .agg(count_distinct(col("id")).as("n_docs"),
           count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Duplicate-span REMOVAL — the apply step of [[duplicateSpans]]
    * (Lee et al. 2022's "deduplicating training data" substring form):
    * every token position covered by ANY k-token span occurring in
    * ≥ `minDocs` distinct documents is masked, and each document
    * reassembles from its surviving tokens in order. Output one row
    * per input document: (id, n_tokens, n_kept, clean_text) — spans
    * are defined on the lowercased `\s+` token stream (the shingle
    * kernels' tokenization), so `clean_text` is the lowercased
    * reassembly.
    *
    * Scale shape (the t31/t42 conventions combined): stage 1 counts
    * span HASHES — the corpus-wide shuffle carries 8 bytes per
    * window; only windows whose hash survives the count regenerate
    * their strings, and the exact verdict (≥ minDocs DISTINCT docs)
    * is taken on span STRINGS among that candidate set, so a 64-bit
    * collision can promote a candidate but never force a removal.
    * The position mask and reassembly are per-document (the
    * collect_list is bounded by document length, same contract as
    * crossDocLineDedup's reassembly); documents with no duplicated
    * span ride through the anti-join untouched.
    */
  def removeDuplicateSpans(docs: DataFrame, textCol: String, idCol: String,
                           k: Int = 6, minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val spans = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.shingle_strings(col(textCol), k))
        .as(Seq("pos", "span")))
    // stage 1: hash prefilter — the hashed_shingles kernel is already
    // per-doc-distinct AND seed-42-xxhash64 of the same span strings
    // (duplicateSpans' contract), so distinct-doc counting needs ONE
    // 8-byte-hash shuffle, no (id, hash) dropDuplicates exchange
    val hashSurv = docs
      .select(explode(TextFunctions.hashed_shingles(col(textCol), k))
        .as("shash"))
      .groupBy(col("shash")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minDocs)
      .select(col("shash"))
    // stage 2: exact string verdict over the hash-bounded candidates
    val cand = spans.join(hashSurv,
      xxhash64(col("span")) === col("shash"), "left_semi")
    val bad = cand.select(col("id"), col("span")).dropDuplicates()
      .groupBy(col("span")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("span"))
    val covered = cand.join(bad, Seq("span"), "left_semi")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("ti"))
      .dropDuplicates()
    // same tokenization as the shingle kernels (TextDedup.tokens:
    // lowercased \s+ split, limit -1); ONE pass over the token stream
    // computes n_tokens, n_kept, and the ordered reassembly — marking
    // covered positions via left join instead of anti-joining and then
    // re-scanning the corpus for totals
    val toks = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("ti", "tok")))
    toks.join(covered.withColumn("__c", lit(1)), Seq("id", "ti"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
           count(when(col("__c").isNull, 1)).cast("int").as("n_kept"),
           array_join(transform(
             array_sort(collect_list(
               when(col("__c").isNull, struct(col("ti"), col("tok"))))),
             _.getField("tok")), " ").as("clean_text"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_kept"),
              col("clean_text"))
  }

  /** Benchmark decontamination — the curation step every training
    * pipeline runs before an eval: flag training documents sharing at
    * least `minShared` distinct word k-shingles with ANY document of an
    * evaluation set. Output: (train_id, eval_id, n_shared) per
    * contaminated (train, eval) pair.
    *
    * Scale shape: the EVAL side is small by nature (benchmarks are
    * thousands of docs, the corpus is billions), so its exploded
    * (shingle, eval_id) posting list broadcasts and the train side
    * costs ONE scan + one partial-aggregated groupBy — the corpus
    * never self-joins and no shuffle carries shingle sets. A
    * stop-shingle shared by every train doc fans out by at most
    * |eval docs containing it|, bounded by the eval set's size. Shingle
    * sets are distinct hashes (HashedShingles), so the count is the
    * DISTINCT overlap, matching the string-set definition modulo
    * 64-bit collisions.
    *
    * `excludeSameId` suppresses pairs where train and eval carry the
    * SAME id — set it only when the eval set is a subset of the
    * training corpus sharing its id space (t28's shape). For an
    * external benchmark with its own ids it must stay false: an id
    * coincidence across two independent datasets is not a self-pair,
    * and dropping it would ship real contamination.
    */
  def contaminationPairs(train: DataFrame, eval: DataFrame,
                         textCol: String, idCol: String,
                         shingleK: Int = 3, minShared: Int = 5,
                         excludeSameId: Boolean = false): DataFrame = {
    val trainPosting = hashedShingleSets(train, textCol, idCol, shingleK)
      .select(col("id").as("train_id"), explode(col("sh")).as("shash"))
    val evalPosting = hashedShingleSets(eval, textCol, idCol, shingleK)
      .select(col("id").as("eval_id"), explode(col("sh")).as("shash"))
    val joined = trainPosting.join(broadcast(evalPosting), "shash")
    (if (excludeSameId) joined.filter(col("train_id") =!= col("eval_id"))
     else joined)
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Winnowing fingerprint SETS (Schleimer–Wilkerson–Aiken,
    * SIGMOD'03 — the MOSS scheme): character k-gram digests of the
    * lowercased text, a w-window minimum selection, fingerprint set =
    * the distinct window minima. The winnowing guarantee: any shared
    * substring of length ≥ k + w − 1 contributes at least one SHARED
    * fingerprint — position-robust like MinHash but LOCAL (a quoted
    * paragraph inside an otherwise different document still collides),
    * with expected density 2/(w+1).
    *
    * Scale shape: everything is IN-ROW Catalyst expression work —
    * gram digests via `transform(sequence(...))`, window minima via
    * `array_min(slice(...))` — no explode, no shuffle, no ×length row
    * amplification; only the callers' fingerprint POSTINGS (8-byte
    * digests) ever shuffle. Digests are the t212 48-bit md5
    * convention, so DuckDB replays them verbatim → the t253/t254
    * driver rows are hash-exact, not gated.
    *
    * Texts shorter than k chars fall back to one whole-text gram
    * (the [[shingles]] convention). Output: (id, n_grams,
    * fps ARRAY<LONG> — sorted distinct).
    *
    * The digest/min/distinct chain runs in ONE codegen'd kernel call
    * per row ([[graft.functions.TextKernels.winnowingFps]]) — the
    * composable nested-lambda form ran interpreted at ~2 ms/doc
    * (10.6 s for 5k docs at sf0.1), the same trap hashedShingles
    * exists for; the kernel is bit-identical (same 48-bit md5
    * convention, same window rule — WinnowingKernelSpec pins it
    * against the expression replay).
    */
  private[graft] def winnowingSets(docs: DataFrame, textCol: String,
                                   idCol: String, k: Int,
                                   w: Int): DataFrame = {
    require(k >= 2, s"gram size must be >= 2, got $k")
    require(w >= 1, s"window must be >= 1, got $w")
    val txt = lower(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        when(length(txt) < k, lit(1))
          .otherwise(length(txt) - (k - 1)).as("n_grams"),
        TextFunctions.winnowing_fps(txt, k, w).as("fps"))
  }

  /** Per-document winnowing fingerprint statistics: gram count,
    * fingerprint count, and density (≈ 2/(w+1) by the winnowing
    * guarantee — a document whose density strays far above it is
    * high-entropy churn; far below, repetitive boilerplate). See
    * [[winnowingSets]] for the scheme and scale shape.
    * Output: (id, n_grams, n_fingerprints, density 6dp).
    */
  def winnowingFingerprints(docs: DataFrame, textCol: String,
                            idCol: String, k: Int = 8,
                            w: Int = 4): DataFrame =
    winnowingSets(docs, textCol, idCol, k, w)
      .select(col("id"), col("n_grams").cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        round(size(col("fps")).cast("double") / col("n_grams"), 6)
          .as("density"))

  /** Cross-document winnowing matches — the plagiarism/quotation
    * detector MinHash whole-document similarity misses: document
    * pairs sharing ≥ `minShared` fingerprints, scored by fingerprint
    * Jaccard. Posting lists are df-capped through the shared
    * saturating buckets (a boilerplate fingerprint in a million docs
    * fills a maxDf+1 buffer and drops, never fanning out); pair
    * counts expand in-array from the capped lists — no posting
    * self-join. Output: (id_a < id_b, n_shared, jaccard 6dp).
    */
  def winnowingPairs(docs: DataFrame, textCol: String, idCol: String,
                     k: Int = 8, w: Int = 4, minShared: Int = 2,
                     maxDf: Int = 10): DataFrame = {
    val sets = winnowingSets(docs, textCol, idCol, k, w)
      .localCheckpoint(true) // feeds postings AND the per-doc sizes
    val posting = sets.select(col("id"), explode(col("fps")).as("h"))
    val pairs = Buckets.capped(posting, Seq("h"), maxDf)
      .select(explode(flatten(transform(col("ids"), a =>
        transform(filter(col("ids"), b => b > a),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // nf is corpus-sized (one row per doc) — never broadcast it; the
    // PAIRS side is the small one and AQE broadcasts it on its own
    val nf = sets.select(col("id"), size(col("fps")).cast("long").as("nf"))
    pairs
      .join(nf.select(col("id").as("id_a"), col("nf").as("__na")), "id_a")
      .join(nf.select(col("id").as("id_b"), col("nf").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared")), 6).as("jaccard"))
  }

  /** LSH banding CALIBRATION audit — the "which (bands, rows) to ship"
    * question answered with the corpus' own numbers instead of the
    * textbook S-curve alone: ground-truth near-dup pairs (the capped
    * n-gram Jaccard generator, df-capped postings) are binned by true
    * Jaccard, and for every candidate banding of the same `numHashes`
    * signature the MEASURED fraction of truth pairs that collide in
    * ≥ 1 band is laid beside the ANALYTIC collision probability
    * p = 1 − (1 − s^r)^b at the bin midpoint. Where measured recall
    * tracks the curve the banding behaves; where it falls under
    * (bucket caps, signature variance at short texts) the gap is
    * visible per bin BEFORE a production dedup run commits to a
    * threshold.
    *
    * Scale shape: the truth pipeline runs ONCE (localCheckpoint'd,
    * reused by every banding); each banding adds one signature scan +
    * one capped-bucket pair pass (8-byte keys, the t2 machinery) and
    * a broadcast-sized join against the truth pairs. Output rows =
    * |bandings| · |bins| — model-sized.
    *
    * Output: (bands, rows_per_band, bin, j_mid, n_pairs, n_recalled,
    * recall 6dp, p_analytic 6dp), ordered (bands, bin).
    */
  def lshCalibration(docs: DataFrame, textCol: String, idCol: String,
                     shingleK: Int = 3, numHashes: Int = 64,
                     bandsOptions: Seq[Int] = Seq(8, 16, 32),
                     minJaccard: Double = 0.2, maxDf: Int = 10,
                     nBins: Int = 5, maxBucket: Int = 200): DataFrame = {
    require(bandsOptions.nonEmpty, "need at least one banding")
    require(bandsOptions.forall(b => b >= 1 && numHashes % b == 0),
      s"every banding must divide numHashes=$numHashes: $bandsOptions")
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val reps = exact(docs, textCol, idCol).localCheckpoint(true)
    val truth = ngramJaccardPairs(reps, textCol, idCol, shingleK,
        minJaccard, maxDf)
      .select(col("id_a"), col("id_b"),
        least(floor(col("jaccard") * nBins), lit(nBins - 1))
          .cast("int").as("bin"))
      .localCheckpoint(true) // reused by every banding below
    val perBanding = bandsOptions.map { b =>
      val cand = minhashCandidates(reps, textCol, idCol, shingleK,
          numHashes, b, maxBucket)
        .withColumn("__hit", lit(1))
      truth.join(cand, Seq("id_a", "id_b"), "left")
        .groupBy(lit(b).as("bands"), col("bin"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(coalesce(col("__hit"), lit(0))).cast("long")
               .as("n_recalled"))
    }.reduce(_ unionByName _)
    perBanding
      .withColumn("rows_per_band", (lit(numHashes) / col("bands")).cast("int"))
      .withColumn("j_mid", round((col("bin") + 0.5) / nBins, 6))
      .withColumn("recall",
        round(col("n_recalled").cast("double") / col("n_pairs"), 6))
      .withColumn("p_analytic",
        round(lit(1.0) - pow(lit(1.0) -
          pow(col("j_mid"), lit(numHashes.toDouble) / col("bands")),
          col("bands").cast("double")), 6))
      .select(col("bands"), col("rows_per_band"), col("bin"), col("j_mid"),
        col("n_pairs"), col("n_recalled"), col("recall"), col("p_analytic"))
      .orderBy(col("bands"), col("bin"))
  }
}
