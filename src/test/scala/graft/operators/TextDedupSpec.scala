package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                     // exact dup of 0
    (2L, base + " tonight"),                        // near dup of 0/1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "the quick brown fox sleeps under the lazy dog again and again today") // near dup, one word changed
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per distinct text") {
    val out = TextDedup.exact(docs, "text", "doc_id")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 2L, 3L, 4L)) // 1 collapsed into 0
  }

  test("shingles produce overlapping word k-grams; short docs fall back to whole text") {
    val sh = docs.filter($"doc_id" === 0)
      .select(TextDedup.shingles($"text", 3).as("sh"))
      .as[Seq[String]].head()
    assert(sh.head == "the quick brown")
    assert(sh(1) == "quick brown fox")
    assert(sh.size == base.split(" ").length - 2)
    val short = Seq((9L, "tiny doc")).toDF("doc_id", "text")
      .select(TextDedup.shingles($"text", 5).as("sh")).as[Seq[String]].head()
    assert(short == Seq("tiny doc"))
  }

  test("native minhash signature is bit-exact with the explode+agg SQL formulation") {
    val n = 16
    val native = TextDedup.minhashSignatures(docs, "text", "doc_id",
        shingleK = 3, numHashes = n)
      .as[(Long, Seq[Long])].collect().toMap
    val exploded = docs.select($"doc_id".as("id"),
        explode(TextDedup.shingles($"text", 3)).as("sh"))
      .groupBy($"id")
      .agg(array((0 until n).map(i => min(xxhash64($"sh", lit(i)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == exploded)
  }

  test("native hashed shingles = sorted distinct xxhash64 of the string shingles") {
    // includes multi-space + tab separators and a short (< k tokens) doc
    val tricky = docs.unionByName(Seq(
      (10L, "spaced  out\ttokens  here"), (11L, "tiny doc")).toDF("doc_id", "text"))
    val native = tricky.select($"doc_id",
        graft.functions.TextFunctions.hashed_shingles($"text", 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val composed = tricky.select($"doc_id",
        array_sort(array_distinct(transform(
          TextDedup.shingles(lower($"text"), 3), s => xxhash64(s)))).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == composed)
  }

  test("minhash near-dups: exact+near pairs found, dissimilar not paired") {
    val pairs = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))       // identical: jaccard 1.0
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc stays out
  }

  test("minhash jaccard on identical docs is exactly 1.0") {
    val j = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.9)
      .filter($"id_a" === 0 && $"id_b" === 1)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: identical docs share a fingerprint; near-dups within Hamming 3") {
    val sh = TextDedup.simhash(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(1L))
    val pairs = TextDedup.simhashNearDups(docs, "text", "doc_id", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 1L)))
    assert(pairs.find(p => (p._1, p._2) == ((0L, 1L))).get._3 == 0)
    assert(!pairSet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("bucket cap: a 1k-doc NEAR-dup (not exact-dup) cluster cannot blow up the candidate join") {
    // 1000 distinct-but-near-identical docs (template spam): every doc
    // shares most shingles, so flat LSH would put the whole cluster in
    // one bucket per band → ~500k candidate pairs per band. The cap
    // drops saturated buckets instead; the run must stay small and the
    // overflow must be auditable.
    val spam = (0 until 1000).map(i => (i.toLong, s"$base variant number $i"))
      .toDF("doc_id", "text")
    val capped = TextDedup.minhashCandidates(spam, "text", "doc_id",
      maxBucket = 50)
    // every emitted pair respects the cap's pair bound: each surviving
    // bucket contributes at most C(50,2) pairs
    val n = capped.count()
    assert(n < 16 * 50 * 49 / 2, s"candidate count $n suggests an uncapped bucket")
    // the audit surface reports the dropped hot buckets
    val overflow = TextDedup.overflowBuckets(spam, "text", "doc_id",
      maxBucket = 50)
    assert(overflow.count() > 0)
    assert(overflow.agg(max($"occupancy")).as[Long].head() > 50)
    // and on the ordinary corpus the cap changes nothing
    val before = TextDedup.minhashCandidates(docs, "text", "doc_id",
      maxBucket = 200).as[(Long, Long)].collect().toSet
    val tight = TextDedup.minhashCandidates(docs, "text", "doc_id",
      maxBucket = 5).as[(Long, Long)].collect().toSet
    assert(before == tight)
  }

  test("capped buckets reject non-integral ids loudly (no silent empty posting lists)") {
    val stringIds = Seq(("doc-1", base), ("doc-2", base)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextDedup.minhashCandidates(stringIds, "text", "doc_id").collect()
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("ngram jaccard pairs with hand-checked similarity") {
    val out = TextDedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleK = 3, minJaccard = 0.3, maxDf = 10)
    val m = out.as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(m((0L, 1L)) == 1.0)
    // doc4 swaps words 4-5 of 13 ("jumps over"→"sleeps under"): shingle
    // starts {2,3,4,5} break → |∩|=7 of 11 each, |∪|=15 → 7/15
    assert(math.abs(m((0L, 4L)) - 7.0 / 15.0) < 1e-6)
  }

  test("removeDuplicateSpans masks covered positions, keeps the rest in order") {
    // k=3, minDocs=2: docs 10 and 11 share the 3-token span "a b c"
    // (positions 1-3 in doc 10, 0-2 in doc 11); doc 12 is untouched
    val corpus = Seq(
      (10L, "x a b c y z q"),    // tokens 1..3 covered → keep x y z q
      (11L, "a b c d e"),        // tokens 0..2 covered → keep d e
      (12L, "p q r s t")         // no shared span → unchanged
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateSpans(corpus, "text", "doc_id",
        k = 3, minDocs = 2)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((7, 4, "x y z q")))
    assert(out(11L) == ((5, 2, "d e")))
    assert(out(12L) == ((5, 5, "p q r s t")))
    // a span repeated WITHIN one doc only does not count as duplicated
    val within = Seq(
      (20L, "m n o m n o"),      // "m n o" twice in the SAME doc
      (21L, "u v w x y")
    ).toDF("doc_id", "text")
    val out2 = TextDedup.removeDuplicateSpans(within, "text", "doc_id",
        k = 3, minDocs = 2)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out2(20L) == "m n o m n o")
    // full scrub: identical short docs empty out entirely
    val dup = Seq((30L, "a b c"), (31L, "a b c")).toDF("doc_id", "text")
    val out3 = TextDedup.removeDuplicateSpans(dup, "text", "doc_id",
        k = 6, minDocs = 2)  // < k tokens → whole-text shingle
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out3(30L) == ((0, "")) && out3(31L) == ((0, "")))
  }

  test("contaminationPairs counts distinct shared shingles vs the eval set") {
    // eval = doc 0; doc 1 is an exact copy (11 shared shingles), doc 4
    // shares 7 (the jaccard test's hand count), doc 3 shares none
    val evalSet = docs.filter($"doc_id" === 0)
    val out = TextDedup.contaminationPairs(docs, evalSet, "text", "doc_id",
        shingleK = 3, minShared = 5, excludeSameId = true)
      .as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(out((1L, 0L)) == 11L)
    assert(out((4L, 0L)) == 7L)
    assert(!out.contains((3L, 0L)))
    assert(!out.contains((0L, 0L))) // an eval doc never flags itself
    // raising the threshold past doc 4's overlap drops it
    val strict = TextDedup.contaminationPairs(docs, evalSet, "text", "doc_id",
        shingleK = 3, minShared = 8, excludeSameId = true)
      .select($"train_id").as[Long].collect().toSet
    assert(strict == Set(1L, 2L)) // doc 2 appends one word: 11+ shared
  }

  test("ngramNovelty: coverage fractions on planted overlap") {
    val reference = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val target = Seq(
      // every trigram of a reference substring → coverage 1.0
      (1L, "quick brown fox jumps"),
      // entirely novel text → coverage 0.0
      (2L, "completely fresh words appearing nowhere else"),
      // half old, half new: trigrams of "brown fox jumps crazy new"
      // = {brown fox jumps (seen), fox jumps crazy, jumps crazy new}
      (3L, "brown fox jumps crazy new"),
      // < 3 tokens: whole text is the single shingle, unseen
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = TextDedup.ngramNovelty(target, reference, "text", "doc_id")
      .select($"doc_id", $"n_shingles", $"n_seen", $"coverage", $"high_overlap")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((2L, 2L, 1.0, true)))
    assert(out(2L) == ((4L, 0L, 0.0, false))) // 6 tokens → 4 trigrams
    assert(out(3L) == ((3L, 1L, 0.333333, false)))
    assert(out(4L) == ((1L, 0L, 0.0, false)))
  }

  test("containmentPairs: a doc quoted inside a longer one scores 1.0 in the sub direction only") {
    val quoted = Seq(
      (0L, "alpha beta gamma delta epsilon"),                       // 3 trigrams
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),   // 7, contains all of 0's
      (2L, "totally unrelated words about nothing shared here"))
      .toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(quoted, "text", "doc_id",
        shingleK = 3, minContainment = 0.8, maxDf = 10)
      .collect().map(r => (r.getAs[Long]("id_sub"), r.getAs[Long]("id_sup"),
        r.getAs[Long]("n_sub"), r.getAs[Long]("n_common"),
        r.getAs[Double]("containment")))
    // 0 ⊆ 1 at 3/3; the reverse direction is 3/7 < 0.8 and drops
    assert(out.toSeq == Seq((0L, 1L, 3L, 3L, 1.0)))
  }

  test("editDistanceVerify scores shortlisted pairs with the exact Levenshtein") {
    val pairs = Seq((0L, 2L), (0L, 4L)).toDF("id_a", "id_b")
    val out = TextDedup.editDistanceVerify(pairs, docs, "text", "doc_id",
        minSim = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
        -> ((r.getAs[Long]("dist"), r.getAs[Long]("max_len"),
             r.getAs[Double]("sim")))).toMap
    val (d02, m02, s02) = out((0L, 2L))
    assert(d02 == 8L) // " tonight" appended: 8 chars inserted
    assert(m02 == base.length + 8)
    assert(s02 == math.rint((1.0 - 8.0 / m02) * 1e6) / 1e6)
    val (d04, _, _) = out((0L, 4L))
    // jumps->sleeps (4 edits), over->under (3)
    assert(d04 == 7L)
  }

  test("editDistanceVerify: minSim and the length quick-reject prune pairs") {
    val pairs = Seq((0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val strict = TextDedup.editDistanceVerify(pairs, docs, "text",
      "doc_id", minSim = 0.95).collect()
    assert(strict.forall(_.getAs[Double]("sim") >= 0.95))
    assert(!strict.exists(r => r.getAs[Long]("id_b") == 3L))
    // the quick-reject alone kills a pair whose length gap already
    // bounds sim below minSim: doc 2 is 8 chars longer than doc 0,
    // so at minSim 0.999 the pair never reaches the DP
    val rejected = TextDedup.editDistanceVerify(
      Seq((0L, 2L)).toDF("id_a", "id_b"), docs, "text", "doc_id",
      minSim = 0.999)
    assert(rejected.count() == 0)
  }

  test("containmentPairs: the df cap silences stop-phrase-only pairs") {
    // every doc shares one stop trigram; with maxDf below the doc
    // count the bucket saturates and no candidates (hence no pairs)
    // emerge from it
    val docs = (0L to 5L).map(i =>
      (i, s"common stop phrase unique$i tail$i word$i"))
      .toDF("doc_id", "text")
    assert(TextDedup.containmentPairs(docs, "text", "doc_id",
      shingleK = 3, minContainment = 0.1, maxDf = 3).count() == 0)
  }

  test("t229-style dedup savings: exact copies collapse to the longest text's bytes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 36L),
      (2L, "alpha beta gamma delta epsilon zeta", 36L), // exact copy
      (3L, "unrelated content about something else entirely", 48L))
      .toDF("doc_id", "text", "n_chars")
    val exactPairs = TextDedup.exactClusters(docs, "text", "doc_id")
    val clusters = Clustering.labelCorpus(docs, "doc_id",
        exactPairs, "id_a", "id_b")
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(max(col("n_chars")).as("keep"), sum(col("n_chars")).as("tot"))
    val row = clusters.agg(sum(col("tot")).as("before"),
      sum(col("keep")).as("after")).collect().head
    assert(row.getAs[Long]("before") == 120 && row.getAs[Long]("after") == 84)
  }

  test("damerauVerify: transpositions count one edit and the reject honors minSim") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma detla epsilon"),  // one transposition (tl <-> lt)
      (3L, "totally different text right here"),
      (4L, "alpha beta"))                       // fails the length reject vs 1
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = TextDedup.damerauVerify(pairs, docs, "text", "doc_id",
      minSim = 0.9).collect()
    // only the transposed pair survives: dl = 1 over 30 chars
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_b") == 2L)
    assert(out.head.getAs[Long]("dl") == 1L)
    // plain levenshtein would charge the swap 2 edits
    val lev = docs.filter(col("doc_id") <= 2)
      .agg(min(levenshtein(lit("alpha beta gamma delta epsilon"),
        lit("alpha beta gamma detla epsilon")))).collect().head.getInt(0)
    assert(lev == 2)
  }

  test("winnowing: hand-checked fingerprints, the shared-substring " +
       "guarantee, and df-capped pair scoring") {
    import spark.implicits._
    def digest(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString, 16)
    // hand replay on one tiny doc: k=3, w=2 over "abcdef" (6 chars →
    // 4 grams abc bcd cde def → 3 windows → distinct minima)
    val tiny = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val hs = Seq("abc", "bcd", "cde", "def").map(digest)
    val exp = hs.sliding(2).map(_.min).toSeq.distinct
    val got = TextDedup.winnowingSets(tiny, "text", "doc_id", 3, 2)
      .select($"fps").as[Seq[Long]].head()
    assert(got.sorted == exp.sorted)
    // stats row agrees
    val st = TextDedup.winnowingFingerprints(tiny, "text", "doc_id", 3, 2)
      .collect().head
    assert(st.getAs[Long]("n_grams") == 4 &&
      st.getAs[Long]("n_fingerprints") == exp.distinct.size)
    // guarantee: a 40-char block quoted inside an unrelated doc shares
    // fingerprints (block length >> k + w - 1 = 11)
    val block = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"completely unrelated preamble text $block trailing words"),
      (2L, s"$block and then a different continuation entirely"),
      (3L, "nothing in common with the others at all here")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.winnowingPairs(docs, "text", "doc_id",
        k = 8, w = 4, minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"quoted block not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // short-doc fallback: one whole-text gram, one fingerprint
    val short = TextDedup.winnowingFingerprints(
      Seq((9L, "ab")).toDF("doc_id", "text"), "text", "doc_id", 8, 4)
      .collect().head
    assert(short.getAs[Long]("n_grams") == 1 &&
      short.getAs[Long]("n_fingerprints") == 1)
  }

  test("winnowing kernel is bit-identical to the composable expression " +
       "replay (incl. multibyte codepoints, short docs, empty text)") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab", "", "exactly8", "ninechars",
      "ünïcödé çhärs in the grams too — κόσμε 世界 mixed in",
      "aaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams identical
      "MiXeD CaSe LoWeRs ThRoUgH tHe SaMe PaTh")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 1))) {
      // the pre-kernel formulation: per-gram portableDigest via
      // nested lambdas, window minima via array_min(slice), distinct
      def digest(c: org.apache.spark.sql.Column) =
        graft.ops.SnapshotDiff.portableDigest(Seq(c))
      val txt = lower(col("text"))
      val grams = when(length(txt) < k, array(digest(txt)))
        .otherwise(transform(sequence(lit(1), length(txt) - (k - 1)),
          i => digest(txt.substr(i, lit(k)))))
      val expected = df.select(col("doc_id"), grams.as("hs"))
        .select(col("doc_id"), sort_array(array_distinct(transform(
          sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
          j => array_min(slice(col("hs"), j, lit(w)))))).as("fps"))
        .orderBy(col("doc_id")).as[(Long, Seq[Long])].collect().toSeq
      val got = TextDedup.winnowingSets(df, "text", "doc_id", k, w)
        .select(col("id"), col("fps"))
        .orderBy(col("id")).as[(Long, Seq[Long])].collect().toSeq
      assert(got == expected, s"kernel/expression divergence at k=$k w=$w")
    }
    // n_grams matches the codepoint count rule
    val ng = TextDedup.winnowingSets(df, "text", "doc_id", 8, 4)
      .select(col("id"), col("n_grams")).as[(Long, Int)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.codePointCount(0, t.length)
      assert(ng(i.toLong) == math.max(n - 7, 1), s"n_grams for '$t'")
    }
  }

  test("lshCalibration: shared truth across bandings, analytic S-curve " +
       "values exact, near-identical planted pairs recalled everywhere") {
    import spark.implicits._
    // 6 base docs + 3 planted near-identical twins (one word changed
    // in a 12-word doc → shingle Jaccard well above 0.8)
    val base = (0 until 6).map { i =>
      (i.toLong, (0 until 12).map(w => s"tok${i}_$w").mkString(" "))
    }
    val twins = (0 until 3).map { i =>
      (100L + i,
        ((0 until 11).map(w => s"tok${i}_$w") :+ "changed").mkString(" "))
    }
    val docs = (base ++ twins).toDF("doc_id", "text")
    val out = TextDedup.lshCalibration(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bandsOptions = Seq(8, 16, 32),
      minJaccard = 0.2, maxDf = 10, nBins = 5).collect()
    assert(out.nonEmpty)
    // one shared truth set: per-banding totals identical
    val totals = out.groupBy(_.getAs[Int]("bands"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_pairs")).sum }
    assert(totals.toSet.size == 1 && totals.head == 3L)
    // analytic column is the exact formula at the bin midpoint
    out.foreach { r =>
      val (b, rr) = (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))
      assert(b * rr == 64)
      val s = r.getAs[Double]("j_mid")
      val exp = BigDecimal(1.0 - math.pow(1.0 - math.pow(s, 64.0 / b), b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("p_analytic") == exp)
    }
    // the planted twins sit in the top bin and every banding finds
    // them (p >= 0.988 even at 8x8 for s = 0.9)
    val top = out.filter(_.getAs[Int]("bin") == 4)
    assert(top.length == 3)
    top.foreach(r => assert(r.getAs[Double]("recall") == 1.0))
  }

  test("canonicalText: NFC composition + casefold + whitespace collapse") {
    val df = Seq(
      (0L, "CAFE\u0301   x"),        // decomposed E + acute, run of spaces
      (1L, "café x"),           // composed, already canonical
      (2L, "  plain\tascii\n ok "),  // whitespace variants + edges
      (3L, "U\u0308ber")             // decomposed U + diaeresis
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextDedup.canonicalText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "café x")
    assert(out(1L) == "café x")
    assert(out(2L) == "plain ascii ok")
    assert(out(3L) == "über")
  }

  test("canonicalExact collapses NFC/case/whitespace variants keep-first; " +
    "canonicalGroups reports them") {
    val df = Seq(
      (10L, "The Quick   Fox"),
      (11L, "the quick fox"),
      (12L, "the quick fox jumps"),   // distinct doc
      (13L, "Cafe\u0301 story"),
      (14L, "café story"),
      (15L, "cafe story")             // NOT a variant (no accent)
    ).toDF("doc_id", "text")
    val kept = TextDedup.canonicalExact(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 12L, 13L, 15L))
    val groups = TextDedup.canonicalGroups(df, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("kept_id"),
        r.getAs[Long]("n_docs"), r.getAs[Int]("canon_chars"))).sorted
    assert(groups.toSeq == Seq((10L, 2L, 13), (13L, 2L, 10)))
  }

  test("prefixFilterPairs = brute-force all-pairs at every threshold " +
       "(exact dups, near dups, short whole-text docs, integer t·|d|)") {
    // corpus engineered so prefix pruning has something to prune (a
    // hot shingle shared by everything) and t·|d| crosses integer
    // boundaries for several set sizes
    val hot = "alpha beta gamma" // shared 3-gram across all docs
    val df = Seq(
      (0L, s"$hot one two three four five six seven"),
      (1L, s"$hot one two three four five six seven"),        // exact dup
      (2L, s"$hot one two three four five six EIGHT"),        // near dup
      (3L, s"$hot totally different tail about spark plans"),
      (4L, "tiny"),                                           // whole-text gram
      (5L, "tiny"),                                           // exact dup of 4
      (6L, s"$hot one two three four five nine seven ten")
    ).toDF("doc_id", "text")
    def brute(t: Double): Set[(Long, Long, Double)] = {
      val sets = df.select($"doc_id".as("id"),
        array_sort(array_distinct(transform(
          TextDedup.shingles($"text", 3), s => xxhash64(s)))).as("sh"))
      sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          round(graft.functions.TextFunctions.sorted_intersect_count(
            col("a.sh"), col("b.sh")).cast("double") /
            (size(col("a.sh")) + size(col("b.sh")) -
              graft.functions.TextFunctions.sorted_intersect_count(
                col("a.sh"), col("b.sh"))), 6).as("j"))
        .filter($"j" >= t)
        .as[(Long, Long, Double)].collect().toSet
    }
    for (t <- Seq(0.3, 0.5, 0.6, 0.75, 1.0)) {
      val got = TextDedup.prefixFilterPairs(df, "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute(t), s"prefix/brute divergence at t=$t")
    }
  }
}
