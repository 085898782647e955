package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with the strongest marker evidence") {
    val docs = Seq(
      (0L, "the house of a cat and a dog is warm"),       // en stopwords
      (1L, "el perro de la casa y que bonito"),            // es stopwords
      (2L, "le chat et la maison de un homme"),            // fr stopwords
      (3L, "der hund und die katze das ist schön"),        // de stopwords + umlaut
      (4L, "这是一个中文文档"),                              // zh charset
      (5L, "xyzzy plugh qwfp")                             // no evidence
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en"); assert(out(1L) == "es"); assert(out(2L) == "fr")
    assert(out(3L) == "de"); assert(out(4L) == "zh"); assert(out(5L) == "und")
  }

  test("qualityMetrics: hand-computed ratios") {
    val docs = Seq((0L, "the cat, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(docs, "text")
      .select("n_chars_m", "n_tokens", "punct_ratio", "stopword_ratio")
      .head()
    assert(r.getInt(0) == 17)
    assert(r.getInt(1) == 4)
    assert(r.getDouble(2) == math.rint(2.0 / 17 * 1e6) / 1e6) // ',' and '!'
    assert(r.getDouble(3) == 0.5)                             // 2× 'the' of 4
  }

  test("tokenCounts: whitespace vs BPE-ish pieces") {
    val docs = Seq((0L, "hello world42 x-y")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs, "text")
      .select("ws_tokens", "bpeish_tokens").head()
    assert(r.getInt(0) == 3)
    // hello | world | 42 | x | - | y
    assert(r.getInt(1) == 6)
  }

  test("bpeish kernel == regex form on edge cases (unicode, runs, whitespace zoo)") {
    val cases = Seq(
      "", " ", "\t\n\f\r ", "abc", "abc123", "a1b2c3",
      "hello, world! 42", "¡héllo wörld!", "汉字 test 123",
      "a.b.c", "...", "a  b\t\tc", "ABCdef GHI", "123 456",
      "x y",            // non-breaking space is NOT Java \s
      "émile—naïve… 3.14",   // multi-byte glyphs count once each
      "😀ok😀") // supplementary (4-byte) code points
    import spark.implicits._
    val df = cases.toDF("text")
    val got = df.select(
        graft.functions.TextFunctions.bpeish_token_count(col("text")).as("k"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("r"))
      .as[(Int, Int)].collect()
    cases.zip(got).foreach { case (s, (k, r)) =>
      assert(k == r, s"kernel $k != regex $r on ${s.map(_.toInt)}")
    }
  }

  test("bpeish kernel == regex form on 500 random unicode-ish strings") {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.frequency(
      6 -> org.scalacheck.Gen.alphaNumChar,
      2 -> org.scalacheck.Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '-'),
      1 -> org.scalacheck.Gen.oneOf('é', 'ß', '汉', ' ', '→')))
      .map(_.mkString)
    val seed = org.scalacheck.rng.Seed(20260812L)
    val strings = Iterator.iterate(seed)(_.next)
      .take(500)
      .flatMap(s => gen.apply(org.scalacheck.Gen.Parameters.default, s))
      .toSeq
    import spark.implicits._
    val got = strings.toDF("text").select(
        col("text"),
        graft.functions.TextFunctions.bpeish_token_count(col("text")).as("k"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("r"))
      .as[(String, Int, Int)].collect()
    got.foreach { case (s, k, r) =>
      assert(k == r, s"kernel $k != regex $r on ${s.map(_.toInt)}")
    }
  }

  test("qualityFlags: hand-computed repetition, symbols, and bounds") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"),                  // bigrams: ab,ba,ab,ba,ab → 2/5 distinct
      (1L, "clean readable prose about engines and planners today"),
      (2L, "#### $$$$ %%%% @@@@"),          // symbol-heavy
      (3L, "hi"),                           // below min token count; no bigrams
      (4L, " padded   prose  with messy   spacing around here "),
      (5L, "汉字 漢字 中文 文字 汉语")       // unicode letters are NOT symbols
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFlags(docs, "text")
      .select($"doc_id", $"dup_bigram_frac", $"symbol_ratio",
              $"ok_repetition", $"ok_symbols", $"ok_word_count", $"keep",
              $"n_tokens", $"mean_word_len")
      .as[(Long, Double, Double, Boolean, Boolean, Boolean, Boolean, Int, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(math.abs(out(0L)._2 - (1.0 - 2.0 / 5.0)) < 1e-9)
    assert(!out(0L)._4 && !out(0L)._7)      // repetitive → dropped
    assert(out(1L)._4 && out(1L)._5 && out(1L)._7) // clean doc keeps
    assert(out(2L)._3 > 0.3 && !out(2L)._5) // symbols over budget
    assert(out(3L)._2 == 0.0 && !out(3L)._6) // no bigrams; too short
    // messy whitespace: no phantom edge tokens, true mean token length
    assert(out(4L)._8 == 7)
    assert(math.abs(out(4L)._9 - 37.0 / 7.0) < 1e-6) // Σ|tok| = 37
    assert(out(4L)._7)
    // CJK: zero symbols, 5 two-char tokens, mean exactly at the bound
    assert(out(5L)._3 == 0.0 && out(5L)._5)
    assert(out(5L)._8 == 5 && out(5L)._9 == 2.0 && out(5L)._7)
  }

  test("rolling hash: deterministic, matches the closed-form polynomial") {
    val out = Seq(("ab", 0L)).toDF("s", "ignore")
      .select(TextFunctions.rolling_hash($"s", base = 31L)).as[Long].head()
    assert(out == 'a'.toLong * 31 + 'b'.toLong)
    // order sensitivity: "ab" != "ba"
    val ba = Seq(("ba", 0L)).toDF("s", "ignore")
      .select(TextFunctions.rolling_hash($"s", base = 31L)).as[Long].head()
    assert(out != ba)
  }

  test("fingerprints join: identical texts share both hashes") {
    val docs = Seq((0L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(docs, "text", "doc_id").collect()
    val m = fp.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(m(0L) == m(1L))
    assert(m(0L) != m(2L))
  }

  test("rolling_hash_mod matches Horner closed form over code points") {
    val out = Seq(Tuple1("ab中")).toDF("s")
      .select(TextFunctions.rolling_hash_mod($"s", base = 31L, mod = 97L))
      .as[Long].head()
    val expect = ((('a'.toLong * 31 + 'b') % 97) * 31 + 0x4e2d) % 97
    assert(out == expect)
  }

  test("tokenChunks: hand-computed windows, overlap, and trailing chunk") {
    // 10 tokens, chunk 4, stride 3: starts at 0,3,6 -> 1+ceil(6/3)=3
    // chunks; last chunk is the full 4 (tokens 7-10)
    val text = (1 to 10).map("w" + _).mkString(" ")
    val got = TextAnalysis.tokenChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", 4, 3)
      .as[(Long, Int, String, Int)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w4 w5 w6 w7", 4),
      (1L, 2, "w7 w8 w9 w10", 4)))
  }

  test("tokenChunks: trailing partial window is kept, not dropped") {
    // 9 tokens, chunk 4, stride 3: starts 0,3,6 -> chunk 2 has 3 tokens
    val text = (1 to 9).map("w" + _).mkString(" ")
    val got = TextAnalysis.tokenChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", 4, 3)
      .as[(Long, Int, String, Int)].collect().sortBy(_._2).toSeq
    assert(got.last == (1L, 2, "w7 w8 w9", 3))
    assert(got.map(_._4).sum >= 9) // every token lands in >= 1 chunk
  }

  test("tokenChunks: short doc is one whole-text chunk") {
    val got = TextAnalysis.tokenChunks(
        Seq((7L, "just three tokens")).toDF("doc_id", "text"),
        "text", "doc_id", 16, 12)
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((7L, 0, "just three tokens", 3)))
  }

  test("tokenChunks: exact-fit doc yields exactly one chunk") {
    val text = (1 to 4).map("w" + _).mkString(" ")
    val got = TextAnalysis.tokenChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", 4, 3)
      .collect()
    assert(got.length == 1)
  }

  test("tokenChunks: every token position is covered at stride < chunk") {
    // n=11, chunk 5, stride 2: starts 0,2,4,6 -> 1+ceil(6/2)=4 chunks,
    // last start 6 covers tokens 7..11 — union covers 1..11
    val text = (1 to 11).map("w" + _).mkString(" ")
    val got = TextAnalysis.tokenChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", 5, 2)
      .as[(Long, Int, String, Int)].collect().toSeq
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 11).map("w" + _).toSet)
    assert(got.length == 4)
  }

  test("collapseRuns: hand-computed collapse, counts, and longest run") {
    val docs = Seq((1L, "a a b a a a c")).toDF("doc_id", "text")
    val r = TextAnalysis.collapseRuns(docs, "text", "doc_id")
      .as[(Long, Int, Int, Int, String)].head()
    assert(r == ((1L, 7, 4, 3, "a b a c")))
  }

  test("collapseRuns: run-free text passes through untouched") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.collapseRuns(docs, "text", "doc_id")
      .as[(Long, Int, Int, Int, String)].head()
    assert(r == ((1L, 3, 3, 1, "x y z")))
  }

  test("collapseRuns kernel == lambda formulation on edge-case zoo and random docs") {
    val rnd = new scala.util.Random(7)
    // repeats make runs likely; multi-byte tokens pin UTF-8 handling
    val vocab = Seq("a", "bb", "ccc", "a", "bb", "日本語", "héllo", "日本語")
    val random = (0 until 200).map { i =>
      (100L + i, (0 until (1 + rnd.nextInt(30)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val zoo = Seq(
      (0L, ""), (1L, " "), (2L, "  x"), (3L, "x  "), (4L, "x  x"),
      (5L, "x\ty\ty"), (6L, "a a a a a a a a"), (7L, "Ab ab AB ab"))
    val docs = (zoo ++ random).toDF("doc_id", "text")
    val k = TextAnalysis.collapseRuns(docs, "text", "doc_id")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    val l = TextAnalysis.collapseRunsLambda(docs, "text", "doc_id")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(k == l)
  }

  test("collapseRuns: single-token doc and idempotence") {
    val docs = Seq((1L, "solo"), (2L, "b b b b")).toDF("doc_id", "text")
    val once = TextAnalysis.collapseRuns(docs, "text", "doc_id")
      .select($"doc_id", $"clean_text".as("text"))
    // collapsing already-collapsed text changes nothing
    val twice = TextAnalysis.collapseRuns(once, "text", "doc_id")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(twice(1L) == ((1L, 1, 1, 1, "solo")))
    assert(twice(2L) == ((2L, 1, 1, 1, "b")))
  }

  /** Reference implementation of the hashed-BoW stats the native kernel
    * must match: regex split, per-token positional code-point sum mod
    * buckets, mean of the Knuth-scramble weights.
    */
  private def bowRef(text: String, buckets: Int): (Int, Double) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) (0, 0.0)
    else {
      val ws = toks.map { t =>
        val cps = t.codePoints().toArray
        val h = cps.zipWithIndex.map { case (cp, i) => cp.toLong * (i + 1) }.sum
        graft.functions.TextKernels.bowWeight(((h % buckets) + buckets) % buckets)
      }
      (toks.length, ws.sum / toks.length)
    }
  }

  test("bowQualityScore: kernel matches the reference formulation") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("key", "agg", "row", "scan", "日本語", "héllo", "x", "value42")
    val random = (0 until 200).map { i =>
      (100L + i, (0 until (1 + rnd.nextInt(25)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val zoo = Seq((0L, ""), (1L, "  "), (2L, " a  b "), (3L, "a\tb\rc\nd"))
    val docs = (zoo ++ random).toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        graft.functions.TextFunctions.hashed_bow_stats($"text", 64).as("s"))
      .select($"doc_id", $"s.n_tokens", $"s.mean_w")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    for ((id, n, m) <- got) {
      val text = (zoo ++ random).find(_._1 == id).get._2
      val (rn, rm) = bowRef(text, 64)
      assert(n == rn, s"n_tokens mismatch for doc $id")
      assert(math.abs(m - rm) < 1e-12, s"mean_w mismatch for doc $id")
    }
  }

  test("bowQualityScore: output shape, bounds, and empty-doc neutrality") {
    val docs = Seq((0L, "key agg row"), (1L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bowQualityScore(docs, "text", "doc_id")
      .as[(Long, Int, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    val (_, n0, s0, _) = out(0L)
    assert(n0 == 3 && s0 > 0.0 && s0 < 1.0)
    // tokenless doc: neutral score, kept
    assert(out(1L) == ((1L, 0, 0.5, true)))
  }

  test("charEntropyProfile: hand-computed entropy, uniqueness, modal share") {
    val docs = Seq(
      (0L, "aaaa"),        // one symbol: 0 bits, modal share 1
      (1L, "abab"),        // two equiprobable: 1 bit, share 0.5
      (2L, "abcd"),        // four equiprobable: 2 bits, share 0.25
      (3L, ""),            // empty: all-zero profile
      (4L, "héé")          // multibyte: p(h)=1/3, p(é)=2/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropyProfile(docs, "text", "doc_id",
        minEntropy = 1.5, maxTopRatio = 0.6)
      .as[(Long, Double, Int, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((0.0, 1, 1.0, true)))
    assert(out(1L) == ((1.0, 2, 0.5, true)))      // entropy below 1.5
    assert(out(2L) == ((2.0, 4, 0.25, false)))
    assert(out(3L) == ((0.0, 0, 0.0, true)))
    val h = -(1.0 / 3) * (math.log(1.0 / 3) / math.log(2)) -
      (2.0 / 3) * (math.log(2.0 / 3) / math.log(2))
    assert(out(4L)._1 == math.rint(h * 1e6) / 1e6)
    assert(out(4L)._2 == 2)
    assert(out(4L)._4)                            // share 2/3 > 0.6
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    val docs = Seq(
      (0L, "spam " * 400),                                   // pure repetition
      (1L, (0 until 400).map(i => java.lang.Long.toString(
        i * 2654435761L % 999999999999L, 36)).mkString(" ")), // varied
      (2L, ""),                                              // empty
      (3L, "short")                                          // tiny
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(docs, "text", "doc_id")
      .as[(Long, Int, Int, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // every roundtrip must succeed
    assert(out.values.forall(_._4))
    assert(out(0L)._3 < 0.05 && out(0L)._5)          // repetition: tiny ratio, flagged
    assert(out(1L)._3 > 3 * out(0L)._3 && !out(1L)._5) // varied text much less compressible
    assert(out(2L) == ((0, 8, 0.0, true, false)))    // empty: zlib header only, unflagged
    assert(out(3L)._1 == 5 && out(3L)._3 > 1.0)      // tiny doc: overhead dominates
    // determinism: the deflated size is a pure function of the text
    val again = TextAnalysis.compressionRatio(docs, "text", "doc_id")
      .as[(Long, Int, Int, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out == again)
  }

  test("charEntropyProfile kernel == explode-groupBy formulation on real docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val kernel = TextAnalysis.charEntropyProfile(docs, "text", "doc_id")
      .select($"doc_id", $"entropy", $"unique_chars", $"top_char_ratio")
    val counts = docs.filter(length($"text") > 0)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .filter($"c" =!= "")
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("n"))
    val tot = counts.groupBy($"doc_id").agg(sum($"n").cast("double").as("tot"))
    val ref = counts.join(tot, "doc_id")
      .groupBy($"doc_id")
      .agg(round(-sum(($"n" / $"tot") * log2($"n" / $"tot")), 6)
        .as("entropy_ref"))
    // spot-check entropy against an independent Spark formulation
    val joined = kernel.join(ref, "doc_id")
      .select($"entropy", $"entropy_ref").as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (k, r) => assert(math.abs(k - r) <= 1e-6) }
  }

  test("diversityReport: exact TTRs on a tiny corpus incl. the short-doc fallback") {
    val docs = Seq(("s", "a b"), ("s", "a b")).toDF("source", "text")
    val out = TextAnalysis.diversityReport(docs, "text", Seq("source"), 3)
      .collect().map(r => r.getAs[Int]("n") ->
        (r.getAs[Long]("total_grams"), r.getAs[Long]("distinct_grams"),
          r.getAs[Double]("ttr"))).toMap
    assert(out(1) == (4L, 2L, 0.5))          // a,b twice each
    assert(out(2) == (2L, 1L, 0.5))          // "a b" per doc
    assert(out(3) == (2L, 1L, 0.5))          // len<3 -> whole text
  }

  test("diversityReport: a templated source scores below a diverse one on 2-gram TTR") {
    val docs =
      (1 to 30).map(i => ("tpl", s"click here to win prize number $i")) ++
      (1 to 30).map(i => ("div", s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"))
    val out = TextAnalysis.diversityReport(docs.toDF("source", "text"),
        "text", Seq("source"), 3)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) ->
        r.getAs[Double]("ttr")).toMap
    assert(out(("tpl", 2)) < 0.5 && out(("div", 2)) == 1.0)
    assert(out(("tpl", 2)) < out(("div", 2)))
  }

  test("crossSourceContainment: full containment scores 1.0, disjoint pairs emit nothing") {
    val docs = Seq(
      ("A", "a b c d"),           // grams: "a b c", "b c d"
      ("B", "a b c d e"),         // grams: + "c d e" — A ⊂ B
      ("C", "x y z w")).toDF("source", "text")
    val out = TextAnalysis.crossSourceContainment(docs, "text", "source", 3)
      .collect().map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_common"), r.getAs[Double]("containment"))).toMap
    assert(out.keySet == Set(("A", "B")))   // C shares nothing — no row
    assert(out(("A", "B")) == (2L, 3L, 2L, 1.0))
  }

  test("crossSourceContainment: duplication within a source does not inflate overlap") {
    val docs = Seq(
      ("A", "p q r s"), ("A", "p q r s"), ("A", "p q r s"),
      ("B", "p q r t")).toDF("source", "text")
    // distinct grams: A={pqr,qrs}, B={pqr,qrt} -> common 1, min 2
    val out = TextAnalysis.crossSourceContainment(docs, "text", "source", 3)
      .collect().head
    assert(out.getAs[Long]("n_common") == 1L)
    assert(out.getAs[Double]("containment") == 0.5)
  }

  test("zipfFit matches the closed-form micro-log OLS on a geometric corpus") {
    // token wi appears 2^(5-i) times: counts 16, 8, 4, 2, 1
    val text = (1 to 5).flatMap(i => Seq.fill(1 << (5 - i))(s"w$i"))
      .mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(("s", text)).toDF("source", "text"),
      "text", Seq("source"), 100).collect().head
    // same contract computed independently: exact integer moments on
    // x = round(ln(rank)*1e6), y = round(ln(count)*1e6)
    val xs = (1 to 5).map(r => math.rint(math.log(r) * 1e6).toLong)
    val ys = (5 to 1 by -1).map(c =>
      math.rint(math.log(1 << (c - 1)) * 1e6).toLong)
    val n = 5L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    assert(out.getAs[Long]("n_terms") == 5L)
    assert(out.getAs[Double]("slope") == math.rint(slope * 1e6) / 1e6)
    assert(out.getAs[Double]("r2") > 0.9) // geometric decay fits well
  }

  test("zipfFit: k caps the fitted terms and tiny groups drop") {
    val docs = Seq(
      ("big", (1 to 10).flatMap(i => Seq.fill(11 - i)(s"t$i")).mkString(" ")),
      ("tiny", "solo solo solo")).toDF("source", "text")
    val out = TextAnalysis.zipfFit(docs, "text", Seq("source"), 3)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_terms")).toMap
    assert(out == Map("big" -> 3L)) // tiny has 1 distinct term — no fit
  }

  test("heapsFit: every-token-new grows at beta 1; a saturated vocabulary fits flat") {
    // "fresh": doc i contributes exactly one never-seen token, so at
    // every checkpoint c the vocabulary V = c and token mass N = c —
    // x = y at every point: beta 1, ln_k 0, r2 1.
    // "flat": every doc repeats the same token — V = 1 forever,
    // y = 0 at every checkpoint: beta 0, and varY = 0 leaves r2 null.
    val docs = ((0L until 8L).map(i => ("fresh", i, s"tok$i")) ++
      (0L until 8L).map(i => ("flat", i + 100L, "same")))
      .toDF("source", "doc_id", "text")
    val out = TextAnalysis.heapsFit(docs, "text", "doc_id", "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_points"), r.getAs[Double]("beta"),
          r.getAs[Double]("ln_k"), Option(r.get(r.fieldIndex("r2")))))).toMap
    assert(out("fresh") == ((3L, 1.0, 0.0, Some(1.0)))) // checkpoints 2,4,8
    assert(out("flat") == ((3L, 0.0, 0.0, None)))
  }

  test("llrCollocations scores a planted phrase above an incidental pair") {
    // "data pipeline" always adjacent (8x); filler tokens vary
    val docs = (0 until 8).map(i =>
      (i.toLong, s"data pipeline filler$i extra${i % 2} data cloud$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.llrCollocations(docs, "text", minCount = 4)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("n12"), r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Double]("llr")))).toMap
    val (n12, n1, n2, llr) = out(("data", "pipeline"))
    assert(n12 == 8L)
    // replay the exact contract: N = total bigrams = 8 docs * 5
    val N = 40L
    def xlx(x: Long) = if (x > 0) x.toDouble * math.log(x.toDouble) else 0.0
    val (k11, k12, k21, k22) = (n12, n1 - n12, n2 - n12, N - n1 - n2 + n12)
    val g2 = 2.0 * ((xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22))
      - (xlx(n1) + xlx(N - n1) + xlx(n2) + xlx(N - n2)) + xlx(N))
    assert(llr == math.rint(g2 * 1e6) / 1e6)
  }

  test("readabilityReport applies the defined proxies and micro-mean") {
    // doc: 6 words, 2 sentences, syllables = vowel groups
    val text = "the cat sat down. it was happy!"
    val w = 7L
    val snt = 2L
    val out = TextAnalysis.readabilityReport(
        Seq(("s", text)).toDF("source", "text"), "text", Seq("source"))
      .collect().head
    // independent replay of the contract
    val vg = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
    val sc = 206.835 - 1.015 * (w.toDouble / snt) - 84.6 * (vg.toDouble / w)
    val micro = math.rint(sc * 1e6).toLong
    assert(out.getAs[Long]("n_docs") == 1L)
    assert(out.getAs[Double]("flesch_avg") ==
      math.rint(micro.toDouble / 1e6 * 1e6) / 1e6)
  }

  test("goodTuringReport counts frequency-of-frequencies and the unseen mass") {
    // tokens: a a a b b c d  -> N=7, V=4, N1=2 (c,d), N2=1 (b)
    val docs = Seq(("s", "a a a b"), ("s", "b c d")).toDF("source", "text")
    val out = TextAnalysis.goodTuringReport(docs, "text", Seq("source"))
      .collect().head
    assert(out.getAs[Long]("n_tokens") == 7L)
    assert(out.getAs[Long]("v") == 4L)
    assert(out.getAs[Long]("n1") == 2L && out.getAs[Long]("n2") == 1L)
    assert(out.getAs[Double]("p_unseen") == math.rint(2.0 / 7 * 1e6) / 1e6)
    assert(out.getAs[Double]("r1_star") == 1.0) // 2*1/2
  }

  test("goodTuringReport: no hapaxes leaves r1_star null") {
    val docs = Seq(("s", "x x y y")).toDF("source", "text")
    val out = TextAnalysis.goodTuringReport(docs, "text", Seq("source"))
      .collect().head
    assert(out.getAs[Long]("n1") == 0L)
    assert(out.isNullAt(out.fieldIndex("r1_star")))
    assert(out.getAs[Double]("p_unseen") == 0.0)
  }

  test("labelMi: a perfectly label-predictive token scores the label entropy; a label-blind one scores 0") {
    // 4 docs, 2 labels balanced; "marker" only in label A docs,
    // "common" in every doc
    val docs = Seq(
      (0L, "A", "common marker u1"), (1L, "A", "common marker u2"),
      (2L, "B", "common u3"), (3L, "B", "common u4"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.labelMi(docs, "text", "doc_id", "source", k = 2)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("n_doc"), r.getAs[Double]("mi")))).toMap
    // top-2 by df: common (4), marker (2)
    assert(out("common") == ((4L, 0.0)))
    val (nM, miM) = out("marker")
    assert(nM == 2L)
    // I(T;L) for a perfect predictor of a balanced binary label = ln 2
    // on the micro contract: cells (1,A): 1/2 ln 2, (0,B): 1/2 ln 2
    val micro = math.rint(0.5 * math.log(2.0) * 1e6).toLong
    assert(miM == math.rint(2 * micro.toDouble / 1e6 * 1e6) / 1e6)
    assert(math.abs(miM - math.log(2.0)) < 1e-5)
  }

  test("pmiPairs: independent tokens score 0, always-together tokens score ln(N/n)") {
    // 4 docs: x and y in every doc (independent at p=1 -> PMI 0);
    // p and q co-occur in 2 docs and never apart -> PMI ln(4*2/(2*2)) = ln 2
    val docs = Seq(
      (0L, "x y p q"), (1L, "x y p q"), (2L, "x y filler1"),
      (3L, "x y filler2")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(docs, "text", "doc_id",
        k = 10, minCount = 2)
      .collect().map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))
        -> ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
             r.getAs[Long]("n_ab"), r.getAs[Double]("pmi")))).toMap
    val xy = out.collectFirst {
      case (k @ ("x", "y"), v) => v; case (k @ ("y", "x"), v) => v }.get
    assert(xy == ((4L, 4L, 4L, 0.0)))
    val pq = out.collectFirst {
      case (("p", "q"), v) => v; case (("q", "p"), v) => v }.get
    assert(pq._3 == 2L)
    assert(pq._4 == math.rint(math.log(2.0) * 1e6) / 1e6)
  }

  test("pmiPairs: minCount prunes rare pairs and k caps the vocabulary") {
    val docs = Seq((0L, "a b c"), (1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // k=2 keeps only the two most frequent tokens (a: 4 docs, b: 3) —
    // c never pairs; minCount=3 then keeps only (a,b) with n_ab=3
    val out = TextAnalysis.pmiPairs(docs, "text", "doc_id",
        k = 2, minCount = 3)
      .collect().map(r => Set(r.getAs[String]("tok_a"),
        r.getAs[String]("tok_b")) -> r.getAs[Long]("n_ab"))
    assert(out.toSeq == Seq(Set("a", "b") -> 3L))
  }

  test("heapsFit matches the micro-log OLS replayed by hand") {
    // one source, 4 single-token docs with vocabulary growth 1,2,2,3:
    // same token at ranks 2 and 3, checkpoints at n=2 (V=2) and n=4 (V=3)
    val docs = Seq(("s", 0L, "a"), ("s", 1L, "b"), ("s", 2L, "b"),
      ("s", 3L, "c")).toDF("source", "doc_id", "text")
    val out = TextAnalysis.heapsFit(docs, "text", "doc_id", "source")
      .collect().head
    def micro(v: Long) = math.rint(math.log(v.toDouble) * 1e6).toLong
    val xs = Seq(micro(2), micro(4))
    val ys = Seq(micro(2), micro(3))
    val n = 2L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    assert(out.getAs[Long]("n_points") == 2L)
    assert(out.getAs[Double]("beta") == math.rint(beta * 1e6) / 1e6)
    assert(out.getAs[Double]("ln_k") ==
      math.rint((sy.toDouble - beta * sx) / n / 1e6 * 1e6) / 1e6)
    assert(out.getAs[Double]("r2") == 1.0) // two points: perfect line
  }

  test("repetitionReport: hand-computed line and gram masses") {
    // doc 0: 4 lines, "dup" appears twice (3 chars each);
    // tokens: "a b a b c" -> 2-grams: "a b"(2), "b a"(1), "b c"(1)
    val docs = Seq(
      (0L, "s", "dup\nuniq line\ndup\nother"),
      (1L, "s", "a b a b c")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.repetitionReport(docs, "text", Seq("source"))
      .collect().head
    // doc0 lines: dup(2x,3ch), "uniq line"(1x,9ch), other(1x,5ch)
    //   n_lines 4, dup_lines 2, line_chars 2*3+9+5=20, dup_chars 6
    // doc1 lines: 1 line, 9 chars, no dups
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Double]("dup_line_frac") ==
      math.rint(2.0 / 5 * 1e6) / 1e6)
    assert(r.getAs[Double]("dup_line_char_frac") ==
      math.rint(6.0 / 29 * 1e6) / 1e6)
    // 2-gram masses: doc0 grams of "dup uniq line dup other" all
    // unique: "dup uniq"(8), "uniq line"(9), "line dup"(8),
    // "dup other"(9) -> top 9, mass 34
    // doc1: "a b"(2x3=6), "b a"(3), "b c"(3) -> top 6, mass 12
    assert(r.getAs[Double]("top2gram_mass_frac") ==
      math.rint((9.0 + 6.0) / (34 + 12) * 1e6) / 1e6)
    // 5-gram: doc0 has 1 window (23 ch), doc1 one window "a b a b c"
    // (9 ch) - no dups anywhere
    assert(r.getAs[Double]("dup5gram_mass_frac") == 0.0)
  }

  test("md5_shingles / gram_digest_counts kernels are bit-identical to " +
       "the composable explode(shingles)→portableDigest replay " +
       "(multibyte, short docs, empty text, repeated grams)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "", "  leading and   irregular\tspace",
      "ünïcödé çhärs κόσμε 世界 mixed in the stream",
      "a a a a a a a", // degenerate: every 1-gram identical
      "MiXeD CaSe ToKeNs MiXeD CaSe")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def digest(c: org.apache.spark.sql.Column) =
      graft.ops.SnapshotDiff.portableDigest(Seq(c))
    for (k <- Seq(1, 2, 3, 5)) {
      val expected = df.select(col("doc_id"),
          sort_array(array_distinct(transform(
            TextDedup.shingles(col("text"), k), g => digest(g)))).as("hs"))
        .orderBy(col("doc_id")).as[(Long, Seq[Long])].collect().toSeq
      val got = df.select(col("doc_id"),
          TextFunctions.md5_shingles(col("text"), k).as("hs"))
        .orderBy(col("doc_id")).as[(Long, Seq[Long])].collect().toSeq
      assert(got == expected, s"md5_shingles divergence at k=$k")
    }
    // gram_digest_counts: per (doc, n) the digest multiset equals the
    // composable explode form's — counts sum to total grams, distinct
    // digests match, and every (h, c) pair agrees
    val maxN = 3
    val expectedCounts = (1 to maxN).map { n =>
      df.select(col("doc_id"), lit(n).as("n"),
          explode(TextDedup.shingles(col("text"), n)).as("g"))
        .select(col("doc_id"), col("n"), digest(col("g")).as("h"))
        .groupBy("doc_id", "n", "h").agg(count(lit(1)).as("c"))
    }.reduce(_ unionByName _)
      .as[(Long, Int, Long, Long)].collect().toSet
    val gotCounts = df.select(col("doc_id"),
        explode(TextFunctions.gram_digest_counts(col("text"), maxN))
          .as("gc"))
      .select(col("doc_id"), col("gc.n"), col("gc.h"), col("gc.c"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(gotCounts == expectedCounts)
  }
}
