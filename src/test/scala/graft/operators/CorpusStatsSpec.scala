package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana"),
    (2L, "apple"),
    (3L, "cherry cherry cherry")).toDF("doc_id", "text")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tf-idf matches hand computation; rarity outranks frequency") {
    val got = CorpusStats.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
      .as[(Long, Int, String, Double)].collect().toSet
    val ln3 = math.log(3.0)
    val ln15 = math.log(1.5) // apple: df=2, N=3
    assert(got == Set(
      (1L, 1, "banana", r6(ln3)),   // tf=1 × ln(3/1) beats...
      (1L, 2, "apple", r6(ln15)),   // ...tf=1 × ln(3/2)
      (2L, 1, "apple", r6(ln15)),
      (3L, 1, "cherry", r6(3 * ln3))))
  }

  test("top-k cuts at k and breaks rounded-score ties by term") {
    val tied = Seq((1L, "beta alpha gamma delta")).toDF("doc_id", "text")
    val got = CorpusStats.tfIdfTopTerms(tied, "doc_id", "text", k = 3)
      .orderBy($"rnk").as[(Long, Int, String, Double)].collect().toSeq
    // all four terms score identically (tf=1, df=1, N=1 → ln(1)=0):
    // ranking must be alphabetical and stop at k=3
    assert(got.map(_._3) == Seq("alpha", "beta", "delta"))
    assert(got.forall(_._4 == 0.0))
  }

  test("case folding and multi-space tokenization") {
    val messy = Seq((1L, "Apple  APPLE apple"), (2L, "pear")).toDF("doc_id", "text")
    val got = CorpusStats.tfIdfTopTerms(messy, "doc_id", "text", k = 1)
      .as[(Long, Int, String, Double)].collect()
      .map { case (d, _, t, s) => (d, (t, s)) }.toMap
    assert(got(1L)._1 == "apple")
    assert(got(1L)._2 == r6(3 * math.log(2.0)))
  }

  test("bigramLmScore: hand-computed smoothed NLL on a tiny corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // corpus: c(a b)=3, c(b a)=1; contexts c(a·)=3, c(b·)=1; V={a,b}=2
    val pAB = (3 + 0.5) / (3 + 0.5 * 2)   // P(b|a) = 0.875
    val pBA = (1 + 0.5) / (1 + 0.5 * 2)   // P(a|b) = 0.75
    assert(got(1L) == ((1L, 3L,
      r6(-(2 * math.log(pAB) + math.log(pBA)) / 3))))
    assert(got(2L) == ((2L, 1L, r6(-math.log(pAB)))))
    assert(!got.contains(3L))             // < 2 tokens: no bigrams, no row
  }

  test("vocabulary: counts, doc frequency, deterministic cut, coverage curve") {
    // cherry 3 occurrences / 1 doc, apple 2 / 2, banana 1 / 1; total 6
    val got = CorpusStats.vocabulary(docs, "doc_id", "text", topK = 2)
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 2) // topK cut
    assert(got(0) == ((1, "cherry", 3L, 1L, r6(3.0 / 6))))
    assert(got(1) == ((2, "apple", 2L, 2L, r6(5.0 / 6))))
    // ties break on token asc: equal counts order alphabetically
    val tied = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    val t2 = CorpusStats.vocabulary(tied, "doc_id", "text", topK = 2)
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(t2.map(_._2).toSeq == Seq("a", "b"))
    // coverage of the full vocabulary reaches exactly 1
    assert(t2.last._5 == 1.0)
  }

  test("perplexityBands: thresholds split fluent from rare, keep drops the tail") {
    // 9 identical fluent docs + 1 rare-bigram doc: the rare doc scores
    // strictly worse (bigramLmScore spec) so it must be the tail and
    // the only keep=false row
    val docs = ((1 to 9).map(i => (i.toLong, "x y")) :+ (10L, "x z"))
      .toDF("doc_id", "text")
    val got = CorpusStats.perplexityBands(docs, "doc_id", "text")
      .select($"doc_id", $"band", $"keep")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == (("tail", false)))
    (1L to 9L).foreach(i => assert(got(i)._1 != "tail" && got(i)._2))
    // cut validation fails loudly
    intercept[IllegalArgumentException] {
      CorpusStats.perplexityBands(docs, "doc_id", "text",
        cuts = (0.8, 0.2))
    }
  }

  test("crossEntropySelect: hand-computed Moore–Lewis difference") {
    // in-domain model (docs 1,2): c(x y)=2, c(x·)=2, V={x,y}=2
    // general model: c(x y)=2, c(p q)=2, c(p·)=2, V=4
    val c = Seq((1L, "x y"), (2L, "x y"), (3L, "p q"), (4L, "p q"))
      .toDF("doc_id", "text")
    val got = CorpusStats.crossEntropySelect(c, "doc_id", "text",
        inDomain = $"doc_id" <= 2)
      .as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val in1  = r6(-math.log((2 + 0.5) / (2 + 0.5 * 2))) // P_in(y|x)
    val gen1 = r6(-math.log((2 + 0.5) / (2 + 0.5 * 4)))
    val in3  = r6(-math.log(0.5 / (0.5 * 2)))           // unseen: k/(kV)
    val gen3 = r6(-math.log((2 + 0.5) / (2 + 0.5 * 4)))
    // the English-looking doc is kept (ced < 0), the out-domain doc
    // scores WORSE under the in-domain model and is dropped
    assert(got(1L) == ((1L, 1L, in1, gen1, r6(in1 - gen1), true)))
    assert(got(2L) == ((2L, 1L, in1, gen1, r6(in1 - gen1), true)))
    assert(got(3L) == ((3L, 1L, in3, gen3, r6(in3 - gen3), false)))
    assert(got(4L) == got(3L).copy(_1 = 4L))
    assert(r6(in1 - gen1) < 0 && r6(in3 - gen3) > 0)
  }

  test("crossEntropySelect: NULL in-domain verdict counts as out-of-domain") {
    val c = Seq((1L, "x y", "en"), (2L, "x y", null), (3L, "x z", "en"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusStats.crossEntropySelect(c, "doc_id", "text",
        inDomain = $"lang" === "en")
      .as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 2 (NULL lang) must NOT have trained the in-domain model:
    // its text equals doc 1's, so its scores match doc 1's exactly,
    // and P_in(y|x) reflects ONE in-domain 'x y' — which differs from
    // P_gen(y|x) (two of three) — i.e. ced(1) ≠ 0 proves the slice
    // really excluded doc 2
    assert(got(2L)._3 == got(1L)._3 && got(2L)._4 == got(1L)._4)
    assert(got(1L)._5 != 0.0)
    assert(got.size == 3)
  }

  test("crossEntropySelect: empty in-domain slice fails loudly, not keep-all") {
    // V_in = 0 would make every in-domain probability Inf and ced =
    // -Inf corpus-wide (keep = true everywhere) — must throw instead
    val c = Seq((1L, "x y"), (2L, "p q")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      CorpusStats.crossEntropySelect(c, "doc_id", "text",
        inDomain = $"doc_id" < 0).collect()
    }
    assert(e.getMessage.contains("inDomain matches no document"))
  }

  test("calibrateScores reproduces percent_rank semantics across partitions") {
    // 240 rows, 3 groups, heavy ties (scores mod 17) — the range
    // repartition splits each group across several partitions and the
    // offset join must still reproduce the global within-group rank
    val rows = (0 until 240).map(i =>
      (s"s${i % 3}", i.toLong, (i * 31 % 17).toDouble))
    val df = rows.toDF("source", "doc_id", "score")
    val got = CorpusStats.calibrateScores(df, Seq("source"), "score")
      .select("source", "doc_id", "pct")
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = rows.groupBy(_._1).flatMap { case (_, grp) =>
      val n = grp.size
      grp.map { case (s, id, v) =>
        val rank = 1 + grp.count(_._3 < v)      // ties share first rank
        (s, id) -> r6((rank - 1).toDouble / (n - 1))
      }
    }
    assert(got.size == expect.size)
    expect.foreach { case (k, v) =>
      assert(got(k) == v, s"row $k: got ${got(k)} expect $v") }
  }

  test("calibrateScores: single-row group calibrates to 0; NULL scores drop") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None),
                 ("b", 3L, Some(9.0)), ("b", 4L, Some(1.0)))
      .toDF("source", "doc_id", "score")
    val got = CorpusStats.calibrateScores(df, Seq("source"), "score")
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.0, 3L -> 1.0, 4L -> 0.0))
  }

  test("calibratedKeep: one global threshold keeps the same fraction of " +
       "groups with disjoint raw-score ranges") {
    // group a scores 1..100, group b scores 1000..1099 — any RAW
    // threshold keeps all-of-one/none-of-the-other; the calibrated
    // threshold keeps exactly the top 30% of each
    val rows = (1 to 100).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("b", 100L + i, 999.0 + i))
    val kept = CorpusStats.calibratedKeep(
      rows.toDF("source", "doc_id", "score"), Seq("source"), "score", 0.7)
    val audit = CorpusStats.calibratedKeepAudit(kept, Seq("source"), "score")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // pct = (rank-1)/99 >= 0.7 -> rank >= 70.3 -> ranks 71..100 = 30 rows
    Seq("a", "b").foreach { s =>
      assert(audit(s).getAs[Long]("n_docs") == 100)
      assert(audit(s).getAs[Long]("n_kept") == 30, s"group $s")
      assert(audit(s).getAs[Double]("keep_frac") == 0.3)
    }
    assert(audit("a").getAs[Double]("min_kept_score") == 71.0)
    assert(audit("b").getAs[Double]("min_kept_score") == 1070.0)
  }

  test("jsdDistinctiveness matches a brute-force reference and hits the " +
       "closed-form bounds") {
    val docsA = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta gamma"))
    val docsB = Seq((3L, "delta epsilon delta"), (4L, "epsilon zeta"))
    val df = (docsA.map { case (i, t) => ("A", i, t) } ++
      docsB.map { case (i, t) => ("B", i, t) }).toDF("source", "doc_id", "text")
    // brute-force reference over the full (group x corpus-vocab) grid
    val grpToks = Map("A" -> docsA.flatMap(_._2.split("\\s+")),
                      "B" -> docsB.flatMap(_._2.split("\\s+")))
    val corpus = grpToks.values.flatten.toSeq
    val vocab = corpus.distinct
    def dist(ts: Seq[String]) =
      vocab.map(t => ts.count(_ == t).toDouble / ts.size)
    val qd = dist(corpus)
    def jsdRef(g: String): Double = {
      val pd = dist(grpToks(g))
      pd.zip(qd).map { case (p, q) =>
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2
    }
    val got = CorpusStats.jsdDistinctiveness(df, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    Seq("A", "B").foreach { g =>
      val jsd = got(g).getAs[Double]("jsd")
      assert(math.abs(jsd - jsdRef(g)) < 1e-6, s"$g: $jsd vs ${jsdRef(g)}")
      assert(jsd >= 0 && jsd <= 0.6931471805599453 + 1e-9)
      assert(got(g).getAs[Double]("jsd_norm") >= 0 &&
        got(g).getAs[Double]("jsd_norm") <= 1.0)
    }
    // disjoint vocabularies -> far from 0 (measured 0.172143: the
    // corpus mixes A at weight 7/12, so group-vs-corpus JSD is well
    // below the two-sample ln 2 ceiling); a group that IS the whole
    // corpus is 0 (next test)
    assert(got("A").getAs[Double]("jsd") > 0.15)
  }

  test("jsdDistinctiveness: a single group equals the corpus -> jsd 0") {
    val df = Seq(("only", 1L, "x y z x"), ("only", 2L, "y z"))
      .toDF("source", "doc_id", "text")
    val r = CorpusStats.jsdDistinctiveness(df, "source", "text")
      .collect().head
    assert(r.getAs[Double]("jsd") == 0.0)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_vocab") == 3)
  }

  test("quantileNormalize: grid-aligned single group is the identity") {
    // 101 distinct values, grid 100: pct lands exactly on grid points
    // and the global quantile at pct k/100 is the value of rank k
    val df = (0 to 100).map(i => ("g", i.toLong, (i * 3).toDouble))
      .toDF("source", "doc_id", "score")
    val out = CorpusStats.quantileNormalize(df, Seq("source"), "score")
      .select("doc_id", "score", "normalized")
      .as[(Long, Double, Double)].collect()
    out.foreach { case (id, s, n) => assert(n == s, s"doc $id: $n != $s") }
  }

  test("quantileNormalize equalizes shifted group marginals") {
    // group A uniform on [0,100), group B on [1000,1100): after
    // normalization both marginals are the corpus marginal, so the
    // sorted normalized sequences of equal-sized groups coincide
    val rows = (0 until 200).map(i => ("A", i.toLong, (i % 100).toDouble)) ++
      (0 until 200).map(i => ("B", 1000L + i, 1000.0 + i % 100))
    val out = CorpusStats.quantileNormalize(rows.toDF("source", "doc_id", "score"),
        Seq("source"), "score")
      .select("source", "normalized").as[(String, Double)].collect()
    val a = out.filter(_._1 == "A").map(_._2).sorted
    val b = out.filter(_._1 == "B").map(_._2).sorted
    assert(a.length == 200 && b.length == 200)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"$x vs $y") }
    // and the normalized values live on the pooled scale, spanning
    // both original ranges
    assert(a.head < 100 && a.last > 1000)
  }

  test("bigramLmScore: rarer continuations score strictly worse") {
    // 'x y' appears 9×, 'x z' once — P(z|x) < P(y|x), so the doc made
    // of the rare bigram must carry the higher (worse) NLL
    val docs = ((1 to 9).map(i => (i.toLong, "x y")) :+ (10L, "x z")).toDF("doc_id", "text")
    val got = CorpusStats.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(10L) > got(1L))
    assert(got(1L) == got(9L))            // identical docs score identically
  }

  test("chapmanEstimate: full overlap estimates the union; disjoint blows up") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => ("g", i, true, true))
    val out = CorpusStats.chapmanEstimate(
      rows.toDF("g", "id", "a", "b"), Seq("g"), col("a"), col("b"))
      .collect().head
    // na=nb=m=50: (51*51/51)-1 = 50 -- captures everything, N-hat = N
    assert(out.getAs[Double]("n_hat") == 50.0)
    val dis = (1L to 20L).map(i => ("g", i, i <= 10, i > 10))
    val o2 = CorpusStats.chapmanEstimate(
      dis.toDF("g", "id", "a", "b"), Seq("g"), col("a"), col("b"))
      .collect().head
    // m=0: (11*11/1)-1 = 120 >> 20 -- disjoint crawls imply a large world
    assert(o2.getAs[Double]("n_hat") == 120.0)
  }

  test("chapmanEstimate matches the closed form on a partial overlap") {
    val rows = (1L to 100L).map(i => ("g", i, i <= 60, i > 40))
    val out = CorpusStats.chapmanEstimate(
      rows.toDF("g", "id", "a", "b"), Seq("g"), col("a"), col("b"))
      .collect().head
    // na=60, nb=60, m=20: 61*61/21 - 1
    assert(out.getAs[Long]("n_overlap") == 20)
    assert(out.getAs[Double]("n_hat") ==
      math.rint((61.0 * 61 / 21 - 1) * 1e6) / 1e6)
  }

  test("chao1Richness: no singletons means no unseen mass; singleton-heavy inflates") {
    import spark.implicits._
    // every bigram repeated: f1 = 0 -> chao1 = D
    val rep = Seq(("g", 1L, "a b a b"), ("g", 2L, "a b a b"))
    val out = CorpusStats.chao1Richness(rep.toDF("g", "id", "text")
      .withColumnRenamed("text", "txt"), "txt", Seq("g"), 2)
      .collect().head
    assert(out.getAs[Long]("f1") == 0)
    assert(out.getAs[Double]("chao1") ==
      out.getAs[Long]("d_observed").toDouble)
    // all singletons: chao1 = D + D(D-1)/2
    val uniq = Seq(("g", 1L, "p q r s t u"))
    val o2 = CorpusStats.chao1Richness(uniq.toDF("g", "id", "txt"),
      "txt", Seq("g"), 2).collect().head
    val d = o2.getAs[Long]("d_observed")
    assert(o2.getAs[Long]("f1") == d)
    assert(o2.getAs[Double]("chao1") == d + d.toDouble * (d - 1) / 2.0)
  }

  test("sourceOverlapMatrix: hand-checked Jaccard/overlap on 1-gram " +
       "vocabularies; disjoint pairs emit nothing; a subset source " +
       "reads overlap_coef 1 at moderate Jaccard") {
    // vocabularies (n = 1 grams): A {a b c d}, B {c d e f},
    // C {c d} (subset of both), D {x y} (disjoint from all)
    val docs = Seq(
      ("A", 1L, "a b c d"), ("B", 2L, "c d e f"),
      ("C", 3L, "c d"), ("D", 4L, "x y"))
      .toDF("source", "doc_id", "text")
    val out = CorpusStats.sourceOverlapMatrix(docs, "text", "source", n = 1)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> r).toMap
    // A∩B = {c,d}: jaccard 2/6, overlap 2/4
    assert(out(("A", "B")).getAs[Long]("n_shared") == 2)
    assert(out(("A", "B")).getAs[Double]("jaccard") == 0.333333)
    assert(out(("A", "B")).getAs[Double]("overlap_coef") == 0.5)
    // C ⊂ A: overlap_coef exactly 1, jaccard 2/4
    assert(out(("A", "C")).getAs[Double]("overlap_coef") == 1.0)
    assert(out(("A", "C")).getAs[Double]("jaccard") == 0.5)
    // D shares nothing: no row at all
    assert(!out.keySet.exists(p => p._1 == "D" || p._2 == "D"))
    // pairs are ordered and unique
    assert(out.keySet.forall(p => p._1 < p._2))
  }

  test("tokenizerFertility: exact counts on a hand fixture; " +
       "zero-word groups yield NULL ratios") {
    // "ab, cd9" -> bpeish tokens: [ab][,][cd][9] = 4; words = 2; chars = 7
    val docs = Seq(("en", 1L, "ab, cd9"), ("en", 2L, "xyz"),
      ("zz", 3L, ""))
      .toDF("lang", "doc_id", "text")
    val out = CorpusStats.tokenizerFertility(docs, "text", Seq("lang"))
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") == 2)
    assert(en.getAs[Long]("n_words") == 3)      // ab, + cd9 + xyz
    assert(en.getAs[Long]("n_bpe_tokens") == 5) // [ab][,][cd][9] + [xyz]
    assert(en.getAs[Long]("n_chars") == 10)
    assert(en.getAs[Double]("fertility") == round6(5.0 / 3))
    assert(en.getAs[Double]("chars_per_token") == 2.0)
    val zz = out("zz")
    assert(zz.getAs[Long]("n_words") == 0)
    assert(zz.isNullAt(zz.fieldIndex("fertility")))
  }

  test("datacard: hand-checked per-source profile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "en", "alpha beta gamma delta words here"),
      (2L, "a", "fr", "alpha beta gamma delta words here"), // exact dup
      (3L, "a", "en", "a completely different document body"),
      (4L, "b", "de", "one more unrelated text entirely here"),
      (5L, "b", "de", null.asInstanceOf[String]) // dropped
    ).toDF("doc_id", "source", "lang", "text")
    val card = graft.operators.CorpusStats
      .datacard(docs, "text", "doc_id", "source", "lang")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = card("a")
    assert(a.getAs[Long]("n_docs") == 3)
    assert(a.getAs[Long]("total_chars") ==
      2 * 33 + "a completely different document body".length)
    assert(a.getAs[Long]("total_tokens") == 6 + 6 + 5)
    assert(a.getAs[Double]("pct_en") == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a.getAs[Double]("exact_dup_frac") == BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = card("b")
    assert(b.getAs[Long]("n_docs") == 1) // null text dropped
    assert(b.getAs[Double]("exact_dup_frac") == 0.0)
    // winnow density present and in (0, 1]
    assert(card.values.forall { r =>
      val d = r.getAs[Double]("winnow_density"); d > 0 && d <= 1 })
  }

  private def round6(v: Double): Double = math.rint(v * 1e6) / 1e6

  test("corpusDiff: added/removed/changed/unchanged per source") {
    val v1 = Seq(
      (1L, "alpha", "a"), (2L, "beta", "a"), (3L, "gamma", "b"),
      (4L, "delta", "b")).toDF("doc_id", "text", "source")
    val v2 = Seq(
      (1L, "alpha", "a"),          // unchanged
      (2L, "beta EDITED", "a"),    // changed
      // 3 removed
      (4L, "delta", "b"),          // unchanged
      (5L, "epsilon", "b")         // added
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.CorpusStats.corpusDiff(v1, v2,
        "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
         r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"))).toMap
    assert(out("a") == ((0L, 0L, 1L, 1L)))
    assert(out("b") == ((1L, 1L, 0L, 1L)))
  }
}
