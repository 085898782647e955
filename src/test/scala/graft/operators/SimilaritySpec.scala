package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim native expression: exact values on known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f), -1.0),
      (Array(3.0f, 4.0f), Array(6.0f, 8.0f), 1.0)
    ).toDF("a", "b", "expected")
    val out = df.select(cosine_sim($"a", $"b").as("c"), $"expected")
      .as[(Double, Double)].collect()
    out.foreach { case (c, e) => assert(math.abs(c - e) < 1e-12) }
  }

  test("dot_product on double arrays") {
    val d = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(dot_product($"a", $"b")).as[Double].head()
    assert(d == 32.0)
  }

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),   // near 2
    (4L, Array(-1.0f, 0.0f, 0.0f)),  // anti of 0
    (5L, Array(1.0f, 0.0f, 0.0f))    // exact dup of 0
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by exact cosine, excludes self") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
      .select("rank", "id").as[(Int, Long)].collect().toMap
    assert(out(1) == 5L) // identical vector first
    assert(out(2) == 1L) // then the near one
    assert(!out.values.toSet.contains(0L)) // self excluded
  }

  test("decontaminateByEmbedding flags max-cosine reach, flag from rounded score") {
    val eval = Seq((100L, Array(1.0f, 0.0f, 0.0f)),
                   (101L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.decontaminateByEmbedding(
        corpus, "vec_id", "embedding", eval, "embedding", threshold = 0.9)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 6)
    assert(out(0L) == ((1.0, true)))     // identical to eval 100
    assert(out(5L) == ((1.0, true)))     // identical to eval 100
    assert(out(1L)._1 > 0.9 && out(1L)._2)  // near eval 100
    assert(out(4L) == ((-0.0, false)) || out(4L) == ((0.0, false))) // anti of 100, orthogonal to 101
    assert(!out(2L)._2)                  // orthogonal to both
    // max semantics: vec 3 is closest to NEITHER eval axis strongly
    assert(out(3L)._1 < 0.9 && !out(3L)._2)
  }

  test("marginMine: hub suppression beats raw cosine; identical pair accepted") {
    // hub h sits close to BOTH sources; t is close only to src a, with
    // a LOWER raw cosine to a than h has. Margin normalization must
    // still pick t for a: h's inflated NNk mean deflates its margin.
    val srcs = Seq((0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val h = Array(0.70710678f, 0.70710678f, 0f)
    val t = Array(0.65f, 0f, 0.75993421f)
    val tgts = Seq((1L, h), (3L, t)).toDF("vec_id", "embedding")
    // explicit brute force: the exact-scoring audit baseline (the
    // pre-flip default — this test pins those semantics unchanged)
    val out = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2,
        topK = Similarity.bruteForceTopK)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._2 == 3L)            // t despite cos(a,t) < cos(a,h)
    assert(out(0L)._4 > 1.0 && out(0L)._5)
    assert(out(2L)._2 == 1L)            // b's only close target is the hub

    // identical vectors: margin >= 1, accepted
    val s2 = Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val t2 = Seq((1L, Array(1f, 0f, 0f)), (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val m2 = Similarity.marginMine(s2, "vec_id", "embedding",
        t2, "vec_id", "embedding", k = 2,
        topK = Similarity.bruteForceTopK)
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(m2._2 == 1L && m2._3 == 1.0 && m2._5)
  }

  test("marginMine: pluggable provider drives the candidate pass; " +
       "the DEFAULT is the gated LSH production path") {
    val srcs = Seq((0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val tgts = Seq((1L, Array(0.9f, 0.1f, 0f)), (3L, Array(0.1f, 0.9f, 0f)),
                   (5L, Array(0.7f, 0.7f, 0f))).toDF("vec_id", "embedding")
    // explicitly passing bruteForceTopK reproduces the PRE-FLIP
    // default output exactly: the expected argmax pairs below are the
    // values this fixture pinned when brute force WAS the default
    val explicit = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2,
        topK = Similarity.bruteForceTopK)
      .as[(Long, Long, Double, Double, Boolean)].collect().toSet
    assert(explicit.map(r => r._1 -> r._2) == Set(0L -> 1L, 2L -> 3L))
    // a provider that returns exhaustive candidate lists (LSH at 1 bit
    // × 8 tables on a tiny corpus ⇒ recall 1) reproduces brute-force
    // mining exactly — the ANN-path parity contract t76 gates at scale
    val lsh = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2,
        topK = Similarity.lshProvider(bits = 1, tables = 8))
      .as[(Long, Long, Double, Double, Boolean)].collect().toSet
    assert(lsh == explicit)
    // the DEFAULT is lshProvider(bits=10, tables=4) — the t85-gated
    // production setting — not brute force: identical output to
    // passing that provider explicitly
    val default = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double, Double, Boolean)].collect().toSet
    val prodExplicit = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2,
        topK = Similarity.lshProvider(bits = 10, tables = 4))
      .as[(Long, Long, Double, Double, Boolean)].collect().toSet
    assert(default == prodExplicit)
    // a provider that WITHHOLDS target 1 proves candidates come from
    // the provider, not from any internal scoring: src 0 must pair
    // with 5 (its best remaining target)
    val restricted: Similarity.TopKProvider =
      (corpus, idCol, vecCol, queries, qidCol, qvecCol, k) =>
        Similarity.bruteForceTopK(
          corpus.filter(col(idCol) =!= 1L), idCol, vecCol,
          queries, qidCol, qvecCol, k)
    val out = Similarity.marginMine(srcs, "vec_id", "embedding",
        tgts, "vec_id", "embedding", k = 2, topK = restricted)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(!out.values.toSet.contains(1L))
    assert(out(0L) == 5L)
  }

  test("decontaminateByEmbedding rejects zero-norm and null-element eval vectors") {
    val zero = Seq((100L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.decontaminateByEmbedding(
        corpus, "vec_id", "embedding", zero, "embedding", threshold = 0.9)
    }
    assert(e.getMessage.contains("zero norm"))
    val withNullElem = Seq((100L, Array[java.lang.Float](1.0f, null, 0.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.decontaminateByEmbedding(
        corpus, "vec_id", "embedding", withNullElem, "embedding",
        threshold = 0.9)
    }
    assert(e2.getMessage.contains("NULL element"))
  }

  test("decontaminateByEmbedding fails fast on an eval set above maxEval") {
    val eval = Seq((100L, Array(1.0f, 0.0f, 0.0f)),
                   (101L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.decontaminateByEmbedding(
        corpus, "vec_id", "embedding", eval, "embedding",
        threshold = 0.9, maxEval = 1)
    }
    assert(e.getMessage.contains("maxEval"))
  }

  test("lshTopK finds identical and near vectors (same-bucket guarantee for dups)") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.lshTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, bits = 4, tables = 8)
      .select("rank", "id").as[(Int, Long)].collect().toMap
    assert(out(1) == 5L) // identical vector always shares every bucket
  }

  test("ivfTopK: identical vector always found (same cell as its query)") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, nlist = 3, nprobe = 2)
      .select("rank", "id").as[(Int, Long)].collect().toMap
    assert(out(1) == 5L) // the duplicate of vector 0 ranks first
    assert(!out.values.toSet.contains(0L))
  }

  test("Lloyd refinement pulls centroids onto direction clusters") {
    // three tight direction clusters; seeds are hash-sampled so at
    // least one cluster may start without its own centroid — after two
    // refinement passes each cluster's members share a cell
    val rnd = new scala.util.Random(7)
    def around(base: Array[Float]) = base.map(v => v + rnd.nextFloat() * 0.05f)
    val bases = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val rows = for {
      (b, c) <- bases.zipWithIndex; i <- 0 until 20
    } yield (c.toLong * 100 + i, around(b))
    val df = rows.toDF("vec_id", "embedding")
    val seeds = Similarity.refineCentroids(
      df.select($"embedding".as("vec")),
      bases.map(_.map(_.toDouble).toSeq).toArray, iters = 0)
    val refined = Similarity.refineCentroids(
      df.select($"embedding".as("vec")),
      // deliberately bad seeds: all three near cluster 0
      Array(Seq(1.0, 0.0, 0.0), Seq(0.9, 0.1, 0.0), Seq(0.9, 0.0, 0.1)),
      iters = 3)
    // after refinement, the three centroids point at distinct clusters:
    // each base direction has some centroid with cosine > 0.95
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    bases.foreach { b =>
      val bd = b.map(_.toDouble).toSeq
      assert(refined.exists(c => cos(c, bd) > 0.95),
        s"no refined centroid near ${bd}: ${refined.toSeq}")
    }
    assert(seeds.length == 3) // iters = 0 is identity
  }

  test("ivfTopK with refinement still retrieves the identical vector") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, nlist = 3, nprobe = 2, refineIters = 2)
      .select("rank", "id").as[(Int, Long)].collect().toMap
    assert(out(1) == 5L)
  }

  test("cosineNearDups verifies candidates with exact cosine") {
    val out = Similarity.cosineNearDups(corpus, "vec_id", "embedding",
        threshold = 0.99, bits = 4, tables = 8)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((0L, 5L)))
    assert(out.find(r => (r._1, r._2) == ((0L, 5L))).get._3 == 1.0)
    assert(!pairs.contains((0L, 4L))) // anti-parallel never passes
  }

  test("cosineNearDups output is a subset of the brute-force exact pair set (t26 contract)") {
    val n = 60
    val vecs = (0L until n).map { i =>
      // 6 direction clusters with per-member jitter + exact dups every 10th
      val base = (i % 6).toInt
      val arr = Array.tabulate(4)(d =>
        (if (d == base % 4) 1.0f else 0.1f * ((base + d) % 3)) +
          (if (i >= 10 && i % 10 == 0) 0f else 0.01f * (i % 7)))
      (i, arr)
    }.toDF("vec_id", "embedding")
    val lsh = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.8, bits = 4, tables = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // brute-force exact: rep-collapse identical vectors, all rep pairs >= 0.8
    val ids = vecs.select($"vec_id".as("id"), $"embedding".as("vec"))
    val reps = ids.groupBy($"vec").agg(min($"id").as("id"))
    val members = ids.join(reps.select($"vec", $"id".as("rep_id")), "vec")
      .filter($"id" =!= $"rep_id")
      .select($"rep_id".as("id_a"), $"id".as("id_b"))
    val a = reps.select($"id".as("id_a"), $"vec".as("vec_a"))
    val b = reps.select($"id".as("id_b"), $"vec".as("vec_b"))
    val exact = a.join(b, $"id_a" < $"id_b")
      .filter(cosine_sim($"vec_a", $"vec_b") >= 0.8)
      .select($"id_a", $"id_b")
      .unionByName(members)
      .as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(lsh.subsetOf(exact),
      s"LSH emitted pairs outside the exact set: ${lsh -- exact}")
  }

  test("topKPerQuery matches the windowed rank formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    // many queries × whole corpus — the shapes the window form ranked
    val queries = corpus.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
    // reference: the classic window top-k over the same scored rows
    val scored = corpus.select($"vec_id".as("id"), $"embedding".as("vec"))
      .join(broadcast(queries))
      .filter($"id" =!= $"qid")
      .withColumn("cosine", cosine_sim($"vec", $"qvec"))
    val w = Window.partitionBy($"qid").orderBy(desc("cosine"), $"id")
    val ref = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"id", round($"cosine", 6).as("cosine"))
    val got = out.orderBy("qid", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val want = ref.orderBy("qid", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("topKPerQuery NaN handling matches the window form (zero-norm vector ranks first)") {
    import org.apache.spark.sql.expressions.Window
    // cosine with a zero-norm vector is NaN; Spark's descending sort
    // ranks NaN above every double, so the window form put it at rank 1
    // — the heap must agree
    val withZero = corpus.unionByName(
      Seq((6L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val queries = withZero.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Similarity.bruteForceTopK(withZero, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
      .orderBy("rank").select("rank", "id").as[(Int, Long)].collect().toSeq
    val scored = withZero.select($"vec_id".as("id"), $"embedding".as("vec"))
      .join(broadcast(queries)).filter($"id" =!= $"qid")
      .withColumn("cosine", cosine_sim($"vec", $"qvec"))
    val w = Window.partitionBy($"qid").orderBy(desc("cosine"), $"id")
    val want = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3).orderBy("rank")
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    assert(got == want)
    assert(got.head._2 == 6L) // the NaN row leads, as it always did
  }

  test("top-k plan is a partial aggregate, not a per-qid window exchange") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val plan = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topkbyscore"),
      s"expected the TopKByScore partial aggregate in:\n$plan")
    assert(!plan.contains("Window"),
      s"expected no window operator in:\n$plan")
  }

  test("top_k_by_score: bounded, best-first, smallest-id tiebreak, k > group size") {
    import graft.functions.TopKFunctions.top_k_by_score
    val df = Seq(
      ("a", 0.9, 7L), ("a", 0.9, 3L), ("a", 0.5, 1L), ("a", 0.99, 9L),
      ("b", 0.1, 2L)
    ).toDF("g", "s", "i")
    val out = df.groupBy($"g")
      .agg(top_k_by_score($"s", $"i", 3).as("t"))
      .select($"g", $"t".cast("array<struct<score:double,id:long>>"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") == Seq((0.99, 9L), (0.9, 3L), (0.9, 7L))) // ties: id asc
    assert(out("b") == Seq((0.1, 2L)))                        // k > size
  }

  test("hyperplane signature is deterministic and seed-sensitive") {
    val sigs = corpus.select($"vec_id",
        hyperplane_sig($"embedding", 16, 42L).as("s1"),
        hyperplane_sig($"embedding", 16, 42L).as("s2"),
        hyperplane_sig($"embedding", 16, 43L).as("s3"))
      .as[(Long, Long, Long, Long)].collect()
    sigs.foreach { case (_, s1, s2, _) => assert(s1 == s2) }
    assert(sigs.exists { case (_, s1, _, s3) => s1 != s3 })
    // identical vectors → identical signatures
    val m = sigs.map(s => s._1 -> s._2).toMap
    assert(m(0L) == m(5L))
  }

  test("semDedup: exact dups always collapse, near groups keep min id") {
    // clusters: {0, 1(near), 5(exact dup of 0)}, {2, 3(near)}, {4 alone}
    val removed = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nlist = 3, refineIters = 1)
      .select("removed_id", "keeper_id").as[(Long, Long)].collect().toMap
    // 5 is an exact dup of 0 — same cell by construction, cosine 1, so
    // it is removed whatever the clustering, kept by min neighbor 0
    assert(removed.contains(5L) && removed(5L) == 0L)
    // greedy election: keeper id always strictly below removed id
    for ((r, k) <- removed) assert(k < r)
    // no same-cell survivor pair above threshold: on this corpus, the
    // survivors of every cell are mutually dissimilar
    assert(!removed.contains(4L)) // 4 is nobody's near-dup
    // deterministic: a second run produces the identical mapping
    val again = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nlist = 3, refineIters = 1)
      .select("removed_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(removed == again)
  }

  test("argmax_cells (column matrix) matches argmax_cell (reference matrix) semantics") {
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(1.0, 0.0, 0.0))
    val df = corpus.select($"vec_id",
      argmax_cell($"embedding", cents).as("fixed"),
      argmax_cells($"embedding",
        typedLit(cents.map(_.toArray).toArray)).as("dynamic"))
    val rows = df.as[(Long, Int, Int)].collect()
    rows.foreach { case (id, f, d) => assert(f == d, s"mismatch for $id") }
    // ties take the LARGER index (centroids 0 and 2 are identical):
    // vector 0 = (1,0,0) is equidistant to cells 0 and 2 → cell 2
    assert(rows.find(_._1 == 0L).get._3 == 2)
  }

  test("semCells two-level invariants: identical vectors share a cell; cells bounded") {
    // a corpus big enough that coarse (√nlist) and fine levels both
    // engage: 40 direction clusters + planted exact dups
    val rows = (0 until 400).map { i =>
      val g = i % 40
      val a = 0.15 * g
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        ((i / 40) * 0.001f)))
    } ++ Seq((400L, Array(math.cos(0.0).toFloat, math.sin(0.0).toFloat, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    // nlist above MaxDriverNlist so the TWO-LEVEL path engages
    val nlist = Similarity.MaxDriverNlist + 36
    val cells = Similarity.semCells(df, "vec_id", "embedding",
        nlist, refineIters = 1)
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    assert(cells.size == 401)
    // 400 is an exact dup of 0 (assignment is a pure function of vec)
    assert(cells(400L) == cells(0L))
    // determinism
    val again = Similarity.semCells(df, "vec_id", "embedding",
        nlist, refineIters = 1)
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    assert(cells == again)
    // the quantizer actually splits the corpus into multiple cells on
    // both levels: more distinct cells than coarse slots (√100 = 10)
    assert(cells.values.toSet.size > 10,
      s"expected fine-level splitting, got cells ${cells.values.toSet}")
    // a null vector is kept with a null cell (same as the single-level
    // path), not silently dropped at the centroid joins
    val withNull = rows.toDF("vec_id", "embedding")
      .unionByName(Seq((999L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val nulled = Similarity.semCells(withNull, "vec_id", "embedding",
        nlist, refineIters = 1)
      .select($"id", $"cell").collect()
    assert(nulled.length == 402)
    assert(nulled.find(_.getLong(0) == 999L).exists(_.isNullAt(1)))
  }

  test("ArgmaxCellExpr equals is structural (CSE-compatible)") {
    import graft.functions.ArgmaxCellExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    val c1 = ArgmaxCellExpr(Literal(1), Vector(Vector(1.0, 0.0)))
    val c2 = ArgmaxCellExpr(Literal(1), Vector(Vector(1.0, 0.0)))
    assert(c1 == c2, "structurally identical instances must be equal")
  }

  test("semDedup: one cell makes greedy removal exhaustive") {
    // nlist=1 puts every vector in one cell: removal must equal the
    // brute-force greedy rule (removed iff SOME smaller id has cosine
    // >= threshold; keeper = the smallest such id)
    val removed = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nlist = 1, refineIters = 0)
      .select("removed_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(removed == Map(1L -> 0L, 3L -> 2L, 5L -> 0L))
  }

  test("cosineProfile bins pairs and reports exact micro moments") {
    import org.apache.spark.sql.functions.col
    // pair 1: identical vectors (cos 1 -> clamps into bin 9);
    // pair 2: orthogonal (cos 0 -> bin 0);
    // pair 3: opposite (cos -1 -> clamps into bin -10)
    val pairs = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("va", "vb")
    val out = Similarity.cosineProfile(pairs, "va", "vb")
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("share"),
          r.getAs[Double]("mean_cos"), r.getAs[Double]("std_cos")))).toMap
    assert(out.keySet == Set(9L, 0L, -10L))
    val (n9, s9, mean, std) = out(9L)
    assert(n9 == 1L && s9 == 0.333333)
    assert(mean == 0.0)           // (1 + 0 - 1) / 3
    // std = sqrt(2/3) of the micro contract
    assert(math.abs(std - math.sqrt(2.0 / 3)) < 1e-5)
  }

  test("poolChunkEmbeddings: mean-pools in chunk-id order, deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, 10L, Array(1.0f, 2.0f)), (1L, 11L, Array(3.0f, 6.0f)),
      (2L, 20L, Array(5.0f, 5.0f)))
    val out = Similarity.poolChunkEmbeddings(
      rows.toDF("doc", "cid", "emb"), "doc", "cid", "emb", dim = 2)
      .orderBy("doc").collect()
    assert(out(0).getAs[Long]("n_chunks") == 2)
    assert(out(0).getSeq[Double](out(0).fieldIndex("embedding")) ==
      Seq(2.0, 4.0))
    assert(out(1).getSeq[Double](out(1).fieldIndex("embedding")) ==
      Seq(5.0, 5.0))
    // shuffled input order yields the identical vector (id-order fold)
    val shuffled = Similarity.poolChunkEmbeddings(
      rows.reverse.toDF("doc", "cid", "emb").repartition(4),
      "doc", "cid", "emb", dim = 2).orderBy("doc").collect()
    assert(shuffled(0).getSeq[Double](shuffled(0).fieldIndex("embedding"))
      == Seq(2.0, 4.0))
  }

  test("labelSeparation: clustered labels separate, shuffled labels do not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // label 0 vectors near (1,0), label 1 near (0,1)
    val rows = (1 to 20).map { i =>
      val eps = (i % 5) * 0.01f
      if (i % 2 == 0) (0L, i.toLong, Array(1.0f - eps, eps))
      else (1L, i.toLong, Array(eps, 1.0f - eps))
    }
    val out = Similarity.labelSeparation(
      rows.toDF("label", "vec_id", "emb"), "label", "emb", dim = 2)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("intra_dot") > 0.9)
      assert(r.getAs[Double]("inter_dot") < 0.1)
      assert(r.getAs[Double]("separation") > 0.8)
    }
    // identical distribution across labels: separation ~ 0
    val flat = (1 to 20).map(i => ((i % 2).toLong, i.toLong,
      Array(0.5f, 0.5f)))
    val o2 = Similarity.labelSeparation(
      flat.toDF("label", "vec_id", "emb"), "label", "emb", dim = 2)
      .collect()
    o2.foreach(r => assert(math.abs(r.getAs[Double]("separation")) < 1e-6))
  }

  test("labelSeparation matches the brute-force pairwise means") {
    import spark.implicits._
    val vecs = Map(
      0L -> Seq(Array(0.3f, 0.4f), Array(0.1f, 0.9f), Array(0.5f, 0.2f)),
      1L -> Seq(Array(0.8f, 0.1f), Array(0.7f, 0.3f)))
    val rows = vecs.toSeq.flatMap { case (l, vs) =>
      vs.zipWithIndex.map { case (v, i) => (l, l * 10 + i.toLong, v) } }
    def q(v: Array[Float]): Seq[Long] =
      v.map(x => math.rint(x.toDouble * 1e6).toLong).toSeq
    def dot(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum / 1e12
    val out = Similarity.labelSeparation(
      rows.toDF("label", "vec_id", "emb"), "label", "emb", dim = 2)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    for ((l, vs) <- vecs) {
      val qs = vs.map(q)
      val others = vecs.filter(_._1 != l).values.flatten.map(q).toSeq
      val intra = (for (i <- qs.indices; j <- qs.indices if i != j)
        yield dot(qs(i), qs(j))).sum / (qs.size * (qs.size - 1))
      val inter = (for (a <- qs; b <- others) yield dot(a, b)).sum /
        (qs.size * others.size)
      assert(out(l).getAs[Double]("intra_dot") ==
        math.rint(intra * 1e6) / 1e6)
      assert(out(l).getAs[Double]("inter_dot") ==
        math.rint(inter * 1e6) / 1e6)
    }
  }
}
