package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of 2 dims each; each subspace has
  // exactly 2 distinct subvectors → ksub=2 makes encoding exact
  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Array(1.0f, 0.0f, 2.0f, 0.0f)),
    (2L, Array(0.0f, 3.0f, 0.0f, 1.0f)),
    (3L, Array(0.0f, 3.0f, 2.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("trainCodebook: full codebook makes every distinct subvector a codeword") {
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    assert(cb.length == 2)
    // only 2 distinct subvectors per subspace exist → smaller codebook
    assert(cb.forall(_.length == 2))
    assert(cb.forall(_.forall(_.length == 2)))
    val sub0 = cb(0).map(_.toSeq).toSet
    assert(sub0 == Set(Seq(1.0, 0.0), Seq(0.0, 3.0)))
  }

  test("encode/decode roundtrip is exact with a full codebook") {
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val bad = Pq.encode(corpus, "vec_id", "embedding", cb)
      .join(corpus, Seq("vec_id"))
      .withColumn("recon", Pq.decode(col("codes"), cb))
      .filter(col("recon") =!= col("embedding").cast("array<double>"))
      .count()
    assert(bad == 0L)
  }

  test("ADC cosine is bit-equal to exact cosine under exact reconstruction") {
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val q = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val mismatches = Pq.encode(corpus, "vec_id", "embedding", cb)
      .join(corpus, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .withColumn("adc", pq_adc(col("codes"), col("qvec"), cb.map(_.map(_.toSeq).toSeq).toSeq))
      .withColumn("exact", cosine_sim(col("embedding"), col("qvec")))
      .filter(col("adc") =!= col("exact"))
      .count()
    assert(mismatches == 0L)
  }

  test("pqTopK with a full codebook matches bruteForceTopK exactly") {
    val q = corpus.filter($"vec_id" <= 1)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val pq = Pq.pqTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
        k = 3, codebook = Some(cb))
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 3)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(pq == exact)
  }

  test("pqTopK rerank path matches exact top-k on a full codebook") {
    val q = corpus.filter($"vec_id" <= 1)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val pq = Pq.pqTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
        k = 2, rerank = 2, codebook = Some(cb))
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 2)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(pq == exact)
  }

  test("ivfPqTopK: nprobe = nlist + full codebook degenerates to brute force") {
    val q = corpus.filter($"vec_id" <= 1)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val got = Pq.ivfPqTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
        k = 3, nlist = 2, nprobe = 2, codebook = Some(cb))
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 3)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(got == exact)
    // rerank path too
    val rr = Pq.ivfPqTopK(corpus, "vec_id", "embedding", q, "qid", "qvec",
        k = 2, nlist = 2, nprobe = 2, rerank = 2, codebook = Some(cb))
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val exact2 = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 2)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(rr == exact2)
  }

  test("ivfPqTopK prunes the scan: nprobe < nlist reads only probed cells") {
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val audit = Pq.ivfPqScanAudit(corpus, "vec_id", "embedding",
        q, "qid", "qvec", nlist = 2, nprobe = 1)
      .as[(String, Double)].collect().toMap
    assert(audit("full_scan_rows") == 4.0)      // 4 corpus rows × 1 query
    assert(audit("scanned_rows") < 4.0)         // the probe prunes
    assert(audit("scanned_rows") > 0.0)
    assert(audit("scan_fraction") ==
      math.rint(audit("scanned_rows") / 4.0 * 1e6) / 1e6)
    // the pruned serving path still returns k rows per query — the
    // probed cell must contain the query's own neighborhood
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val served = Pq.ivfPqTopK(corpus, "vec_id", "embedding", q, "qid",
        "qvec", k = 1, nlist = 2, nprobe = 1, codebook = Some(cb))
      .select("qid", "id").as[(Long, Long)].collect()
    assert(served.nonEmpty)
    assert(Pq.ivfPqScanAudit(corpus, "vec_id", "embedding",
        q, "qid", "qvec", nlist = 2, nprobe = 2)
      .as[(String, Double)].collect().toMap.apply("scan_fraction") == 1.0)
  }

  test("ivfPqIndex append: batch-built rows equal full-corpus build (pure assignment)") {
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 4)
    val cents = Pq.ivfPqTrainCentroids(corpus, "embedding", nlist = 2)
    val full = Pq.ivfPqIndex(corpus, "vec_id", "embedding", cents, cb)
      .as[(Long, Int, Seq[Short])].collect().toSet
    val appended = Pq.ivfPqIndex(corpus.filter($"vec_id" < 2), "vec_id",
        "embedding", cents, cb)
      .unionByName(Pq.ivfPqIndex(corpus.filter($"vec_id" >= 2), "vec_id",
        "embedding", cents, cb))
      .as[(Long, Int, Seq[Short])].collect().toSet
    assert(appended == full)
    // serving from the appended index equals serving from the full one
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def serve(idx: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqServe(idx, corpus, "vec_id", "embedding", q, "qid", "qvec",
          k = 2, nprobe = 2, rerank = 2, cents, cb)
        .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(serve(Pq.ivfPqIndex(corpus, "vec_id", "embedding", cents, cb)) ==
      serve(Pq.ivfPqIndex(corpus.filter($"vec_id" < 2), "vec_id",
          "embedding", cents, cb)
        .unionByName(Pq.ivfPqIndex(corpus.filter($"vec_id" >= 2), "vec_id",
          "embedding", cents, cb))))
  }

  test("Lloyd refinement recenters codewords to member means") {
    // one subspace (m=1), 4 points on a line; ksub=2 seeds then one
    // Lloyd pass must land centroids on the two cluster means
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.2f, 0.0f)),
      (2L, Array(10.0f, 0.0f)), (3L, Array(10.2f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cb = Pq.trainCodebook(pts, "embedding", m = 1, ksub = 2, iters = 3)
    val words = cb(0).map(_(0)).sorted.toSeq
    // float32 inputs: 0.2f as double is 0.2000000029…, so the mean
    // lands within float precision of 0.1, not double precision
    assert(math.abs(words(0) - 0.1) < 1e-6)
    assert(math.abs(words(1) - 10.1) < 1e-6)
  }

  test("trainCodebook rejects a dim not divisible by m") {
    intercept[IllegalArgumentException] {
      Pq.trainCodebook(corpus, "embedding", m = 3, ksub = 2)
    }
  }

  test("compression shape: codes are one short per subspace") {
    val cb = Pq.trainCodebook(corpus, "embedding", m = 2, ksub = 2)
    val row = Pq.encode(corpus, "vec_id", "embedding", cb)
      .select("codes").as[Seq[Short]].head()
    assert(row.length == 2)
  }

  test("centroids/codebook round-trip their DataFrame form exactly") {
    val cents: Array[Seq[Double]] =
      Array(Seq(0.125, -3.5, 7.0), Seq(1e-300, 2.0, -0.0))
    val back = Pq.centroidsFromDf(Pq.centroidsToDf(spark, cents))
    assert(back.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(0.1, 0.2), Array(-1.5, 2.5)),
      Array(Array(3.25, -0.75), Array(1e-10, 42.0)))
    val cbBack = Pq.codebookFromDf(Pq.codebookToDf(spark, cb))
    assert(cbBack.map(_.map(_.toSeq).toSeq).toSeq ==
           cb.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("FromDf rejects sparse/incomplete tables") {
    import org.apache.spark.sql.functions.col
    val full = Pq.centroidsToDf(spark,
      Array[Seq[Double]](Seq(1.0, 2.0), Seq(3.0, 4.0)))
    intercept[IllegalArgumentException] {
      Pq.centroidsFromDf(full.filter(col("d_idx") =!= 0 || col("cell") =!= 1))
    }
    val cbFull = Pq.codebookToDf(spark,
      Array(Array(Array(1.0, 2.0), Array(3.0, 4.0))))
    intercept[IllegalArgumentException] {
      Pq.codebookFromDf(cbFull.limit(3))
    }
  }

  test("FromDf rejects duplicate+missing slot combinations (same row " +
       "count, corrupt content)") {
    import org.apache.spark.sql.functions.{col, lit}
    val full = Pq.centroidsToDf(spark,
      Array[Seq[Double]](Seq(1.0, 2.0), Seq(3.0, 4.0)))
    // drop (1,1), duplicate (0,0): row count still 4
    val corrupt = full.filter(col("cell") =!= 1 || col("d_idx") =!= 1)
      .unionByName(full.filter(col("cell") === 0 && col("d_idx") === 0)
        .withColumn("v", lit(9.9)))
    intercept[IllegalArgumentException] { Pq.centroidsFromDf(corrupt) }
  }

  test("FromDf detects TRAILING loss via shape metadata (max-index " +
       "inference cannot)") {
    import org.apache.spark.sql.functions.col
    val cents = Pq.centroidsToDf(spark,
      Array[Seq[Double]](Seq(1.0, 2.0), Seq(3.0, 4.0)))
    // drop every row of the LAST cell: row count + max(cell)+1 would
    // self-consistently describe a smaller index
    intercept[IllegalArgumentException] {
      Pq.centroidsFromDf(cents.filter(col("cell") =!= 1))
    }
    val cb = Pq.codebookToDf(spark, Array(
      Array(Array(1.0, 2.0)), Array(Array(3.0, 4.0))))
    intercept[IllegalArgumentException] {
      Pq.codebookFromDf(cb.filter(col("m_idx") =!= 1))
    }
  }

  test("RAGGED codebooks (trainCodebook's small-subspace contract) " +
       "round-trip exactly") {
    val ragged: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)), // subspace 0: 2 codewords
      Array(Array(0.0, 0.0)))                  // subspace 1: 1 (padding dims)
    val back = Pq.codebookFromDf(Pq.codebookToDf(spark, ragged))
    assert(back.map(_.map(_.toSeq).toSeq).toSeq ==
           ragged.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
