package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  // two tight planted clusters around (1,0) and (0,1), plus the
  // exact centroid members themselves
  private def planted = Seq(
    (0L, Array(1.00f, 0.00f)),
    (1L, Array(0.99f, 0.01f)),
    (2L, Array(0.98f, 0.02f)),
    (3L, Array(0.00f, 1.00f)),
    (4L, Array(0.01f, 0.99f)),
    (5L, Array(0.02f, 0.98f))
  ).toDF("vec_id", "embedding")

  test("seedByMd5 is deterministic and returns k micro-quantized rows") {
    val s1 = ClusterEval.seedByMd5(planted, "vec_id", "embedding", 2)
    val s2 = ClusterEval.seedByMd5(planted, "vec_id", "embedding", 2)
    assert(s1.length == 2 && s1.forall(_.length == 2))
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    // micro scale: components are round(x * 1e6)
    assert(s1.flatten.forall(v => math.abs(v) <= 1000000L))
  }

  test("clusterQuality: hand-computed values on explicit centroids") {
    // centroids exactly at the cluster anchors (micro units)
    val cents = Array(Array(1000000L, 0L), Array(0L, 1000000L))
    val out = ClusterEval.clusterQuality(planted, "vec_id", "embedding",
      cents).collect()
    assert(out.length == 2)
    val c0 = out.find(_.getAs[Int]("cluster") == 0).get
    val c1 = out.find(_.getAs[Int]("cluster") == 1).get
    assert(c0.getAs[Long]("n") == 3 && c1.getAs[Long]("n") == 3)
    // member (0.99, 0.01): a = (10000² + 10000²) = 2e8 micro²,
    // inertia for cluster 0 = 0 + 2e8 + 8e8 = 1e9 micro² = 1e-3 units²
    assert(c0.getAs[Double]("inertia") == 0.001)
    // tight planted clusters: near-perfect separation
    assert(c0.getAs[Double]("mean_silhouette") > 0.95)
    assert(c1.getAs[Double]("mean_silhouette") > 0.95)
    // db_worst = (s_0 + s_1)/d(c0,c1); s = mean root distance
    // s_0 = (0 + sqrt(2e8) + sqrt(8e8))/3 micro; d = sqrt(2)·1e6
    val s0 = (0.0 + math.round(math.sqrt(2e8)) +
      math.round(math.sqrt(8e8))) / 3
    val d01 = math.sqrt(2.0) * 1e6
    val expDb = BigDecimal((s0 + s0) / d01)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(c0.getAs[Double]("db_worst") - expDb) < 1e-9)
  }

  test("clusterQuality: exact-centroid member has silhouette 1, " +
    "tie-point assigns to the smaller centroid index") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      // exactly equidistant from both centroids
      (2L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val cents = Array(Array(1000000L, 0L), Array(0L, 1000000L))
    val out = ClusterEval.clusterQuality(df, "vec_id", "embedding", cents)
      .collect()
    val c0 = out.find(_.getAs[Int]("cluster") == 0).get
    // tie point lands in cluster 0 (first-min position)
    assert(c0.getAs[Long]("n") == 2)
    // the equidistant point has b = a -> silhouette term 0; the
    // exact-centroid point has a = 0, b > 0 -> term 1
    assert(c0.getAs[Double]("mean_silhouette") == 0.5)
  }

  test("lloydGain: refined objective never below seed, rows well-formed") {
    val rnd = new scala.util.Random(7)
    val blob = (0L until 60L).map { i =>
      val c = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f)
              else Array(0.0f, 1.0f, 0.0f)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val out = ClusterEval.lloydGain(blob, "embedding", nlist = 2, iters = 2)
      .collect()
    assert(out.length == 2)
    val seed = out.find(_.getAs[String]("stage") == "seed").get
    val refined = out.find(_.getAs[String]("stage") == "refined").get
    assert(seed.getAs[Long]("n") == 60 && refined.getAs[Long]("n") == 60)
    assert(refined.getAs[Double]("mean_cos") >=
      seed.getAs[Double]("mean_cos") - 1e-9)
  }
}
