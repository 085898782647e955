package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def quantize(vecs: (Long, Seq[Float])*) =
    Quantization.int8Quantize(
        vecs.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .as[(Long, Double, Double, String, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("known ramp quantizes to exact endpoint codes") {
    val got = quantize((1L, Seq(0f, 1f, 2f)))(1L)
    // lo=0, scale=2/255: codes floor(x·127.5 + 0.5) = 0, 128, 255
    assert(got._4 == "0,128,255")
    assert(got._2 == 0.0) // lo
    assert(got._5 >= 0.0 && got._5 < 1e-4) // tiny reconstruction error
  }

  test("constant vector: scale 0, all-zero codes, zero MSE") {
    val got = quantize((1L, Seq(3.5f, 3.5f, 3.5f)))(1L)
    assert(got._3 == 0.0 && got._4 == "0,0,0" && got._5 == 0.0)
  }

  test("codes stay in [0, 255] and MSE is bounded by (scale/2)²") {
    val vec = (0 until 64).map(i => math.sin(i * 0.7).toFloat)
    val got = quantize((7L, vec))(7L)
    val codes = got._4.split(",").map(_.toInt)
    assert(codes.forall(c => c >= 0 && c <= 255))
    val scale = got._3
    // per-element squared error ≤ (scale/2)² (nearest-code rounding),
    // so the mean must be too
    assert(got._5 <= scale * scale / 4 + 1e-12)
  }

  test("negative-valued vectors shift correctly through lo") {
    val got = quantize((1L, Seq(-2f, -1f, 0f)))(1L)
    assert(got._2 == -2.0 && got._4 == "0,128,255")
  }
}
