package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage-side half of large-scale
  * similarity search: a 100 TB float corpus shrinks 4× under int8
  * scalar quantization, and most ANN stacks (IVF-SQ, HNSW-SQ) scan
  * quantized codes first and rescore the shortlist in float.
  *
  * Everything here is per-row column arithmetic (codegen'd builtins,
  * no shuffle, no state): quantize is one scan at any corpus size.
  */
object Quantization {

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Per-vector int8 scalar quantization: codes_i =
    * round((x_i - lo) / scale) with lo = min(vec), scale = (hi-lo)/255,
    * plus the reconstruction MSE of dequantize(codes) against the
    * original — the quality metric that decides whether SQ is usable
    * for a given embedding family.
    *
    * Determinism contract (oracle t20): all arithmetic in IEEE double
    * with a fixed operation order — rounding via floor(x + 0.5), MSE
    * via an ordered left-fold — so any engine replaying the same
    * formula reproduces the bits. Constant vectors (hi == lo) map to
    * code 0 everywhere with MSE 0.
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol), v.as("v"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("scale", (array_max(col("v")) - col("lo")) / lit(255.0))
      .withColumn("codes",
        when(col("scale") === 0.0, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => floor((x - col("lo")) / col("scale") + lit(0.5)).cast("int"))))
      .withColumn("sq_err",
        zip_with(col("v"), col("codes"),
          (x, q) => pow(x - (col("lo") + q.cast("double") * col("scale")), lit(2))))
      .select(col(idCol),
        round(col("lo"), 6).as("lo"),
        round(col("scale"), 6).as("scale_q"),
        array_join(col("codes"), ",").as("codes_csv"),
        // 9dp: int8 reconstruction errors are ~(scale/2)² ≈ 1e-6 per
        // element, so a 6dp round would collapse every MSE to 0.0
        round(aggregate(col("sq_err"), lit(0.0), (acc, e) => acc + e)
          / size(col("v")), 9).as("mse"))
  }
}
