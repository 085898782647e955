package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("spread/mortonKey: known bit patterns interleave correctly") {
    val df = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
                 (1L, 0L), (0L, 1L), (3L, 1L))
      .toDF("x", "y")
      .select(Layout.mortonKey($"x", $"y").as("z"))
    val got = df.as[Long].collect().toSeq
    // x on even bits, y on odd: (0,0)→0; (65535,0)→0x55555555;
    // (0,65535)→0xAAAAAAAA; both→0xFFFFFFFF; (1,0)→1; (0,1)→2;
    // (3,1)→ x bits 0,2 + y bit 1 = 1+4+2 = 7
    assert(got == Seq(0L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL, 1L, 2L, 7L))
  }

  test("normalize16: endpoints and clamping") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
      .select(Layout.normalize16($"v", lit(0.0), lit(100.0)).as("r"))
    // 0→0, 50→floor(0.5*65536)=32768, 100→clamped 65535
    assert(df.as[Long].collect().toSeq == Seq(0L, 32768L, 65535L))
    // degenerate range maps to 0
    val deg = Seq(5.0).toDF("v")
      .select(Layout.normalize16($"v", lit(5.0), lit(5.0)).as("r"))
    assert(deg.as[Long].head() == 0L)
  }

  test("zorderAudit: on a uniform grid, zorder bounds both dims at " +
       "~1/4 while linear leaves y at ~1") {
    // 64x64 grid of (x, y) — every combination, so spans are exact
    val grid = spark.range(64 * 64)
      .select(($"id" % 64).cast("double").as("x"),
              ($"id" / 64).cast("double").as("y"))
    val out = Layout.zorderAudit(grid, "x", "y", buckets = 16)
      .select($"layout", $"n_buckets", $"avg_x_frac", $"avg_y_frac")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, zn, zx, zy) = out("zorder")
    val (_, ln, lx, ly) = out("linear_x")
    assert(zn == 16L && ln == 16L)
    // zorder: each bucket covers a quarter-band of each dim
    assert(zx < 0.3 && zy < 0.3, s"zorder fracs $zx/$zy")
    // linear: x tightly bounded, y unbounded
    assert(lx < 0.1 && ly > 0.9, s"linear fracs $lx/$ly")
  }

  test("zorderAudit rejects non-power-of-4 bucket counts") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Layout.zorderAudit(df, "x", "y", buckets = 8)
    }
  }
}
