package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 200L).map(i =>
    (s"src${i % 4}", i, 10L + (i % 50))).toDF("src", "id", "w")

  test("weightedSample: exactly k per group, deterministic across runs") {
    val a = Sampling.weightedSample(corpus, Seq("src"), "id", "w", 5, "s1")
    val b = Sampling.weightedSample(corpus, Seq("src"), "id", "w", 5, "s1")
    val rows = a.collect()
    assert(rows.groupBy(_.getString(0)).forall(_._2.length == 5))
    assert(rows.map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
  }

  test("weightedSample: selection = the k smallest -ln(u)/w keys (window replay)") {
    val keyed = corpus
      .withColumn("e", -log(Sampling.md5Uniform(Seq(col("id")), "s1")) / col("w"))
    val expect = keyed.collect()
      .groupBy(_.getString(0))
      .toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy(r => (r.getAs[Double]("e"), r.getLong(1))).take(5).toSeq
      }
      .map(_.getLong(1)).toSet
    val got = Sampling.weightedSample(corpus, Seq("src"), "id", "w", 5, "s1")
      .select("id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("weightedSample: higher weight wins selection share") {
    // two ids with extreme weights, many groups: the heavy id must be
    // selected in (nearly) every group, the feather in (nearly) none
    val df = (1 to 200).flatMap { g =>
      Seq((s"g$g", 1L, 100000L), (s"g$g", 2L, 1L)) ++
        (3L to 12L).map(i => (s"g$g", i, 100L))
    }.toDF("src", "id", "w")
    val picks = Sampling.weightedSample(df, Seq("src"), "id", "w", 3, "s2")
      .select("id").as[Long].collect()
    val heavy = picks.count(_ == 1L)
    val feather = picks.count(_ == 2L)
    assert(heavy > 190, s"heavy id picked only $heavy/200")
    assert(feather < 10, s"feather id picked $feather/200")
  }

  test("weightedSample drops non-positive weights") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, -5L), ("g", 3L, 7L))
      .toDF("src", "id", "w")
    val got = Sampling.weightedSample(df, Seq("src"), "id", "w", 3, "s")
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("bottomKSample: k smallest draws over DISTINCT keys") {
    val df = (1L to 100L).flatMap(i => Seq(("a", i), ("a", i)))
      .toDF("g", "k")
    val got = Sampling.bottomKSample(df, Seq("g"), "k", 10, "s3")
    assert(got.count() == 10)
    val expect = (1L to 100L).map { i =>
      val u = Seq(("x", i)).toDF("g", "k")
        .select(Sampling.md5Uniform(Seq(col("k")), "s3")).head().getDouble(0)
      (u, i)
    }.sortBy(identity).take(10).map(_._2).toSet
    assert(got.select("k").as[Long].collect().toSet == expect)
  }

  test("bottomKSample merges: sample(shard union) == merge of shard samples") {
    val df = (1L to 400L).map(i => ("a", i)).toDF("g", "k")
    val full = Sampling.bottomKSample(df, Seq("g"), "k", 12, "s4")
    val s1 = Sampling.bottomKSample(df.filter(col("k") <= 200), Seq("g"), "k", 12, "s4")
    val s2 = Sampling.bottomKSample(df.filter(col("k") > 200), Seq("g"), "k", 12, "s4")
    val merged = Sampling.bottomKSample(s1.unionByName(s2), Seq("g"), "k", 12, "s4")
    assert(merged.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
  }

  // ---- neymanAllocation -------------------------------------------

  test("neymanAllocation: equal strata split the budget equally") {
    import org.apache.spark.sql.functions._
    val rows = Seq("a", "b").flatMap(g => (1L to 20L).map((g, _)))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), Seq("g"),
      col("v"), budget = 100L).collect()
    assert(out.forall(_.getAs[Long]("n_alloc") == 50L))
  }

  test("neymanAllocation: the variable stratum earns more than proportional") {
    import org.apache.spark.sql.functions._
    // same N: sigma(a) tiny, sigma(b) large -> b gets most of the budget
    val rows = (1 to 50).map(i => ("a", 100L + (i % 2))) ++
      (1 to 50).map(i => ("b", (i * 37L) % 1000))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), Seq("g"),
      col("v"), budget = 100L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_alloc")).toMap
    assert(out("b") > 90 && out("a") < 10)
    // allocation follows the closed form n_h = round(B * w_h / sum w)
    val out2 = Sampling.neymanAllocation(rows.toDF("g", "v"), Seq("g"),
      col("v"), budget = 100L).collect()
    val ws = out2.map(_.getAs[Long]("weight_micro"))
    val tw = ws.sum
    out2.foreach { r =>
      assert(r.getAs[Long]("n_alloc") ==
        math.rint(100.0 * r.getAs[Long]("weight_micro") / tw).toLong)
    }
  }

  test("neymanAllocation: single-value strata drop") {
    import org.apache.spark.sql.functions._
    val rows = Seq(("solo", 5L)) ++ (1L to 10L).map(("multi", _))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), Seq("g"),
      col("v"), budget = 10L).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("multi"))
  }

  test("md5Uniform kernel is bit-identical to the strpos expression tree") {
    // the old form, verbatim: Σ_{i=1..8} hexdigit_i(md5(key))/16^i,
    // clamped — the arithmetic the DuckDB oracle still replays
    def oldTree(keyParts: Seq[org.apache.spark.sql.Column], salt: String) = {
      val h = md5(concat_ws("|", keyParts.map(_.cast("string")) :+
        (lit(salt): org.apache.spark.sql.Column): _*))
      val u = (1 to 8).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1)
          .cast("double") / math.pow(16.0, i)
      }.reduce(_ + _)
      least(greatest(u, lit(1e-9)), lit(1.0 - 1e-9))
    }
    val df = (0L until 5000L).toDF("id")
      .withColumn("b", (col("id") % 97).cast("int"))
    val mism = df.select(
        Sampling.md5Uniform(Seq(col("id"), col("b")), "sx").as("k"),
        oldTree(Seq(col("id"), col("b")), "sx").as("t"))
      .filter(col("k") =!= col("t")).count()
    assert(mism == 0L)
  }
}
