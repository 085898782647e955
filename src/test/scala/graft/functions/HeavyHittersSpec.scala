package graft.functions

import graft.SparkSpec
import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misra_gries is exact when capacity >= distinct tokens") {
    val docs = Seq("a b a", "c b a", "c c c").toDF("text")
    val out = CorpusStats.heavyHitters(docs, "text", capacity = 10)
      .select($"token", $"est").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
  }

  test("planted heavy hitter survives an overflowing sketch with bounded error") {
    // 60 occurrences of "hot" among 40 distinct cold tokens (1 each):
    // N = 100, k = 8 → err = N/9 ≈ 11.1; true(hot) = 60 > err ⇒ hot
    // MUST be reported, with 60 - err <= est <= 60
    val rows = Seq.fill(60)("hot") ++ (0 until 40).map(i => s"cold$i")
    val docs = rows.toDF("text").repartition(7) // force multi-partition merges
    val out = CorpusStats.heavyHitters(docs, "text", capacity = 8)
      .select($"token", $"est").as[(String, Long)].collect().toMap
    assert(out.contains("hot"))
    assert(out("hot") <= 60L)
    assert(out("hot") >= 60L - math.ceil(100.0 / 9).toLong)
    assert(out.size <= 8)
  }

  test("full contract holds on a skewed multi-partition corpus") {
    val k = 10
    // zipf-ish: token i appears 1000/(i+1) times, i in 0..99
    val rows = (0 until 100).flatMap(i => Seq.fill(1000 / (i + 1))(s"t$i"))
    val docs = rows.toDF("text").repartition(13)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toDouble
    val err = n / (k + 1)
    val out = CorpusStats.heavyHitters(docs, "text", capacity = k)
      .select($"token", $"est").as[(String, Long)].collect().toMap
    assert(out.size <= k)
    exact.foreach { case (t, c) =>
      if (c > err) assert(out.contains(t), s"guaranteed hitter $t missing")
    }
    out.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(est >= exact(t) - err, s"$t under floor: $est < ${exact(t)} - $err")
    }
  }

  test("rank output is estimate-descending with token tiebreak") {
    val docs = Seq("b b a a c").toDF("text")
    val out = CorpusStats.heavyHitters(docs, "text", capacity = 10)
      .orderBy($"rank").select($"token").as[String].collect().toSeq
    assert(out == Seq("a", "b", "c")) // (a,2) before (b,2) tie; (c,1) last
  }
}
