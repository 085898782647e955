package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over randomized key/value tables — the reference's
  * audit query turned into invariants (SURVEY.md §5): dedup
  * postconditions, explode/re-nest conservation, union conservation.
  * (Raw scalacheck Gen with fixed seeds — the scalatest bridge artifact
  * isn't in the offline cache; determinism is a feature here anyway.)
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int)]] = Gen.listOfN(60,
    for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
      v <- Gen.chooseNum(0, 1000)
    } yield (k, v))

  private def samples(n: Int): Seq[List[(String, Int)]] =
    (1 to n).map(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("D1 postcondition: after keepFirst, every key count == 1 (audit empty)") {
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val dd = Dedup.keepFirst(df, Seq("k"), Seq(col("v"), monotonically_increasing_id()))
      assert(Dedup.audit(dd, Seq("k")).isEmpty)
      assert(dd.count() == rows.map(_._1).distinct.size)
    }
  }

  test("D2 postcondition: surviving keys had exactly one row originally") {
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val survivors = Dedup.removeAllDuplicated(df, Seq("k"))
        .select("k").as[String].collect().toSet
      val singletons = rows.groupBy(_._1).collect { case (k, vs) if vs.size == 1 => k }.toSet
      assert(survivors == singletons)
    }
  }

  test("D3 postcondition: row count preserved; non-null measures = distinct keys") {
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val masked = Dedup.nullMaskDuplicates(df, Seq("k"),
        Seq(col("v"), monotonically_increasing_id()), Seq("v"))
      assert(masked.count() == rows.size)
      assert(masked.filter(col("v").isNotNull).count() ==
        rows.map(_._1).distinct.size)
    }
  }

  test("explode∘renest conservation: multiset of (key, element) survives the round trip") {
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val renested = ExplodeOps.renest(df, Seq("k"), col("v"), "vs")
      val roundTrip = ExplodeOps.flatten(renested, "vs", "v")
        .select("k", "v").as[(String, Int)].collect().toSeq.sorted
      assert(roundTrip == rows.sorted)
    }
  }

  test("UNION ALL conserves row count; UNION DISTINCT bounded by distinct rows") {
    val Seq(a, b) = samples(2).toSeq
    val (da, db) = (a.toDF("k", "v"), b.toDF("k", "v"))
    assert(da.unionByName(db).count() == a.size + b.size)
    assert(da.unionByName(db).distinct().count() == (a ++ b).distinct.size)
  }

  test("top_k_by_score property: equals local sortBy(-score, id).take(k) per group") {
    import graft.functions.TopKFunctions.top_k_by_score
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "v")
        .select(col("k"), col("v").cast("double").as("s"),
                monotonically_increasing_id().as("i"))
      val local = df.select("k", "s", "i").as[(String, Double, Long)]
        .collect().groupBy(_._1).map { case (k, g) =>
          k -> g.map(t => (t._2, t._3)).sortBy(p => (-p._1, p._2)).take(3).toSeq
        }
      val agg = df.groupBy(col("k"))
        .agg(top_k_by_score(col("s"), col("i"), 3).as("t"))
        .select(col("k"), col("t").cast("array<struct<s:double,i:long>>"))
        .as[(String, Seq[(Double, Long)])].collect().toMap
      assert(agg == local)
    }
  }

  test("sorted_intersect_count property: equals set-intersection size") {
    import graft.functions.TextFunctions.sorted_intersect_count
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 30L))
    (1 to 5).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = gen.apply(Gen.Parameters.default, Seed(i.toLong + 100)).get
      val out = Seq((a.distinct.sorted, b.distinct.sorted))
        .toDF("a", "b")
        .select(sorted_intersect_count(col("a"), col("b")))
        .as[Int].head()
      assert(out == (a.toSet & b.toSet).size)
    }
  }
}
