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
}
