package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 600).map(i =>
    (i.toLong, s"g${i % 3}")).toDF("id", "grp")

  test("per-group quotas honored; unlisted groups take the default") {
    val out = Mixing.sampleQuotas(corpus, "grp", "id",
      Map("g0" -> 10, "g1" -> 25), defaultQuota = 5)
    val counts = out.groupBy($"grp").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("g0" -> 10L, "g1" -> 25L, "g2" -> 5L))
  }

  test("quota larger than the group keeps the whole group") {
    val out = Mixing.sampleQuotas(corpus, "grp", "id",
      Map("g0" -> 10000), defaultQuota = 1)
    val counts = out.groupBy($"grp").count()
      .as[(String, Long)].collect().toMap
    assert(counts("g0") == 200L && counts("g1") == 1L && counts("g2") == 1L)
  }

  test("salted two-level cap selects exactly the single-window set") {
    val picks = Seq(1, 4, 64).map(s =>
      Mixing.sampleQuotas(corpus, "grp", "id",
          Map("g0" -> 7, "g2" -> 13), defaultQuota = 3, salts = s)
        .select($"id").as[Long].collect().sorted.toSeq)
    assert(picks.distinct.size == 1)
  }

  test("selection matches the md5-order reference computed locally") {
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (1 to 600).map(i => (i.toLong, s"g${i % 3}"))
      .groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy(r => md5hex(r._1.toString)).take(4).map(_._1)
      }.toSet
    val got = Mixing.sampleQuotas(corpus, "grp", "id", Map.empty, 4)
      .select($"id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("temperatureMix: alpha=1 is proportional, alpha=0 is uniform, 0.5 upweights rare") {
    // skewed groups: 10 / 90 / 300 rows
    val skewed = ((1 to 10).map(i => (i.toLong, "rare")) ++
      (11 to 100).map(i => (i.toLong, "mid")) ++
      (101 to 400).map(i => (i.toLong, "big"))).toDF("id", "grp")
    def kept(alpha: Double, target: Long) =
      Mixing.temperatureMix(skewed, "grp", "id", alpha, target)
        .groupBy($"grp").count().as[(String, Long)].collect().toMap
        .withDefaultValue(0L)
    // alpha = 1: quotas proportional to group size (floor of 6dp-round)
    val prop = kept(1.0, 200)
    assert(prop("rare") == 5L && prop("mid") == 45L && prop("big") == 150L)
    // alpha = 0: every group gets the same quota (total/#groups),
    // capped at its size
    val unif = kept(0.0, 30)
    assert(unif == Map("rare" -> 10L, "mid" -> 10L, "big" -> 10L))
    // alpha = 0.5: rare keeps a HIGHER fraction than proportional,
    // dominant a lower one — the whole point of tempering
    val temp = kept(0.5, 200)
    assert(temp("rare").toDouble / 10 > prop("rare").toDouble / 10)
    assert(temp("big").toDouble / 300 < prop("big").toDouble / 300)
    // selection within a group is the deterministic md5 prefix
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectRare = (1 to 10).map(_.toLong)
      .sortBy(i => md5hex(i.toString)).take(temp("rare").toInt).toSet
    val gotRare = Mixing.temperatureMix(skewed, "grp", "id", 0.5, 200)
      .filter($"grp" === "rare").select($"id").as[Long].collect().toSet
    assert(gotRare == expectRare)
  }

  test("temperatureMix: arg guards and zero target") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Mixing.temperatureMix(df, "grp", "id", alpha = 1.5, targetRows = 10)
    }
    intercept[IllegalArgumentException] {
      Mixing.temperatureMix(df, "grp", "id", alpha = 0.5, targetRows = -1)
    }
    assert(Mixing.temperatureMix(df, "grp", "id", 0.5, 0).count() == 0L)
  }

  test("weight-budget selection is the greedy md5-order prefix") {
    val weighted = corpus.withColumn("w", ($"id" % 7 + 1).cast("int"))
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (1 to 600).map(i => (i.toLong, s"g${i % 3}", i % 7 + 1))
      .groupBy(_._2).flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => md5hex(r._1.toString)).takeWhile { r =>
          cum += r._3; cum <= 40L
        }.map(_._1)
      }.toSet
    val got = Mixing.sampleWeightBudget(weighted, "grp", "id", $"w",
        Map.empty, defaultBudget = 40L)
      .select($"id").as[Long].collect().toSet
    assert(got == expected)
    // per-group kept weight never exceeds the budget
    val sums = Mixing.sampleWeightBudget(weighted, "grp", "id", $"w",
        Map("g0" -> 15L), defaultBudget = 40L)
      .groupBy($"grp").agg(sum($"wt").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums("g0") <= 15L && sums("g1") <= 40L && sums("g2") <= 40L)
  }

  test("weight-budget rejects negative and null weights loudly") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val negative = corpus.withColumn("w",
      when($"id" === 17, -3).otherwise(1).cast("int"))
    val e1 = intercept[Exception] {
      Mixing.sampleWeightBudget(negative, "grp", "id", $"w",
        Map.empty, defaultBudget = 1000L).count()
    }
    assert(messages(e1).exists(_.contains("negative weight")),
      s"expected the guard message, got: ${messages(e1)}")
    // a NULL weight would ride free (window sum skips nulls) — guarded
    val withNull = corpus.withColumn("w",
      when($"id" === 17, lit(null)).otherwise(lit(1)).cast("int"))
    val e2 = intercept[Exception] {
      Mixing.sampleWeightBudget(withNull, "grp", "id", $"w",
        Map.empty, defaultBudget = 1000L).count()
    }
    assert(messages(e2).exists(_.contains("null or negative weight")),
      s"expected the guard message, got: ${messages(e2)}")
  }

  test("upsampleEpochs emits floor(w) full epochs plus the md5-prefix partial") {
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // g0: 2.5 epochs of 200 rows -> 400 full + 100 partial;
    // g1: 0.3 epochs -> 60 partial only; g2: default 1.0 -> 200 full
    val out = Mixing.upsampleEpochs(corpus, "grp", "id",
        Map("g0" -> 2.5, "g1" -> 0.3), defaultWeight = 1.0)
      .select($"id", $"grp", $"epoch")
      .as[(Long, String, Int)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup == Map("g0" -> 500, "g1" -> 60, "g2" -> 200))
    // every full epoch holds the WHOLE group, each exactly once
    val g0Epochs = out.filter(_._2 == "g0").groupBy(_._3).view
      .mapValues(_.map(_._1).toSet).toMap
    assert(g0Epochs(0).size == 200 && g0Epochs(0) == g0Epochs(1))
    // the partial epoch is the frac(w)*|g| smallest-md5 prefix
    val g0Ids = (1 to 600).filter(_ % 3 == 0).map(_.toLong)
    assert(g0Epochs(2) ==
      g0Ids.sortBy(i => md5hex(i.toString)).take(100).toSet)
    // epochs are dense from 0 within every group
    assert(out.filter(_._2 == "g1").map(_._3).toSet == Set(0))
    assert(out.filter(_._2 == "g2").map(_._3).toSet == Set(0))
  }

  test("upsampleEpochs rejects negative weights and drops w=0 groups") {
    intercept[IllegalArgumentException] {
      Mixing.upsampleEpochs(corpus, "grp", "id", Map("g0" -> -1.0), 1.0)
    }
    val out = Mixing.upsampleEpochs(corpus, "grp", "id",
      Map("g0" -> 0.0), defaultWeight = 1.0)
    assert(out.filter($"grp" === "g0").count() == 0L)
    assert(out.count() == 400L)
  }

  test("waterFill: hand-solved allocation — small sources funded, big ones leveled") {
    // avail (10, 20, 100, 100), budget 90: fund 10 and 20 fully
    // (10·4=40 ≤ 90; 10+20·3=70 ≤ 90; 30+100·2=230 > 90), level =
    // (90−30)/2 = 30 for the two big sources
    val df = Seq(("a", 10L), ("b", 20L), ("c", 100L), ("d", 100L))
      .toDF("src", "avail")
    val out = Mixing.waterFill(df, "src", "avail", budget = 90L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("allocation"), r.getAs[Boolean]("capped"))).toMap
    assert(out("a") == ((10.0, false)))
    assert(out("b") == ((20.0, false)))
    assert(out("c") == ((30.0, true)))
    assert(out("d") == ((30.0, true)))
  }

  test("waterFill: slack budget funds everything; zero budget allocates zero") {
    val df = Seq(("a", 5L), ("b", 7L)).toDF("src", "avail")
    val full = Mixing.waterFill(df, "src", "avail", budget = 100L).collect()
    assert(full.forall(r => r.getAs[Double]("allocation") ==
      r.getAs[Long]("available").toDouble && !r.getAs[Boolean]("capped")))
    val none = Mixing.waterFill(df, "src", "avail", budget = 0L).collect()
    assert(none.forall(_.getAs[Double]("allocation") == 0.0))
  }

  test("waterFill: allocations sum to min(budget, total available)") {
    val df = Seq(("a", 3L), ("b", 11L), ("c", 40L), ("d", 2L), ("e", 25L))
      .toDF("src", "avail")
    def total(b: Long): Double =
      Mixing.waterFill(df, "src", "avail", b)
        .agg(org.apache.spark.sql.functions.sum("allocation"))
        .head().getDouble(0)
    assert(math.abs(total(50L) - 50.0) < 1e-6)
    assert(math.abs(total(1000L) - 81.0) < 1e-9)
  }

  test("rakeWeights: 4 IPF iterations hit both marginals; per-axis " +
       "reweighting alone could not") {
    // a deliberately skewed 2x2 table: counts (a,x)=90 (a,y)=10
    // (b,x)=10 (b,y)=90; targets: rows 0.5/0.5, cols 0.3/0.7
    val cells = Seq(("a", "x", 90L), ("a", "y", 10L),
      ("b", "x", 10L), ("b", "y", 90L)).toDF("r", "c", "n")
    // this table is near-worst-case for IPF (strong row/col coupling):
    // 4 iterations leave a 0.019 row residual (measured), 12 converge
    val out = Mixing.rakeWeights(cells, "r", "c", "n",
        rowTargets = Map("a" -> 0.5, "b" -> 0.5),
        colTargets = Map("x" -> 0.3, "y" -> 0.7), iterations = 12)
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val total = 200.0
    def rowShare(r: String) = Seq("x", "y")
      .map(c => out((r, c))._1 * out((r, c))._2).sum / total
    def colShare(c: String) = Seq("a", "b")
      .map(r => out((r, c))._1 * out((r, c))._2).sum / total
    assert(math.abs(rowShare("a") - 0.5) < 1e-3, rowShare("a"))
    assert(math.abs(rowShare("b") - 0.5) < 1e-3)
    // columns scaled LAST -> on target up to the 6dp weight rounding
    assert(math.abs(colShare("x") - 0.3) < 1e-6, colShare("x"))
    assert(math.abs(colShare("y") - 0.7) < 1e-6)
    assert(out.values.forall(_._2 > 0))
  }

  test("rakeWeights: values containing the old '|' separator cannot " +
       "collide — each cell gets its own weight") {
    // under a "$r|$c" flat key, ("a|x", "y") and ("a", "x|y") would
    // merge; the nested row->(col->weight) lookup keeps them apart
    val cells = Seq(("a|x", "y", 90L), ("a", "x|y", 10L)).toDF("r", "c", "n")
    val out = Mixing.rakeWeights(cells, "r", "c", "n",
        rowTargets = Map("a|x" -> 0.3, "a" -> 0.7),
        colTargets = Map("y" -> 0.3, "x|y" -> 0.7), iterations = 4)
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(out.size == 2)
    // each cell is alone on its row AND column, so IPF must hit the
    // column targets exactly: w = target*total/n
    assert(math.abs(out(("a|x", "y")) - 0.3 * 100 / 90) < 1e-6)
    assert(math.abs(out(("a", "x|y")) - 0.7 * 100 / 10) < 1e-6)
  }

  test("rakeWeights fails loudly on a missing target") {
    val cells = Seq(("a", "x", 5L)).toDF("r", "c", "n")
    val e = intercept[IllegalArgumentException](
      Mixing.rakeWeights(cells, "r", "c", "n",
        rowTargets = Map("a" -> 1.0), colTargets = Map("z" -> 1.0)))
    assert(e.getMessage.contains("no column target"))
  }
}
