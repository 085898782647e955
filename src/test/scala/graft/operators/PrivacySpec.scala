package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),   // group of 3
    (4L, "en", "b"), (5L, "en", "b"),                    // group of 2
    (6L, "fr", "a")                                      // singleton
  ).toDF("id", "lang", "source")

  test("kAnonymize: suppression flags exactly the small groups") {
    val out = Privacy.kAnonymize(rows, Seq("lang", "source"), k = 3)
      .select($"id", $"group_size", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false),
      (6L, 1L, false)))
    // the released subset satisfies k-anonymity: every kept group >= k
    val released = Privacy.kAnonymize(rows, Seq("lang", "source"), 3)
      .filter($"kept")
    val minGroup = released.groupBy($"lang", $"source").count()
      .agg(org.apache.spark.sql.functions.min($"count")).as[Long].head()
    assert(minGroup >= 3L)
  }

  test("kAnonymityAudit: suppressed shares sum to the suppressed fraction") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("lang", "source"), k = 3)
      .select($"kept", $"n_rows", $"suppressed_share")
      .as[(Boolean, Long, Double)].collect()
    assert(audit.filter(_._1).map(_._3).forall(_ == 0.0))
    assert(math.abs(audit.filterNot(_._1).map(_._3).sum - 0.5) < 1e-9) // 3 of 6
  }

  test("dpCounts: seeded noise is reproducible and scales as 1/epsilon") {
    val e1 = Privacy.dpCounts(rows, Seq("lang"), epsilon = 1.0, "s")
      .select($"lang", $"noisy_count").as[(String, Double)].collect().toMap
    val e1b = Privacy.dpCounts(rows, Seq("lang"), epsilon = 1.0, "s")
      .select($"lang", $"noisy_count").as[(String, Double)].collect().toMap
    assert(e1 == e1b) // deterministic release
    // noise is nonzero (we are actually adding noise, not passing
    // counts through) but bounded sanely at eps=1
    val trueCounts = Map("en" -> 5.0, "fr" -> 1.0)
    assert(e1.exists { case (k, v) => v != trueCounts(k) })
    assert(e1.forall { case (k, v) => math.abs(v - trueCounts(k)) < 25 })
    // per-sample monotonicity: same uniform draw, 10x epsilon → noise
    // exactly 10x smaller
    val e10 = Privacy.dpCounts(rows, Seq("lang"), epsilon = 10.0, "s")
      .select($"lang", $"noisy_count").as[(String, Double)].collect().toMap
    for ((k, v) <- e1) {
      val n1 = v - trueCounts(k)
      val n10 = e10(k) - trueCounts(k)
      assert(math.abs(n1 - 10.0 * n10) < 1e-4, s"$k: $n1 vs $n10")
    }
    // a different salt draws different noise
    val other = Privacy.dpCounts(rows, Seq("lang"), epsilon = 1.0, "t")
      .select($"lang", $"noisy_count").as[(String, Double)].collect().toMap
    assert(other != e1)
  }

  test("dpCounts: delimiter-embedding and NULL-shifted groups draw " +
       "independent noise (no seed collisions)") {
    val tricky = Seq(
      (1L, Some("a|b"), Some("c")), (2L, Some("a"), Some("b|c")),
      (3L, Some("a"), Option.empty[String]),
      (4L, Option.empty[String], Some("a"))
    ).toDF("id", "lang", "source")
    val out = Privacy.dpCounts(tricky, Seq("lang", "source"), 1.0, "s")
      .select($"noisy_count").as[Double].collect()
    // all four groups have true count 1; colliding seeds would emit
    // identical noisy values — require all distinct
    assert(out.distinct.length == 4, out.toSeq.toString)
  }

  test("k = 1 keeps everything") {
    val out = Privacy.kAnonymize(rows, Seq("lang", "source"), k = 1)
    assert(out.filter(!$"kept").count() == 0L)
  }

  test("NULL quasi keys form their own groups — never dropped") {
    val withNulls = Seq(
      (1L, Some("en"), Some("a")), (2L, Some("en"), Some("a")),
      (3L, None, Some("a")), (4L, None, Some("a")),  // null lang group of 2
      (5L, None, None)                               // all-null singleton
    ).toDF("id", "lang", "source")
    val out = Privacy.kAnonymize(withNulls, Seq("lang", "source"), k = 2)
    // every input row survives the size join (a plain equi-join would
    // silently drop ids 3-5)
    assert(out.count() == 5L)
    val got = out.select($"id", $"group_size", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 2L, true), (2L, 2L, true),
      (3L, 2L, true), (4L, 2L, true),
      (5L, 1L, false)))
    // the audit sees the NULL groups too, from the count table alone
    val audit = Privacy.kAnonymityAudit(withNulls, Seq("lang", "source"), 2)
      .select($"group_size", $"kept", $"n_rows", $"suppressed_share")
      .as[(Long, Boolean, Long, Double)].collect()
    assert(audit.length == 3)
    assert(audit.map(_._3).sum == 5L)
    assert(math.abs(audit.filterNot(_._2).map(_._4).sum - 0.2) < 1e-9)
  }

  test("lDiversityAudit: a constant sensitive value fails both verdicts; a uniform one passes") {
    import org.apache.spark.sql.functions.col
    val rows =
      (1 to 8).map(i => ("leaky", s"v")) ++        // 8 rows, 1 value
      (1 to 8).map(i => ("mixed", s"v${i % 4}"))   // 8 rows, 4 values uniform
    val out = Privacy.lDiversityAudit(rows.toDF("quasi", "sens"),
        Seq("quasi"), "sens", l = 4)
      .collect().map(r => r.getAs[String]("quasi") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("k_sensitive"),
          r.getAs[Double]("s_entropy"),
          r.getAs[Boolean]("distinct_l_diverse"),
          r.getAs[Boolean]("entropy_l_diverse")))).toMap
    assert(out("leaky") == ((8L, 1L, 0.0, false, false)))
    val (n, k, h, dl, el) = out("mixed")
    assert(n == 8L && k == 4L && dl)
    // uniform over 4: H = ln 4 on the micro contract — passes H >= ln l
    val micro = math.rint(0.25 * math.log(0.25) * 1e6).toLong
    assert(h == math.rint(-(4 * micro).toDouble / 1e6 * 1e6) / 1e6)
    assert(el && math.abs(h - math.log(4.0)) < 1e-5)
  }

  test("lDiversityAudit: NULL sensitive values count as one more value") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("g", Some("a")), ("g", Some("a")), ("g", None))
      .toDF("quasi", "sens")
    val out = Privacy.lDiversityAudit(df, Seq("quasi"), "sens", l = 2)
      .collect().head
    assert(out.getAs[Long]("k_sensitive") == 2L)
    assert(out.getAs[Boolean]("distinct_l_diverse"))
  }

  test("tClosenessAudit: ordered EMD is 0 for a matching group, 0.5 for " +
       "fully separated two-bin groups, and absent bins still count") {
    import org.apache.spark.sql.functions.col
    // g1 all bin 0, g2 all bin 1 (g1 never SEES bin 1 - the grid join
    // must still accumulate its deficit), g3 balanced like the corpus
    val rows = Seq.fill(10)(("g1", 0)) ++ Seq.fill(10)(("g2", 1)) ++
      (Seq.fill(5)(("g3", 0)) ++ Seq.fill(5)(("g3", 1)))
    val out = Privacy.tClosenessAudit(rows.toDF("q", "bin"), Seq("q"),
        col("bin"), t = 0.4)
      .collect().map(r => r.getAs[String]("q") -> r).toMap
    // global: 15/15 over bins {0,1}, m-1 = 1
    // g1: |F_g(0)-F(0)| = |1 - 0.5| = 0.5
    assert(out("g1").getAs[Double]("emd") == 0.5)
    assert(!out("g1").getAs[Boolean]("t_close"))
    assert(out("g2").getAs[Double]("emd") == 0.5)
    assert(out("g3").getAs[Double]("emd") == 0.0)
    assert(out("g3").getAs[Boolean]("t_close"))
    assert(out("g1").getAs[Long]("n") == 10L)
  }

  test("tClosenessAudit: mass moved two bins costs twice one bin") {
    import org.apache.spark.sql.functions.col
    // domain {0,1,2}; gA shifts one unit of mass 0->1, gB shifts it
    // 0->2, gC compensates both so the GLOBAL pool is exactly uniform
    // (32,32,32) - then EMD_B = 2 x EMD_A and EMD_gU = 0
    val gU = for (b <- 0 to 2; _ <- 1 to 8) yield ("gU", b)
    val gA = Seq.fill(7)(("gA", 0)) ++ Seq.fill(9)(("gA", 1)) ++
      Seq.fill(8)(("gA", 2))
    val gB = Seq.fill(7)(("gB", 0)) ++ Seq.fill(8)(("gB", 1)) ++
      Seq.fill(9)(("gB", 2))
    val gC = Seq.fill(10)(("gC", 0)) ++ Seq.fill(7)(("gC", 1)) ++
      Seq.fill(7)(("gC", 2))
    val out = Privacy.tClosenessAudit((gU ++ gA ++ gB ++ gC).toDF("q", "bin"),
        Seq("q"), col("bin"), t = 0.1)
      .collect().map(r => r.getAs[String]("q") -> r.getAs[Double]("emd")).toMap
    assert(out("gU") < 1e-9)
    assert(out("gA") == 0.020833)
    assert(out("gB") == 0.041667)
    assert(math.abs(out("gB") - 2 * out("gA")) < 3e-6)
  }

  test("tClosenessAudit: single-bin global domain (m = 1) is EMD 0, " +
       "not NULL — every distribution over one bin is identical") {
    import org.apache.spark.sql.functions.col
    val rows = Seq.fill(7)(("g1", 42)) ++ Seq.fill(3)(("g2", 42))
    val out = Privacy.tClosenessAudit(rows.toDF("q", "bin"), Seq("q"),
        col("bin"), t = 0.01)
      .collect().map(r => r.getAs[String]("q") -> r).toMap
    assert(out("g1").getAs[Double]("emd") == 0.0)
    assert(out("g1").getAs[Boolean]("t_close"))
    assert(out("g2").getAs[Double]("emd") == 0.0)
    assert(out("g2").getAs[Boolean]("t_close"))
  }
}
