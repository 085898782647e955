package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench budget trip rule (graft.BenchBudget) must catch a real
  * regression but survive machine-class drift: the round-10 battery
  * failed rc=1 on a noise-amplified row, so round 11 both widened the
  * floor (+2 s) and rebased budgets on the MAX of recent recorded
  * batteries. The replay tests here pin that contract to the actual
  * recorded history in docs/bench_history/.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("a planted 5x regression trips, at any budget size") {
    assert(BenchBudget.violations(
      Map("fast" -> 5.0, "slow" -> 40.0),
      Map("fast" -> 1.0, "slow" -> 8.0)) === List("fast", "slow"))
  }

  test("sub-second rows get absolute headroom: 3x noise on a 0.8 s " +
       "budget does NOT trip (the round-10 failure shape at noise scale)") {
    assert(BenchBudget.violations(
      Map("tiny" -> 2.4), Map("tiny" -> 0.8)) === Nil)
    // but the same row at a genuine 5x+2s still trips
    assert(BenchBudget.violations(
      Map("tiny" -> 4.1), Map("tiny" -> 0.8)) === List("tiny"))
  }

  test("unbudgeted (new-this-round) queries are skipped") {
    assert(BenchBudget.violations(Map("new_q" -> 99.0), Map.empty) === Nil)
  }

  private def queriesOf(path: String): Map[String, Double] =
    BenchBudget.parseBenchQueries(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))))

  private def committedBudget: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    BenchBudget.parseTsv(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("docs/bench_budget.tsv")).asScala)
  }

  test("REPLAY: the round-9 builder battery passes the committed " +
       "budgets (historical drift must not fail the battery)") {
    val r9 = queriesOf("docs/bench_history/bench_r09_builder.json")
    assert(r9.size > 200, "history file parsed")
    assert(BenchBudget.violations(r9, committedBudget) === Nil)
  }

  test("REPLAY: the round-10 driver battery passes the committed " +
       "budgets everywhere EXCEPT the genuinely-defective old plans " +
       "(t226's round-10 explode; t243's pre-kernel gram scan)") {
    val r10d = queriesOf("docs/bench_history/bench_r10_driver.json")
    assert(r10d.size > 200)
    assert(BenchBudget.violations(r10d, committedBudget)
      === List("t226_label_separation", "t243_source_overlap"))
  }

  test("REPLAY: all four round-12 batteries (the committed budgets' " +
       "own base) pass clean — including the ten rebased rows") {
    for (b <- Seq("bench_r12_close", "bench_r12_final",
                  "bench_r12_final2", "bench_r12_final3")) {
      val r12 = queriesOf(s"docs/bench_history/$b.json")
      assert(r12.size > 300, b)
      assert(BenchBudget.violations(r12, committedBudget) === Nil, b)
    }
  }

  test("REPLAY: the round-12 DRIVER battery (the rc=1 record whose " +
       "sole violation, t64_pagerank, was adjudicated a machine-tail " +
       "false positive) passes the committed budgets after its " +
       "max-merge into the base") {
    val r12d = queriesOf("docs/bench_history/bench_r12_driver.json")
    assert(r12d.size > 300)
    assert(BenchBudget.violations(r12d, committedBudget) === Nil)
  }

  test("REPLAY: both round-13 closing batteries (335 and 337 queries, " +
       "rc=0 — the hardened t64/t39/q63 plans plus q65–q68/t269) pass " +
       "the committed budgets clean") {
    for (b <- Seq("bench_r13_close", "bench_r13_close2",
                  "bench_r13_close3", "bench_r13_close4",
                  "bench_r13_close5", "bench_r13_close6")) {
      val r13 = queriesOf(s"docs/bench_history/$b.json")
      assert(r13.size > 330, b)
      assert(BenchBudget.violations(r13, committedBudget) === Nil, b)
    }
  }

  test("REPLAY: both round-14 closing batteries (341 and 343 " +
       "queries, rc=0 — the shared robust-stats censuses plus " +
       "q70–q72/t271) pass the committed budgets clean") {
    for (b <- Seq("bench_r14_close", "bench_r14_close2")) {
      val r14 = queriesOf(s"docs/bench_history/$b.json")
      assert(r14.size > 340, b)
      assert(BenchBudget.violations(r14, committedBudget) === Nil, b)
    }
  }

  test("REPLAY: the round-13 DRIVER battery (the rc=1 record whose " +
       "sole violation, t208_lorenz, was adjudicated a transient " +
       "single-query stall on a normal-median machine — battery " +
       "median ratio 0.95) passes the committed budgets after its " +
       "max-merge into the base") {
    val r13d = queriesOf("docs/bench_history/bench_r13_driver.json")
    assert(r13d.size > 330)
    assert(BenchBudget.violations(r13d, committedBudget) === Nil)
  }

  test("machine-speed normalization: a uniformly 4x-slow machine " +
       "(the r12 driver battery, every row quadrupled — slower than " +
       "anything in the max-merged base) trips ZERO rows — but a real " +
       "15x plan regression planted on that same slow battery STILL " +
       "trips") {
    val slow = queriesOf("docs/bench_history/bench_r12_driver.json")
      .view.mapValues(_ * 4.0).toMap
    val budget = committedBudget
    // the quadrupled battery medians ~2.9x over the max-merged base —
    // unambiguous whole-machine slowness
    val mf = BenchBudget.machineFactor(slow, budget)
    assert(mf > 2.5, s"factor $mf should detect the 4x machine")
    assert(BenchBudget.violations(slow, budget) === Nil,
      "a systematically slow machine must fail zero rows, not one")
    // without the normalization the same battery fails MANY rows —
    // the shape the rule exists to prevent (never exactly one)
    val unscaled = slow.keys.count { k =>
      budget.get(k).exists(b => slow(k) > BenchBudget.limit(b))
    }
    assert(unscaled > 50, s"unscaled rule tripped only $unscaled rows")
    // a genuine regression is NOT masked: 15x one mid-size row still
    // clears limit x factor (4.5 s x 2.87 < 22.6 s)
    val planted = slow + ("t154_drift_panel" ->
      budget("t154_drift_panel") * 15.0)
    assert(BenchBudget.violations(planted, budget)
      === List("t154_drift_panel"))
  }

  test("machine-speed normalization stays OFF for normal batteries " +
       "and for small query sets (the planted-regression cases above " +
       "rely on the exact unscaled rule)") {
    // a real recorded battery medians well below 1 vs the max-merge
    val r12 = queriesOf("docs/bench_history/bench_r12_final3.json")
    assert(BenchBudget.machineFactor(r12, committedBudget) === 1.0)
    // < 25 budgeted rows -> factor is meaningless, stays 1 even if
    // every row runs hot
    val tiny = (1 to 10).map(i => s"q$i" -> 5.0).toMap
    val tinyBudget = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    assert(BenchBudget.machineFactor(tiny, tinyBudget) === 1.0)
  }

  test("machine-speed normalization is CAPPED at 3x: a 10x-slow " +
       "'machine' (indistinguishable from a uniform engine regression) " +
       "fails loudly instead of auto-passing") {
    val budget = (1 to 40).map(i => s"q$i" -> 2.0).toMap
    val tenX = budget.view.mapValues(_ * 10.0).toMap
    assert(BenchBudget.machineFactor(tenX, budget)
      === BenchBudget.MaxMachineFactor)
    // limit = 3x budget x cap 3 = 18 < 20 -> every row trips
    assert(BenchBudget.violations(tenX, budget).size === 40)
  }

  test("SECOND CHANCE: a transient stall bracketing one query's both " +
       "passes (the r13 t208 signature) re-times at normal speed and " +
       "the battery passes; a real regression re-times slow and still " +
       "trips; multi-row failures never get a second chance") {
    val budget = (1 to 30).map(i => s"q$i" -> 2.0).toMap
    val normal = budget.view.mapValues(_ * 0.8).toMap
    // stall: q7 ran 6.5x budget in every pass, rest of battery normal
    val stalled = normal + ("q7" -> 13.0)
    var asked = List.empty[String]
    val (v1, sc1) = BenchBudget.withSecondChance(stalled, budget, { k =>
      asked ::= k; Some(1.7) // re-times at normal speed
    })
    assert(asked === List("q7") && v1 === Nil && sc1 === Some("q7" -> 1.7))
    // real regression: the re-run is just as slow -> still trips
    val (v2, sc2) =
      BenchBudget.withSecondChance(stalled, budget, _ => Some(12.8))
    assert(v2 === List("q7") && sc2 === Some("q7" -> 12.8))
    // re-run itself fails -> the violation stands
    val (v3, sc3) = BenchBudget.withSecondChance(stalled, budget, _ => None)
    assert(v3 === List("q7") && sc3 === None)
    // two violators -> no second chance at all
    var asked2 = 0
    val (v4, _) = BenchBudget.withSecondChance(
      stalled + ("q9" -> 14.0), budget, { _ => asked2 += 1; Some(0.1) })
    assert(v4 === List("q7", "q9") && asked2 === 0)
  }

  test("parseBenchQueries still finds the queries map with the " +
       "round-14 machine_factor and second_chance fields present") {
    val line = """{"metric":"total","value":9.9,"unit":"sec","passes":2,""" +
      """"machine_factor":1.000,"second_chance":{"query":"t208_lorenz",""" +
      """"retime":0.912},"failed":[],"budget_violations":[],""" +
      """"queries":{"q1_agg":1.234,"t2_x":0.5},"sf":"d"}"""
    assert(BenchBudget.parseBenchQueries(line)
      === Map("q1_agg" -> 1.234, "t2_x" -> 0.5))
  }

  test("maxMerge takes the per-query max across recorded runs") {
    val merged = BenchBudget.maxMerge(Seq(
      Map("a" -> 1.0, "b" -> 3.0), Map("a" -> 2.0, "c" -> 0.5)))
    assert(merged === Map("a" -> 2.0, "b" -> 3.0, "c" -> 0.5))
  }

  test("parseBenchQueries reads the flat queries object Bench writes") {
    val line = """{"metric":"total","value":9.9,"unit":"sec","failed":[],""" +
      """"budget_violations":[],"queries":{"q1_agg":1.234,"t2_x":0.5},"sf":"d"}"""
    assert(BenchBudget.parseBenchQueries(line)
      === Map("q1_agg" -> 1.234, "t2_x" -> 0.5))
  }
}
