package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{Transaction, TxLeg}
import graft.ops.{DailyAgg, Enrich, Flows}
import graft.analytics.Ols

/** Runnable demonstration of the domain pipeline at its package
  * boundary: mini blockchain → BtcPipeline.run → located ledgers →
  * daily series → OLS. Usage: scripts/run_main.sh graft.pipeline.LedgerDemo [outDir]
  */
object LedgerDemo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("ledger_demo").toString)
    val spark = graft.GraftSession.builder("ledger-demo", Some("local[4]"))
      .config("spark.ui.enabled", "false")
      // keep catalog tables (the bucketed CTAS below) out of the repo cwd
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("demo_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val txs = Seq(
      Transaction("tx1", t("2021-09-20 10:00:00"), 1L, 1L, 1L,
        Seq(TxLeg(Seq("addrA"), BigDecimal(150000000L))),
        Seq(TxLeg(Seq("addrB"), BigDecimal(149000000L)))),
      Transaction("tx2", t("2021-09-26 12:00:00"), 2L, 1L, 1L,
        Seq(TxLeg(Seq("addrB"), BigDecimal(50000000L))),
        Seq(TxLeg(Seq("addrC"), BigDecimal(49000000L))))
    ).toDF()
    val flatIn = txs.select($"block_timestamp", $"hash".as("transaction_hash"),
      $"block_number", explode($"inputs.addresses").as("addresses"))
    val flatOut = txs.select($"block_timestamp", $"hash".as("transaction_hash"),
      $"block_number", explode($"outputs.addresses").as("addresses"))
    val book = Seq(("exchA", "addrA"), ("exchB", "addrC")).toDF("wallet", "address")
    val dimPath = java.nio.file.Files.createTempFile("wallet_loc", ".ndjson")
    java.nio.file.Files.writeString(dimPath,
      "{\"wallet\":\"exchA\",\"location\":\"China\"}\n" +
      "{\"wallet\":\"exchB\",\"location\":\"Russia\",\"Unnamed: 2\":\"junk\"}\n")
    val dim = Enrich.loadWalletLocation(spark, dimPath.toString)

    val (pre, post) = new BtcPipeline(spark, outDir).run(txs, flatIn, flatOut, book, dim)
    println(s"== pre ledger (${pre.count()} rows) ==");  pre.show(false)
    println(s"== post ledger (${post.count()} rows) =="); post.show(false)

    val flow = Flows.simpleFlow(txs)
    val merged = DailyAgg.merge(
      DailyAgg.dailyFlow(flow.filter($"type" === "input"), negate = true, "x"),
      DailyAgg.dailyFlow(flow.filter($"type" === "output"), negate = false, "y"))
    println("== daily series =="); merged.orderBy("date").show(false)
    println(s"== OLS == ${Ols.fit(merged, "x", "y")}")

    // EP2 read path: cohort analysis — a denser synthetic ledger (the
    // 2-tx pipeline ledger has no day carrying both series; the inner
    // day-merge correctly yields nothing there)
    val base = java.time.LocalDate.parse("2021-09-10")
    val denseLedger = (0 until 28).flatMap { d =>
      val day = java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay.plusHours(6))
      val x = 5.0 + d
      Seq((day, s"cx$d", "input", "China", "exchA", s"a$d", -x),
          (day, s"cy$d", "output", "Russia", "exchB", s"b$d", 3.0 * math.pow(x, 1.2)))
    }.toDF("block_timestamp", "txid", "type", "location", "wallet", "addr", "val")
    val (cPre, cPost) = graft.analytics.CohortAnalysis.prePost(
      denseLedger, "2021-09-24", outLocation = "China", inLocationNot = "China",
      minFlow = 0.0)
    println(s"== cohort pre  == n=${cPre.fit.n} slope=${cPre.fit.slope} r2=${cPre.fit.r2}")
    println(s"== cohort post == n=${cPost.fit.n} slope=${cPost.fit.slope} r2=${cPost.fit.r2}")
    cPre.daily.orderBy("date").show(5, truncate = false)

    // Bucketed CTAS + shuffle-free aggregation on the bucket key
    val bucketedLedger = graft.io.Writers.bucketed(
      denseLedger, "demo_ledger_bucketed", numBuckets = 4, Seq("txid"))
    val perTx = bucketedLedger.groupBy("txid").agg(sum("val").as("net"))
    perTx.collect()
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(perTx.queryExecution.executedPlan.toString).length
    println(s"== bucketed ledger == rows=${bucketedLedger.count()} " +
      s"groupBy-shuffles=$shuffles (expect 0)")
    println(s"OUTDIR=$outDir")
    spark.stop()
  }
}
