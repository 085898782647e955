package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import StatefulFlows._

class StatefulFlowsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("advance folds events into prior state (pure transition)") {
    val s1 = advance("w1", Iterator(
      FlowEvent("w1", t("2021-09-20 10:00:00"), -1.5),
      FlowEvent("w1", t("2021-09-20 11:00:00"), 0.5)), None)
    assert(s1.net == -1.0 && s1.n_events == 2)
    val s2 = advance("w1", Iterator(
      FlowEvent("w1", t("2021-09-21 09:00:00"), 2.0)), Some(s1))
    assert(s2.net == 1.0 && s2.n_events == 3)
    assert(s2.last_ts == t("2021-09-21 09:00:00"))
  }

  test("runningBalances accumulates state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FlowEvent]
    val q = runningBalances(input.toDS())
      .writeStream.format("memory").queryName("balances")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(
        FlowEvent("w1", t("2021-09-20 10:00:00"), -1.5),
        FlowEvent("w2", t("2021-09-20 10:05:00"), 3.0))
      q.processAllAvailable()
      input.addData(FlowEvent("w1", t("2021-09-20 12:00:00"), 2.5))
      q.processAllAvailable()

      val rows = spark.table("balances")
        .as[WalletBalance].collect()
      // batch 1 emissions: w1 at -1.5, w2 at 3.0; batch 2: w1 at 1.0
      val w1Emissions = rows.filter(_.wallet == "w1").map(_.net).sorted.toSeq
      assert(w1Emissions == Seq(-1.5, 1.0)) // state carried across batches
      assert(rows.filter(_.wallet == "w2").map(_.net).toSeq == Seq(3.0))
      val w1Final = rows.filter(_.wallet == "w1").maxBy(_.n_events)
      assert(w1Final.n_events == 2 && w1Final.net == 1.0)
    } finally q.stop()
  }
}
