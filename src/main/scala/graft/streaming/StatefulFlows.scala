package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY.md §7.5 extension surface):
  * per-wallet running flow accounting via flatMapGroupsWithState — the
  * piece of the streaming story windowed aggregation can't express
  * (state that survives across windows and emits on change).
  */
object StatefulFlows {

  /** One incoming ledger leg (the streaming shape of FlowRecord). */
  case class FlowEvent(wallet: String, ts: java.sql.Timestamp, value: Double)

  /** Running per-wallet account: cumulative net flow + activity count.
    * Emitted on every update (one output row per input batch per
    * wallet with activity).
    */
  case class WalletBalance(wallet: String, net: Double, n_events: Long,
                           last_ts: java.sql.Timestamp)

  /** State transition: fold the batch's events for this wallet into the
    * running balance. Pure function of (old state, events) — trivially
    * unit-testable off-stream.
    */
  def advance(wallet: String, events: Iterator[FlowEvent],
              prior: Option[WalletBalance]): WalletBalance = {
    var net = prior.map(_.net).getOrElse(0.0)
    var n = prior.map(_.n_events).getOrElse(0L)
    var last = prior.map(_.last_ts).orNull
    events.foreach { e =>
      net += e.value; n += 1
      if (last == null || e.ts.after(last)) last = e.ts
    }
    WalletBalance(wallet, net, n, last)
  }

  /** Wire `advance` into a streaming (or batch) grouped Dataset. The
    * state store partitions by wallet — each task owns its wallets'
    * state, no cross-partition coordination, unbounded wallet counts
    * scale horizontally with shuffle partitions.
    */
  def runningBalances(events: Dataset[FlowEvent]): Dataset[WalletBalance] = {
    implicit val balanceEnc = Encoders.product[WalletBalance]
    events.groupByKey(_.wallet)(Encoders.STRING)
      .flatMapGroupsWithState[WalletBalance, WalletBalance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (wallet: String, it: Iterator[FlowEvent], state: GroupState[WalletBalance]) =>
          val next = advance(wallet, it, state.getOption)
          state.update(next)
          Iterator.single(next)
      }
  }
}
