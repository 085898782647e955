package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 build from an append-only change
  * log — the standard warehouse surface for "what was this entity's
  * attribute at time T": collapse consecutive identical values, then
  * stamp each surviving row with its validity interval
  * [valid_from, valid_to) and a current flag.
  *
  * Scale shape: both passes are windows over the same
  * (key, order-by) spec, so Catalyst plans ONE hash exchange + one
  * sort and reuses them for the second window (the filter between
  * them preserves distribution and ordering). Per-key state is a
  * single lag/lead value — no funnel, any number of keys.
  */
object Scd2 {

  /** Build the SCD2 table. `tieCols` break order ties among same-`tsCol`
    * changes so the version chain is deterministic.
    *
    * Contract (matches the ANSI-SQL lag/lead form, oracle q40):
    *   - a row opens a version iff its `attrCol` differs (null-safely)
    *     from the key's previous row;
    *   - valid_from = its `tsCol`, valid_to = the NEXT version's
    *     valid_from (null for the open version), i.e. half-open
    *     [from, to) intervals that tile the key's timeline;
    *   - is_current marks the open version.
    */
  def build(changes: DataFrame, keyCol: String, attrCol: String,
            tsCol: String, tieCols: Seq[String]): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    changes
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // the key's first row always opens a version — tested explicitly
      // via row_number, because lag() returning null is ambiguous
      // between "no previous row" and "previous attr was null" and a
      // null-valued first attr must not be dropped; later rows open on
      // null-safe change only
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__prev", "__rn")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
