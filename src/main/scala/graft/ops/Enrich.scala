package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension enrichment (SURVEY.md §2.5 J1/J4): join flows against the
  * small wallet→location dimension. Always a broadcast join — the
  * dimension is 121 rows in the reference (wallet_location2.ndjson);
  * at 100 TB the fact side must never shuffle for this.
  */
object Enrich {

  /** Load the wallet→location NDJSON dimension (SURVEY §2.1 S3).
    * Schema inference keeps the messy columns verbatim (null locations,
    * '?', multi-country strings, the `Unnamed: 2` junk column — SURVEY
    * §7.3); the junk column is dropped here, after load, exactly as the
    * reference's consumer does.
    */
  def loadWalletLocation(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path).drop("Unnamed: 2")

  /** Exploded-address ⋈ address-book (btcolap.sql:54-57 J1): attach
    * wallet identity to each exploded address row.
    */
  def attachWallet(flow: DataFrame, addressBook: DataFrame,
                   addrCol: String = "addr"): DataFrame =
    flow.join(broadcast(addressBook), col(addrCol) === col("address"), "inner")
      .drop("address")

  /** flow ⋈ wallet_location (btcolap.sql:429-430 J4): location
    * enrichment; `location` stays an opaque string ('?', 'US' vs 'USA',
    * comma-lists survive untouched — parity with the reference).
    */
  def attachLocation(flow: DataFrame, walletLocation: DataFrame): DataFrame =
    flow.join(broadcast(walletLocation), Seq("wallet"), "inner")
}
