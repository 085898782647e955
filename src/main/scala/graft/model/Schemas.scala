package graft.model

import org.apache.spark.sql.types._

/** Schemas for the blockchain data contract the reference consumes
  * (SURVEY.md §1.2-1.3; bigquery-public-data.crypto_bitcoin per
  * btcolap.sql:52,78,109). Declared `StructType`s because the engine
  * must support both schema-on-read (parquet/JSON inference) and
  * declared schemas (SURVEY §1.1).
  */
object Schemas {

  /** One leg of a transaction: array-of-struct with an inner address
    * array — two levels of repetition (btcolap.sql:109-111).
    */
  val txLeg: StructType = StructType(Seq(
    StructField("addresses", ArrayType(StringType), nullable = true),
    StructField("value", DecimalType(38, 9), nullable = true)))

  /** `transactions` (btcolap.sql:105-115). */
  val transactions: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("block_timestamp", TimestampType, nullable = false),
    StructField("block_number", LongType, nullable = true),
    StructField("input_count", LongType, nullable = true),
    StructField("output_count", LongType, nullable = true),
    StructField("inputs", ArrayType(txLeg), nullable = true),
    StructField("outputs", ArrayType(txLeg), nullable = true)))

  /** Flat `inputs`/`outputs` legs (btcolap.sql:44-53,71-79). */
  val flatLeg: StructType = StructType(Seq(
    StructField("block_timestamp", TimestampType, nullable = false),
    StructField("transaction_hash", StringType, nullable = false),
    StructField("block_number", LongType, nullable = true),
    StructField("addresses", ArrayType(StringType), nullable = true)))

  /** Address book `address_table2` (btcolap.sql:1-15). */
  val addressBook: StructType = StructType(Seq(
    StructField("wallet", StringType, nullable = false),
    StructField("address", StringType, nullable = false)))

  /** Wallet→location dimension (wallet_location2.ndjson). The junk
    * `Unnamed: 2` column is preserved on load (parity with the messy
    * source, SURVEY §7.3) and dropped by Enrich.
    */
  val walletLocation: StructType = StructType(Seq(
    StructField("wallet", StringType, nullable = false),
    StructField("location", StringType, nullable = true),
    StructField("Unnamed: 2", StringType, nullable = true)))

  /** The flow ledger (btcolap.sql:316-360; ledger_table.parquet shape,
    * SURVEY §1.3).
    */
  val flowLedger: StructType = StructType(Seq(
    StructField("block_timestamp", TimestampType, nullable = false),
    StructField("txid", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("location", StringType, nullable = true),
    StructField("wallet", StringType, nullable = true),
    StructField("addr", StringType, nullable = true),
    StructField("val", DoubleType, nullable = true)))
}

/** Case classes for typed Dataset[T] views where compile-time field
  * checks help (SURVEY §1.4). Satoshi values carry as BigDecimal
  * (DecimalType(38,9)); `val` in the ledger is the scaled BTC double.
  */
case class TxLeg(addresses: Seq[String], value: BigDecimal)
case class Transaction(
    hash: String, block_timestamp: java.sql.Timestamp, block_number: Long,
    input_count: Long, output_count: Long,
    inputs: Seq[TxLeg], outputs: Seq[TxLeg])
case class FlowRecord(
    block_timestamp: java.sql.Timestamp, txid: String, `type`: String,
    location: String, wallet: String, addr: String, `val`: Double)
case class WalletLocation(wallet: String, location: String)
