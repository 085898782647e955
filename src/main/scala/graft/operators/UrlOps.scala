package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the C4-style provenance filter: extract the
  * registrable host from each document's source URL and flag documents
  * whose domain sits on a blocklist, so downstream stages can drop or
  * downweight them. Extraction is a single portable regex (identical
  * semantics in Java's engine and RE2-family engines — character
  * classes only, no lookaround), so the whole operator oracle-checks.
  *
  * Scale shape: extraction and the literal-list flag are per-row
  * codegen'd expressions (one scan, no shuffle). A real-world
  * blocklist (millions of domains) exceeds what an `isin` literal
  * should carry — [[flagBlockedJoin]] is the same flag via a broadcast
  * left join against a blocklist table, the shape that scales; the
  * two paths are spec-pinned equal.
  */
object UrlOps {

  /** `scheme://HOST[:port]/...` → HOST (empty string when the value
    * does not look like a URL).
    */
  val DomainPattern = "^https?://([^/:?#]+)"

  def extractDomain(url: Column): Column =
    regexp_extract(url, DomainPattern, 1)

  /** Flag rows whose URL's domain is on `blocklist` (literal path —
    * for lists small enough to ship inside the plan). Adds `domain`
    * and boolean `blocked`.
    */
  def flagBlocked(df: DataFrame, urlCol: String,
                  blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist: nothing to flag")
    val domain = extractDomain(col(urlCol))
    df.withColumn("domain", domain)
      .withColumn("blocked", domain.isin(blocklist: _*))
  }

  /** The same flag against a blocklist TABLE (one `domain` column) —
    * broadcast left join, the path for blocklists too large for a
    * plan literal but far under executor memory (a 10M-domain list is
    * ~hundreds of MB broadcast once, vs. re-shuffling the corpus).
    */
  def flagBlockedJoin(df: DataFrame, urlCol: String,
                      blockDf: DataFrame): DataFrame = {
    val domain = extractDomain(col(urlCol))
    df.withColumn("domain", domain)
      .join(broadcast(blockDf.select(col("domain")).distinct()
              .withColumn("__hit", lit(true))),
            Seq("domain"), "left")
      .withColumn("blocked", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }
}
