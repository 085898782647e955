package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING quality gate — the ingest-time twin of the batch
  * quality battery ([[graft.operators.TextAnalysis.qualityFlags]]):
  * every arriving document is scored against the Gopher/C4-style
  * heuristics AND the PII counters BEFORE it lands in the corpus, so
  * low-quality or PII-bearing text is flagged at the door instead of
  * by a retroactive sweep.
  *
  * Like [[StreamDecontam]], the check is STATELESS per row (pure
  * expression work — token stats, symbol ratio, the native
  * hashed-shingles bigram kernel, two portable regex counters): the
  * query runs in append mode with NO streaming state and its result
  * is independent of arrival order/batching — hash-exact against a
  * plain batch SQL replay (beyond the t14 emission-replay convention;
  * no watermark at all).
  */
object IngestQuality {

  /** Score each streamed document: the four t30 quality measures +
    * flags, plus the t19 PII counters (emails on the raw text, digit
    * runs after email masking). `keep` = all four quality flags AND
    * pii_free. Works identically on batch and streaming frames.
    */
  def gate(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // one SELECT over the stream — a second branch + join would plan
    // as a STATEFUL stream-stream self-join and break the
    // order-independence the hash-exact replay rests on
    val flagged = graft.operators.TextAnalysis.qualityFlags(docs, textCol)
    val (emails, numRuns) =
      graft.operators.TextAnalysis.piiCounts(col(textCol))
    flagged.select(col(idCol), col("n_tokens"), col("mean_word_len"),
        col("symbol_ratio"), col("dup_bigram_frac"),
        (col("ok_word_count") && col("ok_mean_len") &&
          col("ok_symbols") && col("ok_repetition")).as("quality_ok"),
        emails.as("n_emails"), numRuns.as("n_num_runs"))
      .withColumn("pii_free", col("n_emails") === 0 && col("n_num_runs") === 0)
      .withColumn("keep", col("quality_ok") && col("pii_free"))
  }
}
