package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics — TF-IDF (the classic relevance /
  * keyword-extraction weighting) built from two aggregations:
  * term frequency per (doc, term) and document frequency per term.
  *
  * Scale shape: tokenize → groupBy(doc, term) [shuffle 1, partial
  * map-side combine] → groupBy(term) for df [shuffle 2, |vocab| rows]
  * → tf ⋈ df on term → per-doc top-k window (doc_id is
  * high-cardinality, so the window partitions spread — no funnel).
  * The tf ⋈ df strategy is deliberately left to Catalyst/AQE: on a
  * small vocabulary it broadcasts (the committed sf0.01 plan does),
  * while a web-scale vocabulary exceeds the broadcast threshold and
  * falls back to the key-partitioned hash join — neither case needs a
  * hint. The corpus size N rides along as a broadcast single-row
  * frame, never a driver-side collect.
  */
object CorpusStats {

  /** Top-`k` TF-IDF terms per document. Tokenization is lowercase
    * whitespace split (the corpus contract shared with TextDedup);
    * tfidf = tf · ln(N / df), rounded to 6dp BEFORE ranking so the
    * (tfidf desc, term asc) order — and therefore the top-k cut — is
    * identical in any engine recomputing it.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"),
              explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
  }
}
