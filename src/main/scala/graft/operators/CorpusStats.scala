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

  /** Per-document fluency scoring under a corpus-trained bigram
    * language model — the CCNet-style "perplexity filter" shape:
    * train counts on the corpus itself, score every document by its
    * average negative log-likelihood, and let the caller threshold the
    * tail (gibberish and boilerplate score high, typical prose low).
    * Probabilities are add-k smoothed: P(w2|w1) = (c(w1,w2) + k) /
    * (c(w1,·) + k·V) with V the distinct-token vocabulary size.
    *
    * Output: (doc_id, n_bigrams, avg_nll) for every document with ≥ 2
    * tokens — avg_nll = −Σ log P / n over the document's bigrams,
    * rounded to 6dp (the per-term doubles are bit-identical across
    * engines; only the Σ order varies, at ~1e-15 relative error
    * against a 1e-6 rounding grid).
    *
    * Scale shape: bigram instances never ride a join — documents
    * reduce to (doc, bigram, n) first [shuffle 1, map-side combine],
    * the model is two aggregations of that [|bigram vocab| and
    * |vocab| rows], and scoring re-joins on the bigram key [key-
    * partitioned; Catalyst broadcasts when the model is small]. V
    * rides along as a broadcast single-row frame, like tfIdf's N. The
    * same counts table serves any number of scoring passes.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"addK must be positive, got $addK")
    val toksRaw = split(lower(col(textCol)), "\\s+")
    val toks = filter(toksRaw, x => length(x) > 0)
    val n = size(col("t"))
    // bigrams as "w1 w2" strings (zip of the n−1 prefix with the n−1
    // suffix): a flat join key — no struct comparators on the shuffle
    val tokenized = docs
      .select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
    val bg = tokenized.select(col("doc_id"),
      explode(zip_with(slice(col("t"), lit(1), n - 1),
                       slice(col("t"), lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b))).as("b"))
    val perDoc = bg.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("n"))
    val cnt = perDoc.groupBy(col("b")).agg(sum(col("n")).as("c"))
    val ctx = cnt.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c")).as("cc"))
    val vocab = tokenized.select(explode(col("t")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    perDoc.join(cnt, "b")
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .join(ctx, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
           round(-sum(col("n") *
               log((col("c") + addK) / (col("cc") + lit(addK) * col("v")))) /
             sum(col("n")), 6).as("avg_nll"))
  }
}
