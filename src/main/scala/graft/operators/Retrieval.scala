package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — sparse lexical scoring (Okapi BM25, the Lucene /
  * Elasticsearch ranking function) fused with dense embedding ranks by
  * Reciprocal Rank Fusion (Cormack et al., SIGIR'09: score = Σ
  * 1/(k + rank), k=60). The standard first-stage shape for RAG corpus
  * serving and hard-negative mining: two cheap independent rankers,
  * one rank-space fusion that needs no score calibration between
  * them.
  *
  * Scale shape: BM25 reduces the corpus ONCE to (doc, term, tf)
  * [shuffle 1, map-side combine], keeps only query-term postings
  * BEFORE document frequency [so df and scoring shuffles carry
  * |query terms| · |matching docs| rows, never the corpus-wide term
  * relation], and broadcasts the |query-terms|-row idf table. Fusion
  * is a |union of top lists|-cardinality aggregate — the corpus never
  * rides it. Every constant (N, avgdl) is a broadcast 1-row frame, so
  * nothing collects to the driver.
  */
object Retrieval {

  /** Okapi BM25 scores for a bag-of-terms query over a corpus.
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Lucene "plus one"
    * form — strictly positive, so common terms dilute rather than
    * negate); per-term weight = idf · tf·(k1+1) / (tf + k1·(1 − b +
    * b·dl/avgdl)). Scores are rounded to 6dp so the rank cut is
    * engine-stable. Only documents containing ≥ 1 query term appear.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // query-term postings only: everything downstream of this filter is
    // |queryTerms| x |matching docs|, not corpus-sized
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("term"), col("n_docs"), col("avgdl"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
                       (col("df") + lit(0.5))).as("idf"))
    tf.join(broadcast(idf), "term")
      .join(dl, "id")
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("w")), 6).as("bm25"))
  }

  /** Reciprocal Rank Fusion of ranked lists: each input is (id, rank)
    * with rank starting at 1; fused = Σ over lists of 1/(k + rank),
    * rounded to 6dp, ranked (fused desc, id asc). Ids missing from a
    * list simply contribute nothing for it (the standard RRF
    * convention).
    *
    * The final ranking is a single-partition window — sound HERE
    * because the input is a union of top-k lists (O(lists·k) rows by
    * construction), never the corpus; callers fusing unbounded
    * rankings should cut to top-k first.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val unioned = rankings
      .map(_.select(col("id"), col("rank")))
      .reduce(_ unionByName _)
    val w = Window.orderBy(col("rrf").desc, col("id").asc)
    unioned
      .groupBy(col("id"))
      .agg(round(sum(lit(1.0) / (lit(k) + col("rank"))), 6).as("rrf"),
           count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(w))
  }
}
