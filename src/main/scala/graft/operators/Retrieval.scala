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

  /** Ranking-quality metrics at cutoff `k` — the EVAL member of the
    * retrieval family (a stack that ships BM25+RRF needs recall@k /
    * MRR / nDCG@k to choose between its own legs): for every ranked
    * list in `ranked` (`listCol` labels them; `rankCol` starts at 1)
    * scored against one binary relevance set,
    *
    *   recall@k    = |hits| / |relevant|
    *   precision@k = |hits| / k
    *   MRR         = 1 / (first relevant rank ≤ k), 0 if none
    *   nDCG@k      = DCG / IDCG with binary gains 1/log₂(rank+1),
    *                 IDCG over the min(k, |relevant|) ideal ranks
    *
    * Portability: each DCG/IDCG term is micro-rounded to a BIGINT
    * (round(10⁶/log₂(rank+1))) BEFORE summing — the t228 micro-log
    * convention — so both engines integer-sum identical terms and the
    * metric is one IEEE divide of exact integers; everything else is
    * rank arithmetic. Hash-exact oracles, not gates.
    *
    * Scale shape: lists are top-k by construction (O(lists·k) rows);
    * the relevance set joins on 8-byte ids; IDCG explodes a ≤ k
    * sequence off the 1-row relevant-count frame. Nothing here is
    * corpus-sized — the corpus work happened in the retrievers.
    *
    * Output: (list, n_rel, hits, recall, precision, mrr, ndcg),
    * one row per list label (zero-hit lists get 0s, not dropped).
    */
  def rankingMetrics(ranked: DataFrame, listCol: String, idCol: String,
                     rankCol: String, relevant: DataFrame,
                     relIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def microDcg(rank: Column): Column =
      round(lit(1000000.0) /
        (log(rank.cast("double") + 1) / log(lit(2.0)))).cast("long")
    val lists = ranked.select(col(listCol).as("list"),
        col(idCol).as("__id"), col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    val rel = relevant.select(col(relIdCol).as("__id")).distinct()
    val nRel = rel.agg(count(lit(1)).as("n_rel"))
    val names = lists.select(col("list")).distinct()
    val agg = lists.join(rel, "__id")
      .groupBy(col("list"))
      .agg(count(lit(1)).as("hits"),
           min(col("__rank")).as("__first"),
           sum(microDcg(col("__rank"))).as("__dcg"))
    // ideal DCG: the first min(k, n_rel) ranks, exploded off the 1-row
    // count frame (sequence(1, 0) would run DESCENDING in Spark — the
    // n_rel >= 1 guard keeps the empty-relevance case out entirely)
    val idcg = nRel.filter(col("n_rel") >= 1)
      .select(explode(sequence(lit(1L),
        least(lit(k.toLong), col("n_rel").cast("long")))).as("__rank"))
      .agg(sum(microDcg(col("__rank"))).as("__idcg"))
    names.join(agg, Seq("list"), "left")
      .crossJoin(broadcast(nRel))
      .crossJoin(broadcast(idcg))
      .select(col("list"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_rel"), 6).as("recall"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / k, 6)
          .as("precision"),
        coalesce(round(lit(1.0) / col("__first"), 6), lit(0.0)).as("mrr"),
        coalesce(round(col("__dcg").cast("double") / col("__idcg"), 6),
          lit(0.0)).as("ndcg"))
  }

  /** SECOND-STAGE RERANK over a bounded first-stage candidate set —
    * the cross-encoder serving pattern (retrieve cheap and wide with
    * [[bm25]]/dense/[[rrfFuse]], then re-score only the survivors
    * with an expensive PAIR scorer and re-rank): `score` is any
    * Column over the candidate rows — in production a model-serving
    * scorer (this container has no model runtime, so [[proximityScore]]
    * below is the deterministic stand-in; the PLUMBING — bounded
    * input, per-query window, rank-shift audit — is the operator).
    *
    * Scale shape: the input is |queries| × k rows BY CONTRACT (the
    * first stage's top-k), so arbitrarily expensive per-row scoring
    * is safe — that asymmetry is the whole point of the two-stage
    * architecture. The re-rank window partitions on the query
    * columns (REQUIRED — high-cardinality in production, ≤ k rows per
    * partition, never a corpus sort; a single-query caller passes its
    * literal query-id column).
    *
    * Output: query cols…, rerank (1-based), `idCol`, score,
    * first_rank, rank_shift = first_rank − rerank (positive = the
    * pair scorer promoted the document).
    */
  def rerank(candidates: DataFrame, queryCols: Seq[String],
             idCol: String, firstRankCol: String, score: Column,
             topK: Int): DataFrame = {
    require(queryCols.nonEmpty,
      "queryCols must be non-empty — the rerank window partitions on " +
      "the query key (pass the literal query-id column for a single " +
      "query); an unpartitioned window would be a single-task sort")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // withColumn silently OVERWRITES same-named caller columns: a
    // candidate frame already carrying __s or rerank would have its
    // data replaced (and a firstRankCol named either would read the
    // operator's own columns back), corrupting first_rank/rank_shift.
    // Fail loudly instead (r13 ADVICE).
    Seq("__s", "rerank").foreach { reserved =>
      require(!candidates.columns.contains(reserved),
        s"candidates must not carry a column named '$reserved' — " +
        "rerank writes it internally; rename the caller column")
      require(firstRankCol != reserved,
        s"firstRankCol must not be '$reserved' — it would read the " +
        "rerank operator's own internal column")
    }
    val qc = queryCols.map(col)
    val w = Window.partitionBy(qc: _*)
      .orderBy(col("__s").desc, col(idCol).asc)
    candidates.withColumn("__s", score)
      .withColumn("rerank", row_number().over(w).cast("long"))
      .filter(col("rerank") <= topK)
      .select(qc ++ Seq(col("rerank"), col(idCol),
        col("__s").as("score"),
        col(firstRankCol).cast("long").as("first_rank"),
        (col(firstRankCol).cast("long") - col("rerank"))
          .as("rank_shift")): _*)
  }

  /** Deterministic stand-in for a cross-encoder pair scorer: ordered
    * query-term ADJACENCY in the document (the cross-term interaction
    * signal bag-of-words scoring cannot see — "hash join" as a phrase
    * outranks the words scattered) + distinct-term coverage − a
    * length tiebreak, packed into one exact BIGINT so the oracle
    * replays it bit-for-bit:
    *
    *   score = 10⁶ · #(adjacent ordered query-term pairs)
    *         + 10³ · #(distinct query terms present) − #tokens
    *
    * Tokenization is the library-wide lowercase-\s+ contract. NULL
    * text scores as empty (0 matches, 0 tokens). The nested lambdas
    * run interpreted per element — fine HERE because rerank inputs
    * are ≤ |queries|·k rows by contract, never the corpus (the
    * TextKernels rule: kernel-ize corpus-sized per-row work, compose
    * lambdas on bounded frames).
    */
  def proximityScore(textCol: Column, queryTerms: Seq[String]): Column = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val toks = filter(split(lower(coalesce(textCol, lit(""))), "\\s+"),
      t => length(t) > 0)
    val pairs = queryTerms.zip(queryTerms.tail)
    val a = slice(toks, lit(1), greatest(size(toks) - 1, lit(0)))
    val b = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val adjacent =
      if (pairs.isEmpty) lit(0L)  // single-term query: no phrase signal
      else aggregate(
        zip_with(a, b, (x, y) =>
          pairs.map { case (p, q) => x === p && y === q }
            .reduce(_ || _)),
        lit(0L), (acc, v) => acc + when(v, 1L).otherwise(0L))
    val matched = size(array_intersect(array_distinct(toks),
      array(queryTerms.map(lit): _*))).cast("long")
    adjacent * 1000000L + matched * 1000L - size(toks).cast("long")
  }
}
