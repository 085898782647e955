package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed BPE merge learning (Sennrich et al. 2016) — the actual
  * tokenizer-training step the t51 vocabulary statistics are the
  * precursor for: represent every distinct word as a character symbol
  * sequence, repeatedly count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent pair corpus-wide, and record
  * the learned rule table.
  *
  * Scale shape: the corpus reduces ONCE to word frequencies [the only
  * corpus-sized shuffle, map-side combined]; every round after that
  * works on the VOCABULARY-sized symbol table — pair counting is an
  * explode + map-side-combined groupBy of that table, the winning
  * pair is a 1-row distributed TakeOrdered collect (the bounded
  * driver state: one rule per round, like the k-means centroid
  * collects), and merge application is a per-row native kernel pass
  * [[graft.functions.BpeMergeExpr]] with no shuffle. Each round's
  * frame is cached (lazy persist, populated by the NEXT round's
  * TakeOrdered action — one job per round), so round r never replays
  * rounds 1..r−1's lineage; every cached frame unpersists on return.
  */
object Bpe {

  /** Learn `numMerges` merge rules from the corpus (lowercase
    * whitespace tokenization — the shared corpus contract). Output,
    * one row per learned rule in order:
    * (step, left, right, merged, pair_count, applied, residual_pairs)
    * where `pair_count` is the weighted adjacent-pair count that won
    * the round (ties broken (count desc, left, right) so any engine
    * replaying the rule sequence picks the same rules), `applied` is
    * the weighted number of merges actually performed (overlapping
    * runs like "a a a" count 2 pairs but merge once — so applied ≤
    * pair_count), and `residual_pairs` is the weighted count of
    * (left, right) adjacencies REMAINING after the pass — exactly 0
    * by the merge-apply contract, which the t55 audit gate enforces.
    * Stops early if the vocabulary runs out of adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = filter(TextDedup.tokens(col(textCol)), x => length(x) > 0)
    var words = docs.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
      .persist()
    val cached = scala.collection.mutable.ArrayBuffer(words)
    def pairsOf(s: org.apache.spark.sql.Column) =
      zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))
    // ONE action per round: each round's frame is a LAZY persist whose
    // cache is populated by the next round's TakeOrdered pair collect
    // (round r's top job computes round r−1's merge exactly once, into
    // the cache), so the per-round eager-checkpoint job is gone —
    // numMerges+2 jobs total instead of 2·numMerges+2. A SINGLE
    // end-of-run stats job unions every round's audit aggregates over
    // the cached round frames; every cached frame unpersists before
    // return (the collected rule rows are the only state that leaves).
    val staged = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, DataFrame)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val top = words
        .select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val merged = words
          .select(col("freq"), size(col("syms")).as("len0"),
            TextFunctions.bpe_merge(col("syms"), l, r).as("syms"))
          .persist()
        cached += merged
        staged += ((step, l, r, top(0).getLong(2), merged))
        words = merged.select(col("freq"), col("syms"))
        step += 1
      }
    }
    if (staged.isEmpty) {
      cached.foreach(_.unpersist())
      return Seq.empty[(Int, String, String, String, Long, Long, Long)]
        .toDF("step", "left", "right", "merged", "pair_count",
          "applied", "residual_pairs")
    }
    val stats = staged.map { case (s, l, r, _, m) =>
      m.agg(
        sum(col("freq") * (col("len0") - size(col("syms")))).as("applied"),
        sum(col("freq") * aggregate(
          zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
                   slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => when(a === l && b === r, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x)).as("residual"))
        .select(lit(s).as("step"), col("applied"), col("residual"))
    }.reduce(_ unionByName _).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cached.foreach(_.unpersist())
    staged.toSeq.map { case (s, l, r, c, _) =>
      (s, l, r, l + r, c, stats(s)._1, stats(s)._2)
    }.toDF("step", "left", "right", "merged", "pair_count",
      "applied", "residual_pairs")
  }

  /** ENCODE (the apply step [[learnMerges]] trains for): tokenize each
    * document, split every token into character symbols, and apply the
    * learned merge rules IN ORDER — one [[graft.functions.BpeMergeExpr]]
    * kernel pass per rule, nested inside a per-token `transform`, so
    * the whole encode is a single shuffle-free projection over the
    * corpus regardless of rule count (rules are vocabulary-sized
    * driver state, exactly like the k-means centroid literals).
    *
    * Output per document: symbol/word/char counts, the compression
    * ratio tokenizer reports quote (chars per BPE symbol), and
    * `roundtrip_ok` — whether the concatenated encoded symbols
    * reproduce the concatenated tokens EXACTLY. Merges only ever glue
    * adjacent symbols of one token, so a correct encoder can never
    * fail this; the t68 gate enforces zero violations, which is what
    * justifies the rows-only driver record (replaying every merge pass
    * in SQL is not reasonably expressible).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             rules: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.Column
    val toksCol = filter(TextDedup.tokens(col(textCol)), x => length(x) > 0)
    val charsOf = (t: Column) =>
      transform(sequence(lit(1), length(t)), i => t.substr(i, lit(1)))
    var enc: Column = transform(toksCol, t => charsOf(t))
    rules.foreach { case (l, r) =>
      enc = transform(enc, s => TextFunctions.bpe_merge(s, l, r))
    }
    docs.select(col(idCol), toksCol.as("toks"), enc.as("enc"))
      .select(col(idCol),
        size(col("toks")).as("n_words"),
        aggregate(transform(col("toks"), t => length(t)), lit(0),
          (a, x) => a + x).as("n_chars"),
        size(flatten(col("enc"))).as("n_bpe_tokens"),
        (array_join(flatten(col("enc")), "") ===
          array_join(col("toks"), "")).as("roundtrip_ok"))
      .withColumn("compression",
        round(col("n_chars") / col("n_bpe_tokens"), 6))
  }

  // ---- rule persistence ---------------------------------------------------
  //
  // Merge rules are the MODEL a BPE training run exists to produce;
  // until round 11 they lived only as driver state inside one session
  // (the t103 IVF-PQ index made the same move a round earlier). The
  // saved form is a plain parquet relation — browsable, joinable,
  // versionable like any other table — and loading VALIDATES the
  // merge-apply contract before a single document is encoded, so a
  // truncated or hand-edited rule table fails loudly at load, not as
  // silently-wrong encodes.

  /** Persist a [[learnMerges]] output as a parquet rule table (tiny —
    * one row per rule — so one file). */
  def saveRules(rules: DataFrame, path: String): Unit =
    rules.orderBy(col("step")).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Load a persisted rule table and return the ordered (left, right)
    * list [[encode]] takes. Validation: non-empty, steps contiguous
    * from 1, merged = left || right, residual_pairs = 0 on every row
    * (the learn-time merge-apply contract, re-checked at load).
    */
  def loadRules(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select(col("step"), col("left"), col("right"), col("merged"),
        col("residual_pairs"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"empty BPE rule table at $path")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i + 1,
        s"rule steps not contiguous at $path: saw ${r.getInt(0)}, " +
        s"expected ${i + 1}")
      val (l, m) = (r.getString(1), r.getString(3))
      require(l != null && r.getString(2) != null && l.nonEmpty &&
        r.getString(2).nonEmpty, s"null/empty rule at step ${i + 1}")
      require(m == l + r.getString(2),
        s"merged != left||right at step ${i + 1} in $path")
      require(r.getLong(4) == 0L,
        s"residual_pairs != 0 at step ${i + 1} in $path — " +
        "not a completed learnMerges output")
    }
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
