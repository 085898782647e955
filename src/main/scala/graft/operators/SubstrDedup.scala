package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicated-substring detection at CHARACTER level — the
  * suffix-array complement of the hash-prefiltered span family
  * ([[TextDedup]] dup spans / span scrub work on k-TOKEN windows over
  * 48-bit digests; this operator answers the same "what text is
  * copied?" question with no tokenizer and no digest, so its output
  * is exact by construction, not exact-modulo-collisions).
  *
  * Contract (the ExactSubstr criterion of Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better"): a
  * character position is COVERED iff some length-`minLen` window
  * containing it occurs at ≥ 2 distinct (doc, offset) positions in
  * the corpus (cross-doc or self-repeat). Output: the per-document
  * MAXIMAL runs of covered window starts, merged wherever two
  * windows' coverage overlaps or touches — exactly the spans the
  * paper's suffix-array pass scrubs.
  *
  * Spark-first algorithm — PREFIX DOUBLING on rank classes instead
  * of a monolithic suffix array (Manber–Myers, restated relationally;
  * a single in-memory suffix array is the one thing a 100 TB corpus
  * cannot build):
  *
  *  1. seed: rank every `seedLen`-char window by its literal
  *     substring — the class id is the min-(doc, offset) struct over
  *     the window's occurrences: ONE shuffle on the (high-
  *     cardinality) key, no global sort, no driver state, and only
  *     class EQUALITY is consumed downstream so a representative is
  *     as good as a dense integer. Every level prunes to
  *     NON-SINGLETON classes in the same window pass (a duplicated
  *     longer window's every sub-window is duplicated — the
  *     ExactSubstr pruning rule), so on a mostly-unique corpus the
  *     position frame collapses at the seed and the joins above it
  *     run on the duplicated sliver only;
  *  2. double: while 2h ≤ minLen, rank length-2h windows by the PAIR
  *     (rank_h(o), rank_h(o+h)) — each round is one self-join keyed
  *     on (doc, offset) plus one fixed-width re-rank, so key width
  *     stays FIXED while window length doubles (the whole point:
  *     shuffle bytes are O(corpus · log minLen), never
  *     O(corpus · minLen) — grouping literal minLen-char windows
  *     would ship the corpus minLen× at minLen = 1000); sibling
  *     references to the same level are identical subplans, so
  *     Spark's exchange reuse computes each level once;
  *  3. cap: doubling stops as soon as ≤ 4 OVERLAPPING rank_h reads
  *     cover a minLen window — the final class is the tuple
  *     (rank_h(o), rank_h(o+s₁), …, rank_h(o + minLen − h)) with
  *     consecutive shift gaps ≤ h, and equal tuples ⇔ equal
  *     minLen-prefixes (the suffix-array sparse-table trick widened
  *     from 2 reads to 4). Any minLen works, not just powers of two,
  *     small minLen/seedLen ratios pay ZERO re-rank rounds, and the
  *     tuple is never ranked — one window count over it finds the
  *     duplicated classes;
  *  4. windows whose class occurs ≥ 2 times are covered; per-doc
  *     island merge (start ordered, break when the gap exceeds
  *     minLen) yields maximal spans. The merge window partitions by
  *     doc_id — high-cardinality key, spreads across the cluster.
  *
  * Fully LAZY — no checkpoints, no driver collects; the t269 fixture
  * adds its own localCheckpoint when sharing the result with the SQL
  * view. Levels are bounded by log₂(minLen/seedLen) + 1, each a
  * fixed number of linear shuffles; the dup-class count is
  * OUTPUT-bound exactly like [[TextDedup.prefixFilterPairs]] — a 10×
  * dup-heavy corpus grows covered rows ~10×, never quadratically,
  * because classes count positions, they do not pair them.
  *
  * Output: (doc_id-typed `idCol`, span_start, span_end, n_windows) —
  * span offsets are 0-based character positions, span_end exclusive,
  * n_windows the merged window-start count. Hash-exact against a
  * DuckDB replay that groups literal substrings (t269) — feasible for
  * the oracle at verify scale precisely because the oracle may ship
  * minLen-char keys where the engine must not.
  */
object SubstrDedup {

  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                      minLen: Int, seedLen: Int = 16): DataFrame = {
    require(seedLen >= 4, s"seedLen must be >= 4, got $seedLen")
    require(minLen >= seedLen,
      s"minLen ($minLen) must be >= seedLen ($seedLen)")
    val L = minLen.toLong
    // seed positions: EVERY o with o + seedLen <= n, not just final
    // window starts — higher levels read ranks at o + h as pairing
    // PARTNERS, so a final window at o needs seed ranks at offsets up
    // to o + minLen − seedLen. Each level then shrinks naturally: the
    // doubling join keeps o iff its partner exists (o + 2h <= n), and
    // the cap join keeps exactly the o + minLen <= n final windows.
    // (Filter BEFORE sequence — sequence(0, negative) counts down.)
    // Offsets are long from the start so downstream arithmetic is
    // 64-bit.
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .filter(length(col("t")) >= seedLen)
      .select(col("id"), col("t"),
        explode(sequence(lit(0L),
          length(col("t")).cast("long") - seedLen)).as("o"))
    // level seedLen: rank by the literal seed window — the ONLY level
    // that ships text bytes, and only seedLen of them per position
    var h = seedLen.toLong
    var ranked = rankBy(
      base.select(col("id"), col("o"),
        col("t").substr((col("o") + 1).cast("int"),
          lit(seedLen)).as("k")),
      keyNames = Seq("k"))
    // doubling levels: rank_2h(o) = rank of (rank_h(o), rank_h(o+h)).
    // Each level is one self-join + one re-rank — but a re-rank is
    // the expensive step (distinct + denseIds checkpoint + join
    // back), so stop doubling as soon as ≤ capWidth overlapping
    // rank_h reads can pin the full minLen prefix, and let the final
    // class be that TUPLE directly: (r_h(o), r_h(o+s₁), …,
    // r_h(o+L−h)) with consecutive shift gaps ≤ h covers [o, o+L)
    // exactly (the suffix-array sparse-table argument, widened from
    // 2 reads to capWidth). Large minLen still gets log₂ doubling
    // rounds; small minLen/seed ratios pay ZERO re-ranks.
    val capWidth = 4
    while (L > h * capWidth) {
      ranked = rankBy(pairAt(ranked, h), Seq("ka", "kb"))
      h = 2 * h
    }
    // cap shifts: multiples of h strictly inside (0, L−h), then L−h
    // itself — gaps ≤ h, so equal tuples ⇔ equal minLen-prefixes
    val shifts: Seq[Long] =
      if (h == L) Seq.empty
      else ((1 to ((L - h - 1) / h).toInt).map(_ * h) :+ (L - h)).distinct
    val keyNames = "k0" +: shifts.indices.map(i => s"k${i + 1}")
    var classes = ranked.select(col("id"), col("o"), col("r").as("k0"))
    shifts.zipWithIndex.foreach { case (s, i) =>
      val right = ranked.select(col("id").as("id2"), col("o").as("o2"),
        col("r").as(s"k${i + 1}"))
      classes = classes.join(right, col("id2") === col("id") &&
          col("o2") === col("o") + s)
        .drop("id2", "o2")
    }
    // dup classes: ONE window count over the class tuple (the keys
    // are high-cardinality — mostly singleton classes — so the
    // partitioning spreads); covered rows are the output-bound part
    val cw = Window.partitionBy(keyNames.map(col): _*)
    val covered = classes
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__n") >= 2)
      .select(col("id"), col("o"))
    // island merge: o ascending per doc; a window extends coverage
    // while its start is within minLen of the previous start
    // (overlap or touch); a larger gap starts a new span
    val w = Window.partitionBy(col("id")).orderBy(col("o"))
    covered
      .withColumn("__brk",
        when(col("o") - lag(col("o"), 1).over(w) > L, 1L)
          .otherwise(when(lag(col("o"), 1).over(w).isNull, 1L)
            .otherwise(0L)))
      .withColumn("__isl", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("o")).as("span_start"),
           (max(col("o")) + L).as("span_end"),
           count(lit(1)).as("n_windows"))
      .select(col("id").as("doc_id"), col("span_start"),
              col("span_end"), col("n_windows"))
  }

  /** (id, o, r) ⋈ shift → (id, o, ka = r(o), kb = r(o + shift)),
    * keeping only positions whose shifted partner exists (the right
    * half must be a full window of the same level).
    */
  private def pairAt(ranked: DataFrame, shift: Long): DataFrame = {
    val right = ranked.select(col("id").as("id2"),
      col("o").as("o2"), col("r").as("kb"))
    ranked.select(col("id"), col("o"), col("r").as("ka"))
      .join(right, col("id2") === col("id") &&
        col("o2") === col("o") + shift)
      .select(col("id"), col("o"), col("ka"), col("kb"))
  }

  /** Rank classes over `keyNames`: the class id is the MINIMUM
    * (id, o) struct among positions sharing the key — one window
    * shuffle on the (high-cardinality) key, no distinct, no join
    * back, no driver state, and lazy (an earlier denseIds form paid
    * a distinct + range-checkpoint + join-back per level — ~4
    * shuffles and an eager pin — for integer ids that nothing needs:
    * only class EQUALITY matters downstream, and min-of-struct is a
    * deterministic representative). Class width stays fixed at two
    * longs per level regardless of window length. Returns (id, o, r).
    */
  private def rankBy(pos: DataFrame, keyNames: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyNames.map(col): _*)
    // count rides the same window pass as the representative (one
    // shuffle); the filter is the DUP-HALVES pruning rule — a
    // duplicated longer window's every sub-window is duplicated, so
    // positions in singleton classes can never contribute to any
    // later level OR to a final covered window, and on a mostly-
    // unique corpus the frame collapses right here at the seed
    pos.select(col("id"), col("o"),
        min(struct(col("id"), col("o"))).over(w).as("r"),
        count(lit(1)).over(w).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("id"), col("o"), col("r"))
  }
}
