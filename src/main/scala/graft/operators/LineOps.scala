package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level curation operators — the C4 / RefinedWeb cleanup stage
  * that runs BETWEEN raw ingest and document-level dedup: drop
  * low-quality lines inside each document, then drop lines that repeat
  * across too many documents (navigation chrome, boilerplate, cookie
  * banners), reassembling the surviving text in original order.
  *
  * The reference's corpus (like the synthetic test corpus) stores text
  * as a single whitespace-run token stream with no newlines, so "line"
  * here is a deterministic pseudo-line: consecutive windows of
  * `lineLen` tokens. The operator shapes — per-line predicates, a
  * corpus-wide line-frequency pass, order-preserving reassembly — are
  * exactly what a newline-delimited corpus needs; only the splitter
  * differs (and [[lineArray]] is the single place to swap it).
  *
  * Scale notes:
  *  - [[c4LineFilter]] is pure per-row expression work (split,
  *    higher-order filter, re-join) — one scan, no shuffle, any corpus
  *    size.
  *  - [[crossDocLineDedup]] counts line frequency on 8-byte xxhash64
  *    keys (map-side combined), so the corpus-wide shuffle never
  *    carries line text; only the tiny bucket of lines whose HASH is
  *    over-represented re-checks by string, and the final removal is a
  *    broadcast anti-join against that verified set.
  */
object LineOps {

  /** Deterministic pseudo-lines: consecutive `lineLen`-token windows
    * over the whitespace-run token stream (empty tokens from padded
    * whitespace excluded). The last line holds the 1..lineLen-token
    * remainder; an empty/blank document yields an empty array.
    */
  def lineArray(text: Column, lineLen: Int): Column = {
    require(lineLen > 0, s"lineLen must be positive, got $lineLen")
    val toks = filter(split(text, "\\s+"), t => t =!= lit(""))
    val nLines = ceil(size(toks).cast("double") / lineLen).cast("int")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(toks, i * lineLen + 1, lit(lineLen)), " ")))
  }

  /** C4-style line filtering (Raffel et al. 2020 §2.2 shape): keep a
    * line only if it has at least `minWords` words AND ends in a
    * "terminal" word (the newline corpus's terminal-punctuation rule,
    * re-expressed over the synthetic vocabulary); keep a document only
    * if at least `minKeptLines` lines survive.
    *
    * Output: (id, n_lines, n_kept, doc_kept, clean_text) — one row per
    * input document, clean_text the surviving lines in original order
    * ('' when none survive).
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   lineLen: Int, minWords: Int, terminals: Seq[String],
                   minKeptLines: Int): DataFrame = {
    require(terminals.nonEmpty, "terminals must be non-empty")
    val lines = lineArray(col(textCol), lineLen)
    val keep = (l: Column) => {
      val words = split(l, " ")
      size(words) >= minWords &&
        element_at(words, -1).isin(terminals: _*)
    }
    val kept = filter(lines, keep)
    // per-row line splitting/filtering is the whole cost — spread an
    // unsplittable-small scan across the cores first (identity at scale)
    graft.util.Spread.ifTinyScanTo(df, 8).select(col(idCol),
        size(lines).as("n_lines"),
        size(kept).as("n_kept"),
        (size(kept) >= minKeptLines).as("doc_kept"),
        array_join(kept, " ").as("clean_text"))
  }

  /** Within-document line deduplication: keep the FIRST occurrence of
    * each distinct line inside a document, preserving order — the
    * intra-doc cleanup for repeated boilerplate blocks (headers
    * re-inserted by extraction, pagination echoes) that is cheaper
    * than, and runs before, the corpus-wide [[crossDocLineDedup]].
    * `array_distinct` keeps first-occurrence order by contract, so the
    * whole operator is one per-row expression — no shuffle, any corpus
    * size.
    *
    * Output: (id, n_lines, n_unique, clean_text).
    */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String, textCol: String,
                          lineLen: Int): DataFrame = {
    val lines = lineArray(col(textCol), lineLen)
    val uniq = array_distinct(lines)
    // same spread rationale as [[c4LineFilter]]
    graft.util.Spread.ifTinyScanTo(df, 8).select(col(idCol),
      size(lines).as("n_lines"),
      size(uniq).as("n_unique"),
      array_join(uniq, " ").as("clean_text"))
  }

  /** Cross-document line deduplication (RefinedWeb / CCNet shape):
    * remove every line that occurs in more than `maxDocs` distinct
    * documents — corpus-wide boilerplate — and reassemble each
    * document from its surviving lines in original order.
    *
    * Three-stage scale shape:
    *  1. line frequency on xxhash64(line) — the only corpus-wide
    *     shuffle, 8 bytes + id per line, map-side combined;
    *  2. string-level verify restricted to lines whose hash crossed
    *     the threshold (hash collisions can only ADD candidates here,
    *     never drop a line, so the verdict is exact);
    *  3. broadcast anti-join of the verified boilerplate set, then an
    *     order-preserving per-document regroup.
    *
    * Output: (id, n_lines, n_kept, clean_text) — one row per input
    * document, '' when every line was boilerplate.
    */
  def crossDocLineDedup(df: DataFrame, idCol: String, textCol: String,
                        lineLen: Int, maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    // line explode + hashing and the final regroup are map work on the
    // scan's partitioning — spread an unsplittable-small scan first
    // (identity at scale)
    val spreadDf = graft.util.Spread.ifTinyScanTo(df, 8)
    val lines = spreadDf
      .select(col(idCol),
        posexplode(lineArray(col(textCol), lineLen)).as(Seq("line_no", "line")))
      .withColumn("h", xxhash64(col("line")))

    // stage 1: 8-byte frequency pass — which HASHES span too many docs
    val dupHash = lines.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") > maxDocs)
      .select(col("h"))

    // stage 2: exact string verify, only candidate lines carry text
    val dupLines = lines.join(dupHash, Seq("h"), "left_semi")
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") > maxDocs)
      .select(col("line"))

    // stage 3: drop the verified boilerplate, regroup per document in
    // original line order; left join keeps fully-boilerplate documents
    val kept = lines.join(broadcast(dupLines), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line")), " ").as("clean_text"))

    spreadDf.select(col(idCol),
        size(lineArray(col(textCol), lineLen)).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
