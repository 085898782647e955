package graft

/** Textual BigQuery→Spark SQL translation for the dialect subset the
  * reference actually uses (SURVEY §1.4; VERDICT r3 "missing #2").
  * The reference drives everything by SQL text, and four of its
  * constructs don't parse in Spark:
  *
  *  1. backtick-quoted project-qualified names
  *     (btcolap.sql:109 `bigquery-public-data.crypto_bitcoin.transactions`)
  *     → the last path component, as a plain view name;
  *  2. `arr[OFFSET(n)]` / `arr[ORDINAL(n)]` (btcolap.sql:230)
  *     → Spark's 0-based `arr[n]` / `arr[n - 1]`;
  *  3. `ARRAY_AGG(expr IGNORE NULLS)` (btcolap.sql:226-227) → the
  *     `IGNORE NULLS` token is dropped inside ARRAY_AGG calls only —
  *     Spark's array_agg/collect_list drops NULLs by construction,
  *     which IS BigQuery's IGNORE NULLS semantics (window-function
  *     IGNORE NULLS, e.g. in lead/lag, is left untouched: Spark
  *     supports it natively);
  *  4. comma-lateral FROM segments — both the explicit
  *     `, UNNEST(x.arr) AS a` and the implicit array-field form
  *     `, tx.inputs AS input` (btcolap.sql:109-111) → chained
  *     `LATERAL VIEW explode(...)` clauses. Spark's grammar attaches
  *     LATERAL VIEWs after ALL join relations of the FROM clause, so
  *     the rewriter hoists any JOIN text trailing a lateral segment
  *     ahead of the generated views (the views may reference earlier
  *     view aliases; the JOINs, by BigQuery scoping, cannot reference
  *     laterals that follow them in text — and could not in Spark
  *     either).
  *
  * This is a deliberately SCOPED translator — a token scanner with
  * paren tracking, not a SQL parser: enough for every query in the
  * reference corpus (spec-pinned pattern by pattern), not a general
  * BigQuery front end. Quoted strings are never rewritten.
  */
object BigQueryDialect {

  def translate(sql: String): String =
    rewriteLaterals(rewriteArrayAggIgnoreNulls(
      rewriteOffsets(rewriteBackticks(sql))))

  // ── 1. backticked paths ────────────────────────────────────────────

  private val Backticked = "`([^`]+)`".r

  private[graft] def rewriteBackticks(sql: String): String =
    Backticked.replaceAllIn(sql, m => {
      val inner = m.group(1)
      val last = inner.substring(inner.lastIndexOf('.') + 1)
      java.util.regex.Matcher.quoteReplacement(s"`$last`")
    })

  // ── 2. OFFSET / ORDINAL subscripts ────────────────────────────────

  private val Offset = """\[\s*OFFSET\s*\(([^)\]]+)\)\s*\]""".r
  private val Ordinal = """\[\s*ORDINAL\s*\(([^)\]]+)\)\s*\]""".r

  private[graft] def rewriteOffsets(sql: String): String =
    Ordinal.replaceAllIn(
      Offset.replaceAllIn(sql,
        m => java.util.regex.Matcher.quoteReplacement(s"[${m.group(1).trim}]")),
      m => java.util.regex.Matcher.quoteReplacement(s"[(${m.group(1).trim}) - 1]"))

  // ── shared scanning helpers (string-literal + paren aware) ────────

  /** Index just past the close paren matching the open paren at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  private def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Does a whole-word, case-insensitive match of `word` start at i? */
  private def wordAt(s: String, i: Int, word: String): Boolean =
    s.regionMatches(true, i, word, 0, word.length) &&
      (i == 0 || !isWordChar(s.charAt(i - 1))) &&
      (i + word.length >= s.length || !isWordChar(s.charAt(i + word.length)))

  // ── 3. ARRAY_AGG(... IGNORE NULLS) ────────────────────────────────

  private[graft] def rewriteArrayAggIgnoreNulls(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (wordAt(sql, i, "ARRAY_AGG")) {
        val open = sql.indexOf('(', i + "ARRAY_AGG".length)
        if (open >= 0 && sql.substring(i + "ARRAY_AGG".length, open).trim.isEmpty) {
          val end = matchParen(sql, open)
          val call = sql.substring(i, end)
          out.append(call.replaceAll("(?i)\\s+IGNORE\\s+NULLS", ""))
          i = end
        } else { out.append(sql.charAt(i)); i += 1 }
      } else if (sql.charAt(i) == '\'') {
        val close = sql.indexOf('\'', i + 1)
        val stop = if (close < 0) sql.length else close + 1
        out.append(sql.substring(i, stop)); i = stop
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  // ── 4. comma-lateral FROM segments ────────────────────────────────

  private val clauseEnders =
    Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "WINDOW", "UNION",
        "INTERSECT", "EXCEPT", "QUALIFY")
  private val joinStarters =
    Seq("JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS")

  /** `UNNEST(expr) [AS] alias` — expr extracted with balanced parens. */
  private def parseUnnest(seg: String): Option[(String, String, String)] = {
    val t = seg.dropWhile(_.isWhitespace)
    if (!wordAt(t, 0, "UNNEST")) return None
    val open = t.indexOf('(')
    if (open < 0) return None
    val end = matchParen(t, open)
    val expr = t.substring(open + 1, end - 1)
    parseAlias(t.substring(end)).map { case (a, rest) => (expr, a, rest) }
  }

  /** `ident(.ident)+ [AS] alias` — the implicit correlated-array form. */
  private val PathSeg =
    """(?s)^\s*([A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)+)\s+(?:(?i:AS)\s+)?([A-Za-z_][\w]*)\s*(.*)$""".r

  private def parseAlias(s: String): Option[(String, String)] = {
    val m = """(?s)^\s*(?:(?i:AS)\s+)?([A-Za-z_][\w]*)\s*(.*)$""".r
    s match {
      case m(alias, rest) => Some((alias, rest))
      case _ => None
    }
  }

  private[graft] def rewriteLaterals(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var viewN = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val close = sql.indexOf('\'', i + 1)
        val stop = if (close < 0) sql.length else close + 1
        out.append(sql.substring(i, stop)); i = stop
      } else if (wordAt(sql, i, "FROM")) {
        // FROM region: up to the next top-level clause keyword or
        // unbalanced close paren (subquery end)
        var j = i + 4
        var depth = 0
        var end = sql.length
        var found = false
        while (j < sql.length && !found) {
          val c = sql.charAt(j)
          if (c == '\'') { j = matchQuote(sql, j) }
          else if (c == '(') { depth += 1; j += 1 }
          else if (c == ')') {
            if (depth == 0) { end = j; found = true } else { depth -= 1; j += 1 }
          } else if (depth == 0 && clauseEnders.exists(wordAt(sql, j, _))) {
            end = j; found = true
          } else j += 1
        }
        // recurse first: subqueries inside this region carry their own
        // FROM clauses (each recursion strips one nesting level)
        val region = rewriteLaterals(sql.substring(i + 4, end))
        out.append("FROM")
        out.append(rewriteFromRegion(region, () => { viewN += 1; viewN }))
        i = end
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def matchQuote(s: String, at: Int): Int = {
    val close = s.indexOf('\'', at + 1)
    if (close < 0) s.length else close + 1
  }

  /** Split the FROM region on top-level commas, convert lateral
    * segments, and re-emit as base + hoisted JOIN text + LATERAL VIEWs.
    */
  private def rewriteFromRegion(region: String, nextId: () => Int): String = {
    // top-level comma split (paren + quote aware)
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < region.length) {
      region.charAt(i) match {
        case '\'' => i = matchQuote(region, i) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          segs += region.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    segs += region.substring(start)
    if (segs.length == 1) return region

    /** Split a segment into (relation part, trailing JOIN text). */
    def splitJoin(seg: String): (String, String) = {
      var d = 0
      var k = 0
      while (k < seg.length) {
        seg.charAt(k) match {
          case '\'' => k = matchQuote(seg, k) - 1
          case '(' => d += 1
          case ')' => d -= 1
          case _ if d == 0 && joinStarters.exists(wordAt(seg, k, _)) =>
            return (seg.substring(0, k), seg.substring(k))
          case _ =>
        }
        k += 1
      }
      (seg, "")
    }

    val (base, baseJoins) = splitJoin(segs.head)
    val joins = new StringBuilder(baseJoins)
    val laterals = new StringBuilder
    val rest = new StringBuilder
    var rewrote = false
    segs.drop(1).foreach { seg =>
      val (rel, joinText) = splitJoin(seg)
      if (joinText.nonEmpty) joins.append(' ').append(joinText)
      parseUnnest(rel) match {
        case Some((expr, alias, tail)) =>
          rewrote = true
          laterals.append(
            s" LATERAL VIEW explode($expr) __uv${nextId()} AS $alias")
          rest.append(tail)
        case None => rel match {
          case PathSeg(path, alias, tail) =>
            rewrote = true
            laterals.append(
              s" LATERAL VIEW explode($path) __uv${nextId()} AS $alias")
            rest.append(tail)
          case _ =>
            // genuine cross-join segment: keep it a comma relation
            rest.append(", ").append(rel)
        }
      }
    }
    if (!rewrote) region
    else s"$base${rest.toString} ${joins.toString}${laterals.toString} "
  }
}
