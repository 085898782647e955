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
  *     top-level `IGNORE NULLS` token of the ARRAY_AGG call is dropped
  *     — Spark's array_agg/collect_list drops NULLs by construction,
  *     which IS BigQuery's IGNORE NULLS semantics. Window-function
  *     IGNORE NULLS (e.g. in lead/lag — including one NESTED inside an
  *     ARRAY_AGG argument) is left untouched: Spark supports it
  *     natively, and the scanner only strips the token at the call's
  *     own nesting depth;
  *  4. comma-lateral FROM segments — both the explicit
  *     `, UNNEST(x.arr) AS a` and the implicit array-field form
  *     `, tx.inputs AS input` (btcolap.sql:109-111) → chained
  *     `LATERAL VIEW explode(...)` clauses. A dotted segment only
  *     counts as an implicit lateral when its FIRST path component is
  *     an alias introduced earlier in the same FROM clause (BigQuery's
  *     own scoping rule) — `dataset.table t` comma segments stay plain
  *     cross joins. Spark's grammar attaches LATERAL VIEWs after ALL
  *     join relations of the FROM clause, so the rewriter hoists any
  *     JOIN text trailing a lateral segment ahead of the generated
  *     views; subqueries are handled by recursion.
  *
  * String literals — single- or double-quoted, with backslash escapes
  * — are never rewritten: every pass either maps only the text between
  * literals or scans with a literal-aware cursor.
  *
  * This is a deliberately SCOPED translator — a token scanner with
  * paren tracking, not a SQL parser: enough for every query in the
  * reference corpus (spec-pinned pattern by pattern), not a general
  * BigQuery front end.
  */
object BigQueryDialect {

  def translate(sql: String): String =
    rewriteLaterals(rewriteArrayAggIgnoreNulls(
      rewriteOffsets(rewriteBackticks(sql))))

  // ── string-literal infrastructure ─────────────────────────────────

  private def isQuote(c: Char) = c == '\'' || c == '"'

  /** Index just past the end of the string literal starting at `at`
    * (which must hold a quote char). Backslash escapes the next char.
    */
  private def literalEnd(s: String, at: Int): Int = {
    val q = s.charAt(at)
    var i = at + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == q) return i + 1
      else i += 1
    }
    s.length
  }

  /** If position `i` starts an opaque span — string literal, `--` line
    * comment, or backtick-quoted identifier — return the index just
    * past its end; otherwise -1. Opaque spans are never scanned for
    * syntax: an apostrophe inside a comment or a paren inside a
    * backticked name must not desync the cursors.
    */
  private def opaqueEnd(s: String, i: Int): Int = {
    val c = s.charAt(i)
    if (isQuote(c)) literalEnd(s, i)
    else if (c == '`') {
      val close = s.indexOf('`', i + 1)
      if (close < 0) s.length else close + 1
    } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
      val nl = s.indexOf('\n', i)
      if (nl < 0) s.length else nl + 1
    } else -1
  }

  /** Apply `f` to every maximal run of text OUTSIDE string literals and
    * comments, passing those through verbatim. Backtick-quoted
    * identifiers stay INSIDE the mapped chunks (rewriteBackticks needs
    * to see them) but are skipped atomically, so quotes within them
    * don't open phantom literals.
    */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    var i = 0
    var chunk = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '`') i = opaqueEnd(sql, i) // stays part of the chunk
      else {
        val stop = opaqueEnd(sql, i)
        if (stop >= 0) {
          out.append(f(sql.substring(chunk, i)))
          out.append(sql.substring(i, stop))
          i = stop
          chunk = i
        } else i += 1
      }
    }
    out.append(f(sql.substring(chunk)))
    out.toString
  }

  /** Index just past the close paren matching the open paren at `open`,
    * literal/comment/backtick-aware.
    */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val stop = opaqueEnd(s, i)
      if (stop >= 0) i = stop
      else {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') {
          depth -= 1
          if (depth == 0) return i + 1
        }
        i += 1
      }
    }
    s.length
  }

  private def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Does a whole-word, case-insensitive match of `word` start at i? */
  private def wordAt(s: String, i: Int, word: String): Boolean =
    s.regionMatches(true, i, word, 0, word.length) &&
      (i == 0 || !isWordChar(s.charAt(i - 1))) &&
      (i + word.length >= s.length || !isWordChar(s.charAt(i + word.length)))

  // ── 1. backticked paths ────────────────────────────────────────────

  private val Backticked = "`([^`]+)`".r

  private[graft] def rewriteBackticks(sql: String): String =
    mapOutsideLiterals(sql)(Backticked.replaceAllIn(_, m => {
      val inner = m.group(1)
      val last = inner.substring(inner.lastIndexOf('.') + 1)
      java.util.regex.Matcher.quoteReplacement(s"`$last`")
    }))

  // ── 2. OFFSET / ORDINAL subscripts ────────────────────────────────

  private val Offset = """\[\s*OFFSET\s*\(([^)\]]+)\)\s*\]""".r
  private val Ordinal = """\[\s*ORDINAL\s*\(([^)\]]+)\)\s*\]""".r

  private[graft] def rewriteOffsets(sql: String): String =
    mapOutsideLiterals(sql) { chunk =>
      Ordinal.replaceAllIn(
        Offset.replaceAllIn(chunk,
          m => java.util.regex.Matcher.quoteReplacement(s"[${m.group(1).trim}]")),
        m => java.util.regex.Matcher.quoteReplacement(s"[(${m.group(1).trim}) - 1]"))
    }

  // ── 3. ARRAY_AGG(... IGNORE NULLS) ────────────────────────────────

  /** Remove ` IGNORE NULLS` occurring at the CALL's own depth (depth 1
    * relative to its open paren), outside literals — nested calls keep
    * theirs.
    */
  private def stripTopLevelIgnoreNulls(call: String): String = {
    val out = new StringBuilder
    var depth = 0
    var i = 0
    while (i < call.length) {
      val c = call.charAt(i)
      val stop = opaqueEnd(call, i)
      if (stop >= 0) {
        out.append(call.substring(i, stop)); i = stop
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') { depth -= 1; out.append(c); i += 1 }
      else if (depth == 1 && wordAt(call, i, "IGNORE")) {
        val m = """(?s)^IGNORE\s+NULLS""".r.findFirstIn(call.substring(i))
        m match {
          // a window function's IGNORE NULLS also sits at depth 1
          // (between lead(x) and OVER) — the OVER lookahead keeps it
          case Some(tok) if !isFollowedByOver(call, i + tok.length) =>
            // drop the token plus the whitespace that preceded it
            while (out.nonEmpty && out.last.isWhitespace)
              out.setLength(out.length - 1)
            i += tok.length
          case _ => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def isFollowedByOver(s: String, from: Int): Boolean = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    wordAt(s, i, "OVER")
  }

  private[graft] def rewriteArrayAggIgnoreNulls(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      val stop0 = opaqueEnd(sql, i)
      if (stop0 >= 0) {
        out.append(sql.substring(i, stop0)); i = stop0
      } else if (wordAt(sql, i, "ARRAY_AGG")) {
        val open = sql.indexOf('(', i + "ARRAY_AGG".length)
        if (open >= 0 && sql.substring(i + "ARRAY_AGG".length, open).trim.isEmpty) {
          val end = matchParen(sql, open)
          out.append(stripTopLevelIgnoreNulls(sql.substring(i, end)))
          i = end
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
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

  /** Trailing alias of a plain relation segment: `tbl`, `tbl a`,
    * `tbl AS a`, `` `tbl` AS a `` — the identifier the correlated form
    * would reference.
    */
  private val RelAlias =
    """(?s)^.*?([A-Za-z_][\w]*)\s*$""".r

  /** Backticked relation with NO explicit alias — BigQuery treats the
    * last path component as the implicit referenceable alias.
    */
  private val BacktickedRel =
    """(?s)^.*`([^`]+)`\s*$""".r

  private def aliasOf(rel: String): Option[String] = {
    val t = rel.trim
    // a parenthesized subquery with no explicit alias introduces no
    // referenceable alias — matching RelAlias against its body would
    // learn a phantom name from the subquery's own text
    if (t.endsWith(")")) None
    else t match {
      case RelAlias(a) => Some(a)
      case BacktickedRel(inner) =>
        Some(inner.substring(inner.lastIndexOf('.') + 1))
      case _ => None
    }
  }

  /** Remove `--` line comments (outside string literals), keeping the
    * terminating newline so tokens don't glue together. Used on FROM
    * regions that are being rewritten — alias/segment parsing must not
    * read comment prose as SQL.
    */
  private def stripLineComments(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isQuote(c) || c == '`') {
        val stop = opaqueEnd(s, i)
        out.append(s.substring(i, stop)); i = stop
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) s.length else nl // keep the newline itself
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Aliases introduced by the JOIN clauses of `joinText` — each
    * `JOIN rel [AS] alias` (alias falling back to the relation's last
    * name component; none for a subquery join without one) is
    * referenceable by later comma segments. A small scanner, not a
    * regex: handles `JOIN (subquery) s`, `USING (...)` (which is NOT
    * an alias), and ignores words merely ending in "join".
    */
  private def joinAliases(joinText: String): Seq[String] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < joinText.length) {
      val stop = opaqueEnd(joinText, i)
      if (stop >= 0) i = stop
      else if (wordAt(joinText, i, "JOIN")) {
        var j = i + 4
        while (j < joinText.length && joinText.charAt(j).isWhitespace) j += 1
        // relation: parenthesized subquery, backticked path, or dotted name
        var relLast: Option[String] = None
        if (j < joinText.length && joinText.charAt(j) == '(') {
          j = matchParen(joinText, j)
        } else {
          val start = j
          while (j < joinText.length &&
                 (isWordChar(joinText.charAt(j)) ||
                  joinText.charAt(j) == '.' || joinText.charAt(j) == '`')) j += 1
          val rel = joinText.substring(start, j)
            .replace("`", "")
          if (rel.nonEmpty)
            relLast = Some(rel.substring(rel.lastIndexOf('.') + 1))
        }
        // optional [AS] alias — but ON/USING/join-keywords end the relation
        var k = j
        while (k < joinText.length && joinText.charAt(k).isWhitespace) k += 1
        if (wordAt(joinText, k, "AS")) {
          k += 2
          while (k < joinText.length && joinText.charAt(k).isWhitespace) k += 1
        }
        val aStart = k
        while (k < joinText.length && isWordChar(joinText.charAt(k))) k += 1
        val word = joinText.substring(aStart, k)
        val isKeyword = Seq("ON", "USING", "JOIN", "INNER", "LEFT", "RIGHT",
          "FULL", "CROSS", "LATERAL", "WHERE").exists(_.equalsIgnoreCase(word))
        if (word.nonEmpty && !isKeyword && word.headOption.exists(ch =>
              ch.isLetter || ch == '_')) found += word
        else relLast.foreach(found += _)
        i = j
      } else i += 1
    }
    found.toSeq
  }

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
      val c = sql.charAt(i)
      val stop0 = opaqueEnd(sql, i)
      if (stop0 >= 0) {
        out.append(sql.substring(i, stop0)); i = stop0
      } else if (wordAt(sql, i, "FROM")) {
        // FROM region: up to the next top-level clause keyword or
        // unbalanced close paren (subquery end)
        var j = i + 4
        var depth = 0
        var end = sql.length
        var found = false
        while (j < sql.length && !found) {
          val ch = sql.charAt(j)
          val os = opaqueEnd(sql, j)
          if (os >= 0) { j = os }
          else if (ch == '(') { depth += 1; j += 1 }
          else if (ch == ')') {
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
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Split the FROM region on top-level commas, convert lateral
    * segments, and re-emit as base + hoisted JOIN text + LATERAL VIEWs.
    */
  private def rewriteFromRegion(region: String, nextId: () => Int): String = {
    // top-level comma split (paren + literal aware)
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < region.length) {
      val c = region.charAt(i)
      val stop = opaqueEnd(region, i)
      if (stop >= 0) i = stop
      else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) {
          segs += region.substring(start, i); start = i + 1
        }
        i += 1
      }
    }
    segs += region.substring(start)
    if (segs.length == 1) return region
    // a region being rewritten drops its -- comments: alias and
    // segment parsing below must not read comment prose as SQL, and
    // re-emitting segments out of order would misattach them anyway
    if (region.contains("--")) {
      val stripped = stripLineComments(region)
      if (stripped != region)
        return rewriteFromRegion(stripped, nextId)
    }

    /** Split a segment into (relation part, trailing JOIN text). */
    def splitJoin(seg: String): (String, String) = {
      var d = 0
      var k = 0
      while (k < seg.length) {
        val c = seg.charAt(k)
        val stop = opaqueEnd(seg, k)
        if (stop >= 0) k = stop
        else {
          if (c == '(') d += 1
          else if (c == ')') d -= 1
          else if (d == 0 && joinStarters.exists(wordAt(seg, k, _)))
            return (seg.substring(0, k), seg.substring(k))
          k += 1
        }
      }
      (seg, "")
    }

    /** Bare identifiers in `s` (outside literals/backticks) that are
      * not field accesses (not preceded by `.`), lowercased.
      */
    def bareIdents(s: String): Set[String] = {
      val found = scala.collection.mutable.Set.empty[String]
      var k = 0
      var prev = ' '
      while (k < s.length) {
        val stop = opaqueEnd(s, k)
        if (stop >= 0) { prev = s.charAt(stop - 1); k = stop }
        else {
          val c = s.charAt(k)
          if ((c.isLetter || c == '_') && !isWordChar(prev) && prev != '.') {
            val st = k
            while (k < s.length && isWordChar(s.charAt(k))) k += 1
            found += s.substring(st, k).toLowerCase
            prev = s.charAt(k - 1)
          } else { prev = c; k += 1 }
        }
      }
      found.toSet
    }

    val (base, baseJoins) = splitJoin(segs.head)
    // aliases visible to later correlated segments (case-insensitive,
    // as in BigQuery): the base relation's, each JOIN's (explicit or
    // the relation's implicit last-component alias), each earlier
    // comma relation's, and each earlier lateral's
    val known = scala.collection.mutable.Set.empty[String]
    val lateralAliases = scala.collection.mutable.Set.empty[String]
    def learn(a: String): Unit = { known += a.toLowerCase; () }
    aliasOf(base).foreach(learn)
    joinAliases(baseJoins).foreach(learn)
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
          learn(alias)
          lateralAliases += alias.toLowerCase
          laterals.append(
            s" LATERAL VIEW explode($expr) __uv${nextId()} AS $alias")
          rest.append(tail)
        case None => rel match {
          case PathSeg(path, alias, tail)
              if known.contains(path.takeWhile(_ != '.').toLowerCase) =>
            // correlated array field: first component is a FROM alias
            rewrote = true
            learn(alias)
            lateralAliases += alias.toLowerCase
            laterals.append(
              s" LATERAL VIEW explode($path) __uv${nextId()} AS $alias")
            rest.append(tail)
          case _ =>
            // genuine relation (e.g. dataset.table t): keep the comma
            aliasOf(rel).foreach(learn)
            rest.append(", ").append(rel)
        }
      }
      // join aliases become visible only AFTER this segment (the join
      // text trails the relation; BigQuery scoping is left-to-right)
      if (joinText.nonEmpty) joinAliases(joinText).foreach(learn)
    }
    if (!rewrote) region
    else {
      // hoisted JOIN text runs BEFORE the LATERAL VIEWs in the emitted
      // SQL, so an ON clause referencing a lateral alias (legal in
      // BigQuery: FROM t, UNNEST(t.arr) x JOIN u ON u.k = x.k) would
      // fail resolution with an opaque error — reject it clearly
      val clash = bareIdents(joins.toString).intersect(lateralAliases)
      if (clash.nonEmpty)
        throw new IllegalArgumentException(
          "unsupported BigQuery construct: JOIN text references lateral " +
          s"alias(es) ${clash.toSeq.sorted.mkString(", ")} — a JOIN whose " +
          "ON clause uses an UNNEST alias cannot be hoisted ahead of the " +
          "LATERAL VIEW; rewrite the join as a comma/CROSS JOIN segment " +
          "before the UNNEST, or filter in WHERE instead")
      s"$base${rest.toString} ${joins.toString}${laterals.toString} "
    }
  }
}
