package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting.
  *
  * Each expression's kernel lives as a static method on [[TextKernels]]
  * (a standalone Scala object → JVM static forwarders), and `doGenCode`
  * emits a plain static call: the heavy loop runs as compiled JVM code
  * either way, and the expression participates in whole-stage codegen
  * instead of breaking the span the way CodegenFallback does (fallback
  * forces the surrounding operators into interpreted per-row eval with
  * boxing at every boundary).
  */
object TextKernels {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Kernel for [[NfcNormalizeExpr]]: Unicode NFC composition via
    * `java.text.Normalizer` (the JDK's ICU-derived implementation —
    * same canonical composition tables as utf8proc, so a DuckDB
    * `nfc_normalize` oracle replays it exactly). Fast path: NFC
    * quick-check on the already-normalized common case (ASCII and
    * composed text) avoids the String round-trip entirely.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Kernel for [[BpeishTokenCount]]: one pass over the UTF-8 bytes.
    * States track whether the previous byte extended an ASCII letter
    * or digit run; every other non-whitespace code point counts at its
    * first byte (UTF-8 continuation bytes 0x80-0xBF are skipped, so a
    * multi-byte glyph counts exactly once).
    */
  def bpeishCount(text: UTF8String): Int = {
    val n = text.numBytes
    var i = 0
    var count = 0
    var state = 0 // 0 = none, 1 = in letter run, 2 = in digit run
    while (i < n) {
      val b = text.getByte(i) & 0xff
      if (b < 0x80) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (state != 1) { count += 1; state = 1 }
        } else if (b >= '0' && b <= '9') {
          if (state != 2) { count += 1; state = 2 }
        } else {
          state = 0
          // Java regex \s (no UNICODE flag) = space + 0x09..0x0D
          if (!(b == ' ' || (b >= 0x09 && b <= 0x0d))) count += 1
        }
      } else {
        state = 0
        if (b >= 0xc0) count += 1 // lead byte of a multi-byte code point
      }
      i += 1
    }
    count
  }

  /** Kernel for [[CollapseRunsExpr]]: one tokenizing pass computing
    * (n_tokens, n_after, max_run, clean_text) under the corpus
    * whitespace contract (`\s+` split, limit -1 — identical token
    * boundaries to `split(text, "\\s+")`, including the empty edge
    * tokens padded/leading whitespace produces).
    */
  def collapseRuns(text: UTF8String): GenericInternalRow = {
    val toks = ws.split(text.toString, -1)
    val n = toks.length
    val sb = new java.lang.StringBuilder
    var nAfter = 0
    var maxRun = 0
    var run = 0
    var prev: String = null
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (prev != null && t == prev) run += 1
      else {
        run = 1
        if (nAfter > 0) sb.append(' ')
        sb.append(t)
        nAfter += 1
      }
      if (run > maxRun) maxRun = run
      prev = t
      i += 1
    }
    new GenericInternalRow(Array[Any](n, nAfter, maxRun,
      UTF8String.fromString(sb.toString)))
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Kernel for [[WinnowingFps]]: char-k-gram 48-bit md5 digests (the
    * portableDigest convention — first 6 md5 bytes of the gram's UTF-8
    * bytes, so DuckDB replays every value), w-window minima over FULL
    * windows (one whole-array window when fewer grams than w; one
    * whole-text gram when fewer than k codepoints), SORTED DISTINCT
    * output. One byte-walk per row, one reused MessageDigest, zero
    * per-gram string allocation — the composable form (nested
    * transform lambdas, one md5/substr expression tree per gram) ran
    * interpreted and cost ~2 ms/doc; this is the same interpreted-
    * lambda trap [[hashedShingles]] exists for.
    */
  def winnowingFps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    // codepoint-start byte offsets (UTF-8 continuation bytes are
    // 10xxxxxx) — gram windows index CODEPOINTS, matching Spark
    // length()/substr() and DuckDB length()/substr()
    val starts = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { starts(ci) = bi; ci += 1 }
      bi += 1
    }
    starts(n) = bytes.length
    val md = md5Local.get()
    def digest(off: Int, len: Int): Long = {
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }
    val nGrams = if (n < k) 1 else n - k + 1
    val grams = new Array[Long](nGrams)
    if (n < k) grams(0) = digest(0, bytes.length)
    else {
      var i = 0
      while (i < nGrams) {
        grams(i) = digest(starts(i), starts(i + k) - starts(i))
        i += 1
      }
    }
    val nWin = math.max(nGrams - w + 1, 1)
    val mins = new Array[Long](nWin)
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      var t = j + 1
      val end = math.min(j + w, nGrams)
      while (t < end) { if (grams(t) < m) m = grams(t); t += 1 }
      mins(j) = m
      j += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    var p = 1
    while (p < nWin) {
      if (mins(p) != mins(p - 1)) { mins(out) = mins(p); out += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  /** Kernel for [[HashedShingles]]: sorted distinct xxhash64 (seed 42)
    * of the lowercased word k-shingles of `text`.
    */
  def hashedShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    val bytes = new Array[Array[Byte]](toks.length)
    var i = 0
    var maxWindow = 0
    while (i < toks.length) {
      bytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val n = toks.length
    val eff = if (n < k) n else k // short text → one whole-text shingle
    val count = if (n < k) 1 else n - k + 1
    i = 0
    while (i < count) {
      var len = eff - 1 // separator spaces
      var j = 0
      while (j < eff) { len += bytes(i + j).length; j += 1 }
      if (len > maxWindow) maxWindow = len
      i += 1
    }
    val scratch = new Array[Byte](math.max(maxWindow, 1))
    val hashes = new Array[Long](count)
    i = 0
    while (i < count) {
      val pos = joinWindowBytes(bytes, i, eff, scratch)
      hashes(i) = XXH64.hashUnsafeBytes(scratch,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      i += 1
    }
    // distinct via sort + in-place dedup (ascending, deterministic)
    java.util.Arrays.sort(hashes)
    var w = 0
    i = 0
    while (i < hashes.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  /** Assemble the single-space-joined window of `eff` token byte
    * arrays starting at `i` into `scratch`; returns the byte length.
    * Shared by every word-n-gram digest kernel so the gram byte
    * layout (and therefore oracle hash-exactness) has ONE definition.
    */
  private def joinWindowBytes(bytes: Array[Array[Byte]], i: Int,
      eff: Int, scratch: Array[Byte]): Int = {
    var pos = 0
    var j = 0
    while (j < eff) {
      if (j > 0) { scratch(pos) = ' '; pos += 1 }
      val b = bytes(i + j)
      System.arraycopy(b, 0, scratch, pos, b.length)
      pos += b.length
      j += 1
    }
    pos
  }

  /** The single-space-joined window of `eff` tokens starting at `i` —
    * the one STRING-form definition of a word n-gram (shared by
    * [[shingleStrings]] and [[repetitionStats]]).
    */
  private def joinWindowString(toks: Array[String], i: Int, eff: Int,
      sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var j = 0
    while (j < eff) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    sb.toString
  }

  /** First 6 md5 bytes of scratch[0, pos) as a long — the
    * portableDigest packing (`conv(substring(md5(x),1,12),16,10)`),
    * shared by every 48-bit digest kernel.
    */
  private def md5of48(md: java.security.MessageDigest,
      scratch: Array[Byte], pos: Int): Long = {
    md.reset()
    md.update(scratch, 0, pos)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
    ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
    ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Kernel for [[Md5Shingles]]: sorted DISTINCT 48-bit md5 digests
    * (the portableDigest convention — first 6 md5 bytes of the gram's
    * UTF-8 bytes, so DuckDB replays every value via
    * `md5(gram)[1:12]` base-16) of the lowercased word k-shingles of
    * `text`. Tokenization/window semantics are [[hashedShingles]]'
    * spec-pinned mirror of the composable
    * `explode(shingles(text,k)) → portableDigest` form: Pattern.split
    * on \s+ limit -1 of UTF8String.toLowerCase, windows joined with
    * single spaces, fewer than k tokens → one whole-text shingle. One
    * byte-walk per row, one reused MessageDigest, zero per-gram
    * string allocation — replaces the per-gram md5/substr/conv
    * expression trees that made t160/t243's gram stage the hot span.
    */
  def md5Shingles(text: UTF8String, k: Int): ArrayData = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    val n = toks.length
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    var total = 0
    while (i < n) {
      bytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      total += bytes(i).length
      i += 1
    }
    val eff = if (n < k) n else k
    val count = if (n < k) 1 else n - k + 1
    val scratch = new Array[Byte](math.max(total + math.max(n - 1, 0), 1))
    val md = md5Local.get()
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      out(i) = md5of48(md, scratch, joinWindowBytes(bytes, i, eff, scratch))
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Kernel for [[GramDigestCounts]]: for every n in 1..maxN, the
    * doc's word n-gram 48-bit md5 digests ([[md5Shingles]]' digest
    * and tokenization contract) with their PER-DOC occurrence counts,
    * emitted as (n, h, c) struct rows — the one-pass replacement for
    * t157's three unioned explode-shingle passes (rows × tokens × 3
    * materialized records, each gram through its own md5/substr/conv
    * expression tree). Per n the digests sort + run-length encode, so
    * downstream sees ≤ distinct-grams rows of 20 bytes each and the
    * (group, n, digest) aggregate keeps its exact totals:
    * Σc = total grams, row count = distinct grams.
    */
  def gramDigestCounts(text: UTF8String, maxN: Int): ArrayData = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    val nTok = toks.length
    val bytes = new Array[Array[Byte]](nTok)
    var i = 0
    var total = 0
    while (i < nTok) {
      bytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      total += bytes(i).length
      i += 1
    }
    val scratch =
      new Array[Byte](math.max(total + math.max(nTok - 1, 0), 1))
    val md = md5Local.get()
    val rows = new java.util.ArrayList[AnyRef]()
    var n = 1
    while (n <= maxN) {
      val eff = if (nTok < n) nTok else n
      val count = if (nTok < n) 1 else nTok - n + 1
      val hs = new Array[Long](count)
      i = 0
      while (i < count) {
        hs(i) = md5of48(md, scratch, joinWindowBytes(bytes, i, eff, scratch))
        i += 1
      }
      java.util.Arrays.sort(hs)
      i = 0
      while (i < count) {
        var run = 1
        while (i + run < count && hs(i + run) == hs(i)) run += 1
        rows.add(new GenericInternalRow(Array[Any](n, hs(i), run.toLong)))
        i += run
      }
      n += 1
    }
    new GenericArrayData(rows.toArray)
  }

  /** Kernel for [[RepetitionStatsExpr]]: the Gopher-style within-doc
    * repetition counters (Rae et al. 2021, Table A1 class) in ONE
    * pass, as exact integer masses so every downstream fraction is a
    * single divide of summed BIGINTs:
    *
    *  - lines: split on '\n' (limit −1, raw text, empties kept);
    *    n_lines, occurrences belonging to any duplicated line text,
    *    and their codepoint masses (count × length);
    *  - word n-grams (the TextDedup.shingles token contract —
    *    lowercase \s+ split, windows joined with single spaces, fewer
    *    than n tokens → one whole-text gram) for n = 2, 3, 5:
    *    top-gram mass (max over distinct grams of count × length —
    *    the deterministic tie-free form of "fraction of characters in
    *    the most common n-gram"), duplicated-gram mass (Σ count ×
    *    length over grams with count ≥ 2, n = 5), and total mass.
    *
    * Grams group by STRING (per-doc HashMap — no digest-collision
    * caveat), lengths in codepoints matching Spark/DuckDB `length`.
    */
  def repetitionStats(text: UTF8String): GenericInternalRow = {
    val raw = text.toString
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    val lines = raw.split("\n", -1)
    val lm = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < lines.length) {
      val e = lm.computeIfAbsent(lines(i), l => Array(0L, cp(l)))
      e(0) += 1
      i += 1
    }
    var nLines = lines.length.toLong
    var dupLines = 0L
    var lineChars = 0L
    var dupLineChars = 0L
    lm.values.forEach { e =>
      lineChars += e(0) * e(1)
      if (e(0) >= 2) { dupLines += e(0); dupLineChars += e(0) * e(1) }
    }
    val toks = ws.split(text.toLowerCase.toString, -1)
    // (topMass, dupMass, totalMass) for word n-grams
    def gramMasses(n: Int): (Long, Long, Long) = {
      val gm = new java.util.HashMap[String, Array[Long]]()
      val count = if (toks.length < n) 1 else toks.length - n + 1
      val eff = if (toks.length < n) toks.length else n
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < count) {
        val e = gm.computeIfAbsent(joinWindowString(toks, i, eff, sb),
          g => Array(0L, cp(g)))
        e(0) += 1
        i += 1
      }
      var top = 0L; var dup = 0L; var total = 0L
      gm.values.forEach { e =>
        val mass = e(0) * e(1)
        total += mass
        if (mass > top) top = mass
        if (e(0) >= 2) dup += mass
      }
      (top, dup, total)
    }
    val (top2, _, mass2) = gramMasses(2)
    val (top3, _, mass3) = gramMasses(3)
    val (_, dup5, mass5) = gramMasses(5)
    new GenericInternalRow(Array[Any](nLines, dupLines, lineChars,
      dupLineChars, top2, mass2, top3, mass3, dup5, mass5))
  }

  /** Kernel for [[ShingleStrings]]: the word k-shingles of `text` as
    * strings — NON-distinct, in document order (position i = the
    * shingle starting at token i), lowercased, space-joined. Same
    * tokenization as [[hashedShingles]] (Pattern.split on \s+ of the
    * lowercased text, limit -1; fewer than k tokens → one whole-text
    * shingle), so `xxhash64(shingle_strings(t,k)[i])` is always a
    * member of `hashed_shingles(t, k)`.
    */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    val n = toks.length
    val eff = if (n < k) n else k
    val count = if (n < k) 1 else n - k + 1
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromString(joinWindowString(toks, i, eff, sb))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel for [[MinHashSignature]]: per permutation j, min over
    * shingle base-hashes of hashInt(j, base).
    */
  def minhashSig(bases: ArrayData, numHashes: Int): ArrayData = {
    val b = bases.toLongArray()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < b.length) {
      val base = b(s)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Kernel for [[SortedIntersectCount]]: linear merge. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var i = 0; var j = 0; var n = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }

  /** Kernel for [[SimHash64]]: per-bit ±1 votes from feature hashes. */
  def simhash64(v: ArrayData): Long = {
    val hashes = v.toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Kernel for [[RollingHash]]: wrapping-Long polynomial over UTF-8
    * bytes. */
  def rollingHash(v: UTF8String, base: Long): Long = {
    val bytes = v.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Kernel for [[CodePointRollingHash]]: Horner mod `mod` over Unicode
    * code points. */
  def codePointRollingHash(v: UTF8String, base: Long, mod: Long): Long = {
    val s = v.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Deterministic pseudo-weight for hash bucket `b` of the hashed
    * bag-of-words classifier: a fixed Knuth-multiplicative scramble
    * mapped onto [-0.5, 0.5) — any engine (and the DuckDB oracle)
    * reproduces it with three integer ops and a divide.
    */
  def bowWeight(b: Long): Double =
    ((b * 2654435761L) % 1000003L) / 1000003.0 - 0.5

  /** Kernel for [[HashedNgramCountsExpr]]: one pass over the UTF-8
    * bytes producing the `buckets`-length count vector of hashed
    * unigram AND bigram token features — the DSIR feature map (Xie et
    * al. 2023 shape). Tokens are maximal non-`\s` runs; a token
    * hashes to `sum(codePoint * 1-based-codepoint-index) mod buckets`
    * (the t43 convention a SQL oracle replays with plain arithmetic),
    * and a bigram hashes AS IF the two tokens were joined by a single
    * space — `prevH + 32·(prevLen+1) + (prevLen+1)·Σcp + curH` —
    * computed incrementally from per-token partial sums, so neither
    * the token stream nor any joined string ever materializes.
    */
  def hashedNgramCounts(text: UTF8String, buckets: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val n = text.numBytes
    var i = 0
    var inTok = false
    var pos = 0L    // 1-based code-point index within the current token
    var h = 0L      // Σ cp·pos of the current token
    var plain = 0L  // Σ cp of the current token
    var hasPrev = false
    var prevH = 0L; var prevLen = 0L
    def endToken(): Unit = {
      counts((((h % buckets) + buckets) % buckets).toInt) += 1
      if (hasPrev) {
        val bg = prevH + 32L * (prevLen + 1) + (prevLen + 1) * plain + h
        counts((((bg % buckets) + buckets) % buckets).toInt) += 1
      }
      hasPrev = true; prevH = h; prevLen = pos
      inTok = false; pos = 0L; h = 0L; plain = 0L
    }
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; step = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; step = 3 }
        else { cp = b0 & 0x07; step = 4 }
        var j = 1
        while (j < step && i + j < n) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      if (cp == ' ' || (cp >= 0x09 && cp <= 0x0d)) {
        if (inTok) endToken()
      } else {
        inTok = true
        pos += 1
        h += cp.toLong * pos
        plain += cp.toLong
      }
      i += step
    }
    if (inTok) endToken()
    new GenericArrayData(counts)
  }

  /** Kernel for [[BpeMergeExpr]]: one left-to-right pass over a symbol
    * sequence replacing every NON-OVERLAPPING adjacent occurrence of
    * (`left`, `right`) with the concatenated symbol — the classic BPE
    * merge-apply rule (Sennrich et al. 2016): after the pass, no
    * (`left`, `right`) adjacency can remain (each is either merged or
    * its left symbol was consumed by the previous merge — the
    * invariant the t55 audit pins at zero).
    */
  def bpeMergeApply(syms: ArrayData, left: UTF8String,
                    right: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      // a null symbol (legal per the input type) can never match a
      // rule side — it passes through unmerged instead of NPEing
      val merges = cur != null && i + 1 < n && cur.equals(left) && {
        val nxt = syms.getUTF8String(i + 1)
        nxt != null && nxt.equals(right)
      }
      if (merges) {
        out(w) = UTF8String.concat(left, right)
        w += 1; i += 2
      } else {
        out(w) = cur
        w += 1; i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Kernel for [[HashedBowScoreExpr]]: one pass over the UTF-8 bytes
    * computing (n_tokens, mean bucket weight) of the hashed
    * bag-of-words linear model. Tokens are maximal non-`\s` runs
    * (Java regex semantics: ASCII space + 0x09..0x0D); each token
    * hashes to `sum(codePoint * 1-based-codepoint-index) mod buckets`
    * — portable arithmetic a SQL oracle replays exactly — and the
    * token stream never materializes (no split array, no per-token
    * strings).
    */
  def hashedBowStats(text: UTF8String, buckets: Int): GenericInternalRow = {
    val n = text.numBytes
    var i = 0
    var inTok = false
    var pos = 0L   // 1-based code-point index within the current token
    var h = 0L
    var count = 0
    var sum = 0.0
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; step = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; step = 3 }
        else { cp = b0 & 0x07; step = 4 }
        var j = 1
        while (j < step && i + j < n) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      if (cp == ' ' || (cp >= 0x09 && cp <= 0x0d)) {
        if (inTok) {
          sum += bowWeight(((h % buckets) + buckets) % buckets)
          count += 1
          inTok = false; h = 0L; pos = 0L
        }
      } else {
        inTok = true
        pos += 1
        h += cp.toLong * pos
      }
      i += step
    }
    if (inTok) {
      sum += bowWeight(((h % buckets) + buckets) % buckets)
      count += 1
    }
    new GenericInternalRow(Array[Any](count,
      if (count == 0) 0.0 else sum / count))
  }

  /** Kernel for [[CharBigramBucketsExpr]]: the hashed character-BIGRAM
    * feature stream of the trainable language classifier
    * (TextAnalysis.nbLangModel) — one Int bucket per consecutive
    * code-point pair, in text order:
    *
    *   bucket(cp₁, cp₂) = (cp₁ + 2·cp₂) mod buckets
    *
    * Pure integer and engine-portable: code points are < 0x110000 so
    * the weighted sum is < 2²² (no overflow, never negative), and the
    * DuckDB oracle replays each bucket as
    * `(unicode(substr(t,i,1)) + 2*unicode(substr(t,i+1,1))) % B`.
    * The gram stream never materializes strings — used ONLY on the
    * training side, where the exploded Int stream feeds a
    * map-side-combinable (lang, bucket) count; inference goes through
    * [[nbArgmax]] (no explode at all). Decoder identical to
    * [[hashedBowStats]]'s.
    */
  def charBigramBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val n = text.numBytes
    val out = new Array[Int](math.max(text.numChars() - 1, 0))
    var i = 0
    var prev = -1
    var w = 0
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; step = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; step = 3 }
        else { cp = b0 & 0x07; step = 4 }
        var j = 1
        while (j < step && i + j < n) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      if (prev >= 0) { out(w) = (prev + 2 * cp) % buckets; w += 1 }
      prev = cp
      i += step
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Kernel for [[NbArgmaxExpr]]: one pass over the text scoring every
    * language of the trained hashed-bigram naive-Bayes model —
    * score(ℓ) = prior(ℓ) + Σ_grams weights(ℓ)(bucket) on exact BIGINT
    * micro-log units — and returning the argmax index (ties take the
    * LARGER index; languages are sorted ascending by the caller, so
    * ties take the lexicographically later code, the langId
    * convention). The model rides the generated code as reference
    * objects, so codegen is constant-size in |langs|·buckets and the
    * per-row cost is |langs| long-adds per gram — no explode, no
    * join, no per-gram strings anywhere on the inference path.
    */
  def nbArgmax(text: UTF8String, weights: Array[Array[Long]],
               priors: Array[Long], buckets: Int): Int = {
    val nLangs = weights.length
    val scores = java.util.Arrays.copyOf(priors, nLangs)
    val n = text.numBytes
    var i = 0
    var prev = -1
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; step = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; step = 3 }
        else { cp = b0 & 0x07; step = 4 }
        var j = 1
        while (j < step && i + j < n) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      if (prev >= 0) {
        val b = (prev + 2 * cp) % buckets
        var l = 0
        while (l < nLangs) { scores(l) += weights(l)(b); l += 1 }
      }
      prev = cp
      i += step
    }
    var best = 0
    var l = 1
    while (l < nLangs) { if (scores(l) >= scores(best)) best = l; l += 1 }
    best
  }

  /** Kernel for [[CompressionProfileExpr]]: DEFLATE the UTF-8 bytes at
    * the default level and report (n_bytes, n_deflated, roundtrip_ok)
    * where roundtrip_ok = INFLATE(DEFLATE(text)) reproduces the input
    * exactly — the self-check that gates the operator (no SQL engine
    * can replay zlib, but a codec that round-trips and reports sizes
    * is verifiable without one). zlib output is deterministic for a
    * fixed input/level/strategy, so the ratio is reproducible across
    * runs and engines running this kernel.
    */
  def deflateProfile(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes)
    d.finish()
    var buf = new Array[Byte](math.max(64, bytes.length / 2))
    var n = 0
    while (!d.finished()) {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      n += d.deflate(buf, n, buf.length - n)
    }
    d.end()
    val inf = new java.util.zip.Inflater()
    inf.setInput(buf, 0, n)
    // +1 spare byte: lets inflate() both signal stream end on empty
    // input and detect an over-long stream (m > n_bytes ⇒ not ok)
    val out = new Array[Byte](bytes.length + 1)
    var m = 0
    var ok = true
    try {
      while (ok && !inf.finished()) {
        val r = inf.inflate(out, m, out.length - m)
        m += r
        if (r == 0 && !inf.finished()) ok = false // truncated/corrupt
      }
    } catch { case _: java.util.zip.DataFormatException => ok = false }
    inf.end()
    ok = ok && m == bytes.length &&
      java.util.Arrays.equals(out, 0, m, bytes, 0, bytes.length)
    new GenericInternalRow(Array[Any](bytes.length, n, ok))
  }

  /** Kernel for [[CharEntropyExpr]]: one pass over the UTF-8 bytes,
    * decoding code points (same decoder as [[hashedBowStats]]) into a
    * frequency table — a dense 128-slot array for ASCII plus a spill
    * map for the rest — then emits Shannon entropy in bits, the
    * distinct-code-point count, and the modal code point's frequency
    * share: the low-entropy / low-diversity signals quality filters
    * cut on (repeated-char garbage scores near 0 bits; natural English
    * sits around 4). Empty text → (0.0, 0, 0.0).
    */
  def charEntropy(text: UTF8String): GenericInternalRow = {
    val n = text.numBytes
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var total = 0L
    var i = 0
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; step = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; step = 3 }
        else { cp = b0 & 0x07; step = 4 }
        var j = 1
        while (j < step && i + j < n) {
          cp = (cp << 6) | (text.getByte(i + j) & 0x3f)
          j += 1
        }
      }
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      }
      total += 1
      i += step
    }
    if (total == 0)
      return new GenericInternalRow(Array[Any](0.0, 0, 0.0))
    val t = total.toDouble
    val ln2 = math.log(2.0)
    var ent = 0.0
    var uniq = 0
    var maxN = 0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) {
        uniq += 1
        if (k > maxN) maxN = k
        val p = k / t
        ent -= p * (math.log(p) / ln2)
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k = it.next().intValue()
        uniq += 1
        if (k > maxN) maxN = k
        val p = k / t
        ent -= p * (math.log(p) / ln2)
      }
    }
    new GenericInternalRow(Array[Any](ent, uniq, maxN / t))
  }

  /** Kernel for [[JaroWinklerSim]]: Jaro similarity with the Winkler
    * prefix boost, computed over UTF-8 BYTES — the same alphabet
    * DuckDB's `jaro_winkler_similarity` uses (verified bit-exact
    * against it on 12k adversarial pairs, including the threshold
    * region; a multi-byte code point contributes each of its bytes as
    * a separate symbol on both engines). Spec pinned at
    * reference/semantic level rather than cited from any one source:
    * match window ⌊max(|a|,|b|)/2⌋−1, transpositions = unmatched-order
    * disagreements / 2, boost only when jaro > 0.7, prefix ≤ 4 bytes,
    * scale 0.1, and the empty-side rule either-empty ⇒ 0 (INCLUDING
    * both-empty — the equality shortcut applies to non-empty only).
    * The IEEE evaluation order below ((m/l1 + m/l2 + (m−t)/m)/3, then
    * j + ℓ·0.1·(1−j)) is part of the contract — both engines produce
    * the identical double.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var open = true
      while (j < hi && open) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (l < maxP && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Kernel for [[DamerauLevenshteinDist]]: FULL Damerau–Levenshtein
    * (adjacent transpositions counted once, including across edits —
    * NOT the cheaper OSA restriction) over UTF-8 BYTES, matching
    * DuckDB's `damerau_levenshtein` exactly (verified 4,006/4,006
    * adversarial pairs incl. the OSA-vs-DL discriminators like
    * "ca"→"abc" = 2). The classic Lowrance–Wagner DP with a
    * 256-entry last-seen-row table for the byte alphabet.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val la = s1.length; val lb = s2.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(s2(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (s1(i - 1) == s2(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d(i + 1)(j + 1) = m
        j += 1
      }
      da(s1(i - 1) & 0xff) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** 64-bit SimHash over pre-hashed features: each feature hash votes ±1
  * per bit position; the sign of the per-bit sum becomes the output bit.
  * Near-duplicate documents land within a small Hamming distance.
  * Input: ARRAY<LONG> of feature (token/shingle) hashes.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(LongType))
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Polynomial rolling hash of a string (Rabin-Karp form): fingerprint =
  * Σ c_i · base^(n-1-i) in Long arithmetic (wrapping — deterministic on
  * the JVM). One pass, O(length), no allocation.
  */
case class RollingHash(child: Expression, base: Long) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.rollingHash(v.asInstanceOf[UTF8String], base)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.rollingHash($c, ${base}L);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** DISTINCT xxhash64 values (seed 42) of the word k-shingles of a
  * text, sorted ascending — one native pass per row.
  *
  * Semantics mirror the composable Catalyst form
  * `array_distinct(transform(shingles(text, k), s -> xxhash64(s)))`
  * bit-for-bit (spec-pinned): lowercase via UTF8String.toLowerCase
  * (what Lower does), tokens via Pattern.split(.., -1) on \s+ (what
  * StringSplit does), each window joined with single spaces, hashed
  * with the same XXH64 primitive at Spark's default seed. Texts with
  * fewer than k tokens fall back to one whole-text shingle; sets are
  * distinct because every consumer is set-shaped (Jaccard, MinHash —
  * min over duplicates equals min over distinct).
  *
  * Why native: the lambda form builds every shingle through
  * slice → GenericArrayData → array_join → UTF8String concat per
  * window, interpreted per element — profiled at ~7s for 5k docs at
  * sf0.1, the single hottest span in both dedup pipelines. The kernel
  * materializes token bytes once per row and assembles each window in
  * a reused scratch buffer, hashing in place.
  */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.hashedShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.hashedShingles($c, $k);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Winnowing fingerprint set of a text — sorted distinct 48-bit md5
  * char-k-gram digests selected by w-window minima (see
  * [[TextKernels.winnowingFps]]). Codegen'd: one kernel call per row.
  */
case class WinnowingFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 2, "k must be >= 2")
  require(w >= 1, "w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.winnowingFps(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.winnowingFps($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sorted DISTINCT 48-bit md5 word-k-shingle digests of a text (the
  * portableDigest convention — see [[TextKernels.md5Shingles]]).
  * Codegen'd: one kernel call per row; mirrors
  * `array_distinct(transform(shingles(text,k), g -> portableDigest(g)))`
  * bit-for-bit so existing DuckDB oracles replay unchanged.
  */
case class Md5Shingles(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Shingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.md5Shingles($c, $k);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-doc word n-gram digest COUNTS for n = 1..maxN as (n, h, c)
  * struct rows (see [[TextKernels.gramDigestCounts]]) — one kernel
  * pass replaces maxN unioned explode-shingle scans.
  */
case class GramDigestCounts(child: Expression, maxN: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(maxN >= 1, "maxN must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.gramDigestCounts(v.asInstanceOf[UTF8String], maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.gramDigestCounts($c, $maxN);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Gopher-style within-doc repetition counters as one struct of exact
  * integer masses (see [[TextKernels.repetitionStats]]) — one kernel
  * call per row, no explode, no shuffle; per-group fractions are then
  * single divides of summed BIGINTs.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StructType(
    Seq("n_lines", "dup_lines", "line_chars", "dup_line_chars",
      "top2_mass", "mass2", "top3_mass", "mass3", "dup5_mass", "mass5")
      .map(StructField(_, LongType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.repetitionStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.repetitionStats($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Word k-shingle STRINGS of a text — non-distinct, in document order,
  * lowercased (see [[TextKernels.shingleStrings]]). The composable
  * Catalyst form (`transform(sequence(..), i -> array_join(slice(toks,
  * i+1, k), " "))`) re-evaluates the token split inside every lambda
  * element once projection collapse inlines it — the same interpreted
  * hotspot that motivated [[HashedShingles]]; this keeps span
  * regeneration (duplicate-span dedup's retrieval stage) native.
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleStrings(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingleStrings($c, $k);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass MinHash signature over pre-hashed shingles (the
  * [[HashedShingles]] output): element j of the result is min over
  * shingle base-hashes of `hashInt(j, base)` — bit-exact with the SQL
  * form `min(xxhash64(sh, lit(j)))` over exploded shingle STRINGS,
  * because xxhash64(sh, j) folds its children left-to-right: the
  * string at seed 42 (exactly a HashedShingles element), then the
  * literal int j mixed into that base. Evaluating natively makes the
  * signature a PER-ROW map:
  *
  *  - no explode: the |docs|·|shingles| intermediate row set never
  *    exists, and no shuffle of partial minima is needed — the old
  *    explode → groupBy(id).agg(64 × min) shape was itself the
  *    workaround for Catalyst's projection collapse inlining the
  *    shingle construction into every per-hash lambda (O(hashes)
  *    recompute); a native expression evaluates its child once.
  *  - cheaper arithmetic: each shingle is string-hashed ONCE (in
  *    HashedShingles) and the per-permutation values are single int
  *    mixes of that base, instead of numHashes full string hashes.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes >= 1, "numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(LongType))
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSig(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.minhashSig($c, $numHashes);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Intersection size of two SORTED long arrays (the HashedShingles
  * shape) by linear merge — no per-row hash-set allocation, unlike
  * Catalyst's ArrayIntersect/ArrayUnion pair, which this replaces in
  * the Jaccard verification hot path (|∪| follows for free as
  * |a| + |b| - |∩| on distinct inputs). Inputs MUST be sorted distinct;
  * both producers in this codebase are.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}


/** Full Damerau–Levenshtein distance over UTF-8 bytes — the
  * transposition-aware edit distance (typo-shaped corruption counts
  * one edit, not two): the record-linkage verifier between plain
  * Levenshtein's insert/delete/substitute and Jaro–Winkler's
  * alignment score. Engine-portable: matches DuckDB's
  * `damerau_levenshtein` exactly (see
  * [[TextKernels.damerauLevenshtein]]).
  */
case class DamerauLevenshteinDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(StringType, StringType)
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshtein(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.damerauLevenshtein($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Jaro–Winkler similarity of two strings over UTF-8 bytes — the
  * record-linkage / short-field verifier (names, titles, URLs) where
  * Levenshtein's O(|a|·|b|) DP is overkill and prefix agreement
  * matters. O(|a|·window) with zero allocation beyond two boolean
  * flag arrays; full whole-stage codegen via the static-kernel call.
  * Engine-portable: bit-identical to DuckDB's
  * `jaro_winkler_similarity` (see [[TextKernels.jaroWinkler]]).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(StringType, StringType)
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Modular polynomial rolling hash over Unicode CODE POINTS:
  * fingerprint = (Σ cp_i · base^(n-1-i)) mod `mod`, evaluated with
  * Horner's rule so intermediates stay < mod·base (no overflow for
  * mod < 2^31, base < 2^31). Code points (not UTF-8 bytes) and an
  * explicit modulus make the value recomputable by any engine with
  * plain 64-bit integer arithmetic — the DuckDB oracle mirrors it via
  * list_reduce over string_split(text, '') (Oracle.sql t11).
  */
/** Count of BPE-ish pre-tokenization pieces — single pass over the
  * UTF-8 bytes, no match materialization. Equivalent by construction
  * to `size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))`
  * under Java regex semantics (\s = ASCII [ \t\n\x0B\f\r]; non-ASCII
  * whitespace is an "other glyph"): ASCII letter runs and digit runs
  * count once, every other non-\s CODE POINT counts individually
  * (multi-byte sequences count at their lead byte). The regex form
  * allocates one string per matched piece — this kernel replaces it in
  * tokenCounts (spec-pinned equivalent, incl. unicode + property
  * tests).
  */
case class BpeishTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.bpeishCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.bpeishCount($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class CodePointRollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.codePointRollingHash(v.asInstanceOf[UTF8String], base, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.codePointRollingHash($c, ${base}L, ${mod}L);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass consecutive-duplicate-run statistics of a text — the
  * kernel behind `TextAnalysis.collapseRuns`. Returns the whole stat
  * struct from a single tokenizing scan; the lambda composition
  * (indexed `filter` + ordered `aggregate` fold) computes the same
  * values but runs interpreted per element — 6.2 s for 5k docs at
  * sf0.1, the known interpreted-lambda trap — where this kernel stays
  * inside whole-stage codegen.
  */
case class CollapseRunsExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_after", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.collapseRuns(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.collapseRuns($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** BPE merge application over a symbol-sequence column — one merge
  * rule per expression instance (the learner drives one pass per
  * learned rule), replacing non-overlapping left-to-right adjacent
  * (`left`, `right`) occurrences with the joined symbol. The rule
  * strings ride as codegen reference objects, so the per-row pass
  * stays inside whole-stage codegen with zero per-row allocation
  * beyond the output array.
  */
case class BpeMergeExpr(child: Expression, left: String, right: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(left.nonEmpty && right.nonEmpty,
    "merge symbols must be non-empty")
  // null elements pass through unmerged, so the output preserves them
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def inputTypes = Seq(ArrayType(StringType))
  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  override def nullSafeEval(v: Any): Any =
    TextKernels.bpeMergeApply(v.asInstanceOf[ArrayData], l, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", l,
      "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeRight", r,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.bpeMergeApply($c, $lRef, $rRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass hashed unigram+bigram feature counts — the DSIR feature
  * map (`Importance.dsirWeights`): ARRAY<LONG> of length `buckets`
  * holding how many token unigrams and adjacent-pair bigrams of the
  * document hash into each bucket. The hash is the portable t43
  * convention (Σ codePoint · 1-based-index mod buckets; bigrams hash
  * the space-joined pair), so a SQL oracle replays every count with
  * plain arithmetic, while this kernel needs ONE scan and zero
  * intermediate strings per row.
  */
case class HashedNgramCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.hashedNgramCounts(v.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.hashedNgramCounts($c, $buckets);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass hashed bag-of-words linear-classifier statistics — the
  * kernel behind `TextAnalysis.bowQualityScore` (fastText-shaped
  * model-based quality filtering). Returns (n_tokens, mean bucket
  * weight) from a single scan; the model is the deterministic
  * `TextKernels.bowWeight` table over `buckets` hash buckets, so a
  * SQL oracle reproduces every value with plain arithmetic. Swapping
  * in trained weights changes `bowWeight` only — the Spark plumbing
  * (per-row scan, codegen'd expression, no shuffle) is the production
  * shape.
  */
/** DEFLATE-compressibility profile — the "too compressible =
  * boilerplate/repetition" quality heuristic (RefinedWeb/Gopher
  * family): highly repetitive text deflates far below natural prose.
  * One JNI-zlib pass per row, no cross-row state, no shuffle. The
  * per-row Deflater/Inflater allocation is the cost of statelessness;
  * it is still far cheaper than the explode-based repetition metrics
  * it complements (t35's collapse stats).
  */
case class CompressionProfileExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("n_deflated", IntegerType, nullable = false),
    StructField("roundtrip_ok", BooleanType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.deflateProfile(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.deflateProfile($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Character-distribution profile of a document in one pass: Shannon
  * entropy (bits), distinct code points, and the modal code point's
  * share. The explode-and-groupBy formulation shuffles one row per
  * CHARACTER (a 100 TB corpus → quadrillions of rows); this kernel
  * keeps the whole histogram row-local, so the operator has no shuffle
  * at all.
  */
/** Unicode NFC normalization — the canonicalization step Spark's
  * function library lacks (lower/trim exist; composition does not).
  * Codegen'd static call into [[TextKernels.nfcNormalize]]; the
  * quick-check fast path returns the input UTF8String unchanged for
  * already-NFC text, so the hot ASCII path allocates nothing.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.nfcNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.nfcNormalize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("unique_chars", IntegerType, nullable = false),
    StructField("top_char_ratio", DoubleType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.charEntropy($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HashedBowScoreExpr(child: Expression, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("mean_w", DoubleType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.hashedBowStats(v.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.hashedBowStats($c, $buckets);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hashed character-bigram feature buckets (the trainable langid
  * model's feature extractor) — see [[TextKernels.charBigramBuckets]].
  */
case class CharBigramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    TextKernels.charBigramBuckets(v.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.charBigramBuckets($c, $buckets);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Naive-Bayes argmax over a FIXED trained weight matrix — the
  * langid inference expression (see [[TextKernels.nbArgmax]]). The
  * constructor keeps Seqs (structural equals → semanticEquals and
  * common-subexpression elimination work, the ArgmaxCellExpr
  * convention); the kernel's primitive matrix materializes lazily,
  * once per (de)serialized instance, and rides generated code as a
  * reference object so codegen stays constant-size in the model.
  */
case class NbArgmaxExpr(child: Expression, weights: Seq[Seq[Long]],
                        priors: Seq[Long], buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(weights.nonEmpty && weights.length == priors.length,
    s"need one weight row and one prior per language, got " +
    s"${weights.length} rows / ${priors.length} priors")
  require(weights.forall(_.length == buckets),
    s"every weight row must have $buckets buckets")
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(StringType)
  @transient private lazy val wMatrix: Array[Array[Long]] =
    weights.map(_.toArray).toArray
  @transient private lazy val pArr: Array[Long] = priors.toArray
  override def nullSafeEval(v: Any): Any =
    TextKernels.nbArgmax(v.asInstanceOf[UTF8String], wMatrix, pArr, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("nbWeights", wMatrix, "long[][]")
    val p = ctx.addReferenceObj("nbPriors", pArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.nbArgmax($c, $w, $p, $buckets);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextFunctions {
  import ColumnOps._
  def simhash64(featureHashes: Column): Column =
    toColumn(SimHash64(toExpr(featureHashes)))
  def rolling_hash(s: Column, base: Long = 1000003L): Column =
    toColumn(RollingHash(toExpr(s), base))
  def rolling_hash_mod(s: Column, base: Long = 1000003L,
                       mod: Long = 2147483647L): Column =
    toColumn(CodePointRollingHash(toExpr(s), base, mod))
  def hashed_shingles(text: Column, k: Int): Column =
    toColumn(HashedShingles(toExpr(text), k))
  def shingle_strings(text: Column, k: Int): Column =
    toColumn(ShingleStrings(toExpr(text), k))
  def md5_shingles(text: Column, k: Int): Column =
    toColumn(Md5Shingles(toExpr(text), k))
  def gram_digest_counts(text: Column, maxN: Int): Column =
    toColumn(GramDigestCounts(toExpr(text), maxN))
  def repetition_stats(text: Column): Column =
    toColumn(RepetitionStatsExpr(toExpr(text)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpr(a), toExpr(b)))
  def winnowing_fps(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowingFps(toExpr(text), k, w))
  def nfc_normalize(text: Column): Column =
    toColumn(NfcNormalizeExpr(toExpr(text)))
  def char_bigram_buckets(text: Column, buckets: Int): Column =
    toColumn(CharBigramBucketsExpr(toExpr(text), buckets))
  def nb_argmax(text: Column, weights: Seq[Seq[Long]],
                priors: Seq[Long], buckets: Int): Column =
    toColumn(NbArgmaxExpr(toExpr(text), weights, priors, buckets))
  def jaro_winkler(a: Column, b: Column): Column =
    toColumn(JaroWinklerSim(toExpr(a), toExpr(b)))
  def damerau_levenshtein(a: Column, b: Column): Column =
    toColumn(DamerauLevenshteinDist(toExpr(a), toExpr(b)))
  def bpeish_token_count(text: Column): Column =
    toColumn(BpeishTokenCount(toExpr(text)))
  def minhash_sig(hashedShingles: Column, numHashes: Int): Column =
    toColumn(MinHashSignature(toExpr(hashedShingles), numHashes))
  def collapse_runs(text: Column): Column =
    toColumn(CollapseRunsExpr(toExpr(text)))
  def hashed_bow_stats(text: Column, buckets: Int): Column =
    toColumn(HashedBowScoreExpr(toExpr(text), buckets))
  def char_entropy(text: Column): Column =
    toColumn(CharEntropyExpr(toExpr(text)))
  def compression_profile(text: Column): Column =
    toColumn(CompressionProfileExpr(toExpr(text)))
  def hashed_ngram_counts(text: Column, buckets: Int): Column =
    toColumn(HashedNgramCountsExpr(toExpr(text), buckets))
  def bpe_merge(syms: Column, left: String, right: String): Column =
    toColumn(BpeMergeExpr(toExpr(syms), left, right))
}
