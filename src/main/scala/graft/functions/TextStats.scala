package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** All per-document text counters in ONE allocation-free pass.
  *
  * Why this exists — two measured walls on the way to 100 TB:
  *  1. The pure-Column formulation re-split and re-scanned the text ~10x
  *     per row (rule verdicts + fail_reasons + quality score each carried
  *     their own expression tree; Catalyst CSE does not reliably dedupe
  *     higher-order array lambdas). Profiled: 30s of a 50s 750k-doc run.
  *  2. A straightforward JVM rewrite (split -> String[] + HashSet[String]
  *     + bigram concats) allocated ~1800 small objects per document and
  *     hit the collector's throughput wall at ~47k docs/sec no matter how
  *     many cores ran (8 threads = 32 threads in a raw-JVM microbench,
  *     while the allocation-free langid scorer scaled 22x).
  *
  * So: word iteration by index ranges over the original string, distinct
  * words / duplicate bigrams via open-addressing tables of (hash, range)
  * with char-range verification (exact, not probabilistic), stopword hits
  * via a static int-hash table with case-folded range comparison. The only
  * per-document allocations are a handful of flat int arrays.
  *
  * Value parity is load-bearing (DuckDB oracles + committed golden labels):
  * regex counters use precompiled java.util.regex Patterns — the same
  * engine Spark's regexp_* functions use — lengths count code points
  * (Spark length() = UTF8String.numChars), and word/bigram/line identity is
  * exact char equality. Stopword case-folding is per-char
  * Character.toLowerCase, which matches String.toLowerCase(Locale.ROOT)
  * for every word that can fold into an ASCII/CJK/Latin stopword (the
  * divergent locale-special code points like U+0130 can never produce a
  * stopword under either rule). TextStatsSpec asserts equality against the
  * Column twins field by field.
  */
object TextStats {

  // Stats vector layout (flat Array[Int]: ScalaUDFs returning case classes
  // pay a struct-encoder conversion on every call; primitives stay fast).
  val DOC_LENGTH = 0      // code points, = length(text)
  val WORD_COUNT = 1      // \s+ split, empty tokens dropped
  val TOKEN_COUNT = 2     // BPE-ish pre-tokenizer matches
  val SYMBOL_COUNT = 3    // code points not \p{L}\p{N}\s
  val STOP_HITS = 4       // case-folded word in stopword set
  val DISTINCT_WORDS = 5
  val DUP_2GRAMS = 6      // duplicated word bigram occurrences
  val LINE_COUNT = 7      // non-blank lines
  val DISTINCT_LINES = 8
  val NON_SPACE_COUNT = 9 // code points not \s (ASCII class, as regex)
  val UPPER_COUNT = 10    // A-Z
  val DIGIT_COUNT = 11    // 0-9
  // ---- round-6 script-adaptive fields (unsegmented zh/ja/th support) ----
  val NOSPACE_COUNT = 12     // code points in the no-space-script ranges
  val NOSPACE_STOP_COVER = 13 // code points covered by no-space stopword
                              // occurrences; 0 unless the no-space branch
                              // is taken (see noSpaceBranch)
  val CHAR4_TOTAL = 14       // code-point 4-grams; 0 unless branch taken
  val CHAR4_DUP = 15         // duplicated 4-gram occurrences; ditto

  /** Scripts written without inter-word spaces, as code-point ranges:
    * Hiragana/Katakana (3040-30FF incl. the chōonpu), CJK ideographs
    * (3400-4DBF, 4E00-9FFF, F900-FAFF), Thai letters/vowels/tone marks
    * (0E01-0E4E). Hangul is NOT here — Korean is space-segmented. CJK
    * punctuation (3000-303F) is deliberately outside: 。、 stay symbols.
    */
  @inline def isNoSpaceScript(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) ||
      (cp >= 0x3040 && cp <= 0x30FF) ||
      (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) ||
      (cp >= 0x0E01 && cp <= 0x0E4E)

  /** The word rules switch to char-based twins when at least 30% of a
    * document's code points are no-space-script — computed as an IEEE
    * double compare on both engines (JVM and the DuckDB oracle divide
    * the same two ints), so the branch decision is bit-identical.
    */
  @inline def noSpaceBranch(nospace: Int, docLength: Int): Boolean =
    nospace.toDouble / math.max(docLength, 1).toDouble >= 0.3

  /** The frozen stoplist entries usable for substring matching in
    * no-space scripts (every char in the no-space ranges): the zh/ja/th
    * sublists, exactly.
    */
  val noSpaceStopwords: Array[String] = Heuristics.stopwords
    .filter(w => w.nonEmpty && w.forall(c => isNoSpaceScript(c.toInt)))
    .toArray

  private val symbolPat = Pattern.compile("[^\\p{L}\\p{N}\\s]")

  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  // ---- static stopword hash table (case-folded FNV over chars) ----
  @inline private def foldHash(t: String, from: Int, until: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) {
      h ^= Character.toLowerCase(t.charAt(i)).toInt
      h *= 0x01000193
      i += 1
    }
    h
  }

  private val stopWords: Array[String] = Heuristics.stopwords.toArray
  private val stopCap: Int = Integer.highestOneBit(stopWords.length * 4) * 2
  private val stopSlot: Array[Int] = Array.fill(stopCap)(-1)
  locally {
    stopWords.indices.foreach { i =>
      val w = stopWords(i)
      var s = foldHash(w, 0, w.length) & (stopCap - 1)
      while (stopSlot(s) != -1) s = (s + 1) & (stopCap - 1)
      stopSlot(s) = i
    }
  }

  @inline private def foldedEquals(t: String, from: Int, until: Int,
                                   w: String): Boolean = {
    if (until - from != w.length) return false
    var i = 0
    while (i < w.length) {
      val c = t.charAt(from + i)
      // U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE) is the one
      // unconditional 1:N lowercase in Unicode SpecialCasing: full
      // lowercase — what Spark's lower() and the DuckDB oracle's
      // lower() apply — maps it to "i"+U+0307, which can never equal a
      // stopword, while Character.toLowerCase's 1:1 simple map folds it
      // to plain 'i' — which IS a stopword (pl/it). Counting "İ" as a
      // stopword hit would silently diverge from the oracle semantics
      // (round-6 property-test finding); reject it explicitly.
      if (c == 'İ') return false
      if (Character.toLowerCase(c) != w.charAt(i)) return false
      i += 1
    }
    true
  }

  @inline private def isStopword(t: String, from: Int, until: Int): Boolean = {
    var s = foldHash(t, from, until) & (stopCap - 1)
    while (stopSlot(s) != -1) {
      if (foldedEquals(t, from, until, stopWords(stopSlot(s)))) return true
      s = (s + 1) & (stopCap - 1)
    }
    false
  }

  /** Standalone stopword-hit counter over the raw text (whitespace word
    * walk + the static O(1) hash table above). This is the production
    * backend of the COLUMN twin `Heuristics.stopwordFraction`: the old
    * pure-Column formulation scanned a literal ~270-entry array with
    * string equality per word (`array_contains`), an O(|stoplist|·words)
    * cost that grew with every language added — the round-5 driver stamp
    * measured text_quality 0.60 -> 1.87 s from exactly that. Word
    * boundaries are the `\s+` split twin (isAsciiSpace = Java regex \s),
    * membership is the same case-folded table the fused pass uses, so the
    * value is bit-identical to the fused STOP_HITS field and to the
    * DuckDB `list_contains(stoplist, lower(x))` oracle (TextStatsSpec).
    * Called from generated code via [[TextScalarExpr]].
    */
  def stopHits(text: org.apache.spark.unsafe.types.UTF8String): Int =
    stopHitsStr(if (text == null) "" else text.toString)

  def stopHitsStr(t: String): Int = {
    var hits = 0
    var i = 0
    while (i < t.length) {
      if (isAsciiSpace(t.charAt(i))) i += 1
      else {
        val ws = i
        while (i < t.length && !isAsciiSpace(t.charAt(i))) i += 1
        if (isStopword(t, ws, i)) hits += 1
      }
    }
    hits
  }

  /** Word count by the same `\s+`-split-drop-empties rule as the Column
    * twin — exposed as a native scalar because the lambda formulation
    * (`size(filter(split(...)))`) contains an ArrayFilter, which is
    * CodegenFallback and throws the WHOLE enclosing ProjectExec out of
    * whole-stage codegen; this denominator appears in every ratio
    * measure, so the lambda version poisoned every Column-twin project.
    */
  def wordCount(text: org.apache.spark.unsafe.types.UTF8String): Int = {
    val t = if (text == null) "" else text.toString
    var wc = 0
    var inWord = false
    var i = 0
    while (i < t.length) {
      if (isAsciiSpace(t.charAt(i))) inWord = false
      else if (!inWord) { wc += 1; inWord = true }
      i += 1
    }
    wc
  }

  /** 1 - distinct/total words (0.0 for empty texts) — the last lambda in
    * the text_quality projection (`array_distinct` over the split), made
    * native for the same CodegenFallback reason as [[wordCount]].
    * Distinctness is exact char equality on substrings, identical to
    * array_distinct over the `\s+` split and to DuckDB list_distinct.
    */
  def wordRepetition(text: org.apache.spark.unsafe.types.UTF8String): Double = {
    val t = if (text == null) "" else text.toString
    val seen = new java.util.HashSet[String]()
    var wc = 0
    var i = 0
    while (i < t.length) {
      if (isAsciiSpace(t.charAt(i))) i += 1
      else {
        val ws = i
        while (i < t.length && !isAsciiSpace(t.charAt(i))) i += 1
        wc += 1
        seen.add(t.substring(ws, i))
      }
    }
    if (wc == 0) 0.0 else 1.0 - seen.size.toDouble / wc.toDouble
  }

  // ---- standalone script-adaptive counters (Column-twin backends via
  // TextScalarExpr; the fused pass computes the same values in its
  // post-pass). Each is evaluated lazily behind the no-space branch in a
  // CaseWhen, so space-script documents never pay for them. ----

  /** Code points in the no-space-script ranges (DuckDB twin: length of
    * the text with `[^ranges]` regexp-removed).
    */
  def noSpaceCount(text: org.apache.spark.unsafe.types.UTF8String): Int = {
    val t = if (text == null) "" else text.toString
    var n = 0
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (isNoSpaceScript(cp)) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  /** Code points covered by non-overlapping occurrences of each no-space
    * stopword, summed per word independently (DuckDB twin per word:
    * length(t) - length(replace(t, w, ''))).
    */
  def noSpaceStopCover(text: org.apache.spark.unsafe.types.UTF8String): Int = {
    val t = if (text == null) "" else text.toString
    var cover = 0
    var w = 0
    while (w < noSpaceStopwords.length) {
      val sw = noSpaceStopwords(w)
      var idx = t.indexOf(sw)
      while (idx >= 0) {
        cover += sw.length
        idx = t.indexOf(sw, idx + sw.length)
      }
      w += 1
    }
    cover
  }

  /** Duplicated code-point 4-gram fraction: (total - distinct) / total,
    * 0.0 for texts shorter than 4 code points (DuckDB twin via
    * list_distinct over substr 4-grams).
    */
  def char4DupFraction(text: org.apache.spark.unsafe.types.UTF8String): Double = {
    val t = if (text == null) "" else text.toString
    val cps = t.codePoints().toArray
    val total = cps.length - 3
    if (total <= 0) return 0.0
    // boxed exactness is fine here: the hot path is the fused compute()'s
    // open-addressing tables — this standalone twin exists for the
    // pure-Column pipeline and oracle checks
    val seen = new java.util.HashSet[java.util.List[Integer]]()
    var dup = 0
    var j = 0
    while (j < total) {
      val key = java.util.List.of[Integer](cps(j), cps(j + 1), cps(j + 2),
        cps(j + 3))
      if (!seen.add(key)) dup += 1
      j += 1
    }
    dup.toDouble / total.toDouble
  }

  @inline private def rangeHash(t: String, from: Int, until: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) { h ^= t.charAt(i).toInt; h *= 0x01000193; i += 1 }
    h
  }

  @inline private def rangeEquals(t: String, a0: Int, a1: Int,
                                  b0: Int, b1: Int): Boolean = {
    if (a1 - a0 != b1 - b0) return false
    var i = 0
    val n = a1 - a0
    while (i < n) {
      if (t.charAt(a0 + i) != t.charAt(b0 + i)) return false
      i += 1
    }
    true
  }

  /** Per-thread reusable scratch tables with generation stamps: occupancy
    * is slotGen(s) == gen, so a new document costs one counter increment
    * instead of re-zeroing the tables. Sizing the tables per document was
    * the scaling killer: ~50 KB of freshly zeroed + filled arrays per doc
    * is ~2 GB/s of pure memory-write traffic at full throughput — the
    * cores were fighting for store bandwidth, not doing work.
    */
  private final class Scratch {
    var cap = 1024
    var mask = cap - 1
    var gen = 0
    var wGen = new Array[Int](cap)
    var wSlotStart = new Array[Int](cap)
    var wSlotEnd = new Array[Int](cap)
    var bGen = new Array[Int](cap)
    var bSlotA = new Array[Int](cap)
    var bSlotAe = new Array[Int](cap)
    var bSlotB = new Array[Int](cap)
    var bSlotBe = new Array[Int](cap)
    def ensure(maxWords: Int): Unit = {
      var need = Integer.highestOneBit(math.max(maxWords, 4)) * 4
      if (need > cap) {
        cap = need; mask = cap - 1; gen = 0
        wGen = new Array[Int](cap); wSlotStart = new Array[Int](cap)
        wSlotEnd = new Array[Int](cap)
        bGen = new Array[Int](cap); bSlotA = new Array[Int](cap)
        bSlotAe = new Array[Int](cap); bSlotB = new Array[Int](cap)
        bSlotBe = new Array[Int](cap)
      }
      if (gen == Int.MaxValue) { // stamp wrap guard (once per 2^31 docs)
        java.util.Arrays.fill(wGen, 0)
        java.util.Arrays.fill(bGen, 0)
        gen = 0
      }
      gen += 1 // gen 0 marks empty slots of freshly allocated arrays
    }
    // char-4-gram tables (no-space-script branch only): same
    // generation-stamp scheme, separate sizing — 4-gram count tracks code
    // points, not words
    var cpBuf = new Array[Int](1024)
    var c4Cap = 1024
    var c4Mask = c4Cap - 1
    var c4Gen = 0
    var c4GenArr = new Array[Int](c4Cap)
    var c4Slot = new Array[Int](c4Cap)
    def ensureChar4(nGrams: Int, nCps: Int): Unit = {
      if (nCps > cpBuf.length)
        cpBuf = new Array[Int](Integer.highestOneBit(nCps) * 2)
      val need = Integer.highestOneBit(math.max(nGrams, 4)) * 4
      if (need > c4Cap) {
        c4Cap = need; c4Mask = c4Cap - 1; c4Gen = 0
        c4GenArr = new Array[Int](c4Cap); c4Slot = new Array[Int](c4Cap)
      }
      if (c4Gen == Int.MaxValue) {
        java.util.Arrays.fill(c4GenArr, 0); c4Gen = 0
      }
      c4Gen += 1
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  def compute(text: String): Array[Int] = {
    val t = if (text == null) "" else text

    // light pre-pass: word count only (sizes the scratch tables tightly —
    // sizing from a length upper bound would scatter the hash probes over
    // a 4x larger, colder table)
    var maxWords = 0
    var inWord = false
    var ci = 0
    while (ci < t.length) {
      if (isAsciiSpace(t.charAt(ci))) inWord = false
      else if (!inWord) { maxWords += 1; inWord = true }
      ci += 1
    }

    // FUSED main pass: words by index range (distinct + stopwords + dup
    // bigrams via open addressing over (hash, range) — exact char
    // comparison on collision, zero String allocation) PLUS, per char/
    // code point in the same scan: upper/digit/space class counts, the
    // BPE-ish token machine ([A-Za-z]+ | [0-9]+ | single other code
    // point), the symbol count ([^\p{L}\p{N}\s] twin), and the
    // code-point length. One walk over the text instead of four.
    var upper = 0; var digit = 0; var spaceUnits = 0
    var tokens = 0; var symbols = 0; var surrPairs = 0
    var nospace = 0
    var tokenState = 0 // 0 = none, 1 = in letter run, 2 = in digit run
    val sc = scratch.get()
    sc.ensure(maxWords)
    val mask = sc.mask
    val gen = sc.gen
    val wGen = sc.wGen
    val wSlotStart = sc.wSlotStart
    val wSlotEnd = sc.wSlotEnd
    val bGen = sc.bGen
    val bSlotA = sc.bSlotA
    val bSlotAe = sc.bSlotAe
    val bSlotB = sc.bSlotB
    val bSlotBe = sc.bSlotBe

    var wc = 0; var stops = 0; var distinctW = 0; var dupB = 0
    var prevS = -1; var prevE = -1; var prevH = 0
    var i = 0
    while (i < t.length) {
      if (isAsciiSpace(t.charAt(i))) {
        spaceUnits += 1; tokenState = 0; i += 1
      }
      else {
        val ws = i
        var inW = true
        while (inW && i < t.length) {
          val c = t.charAt(i)
          if (isAsciiSpace(c)) inW = false
          else if (c >= 'a' && c <= 'z') {
            if (tokenState != 1) { tokens += 1; tokenState = 1 }
            i += 1
          } else if (c >= 'A' && c <= 'Z') {
            upper += 1
            if (tokenState != 1) { tokens += 1; tokenState = 1 }
            i += 1
          } else if (c >= '0' && c <= '9') {
            digit += 1
            if (tokenState != 2) { tokens += 1; tokenState = 2 }
            i += 1
          } else if (c < 128) {
            // ASCII non-alnum non-space: one token, and always a symbol
            tokens += 1; tokenState = 0; symbols += 1
            i += 1
          } else {
            val cp = t.codePointAt(i)
            tokens += 1; tokenState = 0
            val isLN = Character.isLetter(cp) || {
              val ty = Character.getType(cp)
              ty == Character.DECIMAL_DIGIT_NUMBER ||
                ty == Character.LETTER_NUMBER ||
                ty == Character.OTHER_NUMBER ||
                // \p{M}: combining marks extend letters (Devanagari
                // matras, Arabic harakat) — counting them as symbols
                // drops whole scripts via max_symbol_word_ratio
                ty == Character.NON_SPACING_MARK ||
                ty == Character.COMBINING_SPACING_MARK ||
                ty == Character.ENCLOSING_MARK
            }
            if (!isLN) symbols += 1
            if (isNoSpaceScript(cp)) nospace += 1
            if (cp >= 0x10000) { surrPairs += 1; i += 2 } else i += 1
          }
        }
        val we = i
        wc += 1
        if (isStopword(t, ws, we)) stops += 1
        val h = rangeHash(t, ws, we)
        var s = h & mask
        var found = false
        while (!found && wGen(s) == gen) {
          if (rangeEquals(t, wSlotStart(s), wSlotEnd(s), ws, we)) found = true
          else s = (s + 1) & mask
        }
        if (!found) {
          wGen(s) = gen; wSlotStart(s) = ws; wSlotEnd(s) = we; distinctW += 1
        }
        if (prevS >= 0) {
          var bs = (prevH * 31 + h) & mask
          var bFound = false
          while (!bFound && bGen(bs) == gen) {
            if (rangeEquals(t, bSlotA(bs), bSlotAe(bs), prevS, prevE) &&
              rangeEquals(t, bSlotB(bs), bSlotBe(bs), ws, we)) bFound = true
            else bs = (bs + 1) & mask
          }
          if (bFound) dupB += 1
          else {
            bGen(bs) = gen
            bSlotA(bs) = prevS; bSlotAe(bs) = prevE
            bSlotB(bs) = ws; bSlotBe(bs) = we
          }
        }
        prevS = ws; prevE = we; prevH = h
      }
    }

    // (token machine = hand-rolled twin of [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]
    // — the regex alternation measured 39k docs/sec and refused to scale
    // across threads even with per-thread Patterns, MicroBench4; symbol
    // count = hand-rolled twin of [^\p{L}\p{N}\s], \p{L} = isLetter,
    // \p{N} = Nd|Nl|No. Equality with both regex twins is asserted by
    // TextStatsSpec, including astral/CJK/accented fixtures.)
    val docLength = t.length - surrPairs // = codePointCount
    // \s is ASCII-only; each ASCII space is one code unit = one code point
    val nonSpace = docLength - spaceUnits

    // lines: non-blank raw lines, distinct on raw content (few lines per
    // document; linear range comparison keeps exactness with zero allocs)
    var lines = 0; var distinctL = 0
    var lStart = new Array[Int](64)
    var lEnd = new Array[Int](64)
    var lN = 0
    var start = 0
    var li = 0
    while (li <= t.length) {
      if (li == t.length || t.charAt(li) == '\n') {
        var blank = true
        var k = start
        while (blank && k < li) { if (t.charAt(k) != ' ') blank = false; k += 1 }
        if (!blank) {
          lines += 1
          var dup = false
          var j = 0
          while (!dup && j < lN) {
            if (rangeEquals(t, lStart(j), lEnd(j), start, li)) dup = true
            j += 1
          }
          if (!dup) {
            if (lN == lStart.length) {
              lStart = java.util.Arrays.copyOf(lStart, lN * 2)
              lEnd = java.util.Arrays.copyOf(lEnd, lN * 2)
            }
            lStart(lN) = start; lEnd(lN) = li; lN += 1
            distinctL += 1
          }
        }
        start = li + 1
      }
      li += 1
    }

    // ---- script-adaptive post-pass (round 6): only when the document is
    // no-space-script-dominant, so Latin-script corpora pay nothing. The
    // word rules don't discriminate on unsegmented zh/ja/th (the whole
    // text is one "word"); their char-based twins do:
    //  - stopword COVERAGE: code points covered by non-overlapping
    //    occurrences of each frozen zh/ja/th stopword, counted per word
    //    independently (occurrences of different stopwords may overlap;
    //    the DuckDB twin length(t)-length(replace(t,w,'')) per word sums
    //    identically). O(|noSpaceStopwords|) indexOf scans per doc — ~60
    //    SIMD-intrinsic passes over a page, taken only on CJK/Thai docs;
    //    an Aho-Corasick pass is the upgrade path if no-space corpora
    //    ever dominate the scan cost.
    //  - repetition: duplicated code-point 4-grams (total - distinct),
    //    the char twin of duplicated word bigrams.
    var cover = 0; var c4Total = 0; var c4Dup = 0
    if (noSpaceBranch(nospace, docLength)) {
      val sws = noSpaceStopwords
      var w = 0
      while (w < sws.length) {
        val sw = sws(w)
        var idx = t.indexOf(sw)
        while (idx >= 0) {
          cover += sw.length // all no-space stopwords are BMP: units==cps
          idx = t.indexOf(sw, idx + sw.length)
        }
        w += 1
      }
      c4Total = math.max(docLength - 3, 0)
      if (c4Total > 0) {
        sc.ensureChar4(c4Total, docLength)
        val cps = sc.cpBuf
        var k = 0
        var ci2 = 0
        while (ci2 < t.length) {
          val cp = t.codePointAt(ci2)
          cps(k) = cp; k += 1
          ci2 += Character.charCount(cp)
        }
        val cMask = sc.c4Mask
        val cGen = sc.c4Gen
        val cGenArr = sc.c4GenArr
        val cSlot = sc.c4Slot
        var j = 0
        while (j < c4Total) {
          var h = 0x811c9dc5
          h ^= cps(j); h *= 0x01000193
          h ^= cps(j + 1); h *= 0x01000193
          h ^= cps(j + 2); h *= 0x01000193
          h ^= cps(j + 3); h *= 0x01000193
          var s = h & cMask
          var found = false
          while (!found && cGenArr(s) == cGen) {
            val o = cSlot(s)
            if (cps(o) == cps(j) && cps(o + 1) == cps(j + 1) &&
              cps(o + 2) == cps(j + 2) && cps(o + 3) == cps(j + 3))
              found = true
            else s = (s + 1) & cMask
          }
          if (found) c4Dup += 1
          else { cGenArr(s) = cGen; cSlot(s) = j }
          j += 1
        }
      }
    }

    Array(docLength, wc, tokens, symbols, stops, distinctW, dupB,
      lines, distinctL, nonSpace, upper, digit,
      nospace, cover, c4Total, c4Dup)
  }

  val statsUdf = udf { text: String => compute(text) }

  def statsCol(text: Column): Column = statsUdf(text)

  /** Ratio measures from a stats vector column — same formulas as the
    * Column twins in Heuristics, so values are identical.
    */
  def measure(name: String, st: Column): Option[Column] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    def d(c: Column) = c.cast(DoubleType)
    def wc1 = greatest(st.getItem(WORD_COUNT), lit(1))
    name match {
      case "doc_length"   => Some(d(st.getItem(DOC_LENGTH)))
      case "word_count"   => Some(d(st.getItem(WORD_COUNT)))
      case "token_count"  => Some(d(st.getItem(TOKEN_COUNT)))
      case "symbol_word_ratio" => Some(d(st.getItem(SYMBOL_COUNT)) / d(wc1))
      case "stopword_fraction" => Some(d(st.getItem(STOP_HITS)) / d(wc1))
      case "word_repetition_ratio" => Some(
        when(st.getItem(WORD_COUNT) === 0, lit(0.0))
          .otherwise(lit(1.0) - d(st.getItem(DISTINCT_WORDS)) /
            d(st.getItem(WORD_COUNT))))
      case "dup_2gram_fraction" => Some(
        when(st.getItem(WORD_COUNT) < 2, lit(0.0))
          .otherwise(d(st.getItem(DUP_2GRAMS)) /
            d(st.getItem(WORD_COUNT) - 1)))
      case "dup_line_fraction" => Some(
        when(st.getItem(LINE_COUNT) === 0, lit(0.0))
          .otherwise(lit(1.0) - d(st.getItem(DISTINCT_LINES)) /
            d(st.getItem(LINE_COUNT))))
      case "mean_word_length" => Some(d(st.getItem(NON_SPACE_COUNT)) / d(wc1))
      // script-adaptive twins: same branch condition and formulas as the
      // Heuristics Column versions, read from the fused stats fields (the
      // no-space fields are populated exactly when the branch is taken)
      case "script_nospace_fraction" => Some(
        d(st.getItem(NOSPACE_COUNT)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))))
      case "symbol_ratio_adaptive" => Some {
        val branch = d(st.getItem(NOSPACE_COUNT)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))) >= lit(0.3)
        when(branch, d(st.getItem(SYMBOL_COUNT)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))))
          .otherwise(d(st.getItem(SYMBOL_COUNT)) / d(wc1))
      }
      case "stopword_fraction_adaptive" => Some {
        val branch = d(st.getItem(NOSPACE_COUNT)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))) >= lit(0.3)
        when(branch, d(st.getItem(NOSPACE_STOP_COVER)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))))
          .otherwise(d(st.getItem(STOP_HITS)) / d(wc1))
      }
      case "repetition_adaptive" => Some {
        val branch = d(st.getItem(NOSPACE_COUNT)) /
          d(greatest(st.getItem(DOC_LENGTH), lit(1))) >= lit(0.3)
        when(branch,
          when(st.getItem(CHAR4_TOTAL) <= 0, lit(0.0))
            .otherwise(d(st.getItem(CHAR4_DUP)) / d(st.getItem(CHAR4_TOTAL))))
          .otherwise(
            when(st.getItem(WORD_COUNT) === 0, lit(0.0))
              .otherwise(lit(1.0) - d(st.getItem(DISTINCT_WORDS)) /
                d(st.getItem(WORD_COUNT))))
      }
      case "upper_fraction" => Some(d(st.getItem(UPPER_COUNT)) /
        d(greatest(st.getItem(DOC_LENGTH), lit(1))))
      case "digit_fraction" => Some(d(st.getItem(DIGIT_COUNT)) /
        d(greatest(st.getItem(DOC_LENGTH), lit(1))))
      case "quality_score" => Some(round(
        least(d(st.getItem(DOC_LENGTH)) / lit(500.0), lit(1.0)) * lit(0.3) +
          least((d(st.getItem(STOP_HITS)) / d(wc1)) / lit(0.1), lit(1.0)) * lit(0.3) +
          greatest(lit(1.0) - (d(st.getItem(SYMBOL_COUNT)) / d(wc1)) * lit(2.0),
            lit(0.0)) * lit(0.2) +
          greatest(lit(1.0) - when(st.getItem(WORD_COUNT) === 0, lit(0.0))
            .otherwise(lit(1.0) - d(st.getItem(DISTINCT_WORDS)) /
              d(st.getItem(WORD_COUNT))), lit(0.0)) * lit(0.2), 6))
      case _ => None
    }
  }
}
