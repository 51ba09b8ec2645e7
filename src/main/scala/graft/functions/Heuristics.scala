package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-document heuristic quality measures, compiled as pure Catalyst
  * Columns (never UDFs) so every rule stays inside whole-stage codegen and
  * the parquet scan can prune to just the `text` column.
  *
  * These are the web-text recast of the reference's free-form `measure`
  * expressions (reference weiser/checks/numeric.py:6-14 injects arbitrary
  * SQL scalars; here each named measure is a type-checked Column builder).
  * The thresholds live in check configs, not here.
  */
object Heuristics {

  /** Stopword list used by stopwordFraction: the ~20 most common function
    * words per supported language (multilingual coverage — an English-only
    * list turns the quality filter into a language filter). Frozen:
    * changing it changes verdicts and the committed golden labels.
    */
  val stopwords: Seq[String] = Seq(
    // en
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
    // es
    "de", "la", "que", "el", "en", "y", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    // fr
    "le", "les", "des", "est", "pour", "qui", "dans", "plus", "pas", "au",
    "sur", "ne", "ce", "il", "sont", "aux", "avec", "son", "ont", "cette",
    // de
    "der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "auf",
    "für", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch", "es",
    // zh (function characters)
    "的", "一", "是", "在", "不", "了", "有", "和", "人", "这",
    "中", "大", "为", "上", "个", "我", "以", "要", "他", "们",
    // round-4 coverage fix: the list above only covered the round-1
    // languages, so min_stopword_fraction silently dropped ALL ru prose
    // and half of ja (frozen into the round-3 goldens as keep=false) and
    // would have dropped every ko document. A multilingual filter needs
    // function-word coverage for every language it claims to identify;
    // these are the same public frequency-list words the langid seeds
    // draw from. Goldens regenerated deliberately with the keep flips
    // audited (ru/ja/ko/pl prose now kept — the POINT of the change).
    // it
    "di", "e", "il", "che", "per", "un", "non", "sono", "si", "da",
    "come", "più", "ma", "se", "anche", "della", "questo", "gli", "alla", "nel",
    // pt
    "o", "do", "da", "em", "uma", "os", "mais", "dos", "mas", "foi",
    "ao", "ele", "tem", "ser", "há", "já", "está", "você", "muito", "quando",
    // nl
    "het", "een", "van", "dat", "op", "te", "zijn", "voor", "met", "niet",
    "aan", "er", "om", "door", "maar", "dan", "ook", "bij", "nog", "naar",
    // ru
    "и", "в", "не", "на", "я", "что", "он", "с", "как", "это",
    "она", "по", "но", "они", "к", "у", "из", "за", "то", "все",
    // ja
    "の", "に", "は", "を", "た", "が", "で", "て", "と", "し",
    "ある", "いる", "する", "から", "な", "こと", "この", "その", "また", "もの",
    // pl
    "nie", "się", "w", "i", "z", "co", "jest", "że", "tak",
    "jak", "ale", "po", "ja", "ty", "już", "tylko", "czy", "gdzie", "teraz",
    // ko
    "이", "그", "저", "것", "수", "들", "등", "및", "에서", "은",
    "는", "가", "을", "를", "에", "의", "로", "와", "과", "도",
    // round-5 depth languages (same rule: every language the model
    // identifies gets function-word coverage, or min_stopword_fraction
    // silently drops its prose)
    // sv
    "och", "att", "det", "som", "på", "är", "av", "den", "till", "inte",
    "han", "hon", "vi", "du", "sig", "men", "ett", "har", "var", "kan",
    // tr
    "bir", "ve", "bu", "için", "ne", "gibi", "ile", "daha", "çok", "ama",
    "ki", "sonra", "kadar", "göre", "her", "şey", "değil", "çünkü", "olan", "zaman",
    // id
    "yang", "dan", "itu", "dengan", "untuk", "tidak", "ini", "dari", "dalam", "akan",
    "pada", "juga", "saya", "kita", "dia", "mereka", "ada", "bisa", "sudah", "karena",
    // vi
    "của", "và", "là", "có", "không", "được", "một", "người", "trong", "cho",
    "với", "những", "này", "khi", "đã", "các", "để", "tôi", "rất", "cũng",
    // ar
    "في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "هذه", "التي",
    "الذي", "كان", "هو", "هي", "لا", "ما", "قد", "كل", "بعد", "عند",
    // hi
    "के", "में", "है", "और", "की", "से", "का", "को", "पर", "यह",
    "कि", "नहीं", "एक", "हैं", "था", "हो", "कर", "जो", "वह", "भी",
    // th (segmented-corpus shape, like zh)
    "ที่", "และ", "ใน", "ของ", "มี", "ไม่", "ให้", "ได้", "ว่า", "เป็น",
    "การ", "จะ", "ไป", "มา", "กับ", "แต่", "ก็", "อยู่", "คน", "นี้"
  ).distinct

  def docLength(text: Column): Column = length(coalesce(text, lit("")))

  /** Whitespace-delimited words with empty tokens dropped — robust to
    * leading/trailing/mixed whitespace (note Spark's `trim` only strips
    * 0x20, not tabs, so a filter beats a trim-then-split).
    */
  def words(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), w => length(w) > 0)

  /** Same \s+-split count, but as a native codegen'd scalar: the lambda
    * `size(words(text))` contains an ArrayFilter (CodegenFallback) that
    * throws the whole enclosing project out of whole-stage codegen, and
    * this count is the denominator of every ratio measure. Value parity
    * with the lambda twin is property-pinned (TextStatsSpec).
    */
  def wordCount(text: Column): Column = TextScalarExpr(text, "word_count")

  /** Count of "tokens" under a BPE-ish pre-tokenizer: letter runs, digit
    * runs, and single non-alphanumeric glyphs — the usual byte-pair
    * pre-segmentation shape, kept RE2-compatible for the DuckDB oracle.
    *
    * Decomposed into three single-char-class passes instead of the
    * equivalent alternation `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`: the JDK
    * engine executes that alternation at ~39k docs/sec with NO thread
    * scaling (MicroBench4), while plain char classes scale cleanly.
    * Exactly equivalent — greedy leftmost matching makes every letter/
    * digit match in the alternation a maximal run, so total matches =
    * letter runs + digit runs + other non-space code points. (The fused
    * TextStats pass computes the same count in its single walk; this is
    * the pure-Column twin for standalone measures and the oracle.)
    */
  def tokenCount(text: Column): Column = {
    val t = coalesce(text, lit(""))
    size(regexp_extract_all(t, lit("[A-Za-z]+"), lit(0))) +
      size(regexp_extract_all(t, lit("[0-9]+"), lit(0))) +
      length(regexp_replace(t, "[A-Za-z0-9\\s]", ""))
  }

  /** BPE-ish token count: the GPT-2 pre-tokenizer shape — contraction
    * splits ('s 't 're 've 'm 'll 'd), optionally space-prefixed Unicode
    * letter and number runs, punctuation runs — minus Python's trailing
    * lookahead, counted as regex matches (whitespace runs are skipped,
    * not counted). The estimation path for token budgets/sampling
    * weights: a byte-level BPE's true count tracks this within a small
    * constant on natural text. Kept as ONE declarative pattern so the
    * DuckDB oracle runs the identical regex (RE2 and java.util.regex
    * agree on leftmost-first alternation and \p{L}/\p{N}); the
    * whitespace class is spelled explicitly because the engines' \s
    * differ (Java adds \x0B). NOT for the fused hot loop — JDK
    * alternation scaling pathology, BENCH.md wall #5; [[tokenCount]]
    * above shows the decomposed formulation that scales.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")),
      lit("'(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+"),
      lit(0)))

  /** Symbol characters per word. "Symbol" = not a Unicode letter, digit or
    * whitespace (`\p{L}\p{N}` — an ASCII-only class would count every
    * accented or CJK character as a symbol and silently turn the quality
    * filter into a Latin-script filter).
    */
  def symbolWordRatio(text: Column): Column = {
    // \p{M} (combining marks) are WORD characters, not symbols: Devanagari
    // vowel signs, Arabic harakat and Thai tone marks are Mn/Mc code
    // points, so an L/N-only class counts ~40% of normal Hindi prose as
    // symbols and max_symbol_word_ratio drops the entire language
    // (round-5 audit finding — the symbol-class analog of the round-4
    // stopword-coverage defect)
    val symbols = length(regexp_replace(coalesce(text, lit("")),
      "[\\p{L}\\p{M}\\p{N}\\s]", ""))
    symbols.cast(DoubleType) / greatest(wordCount(text), lit(1)).cast(DoubleType)
  }

  /** Fraction of duplicated word 2-grams (Gopher-style repetition signal):
    * robust across scripts — keyword stuffing scores ~1.0, clean prose in
    * any language scores low even with a small vocabulary. JVM loop (the
    * Catalyst slice formulation is O(words^2), cf. Dedup.shingles).
    */
  val dup2gramUdf = org.apache.spark.sql.functions.udf { ws: Seq[String] =>
    if (ws.length < 2) 0.0
    else {
      val seen = new java.util.HashSet[String]()
      var dups = 0
      var i = 0
      while (i < ws.length - 1) {
        if (!seen.add(ws(i) + " " + ws(i + 1))) dups += 1
        i += 1
      }
      dups.toDouble / (ws.length - 1)
    }
  }

  def dup2gramFraction(text: Column): Column = dup2gramUdf(words(text))

  /** Fraction of words that are stopwords — low coverage flags non-prose.
    *
    * BOUNDARY: word-based measures assume whitespace-delimited input;
    * unsegmented zh/ja/th prose reads as one giant "word" with stopword
    * fraction ~0. The RULES therefore use [[stopwordFractionAdaptive]]
    * (and the other adaptive variants below), which switch to char-based
    * twins on no-space-script-dominant documents — this word-based
    * measure remains for space-script corpora and as the frozen
    * quality_score ingredient.
    */
  def stopwordFraction(text: Column): Column = {
    // membership via the static case-folded O(1) hash table shared with
    // the fused pass (TextScalarExpr -> TextStats.stopHits): the old
    // `array_contains(literal stoplist, lower(w))` lambda was an
    // O(|stoplist|) linear scan per word that tripled text_quality's
    // runtime when the stoplist reached ~270 entries — and kept growing
    // with every language added. Value is bit-identical (TextStatsSpec
    // pins it against an independent split+Set reference).
    val hits = TextScalarExpr(text, "stop_hits")
    hits.cast(DoubleType) / greatest(wordCount(text), lit(1)).cast(DoubleType)
  }

  // ---- script-adaptive measures (round 6) ----------------------------
  // Word-based rules assume whitespace-delimited input; real Common-Crawl
  // zh/ja/th prose arrives UNSEGMENTED and reads as one giant "word"
  // (stopword fraction ~0, symbol/word ratio absurd), so the plain word
  // rules silently drop whole languages. The adaptive variants switch to
  // char-based twins when >= 30% of code points are in the no-space
  // script ranges (TextStats.isNoSpaceScript): stopword coverage by
  // substring occurrence over the frozen zh/ja/th stoplists, symbols per
  // code point, repetition over code-point 4-grams. Space-script
  // documents evaluate the branch condition only — CaseWhen keeps the
  // char-twin expressions unevaluated for them. Language ID needed no
  // such adaptation (char n-grams, pinned on unsegmented Thai).

  /** Fraction of code points in no-space-script ranges (the branch
    * condition, exposed as a measure for observability).
    */
  def scriptNoSpaceFraction(text: Column): Column =
    TextScalarExpr(text, "nospace_count").cast(DoubleType) /
      greatest(docLength(text), lit(1)).cast(DoubleType)

  private def inNoSpaceBranch(text: Column): Column =
    scriptNoSpaceFraction(text) >= lit(0.3)

  /** Symbols per word (space scripts) / per code point (no-space
    * scripts), against the same 0.1-scale threshold: clean CJK prose runs
    * ~5% punctuation code points, symbol soup far above.
    */
  def symbolRatioAdaptive(text: Column): Column = {
    val symbols = length(regexp_replace(coalesce(text, lit("")),
      "[\\p{L}\\p{M}\\p{N}\\s]", ""))
    when(inNoSpaceBranch(text),
      symbols.cast(DoubleType) /
        greatest(docLength(text), lit(1)).cast(DoubleType))
      .otherwise(symbolWordRatio(text))
  }

  /** Stopword fraction of words (space scripts) / stopword-covered
    * fraction of code points (no-space scripts). Coverage counts
    * non-overlapping occurrences per stoplist word independently, so
    * overlapping hits of DIFFERENT words each count — same sum the
    * DuckDB length(t)-length(replace(t,w,'')) twin computes.
    */
  def stopwordFractionAdaptive(text: Column): Column =
    when(inNoSpaceBranch(text),
      TextScalarExpr(text, "nospace_stop_cover").cast(DoubleType) /
        greatest(docLength(text), lit(1)).cast(DoubleType))
      .otherwise(stopwordFraction(text))

  /** Word-repetition ratio (space scripts) / duplicated code-point
    * 4-gram fraction (no-space scripts) — keyword stuffing scores ~1.0
    * in both twins, clean prose low.
    */
  def repetitionAdaptive(text: Column): Column =
    when(inNoSpaceBranch(text), TextScalarExpr(text, "char4_dup_fraction"))
      .otherwise(wordRepetitionRatio(text))

  /** 1 - distinct/total words: repetition (spammy keyword stuffing).
    * Native scalar (codegen'd) — the array_distinct-over-split lambda was
    * the last CodegenFallback expression in the text_quality projection;
    * value parity with the lambda twin is property-pinned.
    */
  def wordRepetitionRatio(text: Column): Column =
    TextScalarExpr(text, "word_repetition")

  /** 1 - distinct/total non-blank lines: duplicated-line spam. */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(coalesce(text, lit("")), "\n"),
      l => length(trim(l)) > 0)
    val n = size(lines)
    when(n === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast(DoubleType) / n.cast(DoubleType))
  }

  def meanWordLength(text: Column): Column = {
    val nonSpace = length(regexp_replace(coalesce(text, lit("")), "\\s", ""))
    nonSpace.cast(DoubleType) / greatest(wordCount(text), lit(1)).cast(DoubleType)
  }

  def upperFraction(text: Column): Column = {
    val uppers = length(regexp_replace(coalesce(text, lit("")), "[^A-Z]", ""))
    uppers.cast(DoubleType) / greatest(docLength(text), lit(1)).cast(DoubleType)
  }

  def digitFraction(text: Column): Column = {
    val digits = length(regexp_replace(coalesce(text, lit("")), "[^0-9]", ""))
    digits.cast(DoubleType) / greatest(docLength(text), lit(1)).cast(DoubleType)
  }

  /** Composite quality score in [0,1]; a fixed linear blend of the
    * heuristics (weights frozen — they define the score's semantics).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(docLength(text).cast(DoubleType) / lit(500.0), lit(1.0))
    val stopScore = least(stopwordFraction(text) / lit(0.1), lit(1.0))
    val symPenalty = greatest(lit(1.0) - symbolWordRatio(text) * lit(2.0), lit(0.0))
    val repPenalty = greatest(lit(1.0) - wordRepetitionRatio(text), lit(0.0))
    round(lenScore * lit(0.3) + stopScore * lit(0.3) +
      symPenalty * lit(0.2) + repPenalty * lit(0.2), 6)
  }

  /** Document fingerprint: md5 hex of the raw text (exact-dup key). */
  def fingerprintMd5(text: Column): Column = md5(coalesce(text, lit("")))

  /** Rolling polynomial hash (base-31 mod 1e9+7, the classical textbook
    * modulus) over the text's characters, computed with the higher-order
    * `aggregate` function — stays in codegen, no UDF. The modulus must
    * keep acc*31 far below 2^63: Spark 4 runs ANSI arithmetic, so a
    * 2^61-scale modulus overflows `times` mid-fold. DuckDB twin in the
    * text_fingerprint oracle.
    */
  def rollingHash(text: Column): Column = {
    val prime = 1000000007L
    aggregate(
      split(coalesce(text, lit("")), ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + coalesce(ascii(ch), lit(0)).cast("long"),
        lit(prime)))
  }
}
