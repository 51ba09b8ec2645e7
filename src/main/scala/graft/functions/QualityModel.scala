package graft.functions

/** TRAINED quality classifier — the model-based arm of the quality
  * filter, alongside the declarative heuristic rules: a fastText-style
  * binary head (hashed char 1/2/3-gram features into one linear weight
  * vector + sigmoid) scoring "reference-like prose" vs "web junk", the
  * classifier-filtering shape the GPT-3/LLaMA data recipes describe
  * (score against a curated reference corpus, keep high-scoring pages).
  * The reference engine has no model scoring at all; this follows the
  * [[LangId]] trained-head discipline the survey established:
  *
  *  - features are [[LangId.meanFeaturize]]'s gram stream (same virtual
  *    " text " lowercase view, same FNV-1a buckets, same per-gram mean
  *    normalization), so the quality head is one more accumulator over
  *    the gram stream the langid head already defines, PLUS [[HandK]]
  *    dense hand features ([[handFeatures]]: word-bigram and
  *    char-8-gram repetition) appended past the gram buckets — char
  *    n-grams are structurally blind to verbatim repetition (a chunk
  *    repeated 40x has exactly prose's gram distribution), so without
  *    them stuffing scored prose-like (the round-6 boundary this
  *    closes) — NOTE the pipeline gate scores SCRUBBED text while
  *    langid scores raw text, so in the shipped pipeline order the two
  *    scores are separate passes over different streams by design, not
  *    a missed fusion;
  *  - training is fully deterministic, once per JVM at class init
  *    (measured ~330 ms — the same order as [[LangId]]'s ~310 ms init;
  *    per-executor, not per-task, so it vanishes against any real
  *    executor lifetime):
  *    example-ordered SGD on logistic loss, linearly-decayed rate,
  *    class-balanced gradients, bias-free (a learned bias just encodes
  *    the positive/negative window-count imbalance), StrictMath only —
  *    every executor materializes bit-identical weights;
  *  - positives are the frozen 19-language [[LangId.seeds]] prose
  *    (already the engine's curated reference corpus); negatives are a
  *    frozen junk corpus covering the classes the heuristic rules also
  *    target (keyword stuffing, nav/footer boilerplate, code and markup
  *    fragments, id/digit spam, rare-bigram gibberish) — so the model
  *    generalizes the rules rather than memorizing fixtures (the golden
  *    corpus is NOT in the training set; QualityModelSpec holds it out).
  *
  * Inference is the streaming scorer shape of [[LangId.predict]]: grams
  * stream into ONE accumulator (the binary head reads one float per
  * gram), no per-document feature vector, document length cancels in the
  * per-gram mean. Empty/blank text scores 0.0.
  *
  * This is a SCORING operator — thresholding is the caller's policy
  * (e.g. `quality_prob >= 0.5` as a RowRule measure). It is deliberately
  * not in [[graft.operators.QualityFilter.defaultRules]]: the
  * reference-parity keep/drop contract (F1 vs reference labels, frozen
  * goldens) must not move when the model is retrained.
  */
object QualityModel extends Serializable {

  /** Frozen junk seed corpora (negative classes). Space-separated so the
    * window slicer treats them like the language seeds. Each class is
    * one string; windows are cut per class so no window mixes classes.
    */
  private[functions] val junkSeeds: Array[String] = Array(
    // keyword stuffing / SEO spam
    "buy cheap discount sale offer deal best price free shipping order " +
      "now click here win money online casino bonus jackpot slots poker " +
      "bet lucky spin prize claim reward gift card code coupon promo " +
      "cheap cheap buy buy sale sale best best free free now now " +
      "viagra pills pharmacy meds insurance loans credit score mortgage " +
      "rates forex crypto bitcoin profit earn cash fast easy guaranteed " +
      "limited time act now dont miss exclusive offer best deal buy today " +
      "lowest price top rated five stars satisfaction guaranteed money back",
    // navigation / footer boilerplate
    "home about contact login register sign in sign up privacy policy " +
      "terms of service cookie settings sitemap next prev page copyright " +
      "all rights reserved subscribe newsletter follow us share menu " +
      "search help faq support careers press blog archive tags categories " +
      "related posts read more skip to content back to top load more " +
      "view all show more accept cookies manage preferences language " +
      "english select country united states shopping cart checkout " +
      "my account wishlist compare track order returns store locator",
    // code / markup fragments
    "var x = 0 ; function ( ) { return [ 1 , 2 , 3 ] ; } </div> <a href= " +
      "http://example.com ?id=123&ref=456 #fff !important { margin: 0px ; " +
      "padding: 0px ; } || && == != ++ -- => $scope console.log ( error ) " +
      "undefined null NaN TypeError stack trace at line 42 col 7 module " +
      "exports require ( ) import from default class extends implements " +
      "public static void main String [ ] args System.out.println printf " +
      "SELECT * FROM WHERE AND OR NOT NULL INSERT INTO VALUES UPDATE SET",
    // id / digit spam
    "a8f3e2 7b9c01 0x1f4a 99213 555-0100 4096 65535 f00d beef 1234567890 " +
      "abcdef0123 00:1a:2b:3c:4d:5e 192.168.0.1 10.0.0.255 fe80::1 " +
      "550e8400-e29b-41d4-a716-446655440000 20240101T000000Z 1707654321 " +
      "9781234567890 978-3-16-148410-0 4111111111111111 SKU-0042-AX " +
      "REF#88471 v2.31.7-rc1 build 20847 rev 9f3ac21 sha256 deadbeef " +
      "0755 0644 644 755 127.0.0.1 8080 443 3306 5432 65001 utf-8 " +
      "e2b4c6d8 f1a3b5c7 9d8e7f6a 5b4c3d2e 1f2e3d4c a0b1c2d3 e4f5a6b7",
    // rare-bigram gibberish (letter soup with no language structure)
    "xq zvkw wfjp qgxzt vkwqx jzxqv pkqzw xvjqk qzwxv kjqxz wvqzx jxqkv " +
      "zqxwv kvjxq xwzqv qjkxz vzwxq kxqjv zxvqw qwkxj vxzqk jwqxz kzvxq " +
      "xjqwv qvkzx wzjqx vqxkw zkxqj xwvqz qkjzx vwxqz jzqkx qxvzw kwjqz " +
      "zzyx xyzz yzzx zxyy yyzx xzyz qqpw wpqq pqwq qwpp ppwq wqpq " +
      "fjgh ghjf jfgh hgfj gjhf hfgj vbnm mnbv bnvm mvnb nmvb vmnb",
    // pure symbol soup (decorative/ASCII-art punctuation runs)
    "@@@ ### $$$ %%% ^^^ &&& *** @#$ %^& *@# $%^ &*@ #$% ^&* @@ ## $$ " +
      "%% ^^ && ** @# $% ^& *@ #$ %^ &* @ # $ % ^ & * @@@@ #### $$$$ " +
      "%%%% ^^^^ &&&& **** ~~~ ``` ||| \\\\ /// +++ === --- ___ ::: ;;; " +
      "!!! ??? <<< >>> [[[ ]]] ((( ))) {{{ }}} ... ,,, ''' \"\"\" " +
      "*-* +-+ =-= ~!~ @!@ #!# $!$ %!% ^!^ &!& *!* <-> >=< |=| :-: " +
      "-=- _-_ .-. ,-, ;-; !-! ?-? <=> >|< [|] (|) {|} ~|~ `|` =|=")

  /** Repetition junk (negative): short word chunks repeated, segmented
    * ("w1 w2 w3 w1 w2 w3 ...") and unsegmented ("c1..c9" glued and
    * repeated — the no-space stuffing shape). Built FROM the prose
    * seeds' own vocabulary, so char n-grams CANNOT separate these from
    * prose — the dense repetition features below are the only
    * consistent signal, which forces SGD to learn them instead of
    * memorizing junk grams. Two chunk periods (3 and 6 words) so the
    * learned weight generalizes across repeat lengths (doc-level
    * inference sees periods the 12-word training window cannot).
    */
  private[functions] val repetitionSeeds: Array[String] = {
    val segLangs =
      Array("en", "es", "fr", "de", "ru", "ar", "hi", "th", "ja")
    val seg = segLangs.flatMap { l =>
      val ws = LangId.seeds(l).split("\\s+").filter(_.nonEmpty)
      Array(
        Array.fill(40)(ws.take(3).mkString(" ")).mkString(" "),
        Array.fill(20)(ws.slice(3, 9).mkString(" ")).mkString(" "))
    }
    val unseg = Array("zh", "ja", "th").map { l =>
      LangId.seeds(l).replaceAll("\\s+", "").take(9) * 40
    }
    seg ++ unseg
  }

  /** Number of dense hand features appended past the gram buckets. */
  private[functions] val HandK = 2

  /** Dense hand features — the signals char n-grams are structurally
    * blind to (a chunk repeated verbatim has exactly prose's gram
    * distribution): word-BIGRAM repetition and char-8-gram repetition.
    * Bigrams, not unigrams, for the word feature: fixture/synthetic
    * prose drawn from a small vocabulary repeats single words heavily
    * (coupon-collector effect) while its bigram space stays large, so
    * the bigram rate separates verbatim repetition from vocabulary
    * poverty. The char-8-gram twin catches unsegmented (no-space)
    * stuffing, where there are no word bigrams at all. Both in [0,1],
    * 0 for texts too short to form a gram; FNV-1a hashed distinct
    * counts (deterministic; collisions only ever UNDERcount dups).
    * One O(len) pass + two hash sets per call — this is the model
    * scoring path, not the fused heuristic pass, so per-doc set
    * allocation is acceptable (same order as the shingle operators).
    */
  private[graft] def handFeatures(text: String): Array[Float] = {
    val n = text.length
    // word bigrams: FNV over the two words' chars with a 0 separator
    val bigrams = new java.util.HashSet[Integer]()
    var totalBi = 0
    var prevStart = -1; var prevEnd = -1
    var wStart = -1
    var i = 0
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (Character.isWhitespace(c)) {
        if (wStart >= 0) {
          if (prevStart >= 0) {
            var h = 0x811c9dc5
            var j = prevStart
            while (j < prevEnd) { h ^= text.charAt(j).toInt; h *= 0x01000193; j += 1 }
            h ^= 0; h *= 0x01000193
            j = wStart
            while (j < i) { h ^= text.charAt(j).toInt; h *= 0x01000193; j += 1 }
            bigrams.add(h); totalBi += 1
          }
          prevStart = wStart; prevEnd = i; wStart = -1
        }
      } else if (wStart < 0) wStart = i
      i += 1
    }
    // char 8-grams over the raw text (spaces included: repetition of the
    // "chunk chunk " shape repeats its spaces too)
    val grams8 = new java.util.HashSet[Integer]()
    var total8 = 0
    i = 0
    while (i + 8 <= n) {
      var h = 0x811c9dc5
      var j = i
      while (j < i + 8) { h ^= text.charAt(j).toInt; h *= 0x01000193; j += 1 }
      grams8.add(h); total8 += 1
      i += 1
    }
    Array(
      if (totalBi == 0) 0f
      else (1.0 - bigrams.size.toDouble / totalBi).toFloat,
      if (total8 == 0) 0f
      else (1.0 - grams8.size.toDouble / total8).toFloat)
  }

  /** Post-scrub artifact prose (positive): the pipeline scores SCRUBBED
    * text, so [[Scrub]]'s placeholder tokens inside otherwise-normal
    * prose are legitimate — without this class their angle-bracket grams
    * read as the markup junk the code/markup negatives trained against,
    * and they drag low-gram-mass (CJK) prose under the 0.5 line.
    */
  private[functions] val scrubArtifactProse: String =
    "please contact <EMAIL> or call <PHONE> for more details about the " +
      "service our office is open every day and you can also write to " +
      "<EMAIL> with questions the account number <CC> was removed from " +
      "this page for safety and the identifier <SSN> is not shown the " +
      "server at <IP> answers during business hours if you need help " +
      "send a message to <EMAIL> or phone us at <PHONE> thank you for " +
      "reading and we hope to hear from you soon at <EMAIL> any time"

  /** Positive seeds: the frozen 19-language prose corpora plus the
    * post-scrub artifact prose class.
    */
  private[functions] def proseSeeds: Array[String] =
    LangId.langs.map(LangId.seeds) :+ scrubArtifactProse

  private def windows(seed: String, w: Int, stride: Int): Iterator[String] =
    seed.split("\\s+").filter(_.nonEmpty).sliding(w, stride)
      .map(_.mkString(" "))

  /** Trained weight vector, bucket-indexed like one row of the langid
    * head. 12-word windows (stride 6) — quality is a longer-range signal
    * than language, and the wider window keeps stuffing repetition and
    * boilerplate enumeration visible inside one example.
    */
  private[graft] lazy val weights: Array[Float] = {
    val pos = proseSeeds.iterator.flatMap(windows(_, 12, 6)).map((1, _))
    val neg = (junkSeeds.iterator ++ repetitionSeeds.iterator)
      .flatMap(windows(_, 12, 6)).map((0, _))
    val examples: Array[(Int, Array[Int], Array[Float])] =
      (pos ++ neg).map { case (label, text) =>
        val (idx, vals, _) = LangId.meanFeaturize(text)
        val hf = handFeatures(text)
        val idx2 = idx ++ Array.tabulate(HandK)(LangId.dim + _)
        val vals2 = vals ++ hf
        (label, idx2, vals2)
      }.toArray
    val nPos = examples.count(_._1 == 1)
    val nNeg = examples.length - nPos
    // class-balanced learning rates (same rationale as the langid head:
    // window counts per class are an artifact of seed lengths)
    val half = examples.length.toDouble / 2
    val classWeight = Array(half / nNeg, half / nPos)
    val w = new Array[Double](LangId.dim + HandK)
    val epochs = 120
    val lr0 = 6.0
    val totalSteps = epochs.toLong * examples.length
    var step = 0L
    var e = 0
    while (e < epochs) {
      var x = 0
      while (x < examples.length) {
        val (label, idx, vals) = examples(x)
        val lr = lr0 * (1.0 - step.toDouble / totalSteps) * classWeight(label)
        var d = 0.0
        var j = 0
        while (j < idx.length) { d += w(idx(j)) * vals(j); j += 1 }
        val p = 1.0 / (1.0 + StrictMath.exp(-d))
        val g = lr * (p - label)
        j = 0
        while (j < idx.length) { w(idx(j)) -= g * vals(j); j += 1 }
        step += 1
        x += 1
      }
      e += 1
    }
    w.map(_.toFloat)
  }

  /** Dense reference formulation (test hook): score via the materialized
    * meanFeaturize sparse vector. The streaming scorer accumulates in
    * gram-stream order and the dense one in bucket order with Float
    * per-bucket values, so they agree to float precision, not bit-for-bit
    * (QualityModelSpec asserts 1e-6); the SHIPPED streaming path itself
    * is bit-deterministic (fixed traversal order, StrictMath).
    */
  private[graft] def denseScore(text: String): Double = {
    if (text == null || text.isEmpty || LangId.allBlank(text)) return 0.0
    val (idx, vals, grams) = LangId.meanFeaturize(text)
    if (grams == 0) return 0.0
    var d = 0.0
    var j = 0
    while (j < idx.length) { d += weights(idx(j)) * vals(j); j += 1 }
    val hf = handFeatures(text)
    var k = 0
    while (k < HandK) { d += weights(LangId.dim + k) * hf(k); k += 1 }
    1.0 / (1.0 + StrictMath.exp(-d))
  }

  /** P(reference-like prose) in [0,1); empty/blank text -> 0.0.
    * Streaming scorer: the same gram stream as [[LangId.meanFeaturize]]
    * (same hashes, same skips — asserted vs [[denseScore]]), one
    * accumulator, per-gram mean, StrictMath sigmoid.
    */
  def score(text: String): Double = {
    if (text == null || text.isEmpty || LangId.allBlank(text)) return 0.0
    val len = text.length + 2
    val wq = weights
    var acc = 0.0
    var grams = 0
    var i = 0
    while (i < len - 1) {
      var h = 0x811c9dc5
      val c0 = LangId.cAt(text, i, len)
      h ^= c0.toInt; h *= 0x01000193
      if (c0 != ' ') { acc += wq((h & Int.MaxValue) % LangId.dim); grams += 1 }
      val c1 = LangId.cAt(text, i + 1, len)
      h ^= c1.toInt; h *= 0x01000193
      if (c0 != ' ' || c1 != ' ') {
        acc += wq((h & Int.MaxValue) % LangId.dim); grams += 1
      }
      if (i < len - 2) {
        val c2 = LangId.cAt(text, i + 2, len)
        if (c0 != ' ' || c1 != ' ' || c2 != ' ') {
          h ^= c2.toInt; h *= 0x01000193
          acc += wq((h & Int.MaxValue) % LangId.dim); grams += 1
        }
      }
      i += 1
    }
    if (grams == 0) return 0.0
    var d = acc / grams
    val hf = handFeatures(text)
    var k = 0
    while (k < HandK) { d += wq(LangId.dim + k) * hf(k); k += 1 }
    1.0 / (1.0 + StrictMath.exp(-d))
  }
}
