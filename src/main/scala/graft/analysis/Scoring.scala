package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable

/** Query-time scalar bonus functions, reference-exact.
  *
  * Reference semantics: scoring.py:11-257 (proximity, ngram, pattern,
  * metadata, gibberish, fuzzy) applied additively (gibberish multiplicative)
  * in main.py:140-167.
  */
object Scoring {
  import Analyzer.lower

  /** scoring.py:11-54 proximity_bonus. */
  def proximityBonus(text: String, queryTokens: Seq[String], windowSize: Int = 30): Double = {
    if (queryTokens.length < 2) return 0.0
    val textTokens = Analyzer.pySplit(lower(text))
    if (textTokens.length < 2) return 0.0
    val qset = queryTokens.map(lower).toSet
    // positions keyed by token, insertion-ordered like a Python dict
    val positions = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < textTokens.length) {
      val tok = textTokens(i)
      if (qset.contains(tok))
        positions.getOrElseUpdate(tok, mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    if (positions.size < 2) return 0.0
    var maxScore = 0.0
    val tokenList = positions.keys.toIndexedSeq
    for {
      a <- tokenList.indices
      bIdx <- (a + 1) until tokenList.length
      pos1 <- positions(tokenList(a))
      pos2 <- positions(tokenList(bIdx))
    } {
      val distance = math.abs(pos1 - pos2)
      if (distance <= windowSize) {
        val score = math.max(0.0, 1.0 - distance.toDouble / windowSize)
        if (score > maxScore) maxScore = score
      }
    }
    maxScore
  }

  /** scoring.py:57-76 ngram_bonus. */
  def ngramBonus(text: String, query: String, maxHits: Int = 6): Double = {
    val t = Analyzer.pySplit(lower(text)).mkString(" ")
    val toks = Analyzer.tokenize(query)
    val bigrams = (0 until math.max(0, toks.length - 1)).map(i => toks.slice(i, i + 2).mkString(" "))
    val trigrams = (0 until math.max(0, toks.length - 2)).map(i => toks.slice(i, i + 3).mkString(" "))
    var hits = 0
    val it = (bigrams ++ trigrams).iterator
    while (it.hasNext && hits < maxHits) {
      val ng = it.next()
      if (ng.length >= 5 && t.contains(ng)) hits += 1
    }
    math.min(hits, maxHits).toDouble / maxHits
  }

  /** scoring.py:79-84 pattern_bonus. */
  def patternBonus(text: String): Double = {
    val tl = lower(text)
    Analyzer.AnswerPatterns.count(tl.contains) * 0.05
  }

  /** scoring.py:87-116 metadata_bonus. */
  def metadataBonus(text: String, docTitle: Option[String] = None): Double = {
    var bonus = 0.0
    val tl = lower(text).trim
    if (tl.startsWith("abstract") || tl.take(50).contains("abstract")) bonus += 0.15
    val head60 = tl.take(60)
    if (Seq("result", "conclusion", "summary", "discussion").exists(head60.contains))
      bonus += 0.1
    docTitle.foreach { title =>
      val titleLower = lower(title).trim
      if (titleLower.nonEmpty && tl.contains(titleLower)) {
        bonus += (if (tl.length < titleLower.length + 20) 0.2 else 0.05)
      }
    }
    bonus
  }

  private val LineNumbers = Pattern.compile("\\b\\d{3,5}\\b", Pattern.UNICODE_CHARACTER_CLASS)
  private val DoiGib = Pattern.compile("doi:\\S+|10\\.\\d{4,}/\\S+", Pattern.UNICODE_CHARACTER_CLASS)
  private val Mixed = Pattern.compile("\\b\\d+[a-zA-Z]+\\d*\\b|\\b[a-zA-Z]+\\d+[a-zA-Z]*\\b",
    Pattern.UNICODE_CHARACTER_CLASS)
  private val PunctClusters = Pattern.compile("(?U)[^\\w\\s]{2,}")
  private val YearLike = Pattern.compile("^[12]\\d{3}$")
  private val ValidShort = Set("p", "pp", "ch", "vol", "no", "ed", "v", "n")

  private def findAll(p: Pattern, text: String): Seq[String] = {
    val m = p.matcher(text)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** Sum of match lengths without materializing the match strings — the
    * gibberish scan only needs lengths for three of its four patterns, and
    * this runs per chunk on the index-build hot path.
    */
  private def matchLenSum(p: Pattern, text: String): Long = {
    val m = p.matcher(text)
    var sum = 0L
    while (m.find()) sum += m.end() - m.start()
    sum
  }

  /** scoring.py:119-194 gibberish_penalty — multiplicative in (0,1]. */
  def gibberishPenalty(text: String, threshold: Double = 0.20): Double = {
    if (text == null || text.length < 20) return 1.0
    var gibberishChars = 0L
    val totalChars = text.length
    // One cheap char scan prescreens the three digit-dependent patterns
    // (~2% of real chunks contain any digit): LineNumbers needs a run of
    // >= 3 Unicode digits, Mixed needs an ASCII-letter/digit adjacency,
    // DoiGib needs a "doi:" or "10." literal, and the digit-ratio word
    // walk needs a digit at all — when the prescreen proves no match is
    // possible, the regex contributes exactly 0 and is skipped. Skips are
    // only taken on surrogate-free text (char-level classes equal the
    // regexes' code-point classes exactly on the BMP; supplementary-plane
    // digits fall back to the full scan).
    var hasSurrogate = false
    var anyDigit = false
    var digitRun3 = false
    var mixAdj = false
    locally {
      var run = 0
      var prevD = false
      var prevL = false
      var i = 0
      while (i < totalChars) {
        val c = text.charAt(i)
        if (Character.isSurrogate(c)) hasSurrogate = true
        val d = Character.isDigit(c)
        val l = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        if (d) {
          anyDigit = true
          run += 1
          if (run >= 3) digitRun3 = true
        } else run = 0
        if ((prevD && l) || (prevL && d)) mixAdj = true
        prevD = d
        prevL = l
        i += 1
      }
    }
    val noSkip = hasSurrogate
    if (noSkip || digitRun3)
      gibberishChars += matchLenSum(LineNumbers, text)
    if (noSkip || text.contains("doi:") || text.contains("10."))
      gibberishChars += matchLenSum(DoiGib, text)
    if (noSkip || mixAdj) {
      for (pattern <- findAll(Mixed, text)) {
        val skipShortValid = pattern.length <= 3 && !ValidShort.contains(lower(pattern))
        // reference logic: `continue` when (len<=3 AND not in valid set);
        // note this *counts* short patterns that ARE in the valid set.
        if (!skipShortValid && !YearLike.matcher(pattern).matches()) {
          gibberishChars += pattern.length
        }
      }
    }
    gibberishChars += matchLenSum(PunctClusters, text)
    // Python-split word walk without materializing the word array: spans
    // between WsPattern separator runs, digit ratio counted in place
    // (identical digit classifier and span boundaries to pySplit + count).
    // Skipped when the text has no digit char at all: the walk counts the
    // same char-level isDigit, so every ratio would be 0 (no surrogate
    // caveat — both sides are char-level).
    if (anyDigit) locally {
      val m = Analyzer.wsMatcher(text)
      var spanStart = 0
      def span(end: Int): Unit = if (end - spanStart > 2) {
        var digits = 0
        var i = spanStart
        while (i < end) {
          if (text.charAt(i).isDigit) digits += 1
          i += 1
        }
        if (digits.toDouble / (end - spanStart) > 0.5)
          gibberishChars += end - spanStart
      }
      while (m.find()) {
        span(m.start())
        spanStart = m.end()
      }
      span(text.length)
    }
    val ratio = if (totalChars > 0) gibberishChars.toDouble / totalChars else 0.0
    if (ratio <= threshold) return 1.0
    val penaltyRange = 0.50 - threshold
    val excess = math.min(ratio - threshold, penaltyRange)
    math.max(0.0, 1.0 - excess / penaltyRange)
  }

  /** Exact prescreen for [[fuzzyMatchBonus]]: the bonus fires only when an
    * exact common substring of length >= minLength exists; any such
    * substring fully covers one aligned length-(minLength/2) block of the
    * query, so if no such block occurs in the text the bonus is provably 0
    * — skipping the O(|t|*|q|) difflib pass on the vast majority of chunks.
    */
  private def fuzzyPossible(tn: String, qn: String, minLength: Int): Boolean = {
    val block = minLength / 2
    if (qn.length < minLength) return false
    var i = 0
    while (i + block <= qn.length) {
      if (tn.contains(qn.substring(i, i + block))) return true
      i += block
    }
    // trailing partial block: cover the query suffix too
    if (qn.length % block != 0 && tn.contains(qn.substring(qn.length - block)))
      return true
    false
  }

  /** scoring.py:197-257 fuzzy_match_bonus — difflib port for exactness. */
  def fuzzyMatchBonus(text: String, query: String, minLength: Int = 20): Double = {
    if (text == null || text.isEmpty || query == null || query.length < minLength) return 0.0
    val tn = Analyzer.pySplit(lower(text)).mkString(" ")
    val qn = Analyzer.pySplit(lower(query)).mkString(" ")
    if (!fuzzyPossible(tn, qn, minLength)) return 0.0
    val matcher = new SequenceMatcher(tn, qn)
    val m = matcher.findLongestMatch(0, tn.length, 0, qn.length)
    if (m.size < minLength) return 0.0
    val textMatch = tn.substring(m.a, m.a + m.size)
    val queryMatch = qn.substring(m.b, m.b + m.size)
    val similarity = new SequenceMatcher(textMatch, queryMatch).ratio
    val lengthScore = math.min(0.5, m.size / 100.0)
    val similarityScore =
      if (similarity >= 0.95) 0.5
      else if (similarity >= 0.85) 0.3 + (similarity - 0.85) * 2.0
      else if (similarity >= 0.75) 0.1 + (similarity - 0.75) * 2.0
      else similarity * 0.1
    math.min(1.0, lengthScore + similarityScore)
  }

  /** Per-query precomputed state for the hot bonus path. Semantics are
    * identical to [[applyBonuses]] (float-op order preserved); the
    * query-independent bonuses (pattern, metadata, gibberish) are supplied
    * precomputed — they are stored as chunk-table columns at index time —
    * and all query-derived artifacts (token set, n-grams, normalized query,
    * fuzzy prescreen blocks) are built once per query instead of per chunk.
    */
  final class QueryBonusContext(query: String, qTokens: Seq[String],
                                proxWindow: Int = 24, proxLambda: Double = 0.2,
                                ngramLambda: Double = 0.1) extends Serializable {
    private val qset: Set[String] = qTokens.map(lower).toSet
    private val ngrams: Array[String] = {
      val toks = Analyzer.tokenize(query)
      val bi = (0 until math.max(0, toks.length - 1)).map(i => toks.slice(i, i + 2).mkString(" "))
      val tri = (0 until math.max(0, toks.length - 2)).map(i => toks.slice(i, i + 3).mkString(" "))
      (bi ++ tri).toArray // order matters: bigrams then trigrams, cap 6
    }
    private val qn: String = Analyzer.pySplit(lower(query)).mkString(" ")
    private val fuzzyActive: Boolean = query != null && query.length >= 20

    private def proximity(tokens: Array[String]): Double = {
      if (qset.size < 2 || tokens.length < 2) return 0.0
      val positions = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Int]]
      var i = 0
      while (i < tokens.length) {
        if (qset.contains(tokens(i)))
          positions.getOrElseUpdate(tokens(i), mutable.ArrayBuffer.empty) += i
        i += 1
      }
      if (positions.size < 2) return 0.0
      var maxScore = 0.0
      val lists = positions.values.toIndexedSeq
      for (a <- lists.indices; b <- (a + 1) until lists.length;
           p1 <- lists(a); p2 <- lists(b)) {
        val d = math.abs(p1 - p2)
        if (d <= proxWindow) {
          val s = math.max(0.0, 1.0 - d.toDouble / proxWindow)
          if (s > maxScore) maxScore = s
        }
      }
      maxScore
    }

    private def ngram(t: String): Double = {
      var hits = 0
      var i = 0
      while (i < ngrams.length && hits < 6) {
        val ng = ngrams(i)
        if (ng.length >= 5 && t.contains(ng)) hits += 1
        i += 1
      }
      math.min(hits, 6).toDouble / 6
    }

    private def fuzzy(tn: String): Double = {
      if (!fuzzyActive || tn.isEmpty) return 0.0
      if (!Scoring.fuzzyPossible(tn, qn, 20)) return 0.0
      val m = new SequenceMatcher(tn, qn).findLongestMatch(0, tn.length, 0, qn.length)
      if (m.size < 20) return 0.0
      val textMatch = tn.substring(m.a, m.a + m.size)
      val queryMatch = qn.substring(m.b, m.b + m.size)
      val similarity = new SequenceMatcher(textMatch, queryMatch).ratio
      val lengthScore = math.min(0.5, m.size / 100.0)
      val similarityScore =
        if (similarity >= 0.95) 0.5
        else if (similarity >= 0.85) 0.3 + (similarity - 0.85) * 2.0
        else if (similarity >= 0.75) 0.1 + (similarity - 0.75) * 2.0
        else similarity * 0.1
      math.min(1.0, lengthScore + similarityScore)
    }

    /** Same float-op order as main.py:140-167 / [[applyBonuses]]. */
    def score(base: Double, text: String, patternB: Double, metaB: Double,
              gib: Double): Double = {
      var s = base
      val tokens = Analyzer.pySplit(lower(text))
      if (proxLambda > 0 && proxWindow > 0) {
        val pb = proximity(tokens)
        if (pb != 0.0) s += proxLambda * pb
      }
      val tn = tokens.mkString(" ")
      if (ngramLambda > 0) {
        val nb = ngram(tn)
        if (nb != 0.0) s += ngramLambda * nb
      }
      s += patternB
      s += metaB
      if (gib < 1.0) s *= gib
      val fz = fuzzy(tn)
      if (fz > 0) s += 2.0 * fz
      s
    }
  }

  /** main.py:140-167 — combined bonus application to a base BM25 score. */
  def applyBonuses(base: Double, text: String, query: String, qTokens: Seq[String],
                   docTitle: Option[String],
                   proxWindow: Int = 24, proxLambda: Double = 0.2,
                   ngramLambda: Double = 0.1): Double = {
    var s = base
    if (proxLambda > 0 && proxWindow > 0) {
      val pb = proximityBonus(text, qTokens, proxWindow)
      if (pb != 0.0) s += proxLambda * pb
    }
    if (ngramLambda > 0) {
      val nb = ngramBonus(text, query)
      if (nb != 0.0) s += ngramLambda * nb
    }
    s += patternBonus(text)
    s += metadataBonus(text, docTitle)
    val gib = gibberishPenalty(text, 0.20)
    if (gib < 1.0) s *= gib
    val fuzzy = fuzzyMatchBonus(text, query, 20)
    if (fuzzy > 0) s += 2.0 * fuzzy
    s
  }
}
