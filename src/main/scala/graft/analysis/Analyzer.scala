package graft.analysis

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Deterministic text analyzer.
  *
  * Pure-Scala (no Spark dependency) reimplementation of the reference text
  * pipeline so the same code runs inside Catalyst UDFs, `mapPartitions`
  * tasks and driver-side query processing with byte-identical results.
  *
  * Reference semantics (observed behavior only):
  *  - clean_text / normalize_text:   /root/reference lightweight_rag/io_pdf.py:93-134
  *  - is_text_quality_good:          io_pdf.py:35-90
  *  - split_into_sentences:          io_pdf.py:137-174
  *  - create_sliding_windows:        io_pdf.py:177-322
  *  - chunk_text:                    io_pdf.py:325-364
  *  - tokenize + STOP:               index.py:38-40, models.py:58-64
  *  - tokenize_for_rerank:           rerank.py:24-30
  *  - robustify_query:               fusion.py:31-44
  *  - window (snippet):              models.py:81-87
  *  - find_doi_in_text:              models.py:45,72-78
  *  - dedup normalization:           io_pdf.py:1219-1242
  */
object Analyzer {

  /** Stopword list — models.py:58-64 (verbatim). */
  val Stop: Set[String] =
    """a an and are as at be by for from has have in is it its of on or that the their this to was were with without within into between over under than then thus hence therefore however not nor but if else when where while whom whose which who what why how can may might must shall should will would could do does did done also such many most more some any each per via using used study studies paper papers result results method methods approach approaches technique techniques model models data dataset datasets system systems figure figures table tables appendix references introduction conclusion conclusions
yes no true false
design value values vsd privacy security fairness bias harms trust governance regulation policy stakeholders stakeholder users user participants participants actors actor"""
      .split("\\s+").filter(_.nonEmpty).toSet

  /** Answer patterns — models.py:47-56. */
  val AnswerPatterns: Seq[String] = Seq(
    " is a ", " we define ", " we propose ", " we argue ", " consists of ",
    " stakeholders include ", " method ", " methodology ")

  // Python `\w`/`\s` are Unicode-aware by default. Java's (?U)\s follows the
  // Unicode White_Space property, which unlike Python's \s excludes the
  // \x1c-\x1f file/group separators — add them explicitly.
  private val WsPattern = Pattern.compile("(?U)[\\s\\x1c-\\x1f]+")
  private val NonWordPattern = Pattern.compile("(?U)\\W+")
  private val ControlPattern = Pattern.compile("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
  private val HardHyphPattern = Pattern.compile("(?U)(\\w)-\\n(\\w)")
  private val RerankTokenPattern = Pattern.compile("[a-z0-9_]+(?:-[a-z0-9_]+)?")
  private val NonAlnumSpacePattern = Pattern.compile("[^A-Za-z0-9\\s]")
  private val DoiPattern = Pattern.compile("10\\.\\d{4,9}/[-._;()/:A-Z0-9]+", Pattern.CASE_INSENSITIVE)

  @inline def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** index.py:38-40 — `[A-Za-z0-9]+` findall, lowercase, drop STOP.
    *
    * Hand-rolled ASCII scanner instead of the regex matcher: the pattern
    * only ever matches ASCII alnum runs, and `toLowerCase(Locale.ROOT)` on
    * such a run is the per-char 'A'..'Z' shift, so the scan is exactly
    * equivalent (golden-pinned) while skipping two string allocations and
    * the regex engine per token — this is the hottest kernel of the index
    * build (static-cols pass + posting pass) and the map-scaling bench.
    */
  def tokenize(s: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    val n = s.length
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) {
        val t = sb.toString
        if (!Stop.contains(t)) out += t
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) {
      val t = sb.toString
      if (!Stop.contains(t)) out += t
    }
    out.toArray
  }

  /** rerank.py:24-30 — lowercase, collapse ws, keep hyphen-joined tokens. */
  def tokenizeForRerank(s: String): Array[String] = {
    val t = WsPattern.matcher(lower(s)).replaceAll(" ")
    val m = RerankTokenPattern.matcher(t)
    val out = new ArrayBuffer[String]()
    while (m.find()) out += m.group()
    out.toArray
  }

  /** fusion.py:31-44 — lowercase, strip punctuation to space, collapse ws. */
  def robustifyQuery(query: String): String = {
    val q2 = NonAlnumSpacePattern.matcher(lower(query)).replaceAll(" ")
    WsPattern.matcher(q2).replaceAll(" ").trim
  }

  /** Python str.split() — split on Unicode whitespace runs, drop empties. */
  def pySplit(s: String): Array[String] =
    WsPattern.split(s).filter(_.nonEmpty)

  /** Matcher over the exact pySplit separator pattern, for callers that
    * walk word spans in place instead of materializing the split array.
    */
  private[analysis] def wsMatcher(s: String): java.util.regex.Matcher =
    WsPattern.matcher(s)

  /** io_pdf.py:115-134 normalize_text. */
  def normalizeText(s0: String): String = {
    var s = s0.replace("\u00ad", "")
    s = HardHyphPattern.matcher(s).replaceAll("$1$2")
    s = s.replace("\n", " ")
    s = Normalizer.normalize(s, Normalizer.Form.NFKC)
    WsPattern.matcher(s).replaceAll(" ").trim
  }

  /** io_pdf.py:93-112 clean_text. */
  def cleanText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    normalizeText(ControlPattern.matcher(text).replaceAll(""))
  }

  /** io_pdf.py:1230 dedup key: md5 of lowercase text with `\W+` removed. */
  def dedupNormalize(text: String): String =
    NonWordPattern.matcher(lower(text)).replaceAll("")

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** models.py:81-87 snippet window. */
  def windowSnippet(text: String, maxlen: Int = 900): String = {
    val t = text.trim.replace("\n", " ")
    if (t.length > maxlen) t.substring(0, maxlen - 3) + "..." else t
  }

  /** models.py:72-78 find_doi_in_text. */
  def findDoiInText(text: String): Option[String] = {
    val m = DoiPattern.matcher(text)
    if (!m.find()) None
    else Some(m.group().reverse.dropWhile(c => "]).,;".indexOf(c) >= 0).reverse)
  }

  // ---------------------------------------------------------------------
  // Quality gate — io_pdf.py:35-90
  // ---------------------------------------------------------------------

  private val RepeatPattern = Pattern.compile("(.)\\1{4,}", Pattern.DOTALL)
  private val CommonChars: Set[Char] = "etaoinshrdlucmfwypvbgkjqxz ".toSet

  /** Python str.isprintable(): true unless the char is non-printable per
    * Unicode (categories Cc, Cf, Cs, Co, Cn, Zl, Zp, and Zs except space).
    */
  private def pyIsPrintable(c: Char): Boolean = {
    if (c == ' ') return true
    val t = Character.getType(c)
    t != Character.CONTROL && t != Character.FORMAT && t != Character.SURROGATE &&
    t != Character.PRIVATE_USE && t != Character.UNASSIGNED &&
    t != Character.LINE_SEPARATOR && t != Character.PARAGRAPH_SEPARATOR &&
    t != Character.SPACE_SEPARATOR
  }

  /** Python str.isspace() approximation over BMP chars. */
  private def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.getType(c) == Character.SPACE_SEPARATOR ||
      c == 0x85.toChar

  def isTextQualityGood(text: String, minReadableRatio: Double = 0.7): Boolean = {
    if (text == null || text.trim.length < 10) return false
    var controlChars = 0
    var printableChars = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c < 32 && c != '\t' && c != '\n' && c != '\r') controlChars += 1
      else if (pyIsPrintable(c) || pyIsSpace(c)) printableChars += 1
      i += 1
    }
    val total = text.length
    if (total == 0) return false
    if (controlChars.toDouble / total > 0.05) return false
    if (printableChars.toDouble / total < minReadableRatio) return false
    // runs of 5+ identical non-space chars
    val m = RepeatPattern.matcher(text)
    var nonSpaceRepeats = 0
    while (m.find()) {
      val ch = m.group(1)
      if (ch != " " && ch != "\t" && ch != "\n" && ch != "\r") nonSpaceRepeats += 1
    }
    if (nonSpaceRepeats > 3) return false
    val textChars = lower(text).toSet
    if (textChars.count(CommonChars.contains) < 5) return false
    true
  }

  // ---------------------------------------------------------------------
  // Sentence splitting — io_pdf.py:137-174
  // ---------------------------------------------------------------------

  private val AbbrevPattern = Pattern.compile("\\b(Dr|Mr|Mrs|Ms|Prof|vs|etc|i\\.e|e\\.g|cf|al)\\.")
  private val SentSplitPattern = Pattern.compile("([.!?]+)\\s+")

  def splitIntoSentences(text0: String): Array[String] = {
    // Protect abbreviations: replace '.' inside the matched abbreviation.
    val sb = new StringBuilder
    val m = AbbrevPattern.matcher(text0)
    var last = 0
    while (m.find()) {
      sb.append(text0.substring(last, m.start()))
      sb.append(m.group().replace(".", "~DOT~"))
      last = m.end()
    }
    sb.append(text0.substring(last))
    val text = sb.toString

    // Python re.split with one capture group: [pre0, punct0, pre1, punct1, ..., tail]
    val parts = new ArrayBuffer[String]()
    val sm = SentSplitPattern.matcher(text)
    var pos = 0
    while (sm.find()) {
      parts += text.substring(pos, sm.start())
      parts += sm.group(1)
      pos = sm.end()
    }
    parts += text.substring(pos)

    val result = new ArrayBuffer[String]()
    var i = 0
    while (i < parts.length - 1) {
      if (i + 1 < parts.length) {
        var sentence = parts(i) + parts(i + 1)
        sentence = sentence.replace("~DOT~", ".").trim
        if (sentence.nonEmpty && sentence.trim.length > 10) result += sentence
      }
      i += 2
    }
    if (parts.length % 2 == 1) {
      val lastS = parts.last.replace("~DOT~", ".").trim
      if (lastS.nonEmpty && lastS.trim.length > 10) result += lastS
    }
    result.toArray
  }

  // ---------------------------------------------------------------------
  // Sliding windows — io_pdf.py:177-322
  // ---------------------------------------------------------------------

  def createSlidingWindows(text: String, windowChars: Int = 300, overlapChars: Int = 50): Array[String] = {
    if (text.length <= windowChars) return Array(text)
    val sentences = splitIntoSentences(text)
    if (sentences.isEmpty) return Array.empty

    if (sentences.length == 1 && sentences(0).length > windowChars) {
      // word-based fallback
      val words = pySplit(text)
      if (words.isEmpty) return Array.empty
      val windows = new ArrayBuffer[String]()
      var current = new ArrayBuffer[String]()
      var currentLength = 0
      var index = 0
      while (index < words.length) {
        val word = words(index)
        val wordLength = word.length
        val additional = if (current.isEmpty) wordLength else wordLength + 1
        if (currentLength + additional <= windowChars || current.isEmpty) {
          current += word
          currentLength += additional
          index += 1
        } else {
          val wt = current.mkString(" ").trim
          if (wt.nonEmpty) windows += wt
          if (overlapChars > 0 && current.nonEmpty) {
            val overlap = new ArrayBuffer[String]()
            var overlapLength = 0
            var j = current.length - 1
            while (j >= 0 && overlapLength < overlapChars) {
              val tok = current(j)
              val tokLen = if (overlap.isEmpty) tok.length else tok.length + 1
              overlapLength += tokLen
              overlap.insert(0, tok)
              j -= 1
            }
            val overlapTotal = overlap.map(_.length).sum + math.max(overlap.length - 1, 0)
            val nextWordLength = if (overlap.isEmpty) wordLength else wordLength + 1
            if (overlapTotal + nextWordLength > windowChars && overlap.nonEmpty) {
              current = new ArrayBuffer[String](); currentLength = 0
            } else {
              current = overlap
              currentLength = current.map(_.length).sum + math.max(current.length - 1, 0)
            }
          } else { current = new ArrayBuffer[String](); currentLength = 0 }
        }
      }
      if (current.nonEmpty) {
        val wt = current.mkString(" ").trim
        if (wt.nonEmpty) windows += wt
      }
      return windows.filter(_.trim.length > 20).toArray
    }

    // sentence-based chunking
    val out = new ArrayBuffer[String]()
    var current = new ArrayBuffer[String]()
    var currentLength = 0
    var index = 0
    while (index < sentences.length) {
      val sentence = sentences(index)
      val sentenceLength = sentence.length
      val additional = if (current.isEmpty) sentenceLength else sentenceLength + 1
      if (currentLength + additional <= windowChars || current.isEmpty) {
        current += sentence
        currentLength += additional
        index += 1
      } else {
        val wt = current.mkString(" ").trim
        if (wt.nonEmpty) out += wt
        if (overlapChars > 0 && current.nonEmpty) {
          val overlap = new ArrayBuffer[String]()
          var overlapLength = 0
          var j = current.length - 1
          while (j >= 0 && overlapLength < overlapChars) {
            val sent = current(j)
            val sentLen = if (overlap.isEmpty) sent.length else sent.length + 1
            overlapLength += sentLen
            overlap.insert(0, sent)
            j -= 1
          }
          val overlapTotal = overlap.map(_.length).sum + math.max(overlap.length - 1, 0)
          val nextLen = if (overlap.isEmpty) sentenceLength else sentenceLength + 1
          if (overlapTotal + nextLen > windowChars && overlap.nonEmpty) {
            current = new ArrayBuffer[String](); currentLength = 0
          } else {
            current = overlap
            currentLength = current.map(_.length).sum + math.max(current.length - 1, 0)
          }
        } else { current = new ArrayBuffer[String](); currentLength = 0 }
      }
    }
    if (current.nonEmpty) {
      val wt = current.mkString(" ").trim
      if (wt.nonEmpty) out += wt
    }
    out.filter(_.trim.length > 20).toArray
  }

  /** io_pdf.py:325-364 chunk_text. */
  def chunkText(text: String, docTitle: String = "",
                pageSplit: String = "sliding",
                windowChars: Int = 600, overlapChars: Int = 80): Array[String] = {
    val base: Array[String] = pageSplit match {
      case "sentence" => splitIntoSentences(text)
      case "sliding"  => createSlidingWindows(text, windowChars, overlapChars)
      case _          => Array(text)
    }
    if (docTitle != null && docTitle.nonEmpty) base.map(w => s"$docTitle | $w") else base
  }
}
