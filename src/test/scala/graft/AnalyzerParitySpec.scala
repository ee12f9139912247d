package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.analysis.{Analyzer, Scoring}

/** Byte-identical parity of the deterministic analyzer against vectors
  * produced by running the reference implementation (text_vectors.json).
  */
class AnalyzerParitySpec extends AnyFunSuite {

  private val vectors = Goldens.load("text_vectors.json").elements().asScala.toList

  test("clean_text parity") {
    for (v <- vectors)
      assert(Analyzer.cleanText(v.get("input").asText()) == v.get("clean_text").asText(),
        s"input=${v.get("input").asText().take(60)}")
  }

  test("normalize_text parity") {
    for (v <- vectors)
      assert(Analyzer.normalizeText(v.get("input").asText()) == v.get("normalize_text").asText())
  }

  test("quality gate parity") {
    for (v <- vectors) {
      val t = v.get("input").asText()
      assert(Analyzer.isTextQualityGood(t, 0.7) == v.get("quality_07").asBoolean(), s"q07 $t")
      assert(Analyzer.isTextQualityGood(t, 0.5) == v.get("quality_05").asBoolean(), s"q05 $t")
    }
  }

  test("sentence splitter parity") {
    for (v <- vectors) {
      val got = Analyzer.splitIntoSentences(v.get("input").asText()).toSeq
      assert(got == Goldens.strSeq(v.get("sentences")),
        s"input=${v.get("input").asText().take(80)}")
    }
  }

  test("sliding windows parity (300/50 and 600/80)") {
    for (v <- vectors) {
      val t = v.get("input").asText()
      assert(Analyzer.createSlidingWindows(t, 300, 50).toSeq == Goldens.strSeq(v.get("sliding_300_50")),
        s"300/50 input=${t.take(60)}")
      assert(Analyzer.createSlidingWindows(t, 600, 80).toSeq == Goldens.strSeq(v.get("sliding_600_80")),
        s"600/80 input=${t.take(60)}")
    }
  }

  test("tokenize parity") {
    for (v <- vectors)
      assert(Analyzer.tokenize(v.get("input").asText()).toSeq == Goldens.strSeq(v.get("tokenize")))
  }

  test("tokenize_for_rerank parity") {
    for (v <- vectors)
      assert(Analyzer.tokenizeForRerank(v.get("input").asText()).toSeq ==
        Goldens.strSeq(v.get("tokenize_rerank")))
  }

  test("robustify_query parity") {
    for (v <- vectors)
      assert(Analyzer.robustifyQuery(v.get("input").asText()) == v.get("robustify").asText())
  }

  test("dedup md5 parity") {
    for (v <- vectors)
      assert(Analyzer.md5Hex(Analyzer.dedupNormalize(v.get("input").asText())) ==
        v.get("dedup_md5").asText())
  }

  test("window snippet parity") {
    for (v <- vectors)
      assert(Analyzer.windowSnippet(v.get("input").asText(), 50) ==
        v.get("window_snippet_50").asText())
  }
}

/** Parity of all query-time bonus functions (bonus_vectors.json). */
class ScoringParitySpec extends AnyFunSuite {
  private val vectors = Goldens.load("bonus_vectors.json").elements().asScala.toList
  private val eps = 1e-12

  private def check(name: String)(f: (String, String) => Double): Unit =
    for (v <- vectors) {
      val t = v.get("text").asText(); val q = v.get("query").asText()
      val expected = v.get(name).asDouble()
      val got = f(t, q)
      assert(math.abs(got - expected) <= eps,
        s"$name mismatch: got=$got expected=$expected text=${t.take(50)} query=$q")
    }

  test("proximity_bonus parity") {
    check("proximity_30")((t, q) => Scoring.proximityBonus(t, Analyzer.tokenize(q).toSeq, 30))
    check("proximity_24")((t, q) => Scoring.proximityBonus(t, Analyzer.tokenize(q).toSeq, 24))
  }
  test("ngram_bonus parity") { check("ngram")((t, q) => Scoring.ngramBonus(t, q)) }
  test("pattern_bonus parity") { check("pattern")((t, _) => Scoring.patternBonus(t)) }
  test("metadata_bonus parity") {
    check("metadata_none")((t, _) => Scoring.metadataBonus(t, None))
    check("metadata_title")((t, _) => Scoring.metadataBonus(t, Some("Machine Learning Algorithms")))
  }
  test("gibberish_penalty parity") { check("gibberish")((t, _) => Scoring.gibberishPenalty(t)) }
  test("fuzzy_match_bonus parity") { check("fuzzy")((t, q) => Scoring.fuzzyMatchBonus(t, q)) }

  test("QueryBonusContext fast path == applyBonuses on the golden corpus") {
    val chunks = Goldens.chunks
    val queries = Seq("machine learning algorithms", "quick brown fox",
      "gradient descent optimization methods for neural networks training",
      "transformer attention mechanisms are the core of modern neural networks today",
      "the of and", "zzz nonexistent")
    for (q <- queries) {
      val qTokens = Analyzer.tokenize(q).toIndexedSeq
      val ctx = new Scoring.QueryBonusContext(q, qTokens)
      for (c <- chunks) {
        val slow = Scoring.applyBonuses(1.25, c.text, q, qTokens, c.meta.title)
        val fast = ctx.score(1.25, c.text,
          Scoring.patternBonus(c.text),
          Scoring.metadataBonus(c.text, c.meta.title),
          Scoring.gibberishPenalty(c.text))
        assert(slow == fast, s"q=$q chunk=${c.chunkId}: $slow != $fast")
      }
    }
  }
}
