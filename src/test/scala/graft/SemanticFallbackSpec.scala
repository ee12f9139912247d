package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.query.{EmbeddingProvider, Semantic}

/** Run-D semantic rerank FALLBACK parity vs the EXECUTED reference
  * (goldens/semantic_fallback.json <- tools/make_semantic_fallback_golden.py
  * running rerank.py:254-309 + the fusion.py:195-199 ordering): a pool with
  * one missing embedding — or no encoder at all — must return the raw
  * scores wholesale and preserve raw-score run-D order. The all-embedded
  * positive control pins the 0.7/0.3 combination bit-exactly (the golden
  * encoder emits ±0.5 unit vectors, so every dot product is an exact
  * binary fraction in both engines).
  */
class SemanticFallbackSpec extends AnyFunSuite {
  private val golden = Goldens.load("semantic_fallback.json")
  private val marker = golden.get("marker").asText()

  /** Mirror of the golden tool's stand-in encoder: md5 low bits -> ±0.5. */
  private def signVec(text: String): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    (0 until 4).map(j => if ((d(j) & 1) != 0) 0.5f else -0.5f).toArray
  }

  private val provider = new EmbeddingProvider {
    def embed(text: String): Option[Array[Float]] =
      if (text.contains(marker)) None else Some(signVec(text))
    def embedQuery(q: String): Option[Array[Float]] = Some(signVec(q))
  }
  /** The encoder-unavailable state (reference: SentenceTransformer None). */
  private val noProvider = new EmbeddingProvider {
    def embed(text: String): Option[Array[Float]] = None
    def embedQuery(q: String): Option[Array[Float]] = None
  }

  for (c <- golden.get("cases").elements().asScala.toList) {
    val name = c.get("name").asText()
    test(s"semantic run-D scenario '$name' matches the executed reference") {
      val query = c.get("query").asText()
      val texts = Goldens.strSeq(c.get("texts"))
      val scores = c.get("scores").elements().asScala.map(_.asDouble()).toSeq
      val p = if (name == "unavailable") noProvider else provider
      val out = Semantic.semanticRerank(query, texts, scores, p)
      val expected = c.get("out_scores").elements().asScala.map(_.asDouble()).toSeq
      assert(out == expected, s"$name: scores diverge from the reference run")
      if (name != "all_embedded")
        assert(out == scores, s"$name: fallback must return raw scores wholesale")
      // run-D ordering (stable sort by new score, descending)
      val pool = texts.indices.map(i => (i.toLong, texts(i), scores(i))).toIndexedSeq
      val order = Semantic.semanticRun(query, pool, texts.length, p)
      val goldenOrder = c.get("run_d_order").elements().asScala.map(_.asLong()).toList
      assert(order == goldenOrder, s"$name: run-D order diverges")
    }
  }
}
