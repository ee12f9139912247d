package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{EmbeddingProvider, LocalBackend, Pipeline, PipelineConfig, Semantic}

class SemanticSpec extends AnyFunSuite {

  /** Deterministic fake encoder: hashes tokens into a small dense vector,
    * L2-normalized — stands in for the external sentence-transformer.
    */
  private object FakeProvider extends EmbeddingProvider {
    private def vec(s: String): Array[Float] = {
      val v = new Array[Float](16)
      for (t <- graft.analysis.Analyzer.tokenize(s)) {
        val h = graft.index.IndexBuilder.stableId(t)
        v(math.floorMod(h, 16).toInt) += 1f
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (n == 0) v else v.map(_ / n)
    }
    override def embed(text: String) = Some(vec(text))
    override def embedQuery(query: String) = Some(vec(query))
  }

  test("semantic_rerank combined-score formula (0.7*minmax + 0.3*cos)") {
    val texts = Seq("alpha beta gamma", "alpha alpha alpha", "unrelated words here")
    val scores = Seq(3.0, 1.0, 2.0)
    val out = Semantic.semanticRerank("alpha beta", texts, scores, FakeProvider)
    assert(out.length == 3)
    val cos = texts.map(t =>
      Semantic.cosine(FakeProvider.embed(t).get, FakeProvider.embedQuery("alpha beta").get))
    val norm = Seq(1.0, 0.0, 0.5)
    out.zipWithIndex.foreach { case (s, i) =>
      assert(math.abs(s - (0.7 * norm(i) + 0.3 * cos(i))) < 1e-12)
    }
    // single-candidate and empty fallbacks
    assert(Semantic.semanticRerank("q", Seq("one"), Seq(5.0), FakeProvider) ==
      Seq(0.7 * 1.0 + 0.3 * Semantic.cosine(FakeProvider.embed("one").get,
        FakeProvider.embedQuery("q").get)))
    assert(Semantic.semanticRerank("q", Nil, Nil, FakeProvider) == Nil)
  }

  test("semantic + HyDE runs feed RRF fusion") {
    val backend = new LocalBackend(Goldens.chunks)
    val base = Pipeline.searchTopK(backend, "machine learning algorithms",
      PipelineConfig())
    val withRuns = Pipeline.searchTopK(backend, "machine learning algorithms",
      PipelineConfig(semanticEnabled = true,
        hydeVariants = Seq("neural networks are trained with gradient descent",
          "attention mechanisms power transformers")),
      embeddings = Some(FakeProvider))
    // baseline config yields 3 runs (A, heuristic, robust is skipped when
    // robustified == lowercase query); extra runs must appear
    assert(withRuns.runs.length == base.runs.length + 3)
    assert(withRuns.results.nonEmpty)
    // fallback: semantic enabled without provider = pool-order run
    val fallback = Pipeline.searchTopK(backend, "machine learning algorithms",
      PipelineConfig(semanticEnabled = true))
    assert(fallback.runs.length == base.runs.length + 1)
    assert(fallback.runs.last != fallback.pool.toList ||
      fallback.runs.exists(_ == fallback.pool.take(80).toList))
  }
}
