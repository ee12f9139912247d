package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.query.{Bm25, LocalBackend, Pipeline, PipelineConfig}

/** Rank-identical / score-identical parity of the full query pipeline vs
  * the reference run (pipeline.json, corpus.json goldens).
  */
class Bm25ParitySpec extends AnyFunSuite {
  private val corpus = Goldens.corpus
  private lazy val backend = new LocalBackend(Goldens.chunks,
    corpus.get("k1").asDouble(), corpus.get("b").asDouble())

  test("BM25 stats parity: N, avgdl, idf incl. negative-IDF floor") {
    assert(backend.stats.nDocs == corpus.get("n_docs").asLong())
    assert(math.abs(backend.stats.avgdl - corpus.get("avgdl").asDouble()) < 1e-12)
    val goldenIdf = corpus.get("idf")
    assert(backend.stats.idf.size == goldenIdf.size())
    goldenIdf.fields().asScala.foreach { e =>
      val got = backend.stats.idf(e.getKey)
      assert(math.abs(got - e.getValue.asDouble()) < 1e-12,
        s"idf(${e.getKey}) got=$got expected=${e.getValue.asDouble()}")
    }
  }
}

class PipelineParitySpec extends AnyFunSuite {
  private val corpus = Goldens.corpus
  private lazy val backend = new LocalBackend(Goldens.chunks,
    corpus.get("k1").asDouble(), corpus.get("b").asDouble())
  private val goldens = Goldens.load("pipeline.json").elements().asScala.toList

  private def cfgFor(g: com.fasterxml.jackson.databind.JsonNode): PipelineConfig =
    PipelineConfig(prfEnabled = g.get("prf_enabled").asBoolean())

  test("base BM25 scores parity (nonzero entries, 1e-9)") {
    for (g <- goldens) {
      val qTokens = Goldens.strSeq(g.get("q_tokens"))
      val scores = backend.denseScores(qTokens)
      val expected = g.get("base_scores_nonzero")
      expected.fields().asScala.foreach { e =>
        val i = e.getKey.toInt
        assert(math.abs(scores(i) - e.getValue.asDouble()) < 1e-9,
          s"query=${g.get("query").asText()} chunk=$i")
      }
      val nonzero = scores.zipWithIndex.count(_._1 != 0.0)
      assert(nonzero == expected.size(), s"nonzero count for ${g.get("query").asText()}")
    }
  }

  test("bonused scores parity (1e-9)") {
    for (g <- goldens) {
      val q = g.get("query").asText()
      val scores = backend.bonusedScores(q, q, cfgFor(g))
      val expected = g.get("bonused_scores").elements().asScala.map(_.asDouble()).toArray
      assert(scores.length == expected.length)
      for (i <- scores.indices)
        assert(math.abs(scores(i) - expected(i)) < 1e-9,
          s"query=$q chunk=$i got=${scores(i)} expected=${expected(i)}")
    }
  }

  test("candidate pool rank-identical") {
    for (g <- goldens) {
      val q = g.get("query").asText()
      val out = Pipeline.searchTopK(backend, q, cfgFor(g))
      val expectedPool = g.get("pool").elements().asScala.map(_.asLong()).toList
      assert(out.pool.toList == expectedPool, s"pool mismatch for query=$q")
    }
  }

  test("RM3 expansion parity") {
    for (g <- goldens if g.get("prf_enabled").asBoolean()) {
      val q = g.get("query").asText()
      val out = Pipeline.searchTopK(backend, q, cfgFor(g))
      assert(out.rm3Expanded == Goldens.optStr(g, "rm3_expanded"), s"rm3 for $q")
    }
  }

  test("confidence parity") {
    for (g <- goldens) {
      val q = g.get("query").asText()
      val out = Pipeline.searchTopK(backend, q, cfgFor(g))
      val c = g.get("confidence")
      assert(out.confidence.level == c.get("level").asText(), s"level for $q")
      assert(out.confidence.score == c.get("score").asDouble(), s"conf score for $q")
      assert(out.confidence.spread == c.get("spread").asDouble(), s"spread for $q")
      assert(out.confidence.stability == c.get("stability").asDouble(), s"stability for $q")
    }
  }

  test("final results rank- and content-identical") {
    for (g <- goldens) {
      val q = g.get("query").asText()
      val out = Pipeline.searchTopK(backend, q, cfgFor(g))
      val expected = g.get("results").elements().asScala.toList
      assert(out.results.length == expected.length, s"result count for $q")
      out.results.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(got.text == exp.get("text").asText(), s"$q result[$i].text")
        assert(got.citation == exp.get("citation").asText(), s"$q result[$i].citation")
        val src = exp.get("source")
        assert(got.source.file == src.get("file").asText(), s"$q result[$i].file")
        assert(got.source.page == src.get("page").asInt(), s"$q result[$i].page")
        assert(got.source.doi == Goldens.optStr(src, "doi"), s"$q result[$i].doi")
        assert(got.source.title == Goldens.optStr(src, "title"), s"$q result[$i].title")
        assert(got.source.citekey == Goldens.optStr(src, "citekey"), s"$q result[$i].citekey")
        assert(got.pandoc == Goldens.optStr(exp, "pandoc"), s"$q result[$i].pandoc")
        assert(got.score.contains(exp.get("score").asDouble()), s"$q result[$i].score " +
          s"got=${got.score} expected=${exp.get("score").asDouble()}")
      }
    }
  }
}

class RrfParitySpec extends AnyFunSuite {
  test("rrf_fuse parity incl. tie order") {
    val cases = Goldens.load("rrf.json").elements().asScala.toList
    for (c <- cases) {
      val runs = c.get("runs").elements().asScala
        .map(r => r.elements().asScala.map(_.asLong()).toSeq).toSeq
      val got = Pipeline.rrfFuse(runs, c.get("C").asInt(), c.get("cap").asInt())
      val expected = c.get("fused").elements().asScala.map(_.asLong()).toList
      assert(got == expected)
    }
  }
}

class DedupParitySpec extends AnyFunSuite {
  test("keep-first dedup matches reference chunk stream") {
    // corpus.json chunks are already deduped by the reference
    // (io_pdf.py:1219-1242); re-chunk the raw pages ourselves and verify we
    // produce the identical chunk list.
    val corpus = Goldens.corpus
    val pages = corpus.get("pages").elements().asScala.toList
    val chunksOut = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    for (p <- pages) {
      val cleaned = graft.analysis.Analyzer.cleanText(p.get("text").asText())
      for (piece <- graft.analysis.Analyzer.chunkText(cleaned, "", "sliding", 600, 80))
        chunksOut += ((p.get("doc_id").asLong(), p.get("page").asInt(), piece))
    }
    val seen = scala.collection.mutable.HashSet.empty[String]
    val deduped = chunksOut.filter { case (_, _, text) =>
      val normalized = graft.analysis.Analyzer.dedupNormalize(text)
      normalized.nonEmpty && seen.add(graft.analysis.Analyzer.md5Hex(normalized))
    }
    val goldenChunks = Goldens.chunks
    assert(deduped.length == goldenChunks.length)
    deduped.zip(goldenChunks).foreach { case ((docId, page, text), g) =>
      assert(docId == g.docId && page == g.page && text == g.text)
    }
  }
}
