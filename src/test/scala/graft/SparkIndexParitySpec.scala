package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.index.{BuildConfig, IndexBuilder, IndexPaths}
import graft.query.{LocalBackend, Pipeline, PipelineConfig, SparkBackend, Wand}

/** End-to-end parity of the DISTRIBUTED engine (index build + Spark-backed
  * query pipeline + WAND) against the reference goldens and the in-memory
  * oracle path.
  */
class SparkIndexParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val corpus = Goldens.corpus
  private lazy val paths = {
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toString
    val p = IndexPaths(dir)
    import spark.implicits._
    val ds = spark.createDataset(Goldens.chunks)
    IndexBuilder.build(spark, ds, p,
      BuildConfig(k1 = corpus.get("k1").asDouble(), b = corpus.get("b").asDouble(),
        nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8))
    p
  }
  private lazy val backend = new SparkBackend(spark, paths)
  private lazy val local = new LocalBackend(Goldens.chunks,
    corpus.get("k1").asDouble(), corpus.get("b").asDouble())
  private lazy val goldens = Goldens.load("pipeline.json").elements().asScala.toList

  test("distributed stats match reference (N, avgdl, idf incl. floor)") {
    val stats = backend.stats
    assert(stats.nDocs == corpus.get("n_docs").asLong())
    assert(math.abs(stats.avgdl - corpus.get("avgdl").asDouble()) < 1e-9)
    import spark.implicits._
    val idf = spark.read.parquet(paths.termStats)
      .select("term", "idf").as[(String, Double)].collect().toMap
    val goldenIdf = corpus.get("idf")
    assert(idf.size == goldenIdf.size())
    goldenIdf.fields().asScala.foreach { e =>
      assert(math.abs(idf(e.getKey) - e.getValue.asDouble()) < 1e-9, s"idf(${e.getKey})")
    }
  }

  test("distributed search pipeline rank- and score-identical to reference") {
    for (g <- goldens) {
      val q = g.get("query").asText()
      val cfg = PipelineConfig(prfEnabled = g.get("prf_enabled").asBoolean())
      val out = Pipeline.searchTopK(backend, q, cfg)
      val expectedPool = g.get("pool").elements().asScala.map(_.asLong()).toList
      assert(out.pool.toList == expectedPool, s"pool mismatch for '$q'")
      val expected = g.get("results").elements().asScala.toList
      assert(out.results.length == expected.length, s"result count for '$q'")
      out.results.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(got.text == exp.get("text").asText(), s"'$q' result[$i].text")
        assert(got.citation == exp.get("citation").asText(), s"'$q' result[$i].citation")
        assert(got.score.contains(exp.get("score").asDouble()), s"'$q' result[$i].score")
      }
      assert(out.confidence.score == g.get("confidence").get("score").asDouble(), s"conf '$q'")
    }
  }

  test("WAND top-k matches join+agg scoring path") {
    val queries = Seq("machine learning algorithms", "quick brown fox",
      "climate ocean temperature", "nobel prize physics quantum theory experiment",
      "spark shuffle partition")
    for (q <- queries) {
      val toks = graft.analysis.Analyzer.tokenize(q).toIndexedSeq
      val wand = Wand.topK(spark, paths, backend.stats, q, 10, backend.idfFor)
      // reference scoring path: dense local scores, top-10 by (score desc, id asc)
      val dense = local.denseScores(toks)
      val expected = dense.zipWithIndex
        .filter(_._1 != 0.0)
        .sortBy { case (s, i) => (-s, i.toLong) }
        .take(10).map { case (s, i) => (i.toLong, s) }.toSeq
      assert(wand.length == expected.length, s"'$q': ${wand.length} vs ${expected.length}")
      wand.zip(expected).foreach { case ((gd, gs), (ed, es)) =>
        assert(gd == ed, s"'$q' doc order: got $gd expected $ed")
        assert(math.abs(gs - es) < 1e-9, s"'$q' score: $gs vs $es")
      }
    }
  }

  test("WAND is correct under all-negative idf (stopword-dense corpus)") {
    // every term appears in nearly every doc -> raw idf < 0 for all terms,
    // eps floor negative (faithful BM25Okapi behavior); WAND must clamp
    // term upper bounds at 0 or it prunes wrongly (regression: sf0.1)
    import spark.implicits._
    val texts = (0 until 300).map { i =>
      val rare = if (i % 7 == 0) " gamma" else ""
      s"alpha beta${" alpha" * (i % 4)}$rare common tokens everywhere"
    }
    val chunks = texts.zipWithIndex.map { case (t, i) =>
      graft.corpus.ChunkRow(i.toLong, i.toLong, s"s$i", 1, 0, t, graft.corpus.ChunkMeta())
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-negidf").toString
    val p = IndexPaths(dir)
    IndexBuilder.build(spark, spark.createDataset(chunks), p,
      BuildConfig(nTermBuckets = 4, nDocShards = 2, shufflePartitions = 4))
    val be = new graft.query.SparkBackend(spark, p)
    assert(be.idfFor(Seq("alpha"))("alpha") < 0, "setup must produce negative idf")
    val local = new LocalBackend(chunks.toIndexedSeq)
    for (q <- Seq("alpha beta", "alpha gamma", "alpha alpha beta")) {
      val toks = graft.analysis.Analyzer.tokenize(q).toIndexedSeq
      val wand = Wand.topK(spark, p, be.stats, q, 10, be.idfFor)
      val dense = local.denseScores(toks).zipWithIndex
        .filter(_._1 != 0.0).sortBy { case (s, i) => (-s, i.toLong) }
        .take(10).map { case (s, i) => (i.toLong, s) }.toSeq
      assert(wand.map(_._1) == dense.map(_._1), s"'$q': $wand vs $dense")
      wand.zip(dense).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9)
      }
    }
  }

  test("postings compression: blocks smaller than raw postings") {
    import org.apache.spark.sql.functions._
    val blockBytes = spark.read.parquet(paths.blocks)
      .agg(sum(length(col("docs")) + length(col("tfs")) + length(col("dls"))))
      .head().getLong(0)
    val nPostings = spark.read.parquet(paths.blocks)
      .agg(sum(col("n"))).head().getLong(0)
    // raw postings are (8B id + 4B tf + 4B dl) = 16B
    assert(blockBytes < nPostings * 16, s"$blockBytes bytes for $nPostings postings")
  }

  test("distributed chunker + keep-first dedup reproduce the reference chunk set") {
    import spark.implicits._
    val pages = corpus.get("pages").elements().asScala.toList.map { p =>
      graft.corpus.PageDoc(p.get("source").asText(), p.get("page").asInt(),
        p.get("text").asText(), None)
    }
    val got = graft.corpus.ChunkerJob.chunk(
      spark.createDataset(pages),
      graft.corpus.ChunkerConfig(qualityCheck = false))
      .collect().map(c => (c.source, c.page, c.text)).sortBy(t => (t._1, t._2, t._3))
    val expected = Goldens.chunks.map(c => (c.source, c.page, c.text))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.length == expected.length)
    assert(got.toSeq == expected.toSeq)
  }

  test("doc-shard auto mode scales with corpus; WAND parity holds past 4 shards") {
    // auto (nDocShards = 0, the default) must grow shard count with the
    // corpus so WAND's per-shard task parallelism is never capped at a
    // constant: one shard never exceeds ~250k docs.
    val auto = BuildConfig() // default is auto
    assert(auto.nDocShards == 0)
    assert(auto.resolveDocShards(1000L) == 4)
    assert(auto.resolveDocShards(1000000L) == 5)
    assert(auto.resolveDocShards(10000000L) == 41)
    assert(auto.resolveDocShards(2000000000L) == 4096) // capped
    assert(BuildConfig(nDocShards = 7).resolveDocShards(1000L) == 7) // explicit wins

    // an index with >4 shards stays rank- and score-identical
    import spark.implicits._
    val texts = (0 until 120).map(i => s"omega theta phi-$i shard test corpus row number $i")
    val chunks = texts.zipWithIndex.map { case (t, i) =>
      graft.corpus.ChunkRow(i.toLong, i.toLong, s"s$i", 1, 0, t, graft.corpus.ChunkMeta())
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-shards7").toString
    val p = IndexPaths(dir)
    IndexBuilder.build(spark, spark.createDataset(chunks), p,
      BuildConfig(nTermBuckets = 4, nDocShards = 7, shufflePartitions = 8))
    val nShards = spark.read.parquet(p.blocks).select("shard").distinct().count()
    assert(nShards > 4, s"expected >4 distinct shards, got $nShards")
    val be = new graft.query.SparkBackend(spark, p)
    val lb = new LocalBackend(chunks.toIndexedSeq)
    for (q <- Seq("omega theta", "shard test corpus", "row number test")) {
      val toks = graft.analysis.Analyzer.tokenize(q).toIndexedSeq
      val wand = Wand.topK(spark, p, be.stats, q, 10, be.idfFor)
      val dense = lb.denseScores(toks).zipWithIndex
        .filter(_._1 != 0.0).sortBy { case (s, i) => (-s, i.toLong) }
        .take(10).map { case (s, i) => (i.toLong, s) }.toSeq
      assert(wand.map(_._1) == dense.map(_._1), s"'$q': $wand vs $dense")
      wand.zip(dense).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9)
      }
    }
  }

  test("metrics and manifest are written") {
    val metrics = spark.read.parquet(paths.metrics)
    assert(metrics.count() > 0)
    val manifest = graft.index.TableIO.readManifest(paths.manifest)
    assert(manifest.exists(_.contains("snapshot_id")))
    assert(manifest.exists(_.get("n_docs").contains(Goldens.chunks.length.toString)))
  }
}
