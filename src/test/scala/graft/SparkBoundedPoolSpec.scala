package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{ChunkerConfig, ChunkerJob, PageDoc, WebPages}
import graft.index.{BuildConfig, IndexBuilder, IndexPaths}
import graft.query.{PipelineConfig, SparkBackend}

/** The rank-safe bounded pool (WAND top-M superset + exact re-score) must
  * return the exact same pool — ids AND scores — as the reference-exact
  * dense bonus pass, and must actually engage (not just fall back) on a
  * corpus large enough that the safety bound is provable.
  */
class SparkBoundedPoolSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val backend = {
    import spark.implicits._
    val pages = WebPages.generate(spark, 2000, 42, 8)
      .map(p => PageDoc(p.url, 1, p.text, None))
    val chunks = ChunkerJob.chunk(pages, ChunkerConfig())
    val paths = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-bounded").toString)
    IndexBuilder.build(spark, chunks, paths,
      BuildConfig(nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8))
    new SparkBackend(spark, paths)
  }

  private val queries = Seq(
    "machine learning algorithms",
    "gradient descent optimization methods for neural networks training",
    "climate ocean temperature",
    "spark shuffle partition",
    "index build throughput")

  test("bounded pool == dense pool (ids, scores, order) and engages") {
    var engaged = 0
    for (q <- queries; poolSize <- Seq(20, 100)) {
      val dense = backend.topPool(q, q, poolSize,
        PipelineConfig(densePoolOnly = true))
      assert(backend.lastPoolPath == "dense")
      val auto = backend.topPool(q, q, poolSize, PipelineConfig())
      if (backend.lastPoolPath == "bounded") engaged += 1
      assert(auto.map(_._1.chunkId) == dense.map(_._1.chunkId),
        s"'$q' pool=$poolSize ids differ (path=${backend.lastPoolPath})")
      auto.zip(dense).foreach { case ((_, gs), (_, es)) =>
        assert(gs == es, s"'$q' pool=$poolSize score $gs != $es")
      }
    }
    assert(engaged > 0, "bounded path never engaged — safety bound broken or corpus too small")
  }

  test("chunk-bucketed index (pruned candidate fetch) returns identical pools") {
    import spark.implicits._
    val pages = WebPages.generate(spark, 800, 42, 8)
      .map(p => PageDoc(p.url, 1, p.text, None))
    val chunks = ChunkerJob.chunk(pages, ChunkerConfig())
    val pathsB = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-cbucket").toString)
    IndexBuilder.build(spark, chunks, pathsB,
      BuildConfig(nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8,
        nChunkBuckets = 16))
    val bucketed = new SparkBackend(spark, pathsB)
    for (q <- queries.take(3)) {
      val a = bucketed.topPool(q, q, 50, PipelineConfig())
      val b = backend.topPool(q, q, 50, PipelineConfig())
      // different corpora sizes -> compare bucketed against ITS own dense
      val dense = bucketed.topPool(q, q, 50, PipelineConfig(densePoolOnly = true))
      assert(a.map(p => (p._1.chunkId, p._2)) == dense.map(p => (p._1.chunkId, p._2)),
        s"'$q' bucketed pool != dense pool")
      assert(b.nonEmpty) // main fixture still healthy
    }
  }
}
