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
  private lazy val (paths, backend) = {
    import spark.implicits._
    val pages = WebPages.generate(spark, 2000, 42, 8)
      .map(p => PageDoc(p.url, 1, p.text, None))
    val chunks = ChunkerJob.chunk(pages, ChunkerConfig())
    val p = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-bounded").toString)
    IndexBuilder.build(spark, chunks, p,
      BuildConfig(nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8))
    (p, new SparkBackend(spark, p))
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

  test("head-term dense pass above the matched-doc ceiling never broadcasts") {
    import spark.implicits._
    // synthetic head-term query: the most frequent indexed term, guaranteed
    // to route topPool through the dense fallback (df > nDocs/2 on a Zipf
    // corpus) rather than the bounded WAND path
    val head = spark.read.parquet(paths.termStats)
      .orderBy(org.apache.spark.sql.functions.desc("df"))
      .select("term").as[String].head()
    val q = s"$head learning"
    assert(backend.dfFor(Seq(head))(head) > backend.stats.nDocs / 2,
      s"setup: '$head' must be a head term")
    // the corpus-score join is on chunkId; the inner broadcast of the
    // <=10-row query-term frame inside scoresDF is legitimate at any scale
    def chunkIdJoin(plan: String, kind: String): Boolean =
      plan.linesIterator.exists(l => l.contains(kind) && l.contains("[chunkId"))
    val before = backend.topPool(q, q, 20, PipelineConfig())
    assert(backend.lastPoolPath == "dense") // head term skipped bounded path
    assert(backend.lastDenseJoin == "broadcast") // tiny corpus: under ceiling
    assert(chunkIdJoin(backend.lastDensePlan, "BroadcastHashJoin"))
    backend.denseBroadcastMaxMatched = 0 // force every query over the ceiling
    try {
      val after = backend.topPool(q, q, 20, PipelineConfig())
      assert(backend.lastDenseJoin == "shuffle-hash")
      assert(!chunkIdJoin(backend.lastDensePlan, "BroadcastHashJoin"),
        s"corpus-sized broadcast still planned:\n${backend.lastDensePlan}")
      assert(chunkIdJoin(backend.lastDensePlan, "ShuffledHashJoin"),
        s"expected shuffled hash join:\n${backend.lastDensePlan}")
      assert(after.map(p => (p._1.chunkId, p._2)) == before.map(p => (p._1.chunkId, p._2)),
        "shuffle-hash dense pass changed the pool")
    } finally backend.denseBroadcastMaxMatched = 50L * 1000 * 1000
  }

  test("headTermWand serves a head-term query from WAND only — no dense pass, bounded deviation") {
    import spark.implicits._
    val head = spark.read.parquet(paths.termStats)
      .orderBy(org.apache.spark.sql.functions.desc("df"))
      .select("term").as[String].head()
    val q = s"$head learning"
    assert(backend.dfFor(Seq(head))(head) > backend.stats.nDocs / 2,
      s"setup: '$head' must be a head term")
    val dense = backend.topPool(q, q, 50, PipelineConfig())
    assert(backend.lastPoolPath == "dense") // default mode: reference-exact
    backend.lastDenseJoin = "" // sentinel: any dense pass would overwrite it
    val wand = backend.topPool(q, q, 50, PipelineConfig(headTermWand = true))
    assert(backend.lastPoolPath == "wand-headterm")
    assert(backend.lastDenseJoin == "",
      "headTermWand mode executed the dense chunk-table pass")
    assert(wand.length == dense.length)
    // deviation bound: candidate selection ignored bonuses, so at every
    // rank the served score trails the reference-exact pool by at most the
    // additive bonus ceiling (re-scoring itself is exact)
    val bMax = 0.2 + 0.1 + backend.stats.maxStaticBonus +
      (if (q.length >= 20) 2.0 else 0.0)
    wand.zip(dense).zipWithIndex.foreach { case (((_, ws), (_, ds)), i) =>
      assert(ds - ws <= bMax + 1e-9,
        s"rank $i: wand score $ws trails dense $ds beyond the $bMax bound")
    }
    // a non-head-term query is untouched by the flag (same path, same pool)
    val normal = backend.topPool(queries.head, queries.head, 20,
      PipelineConfig(headTermWand = true))
    val normalDefault = backend.topPool(queries.head, queries.head, 20,
      PipelineConfig())
    assert(normal.map(p => (p._1.chunkId, p._2)) ==
      normalDefault.map(p => (p._1.chunkId, p._2)))
  }

  test("q_wand_headterm's corpus routes the full headTermWand pool through WAND (driver scale)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val (_, b) = graft.spark.DocIndex.backendFor(spark, dir)
    val q = "scan merge sort window" // SparkEntryExtra.HeadQuery
    val toks = graft.analysis.Analyzer.tokenize(q).toSeq
    assert(b.dfFor(toks).values.sum > b.stats.nDocs / 2,
      "setup: the catalog head-term query must be head on the driver corpus")
    b.lastDenseJoin = "" // sentinel: any dense chunk-table pass overwrites it
    val pool = b.topPool(q, q, 50, PipelineConfig(headTermWand = true))
    assert(b.lastPoolPath == "wand-headterm",
      s"expected wand-headterm routing, got ${b.lastPoolPath}")
    assert(b.lastDenseJoin == "",
      "headTermWand mode executed the dense chunk-table pass — blocks-only plan violated")
    assert(pool.nonEmpty)
    // and the catalog entry itself (exact WAND top-20, oracle-matched in
    // both dialects) serves rows on the same index
    val rows = SparkEntry.queries("q_wand_headterm")(spark, dir).collect()
    assert(rows.length == 20)
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
