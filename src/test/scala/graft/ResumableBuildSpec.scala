package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.{ChunkerConfig, ChunkerJob, PageDoc, WebPages}
import graft.index._

class ResumableBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val chunker = ChunkerConfig(qualityCheck = false)
  private val build = BuildConfig(nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8)
  private val resume = ResumableBuild.ResumeConfig(nInputBuckets = 8)

  private def pagesA = WebPages.generate(spark, 150, seed = 42, partitions = 4)
    .map(p => PageDoc(p.url, 1, p.text, None))

  test("build resumes from checkpoints after a mid-build crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val out = IndexPaths(dir)
    val ex = intercept[RuntimeException] {
      ResumableBuild.chunkPhase(spark, pagesA, out, chunker,
        resume.copy(failAfterBuckets = 3))
    }
    assert(ex.getMessage.contains("aborted"))
    val cps1 = TableIO.readCheckpoints(out.checkpoints)
    assert(cps1.size == 3)

    // restart: completes only the remaining buckets
    val processed = ResumableBuild.chunkPhase(spark, pagesA, out, chunker, resume)
    assert(processed.size == resume.nInputBuckets - 3)
    val stats = ResumableBuild.indexPhase(spark, out, build, resume)

    // equivalent non-resumed build
    val dir2 = java.nio.file.Files.createTempDirectory("graft-direct").toString
    val out2 = IndexPaths(dir2)
    val direct = IndexBuilder.build(spark,
      ChunkerJob.chunk(pagesA, chunker), out2, build)
    assert(stats.nDocs == direct.nDocs)
    assert(math.abs(stats.avgdl - direct.avgdl) < 1e-12)
    assert(stats.vocabSize == direct.vocabSize)

    // identical search results through both indexes
    val cfgP = graft.query.PipelineConfig()
    val b1 = new graft.query.SparkBackend(spark, out)
    val b2 = new graft.query.SparkBackend(spark, out2)
    val q = "quantum physics experiment"
    val r1 = graft.query.Pipeline.searchTopK(b1, q, cfgP)
    val r2 = graft.query.Pipeline.searchTopK(b2, q, cfgP)
    assert(r1.results == r2.results)
    assert(r1.results.nonEmpty)
  }

  test("chunker-config change invalidates checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inval").toString
    val out = IndexPaths(dir)
    ResumableBuild.chunkPhase(spark, pagesA, out, chunker, resume)
    assert(TableIO.readCheckpoints(out.checkpoints).size == resume.nInputBuckets)
    // different window size -> full re-chunk
    val processed = ResumableBuild.chunkPhase(spark, pagesA, out,
      chunker.copy(windowChars = 300), resume)
    assert(processed.size == resume.nInputBuckets)
  }

  test("warc_ts changed-detection: a re-crawled url triggers exactly its bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val out = IndexPaths(dir)
    val crawlA = WebPages.generate(spark, 150, seed = 42, partitions = 4)
    ResumableBuild.run(spark, crawlA.map(p => PageDoc(p.url, 1, p.text, None)),
      out, build, chunker, resume)
    ResumableBuild.writeUrlManifest(crawlA.toDF(), out)

    // crawl B: one url re-crawled with a newer warc_ts + new text, one new url
    val recrawled = crawlA.filter(col("url").endsWith("page03")).limit(1)
      .collect().head
    val crawlB = crawlA.map { p =>
      if (p.url == recrawled.url)
        p.copy(warc_ts = new java.sql.Timestamp(p.warc_ts.getTime + 86400000L),
          text = p.text + " recrawl sentinel content")
      else p
    }.union(spark.createDataset(Seq(WebPages.pageFor(999999L, 7L))))

    val manifest = spark.read.parquet(ResumableBuild.urlManifestPath(out))
    val (newU, changed, removed) =
      ResumableBuild.detectChanged(spark, crawlB.toDF(), manifest)
    assert(changed.collect().map(_.getString(0)).toSeq == Seq(recrawled.url))
    assert(newU.count() == 1)
    assert(removed.count() == 0)

    val before = TableIO.readCheckpoints(out.checkpoints).size
    ResumableBuild.incrementalUpdate(spark,
      crawlB.map(p => PageDoc(p.url, 1, p.text, None)),
      changed.union(newU), out, build, chunker, resume)
    val incr = TableIO.readCheckpoints(out.checkpoints).drop(before)
    val expectedBuckets = Set(recrawled.url, WebPages.pageFor(999999L, 7L).url)
      .map(u => graft.index.IndexBuilder.termBucket(u, resume.nInputBuckets))
    assert(incr.flatMap(_.get("bucket")).map(_.toInt).toSet == expectedBuckets)
    assert(spark.read.parquet(out.chunks)
      .filter(col("text").contains("recrawl sentinel")).count() > 0)
  }

  test("incremental update reprocesses only changed urls' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val out = IndexPaths(dir)
    ResumableBuild.run(spark, pagesA, out, build, chunker, resume)
    val priorHashes = ResumableBuild.urlTextHashes(
      spark.read.parquet(out.chunks).as[graft.corpus.ChunkRow])

    // corpus B: 10 pages get new content
    val pagesB = pagesA.map { p =>
      if (p.url.hashCode % 15 == 0)
        p.copy(text = p.text + " freshly recrawled marker content appears here")
      else p
    }
    val currentHashes = ResumableBuild.urlTextHashes(
      ChunkerJob.chunk(pagesB, chunker))
    val changed = ResumableBuild.detectChangedByHash(currentHashes, priorHashes)
    val nChanged = changed.count()
    assert(nChanged > 0 && nChanged < 150, s"changed=$nChanged")

    val before = TableIO.readCheckpoints(out.checkpoints).size
    ResumableBuild.incrementalUpdate(spark, pagesB, changed, out, build, chunker, resume)
    val incr = TableIO.readCheckpoints(out.checkpoints).drop(before)
    assert(incr.nonEmpty && incr.size <= resume.nInputBuckets)
    assert(incr.forall(_.get("incremental").contains("true")))

    // updated chunks present in the final table
    val marked = spark.read.parquet(out.chunks)
      .filter(col("text").contains("freshly recrawled marker")).count()
    assert(marked > 0)
  }
}
