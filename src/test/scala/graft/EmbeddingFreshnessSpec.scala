package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.{ChunkerConfig, PageDoc, WebPages}
import graft.index._
import graft.query.EmbeddingProvider

/** VERDICT r5 directive: the embedding table must have the same
  * change-proportional update story as the index — a re-crawled doc's
  * vector is replaced, untouched ubucket partitions stay byte-identical,
  * and the ANN serving path refreshes itself via the snapshot staleness
  * check (the reference invalidates its FAISS cache by manifest hash,
  * semantic_index.py:25-71).
  */
class EmbeddingFreshnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic text-hash embedding — re-crawled text => new vector. */
  private object HashProvider extends EmbeddingProvider {
    def embed(text: String): Option[Array[Float]] = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      Some((0 until 8).map(j => (d(j).toInt / 128.0).toFloat).toArray)
    }
    def embedQuery(q: String): Option[Array[Float]] = embed(q)
  }

  private val chunker = ChunkerConfig(qualityCheck = false)
  private val build = BuildConfig(nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8)
  private val resume = ResumableBuild.ResumeConfig(nInputBuckets = 8)
  private def pagesA = WebPages.generate(spark, 120, seed = 7, partitions = 4)
    .map(p => PageDoc(p.url, 1, p.text, None))

  private def filesByU(root: String): Map[Int, Set[(String, Long)]] = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try s.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map { p =>
        val u = "ubucket=(\\d+)".r.findFirstMatchIn(p.toString).get.group(1).toInt
        u -> ((p.toString, java.nio.file.Files.size(p)))
      }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    finally s.close()
  }

  test("re-crawl replaces exactly the changed doc's vectors; untouched partitions byte-identical") {
    val out = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-embfresh").toString)
    ResumableBuild.run(spark, pagesA, out, build, chunker, resume)
    EmbeddingTable.build(spark, out, HashProvider)
    assert(EmbeddingTable.isFresh(spark, out))
    val before = filesByU(EmbeddingTable.dir(out))
    assert(before.keySet.size > 2, "setup: expected several ubucket dirs")
    // coverage: one row per embeddable chunk, sig-matched
    val nChunks = spark.read.parquet(out.chunks).count()
    assert(spark.read.parquet(EmbeddingTable.dir(out)).count() == nChunks)

    // re-crawl one url with new text
    val targetUrl = pagesA.select("url").as[String].orderBy("url").head()
    val pagesB = pagesA.map(p =>
      if (p.url == targetUrl) p.copy(text = p.text + " embedding freshness sentinel")
      else p)
    ResumableBuild.incrementalUpdate(spark, pagesB,
      Seq(targetUrl).toDF("url"), out, build, chunker, resume)
    assert(!EmbeddingTable.isFresh(spark, out),
      "index snapshot moved — embedding table must read as stale")

    // the serving-path constructor refreshes change-proportionally
    val ann = EmbeddingTable.annFor(spark, out, HashProvider)
    assert(EmbeddingTable.isFresh(spark, out))
    val after = filesByU(EmbeddingTable.dir(out))
    val affectedU = IndexBuilder.termBucket(targetUrl, resume.nInputBuckets)
    for (u <- before.keySet - affectedU)
      assert(after.get(u).contains(before(u)),
        s"untouched embedding partition $u was rewritten")
    assert(after.getOrElse(affectedU, Set.empty) != before(affectedU),
      "the changed url's partition kept its old files")

    // the re-crawled doc's vector IS the new text's embedding
    val changedChunks = spark.read.parquet(out.chunks)
      .filter(col("source") === targetUrl)
      .select("chunkId", "text").as[(Long, String)].collect()
    assert(changedChunks.nonEmpty)
    val served = spark.read.parquet(EmbeddingTable.dir(out))
      .filter(col("chunkId").isin(changedChunks.map(_._1).toSeq: _*))
      .select("chunkId", "embedding").as[(Long, Seq[Float])].collect().toMap
    for ((id, text) <- changedChunks)
      assert(served(id) == HashProvider.embed(text).get.toSeq,
        s"chunk $id still serves the pre-recrawl vector")
    // table still covers the corpus exactly
    assert(spark.read.parquet(EmbeddingTable.dir(out)).count() ==
      spark.read.parquet(out.chunks).count())
    // ANN over the refreshed table returns candidates
    assert(ann.preselect("embedding freshness sentinel", 5).nonEmpty)

    // idempotence: a second annFor must not rewrite anything
    EmbeddingTable.annFor(spark, out, HashProvider)
    assert(filesByU(EmbeddingTable.dir(out)) == after,
      "fresh table was rewritten by a no-op refresh")
  }

  test("annFor kind=ivf: codebook fitted once and persisted; all-cells probe == brute; fit survives snapshot churn") {
    val out = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-embivf").toString)
    ResumableBuild.run(spark, pagesA, out, build, chunker, resume)
    EmbeddingTable.build(spark, out, HashProvider)

    val ivf = EmbeddingTable.annFor(spark, out, HashProvider,
      kind = "ivf", ivfK = 4, nprobe = 4)
    val brute = EmbeddingTable.annFor(spark, out, HashProvider)
    val q = "inverted index compression"
    // probing every cell makes IVF an exact partition of brute's scan —
    // identical float chain and tie-break, so the lists must be EQUAL
    assert(ivf.preselect(q, 10) == brute.preselect(q, 10))

    val cbDir = java.nio.file.Paths.get(EmbeddingTable.codebookDir(out))
    assert(java.nio.file.Files.exists(cbDir), "codebook was not persisted")
    def cbFiles = {
      val s = java.nio.file.Files.walk(cbDir)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => (p.toString, java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p))).toSet
      finally s.close()
    }
    val fitted = cbFiles

    // snapshot churn: the coarse quantizer is reused (assignments are
    // per-snapshot, the codebook is offline-cadence like FAISS retraining)
    val targetUrl = pagesA.select("url").as[String].orderBy("url").head()
    val pagesB = pagesA.map(p =>
      if (p.url == targetUrl) p.copy(text = p.text + " ivf drift sentinel") else p)
    ResumableBuild.incrementalUpdate(spark, pagesB,
      Seq(targetUrl).toDF("url"), out, build, chunker, resume)
    val ivf2 = EmbeddingTable.annFor(spark, out, HashProvider,
      kind = "ivf", ivfK = 4, nprobe = 4)
    assert(cbFiles == fitted, "codebook was refit on a snapshot change")
    assert(EmbeddingTable.isFresh(spark, out))
    val brute2 = EmbeddingTable.annFor(spark, out, HashProvider)
    assert(ivf2.preselect(q, 10) == brute2.preselect(q, 10),
      "post-update IVF serving diverged from brute over the refreshed table")

    // cell pruning actually engages at nprobe < k and still returns rows
    val pruned = EmbeddingTable.annFor(spark, out, HashProvider,
      kind = "ivf", ivfK = 4, nprobe = 1)
    assert(pruned.preselect(q, 5).nonEmpty)
  }

  test("removed urls evict their vectors on refresh") {
    val out = IndexPaths(
      java.nio.file.Files.createTempDirectory("graft-embevict").toString)
    ResumableBuild.run(spark, pagesA, out, build, chunker, resume)
    EmbeddingTable.build(spark, out, HashProvider)
    val urls = pagesA.select("url").as[String].collect()
    val gone = urls.take(5).toSet
    val pagesB = pagesA.filter(p => !gone.contains(p.url))
    ResumableBuild.incrementalUpdate(spark, pagesB,
      gone.toSeq.toDF("url"), out, build, chunker, resume)
    EmbeddingTable.refresh(spark, out, HashProvider)
    val keptIds = spark.read.parquet(out.chunks).select("chunkId")
    val emb = spark.read.parquet(EmbeddingTable.dir(out))
    assert(emb.join(keptIds, Seq("chunkId"), "left_anti").count() == 0,
      "vectors of removed chunks still served")
    assert(emb.count() == keptIds.count())
  }
}
