package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, sum}
import graft.index.{BuildConfig, Codec, IndexBuilder, IndexPaths}
import graft.query.{Pipeline, PipelineConfig, SparkBackend, Wand}

/** An index built with postingCodec="for" serves bit-identically to the
  * vbyte build over the same corpus: the codec is a pure byte-layout choice
  * below the scoring math, so every decoded posting — and therefore every
  * BM25 score, WAND bound, and pipeline result — must be equal, while the
  * on-disk block bytes differ (proof the FOR path actually ran).
  */
class ForCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val corpus = Goldens.corpus
  private def buildWith(codec: String): IndexPaths = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$codec").toString
    val p = IndexPaths(dir)
    import spark.implicits._
    val ds = spark.createDataset(Goldens.chunks)
    IndexBuilder.build(spark, ds, p,
      BuildConfig(k1 = corpus.get("k1").asDouble(), b = corpus.get("b").asDouble(),
        nTermBuckets = 8, nDocShards = 2, shufflePartitions = 8,
        postingCodec = codec))
    p
  }
  private lazy val vbytePaths = buildWith(Codec.Vbyte)
  private lazy val forPaths = buildWith(Codec.For)
  private lazy val queries = Seq(
    "transformer attention mechanism", "the of and", "retrieval", "bm25 ranking")

  test("stats record the codec; block bytes differ, posting payload does not") {
    val vb = IndexBuilder.loadStats(spark, vbytePaths)
    val fr = IndexBuilder.loadStats(spark, forPaths)
    assert(vb.postingCodec == Codec.Vbyte && fr.postingCodec == Codec.For)
    assert(vb.configHash != fr.configHash) // layout contract: no mixed shards
    def sizes(p: IndexPaths) = spark.read.parquet(p.blocks)
      .select(sum(org.apache.spark.sql.functions.length(col("docs"))),
        sum(col("n"))).head()
    val (sv, sf) = (sizes(vbytePaths), sizes(forPaths))
    assert(sv.getLong(1) == sf.getLong(1), "posting counts must match")
    assert(sv.getLong(0) != sf.getLong(0), "identical byte sizes: FOR never ran?")
  }

  test("WAND top-k identical across codecs") {
    val vb = new SparkBackend(spark, vbytePaths)
    val fr = new SparkBackend(spark, forPaths)
    for (q <- queries) {
      val a = Wand.topK(spark, vbytePaths, vb.stats, q, 10, vb.idfFor)
      val b = Wand.topK(spark, forPaths, fr.stats, q, 10, fr.idfFor)
      assert(a == b, s"WAND divergence for '$q'")
    }
  }

  test("full pipeline results identical across codecs") {
    val vb = new SparkBackend(spark, vbytePaths)
    val fr = new SparkBackend(spark, forPaths)
    for (q <- queries) {
      val a = Pipeline.searchTopK(vb, q, PipelineConfig())
      val b = Pipeline.searchTopK(fr, q, PipelineConfig())
      assert(a.pool.toList == b.pool.toList, s"pool divergence for '$q'")
      assert(a.results.map(r => (r.text, r.score, r.citation)) ==
        b.results.map(r => (r.text, r.score, r.citation)), s"results for '$q'")
      assert(a.confidence == b.confidence, s"confidence for '$q'")
    }
  }

  test("pre-r5 stats without a postingCodec column load as vbyte") {
    val dir = java.nio.file.Files.createTempDirectory("graft-oldstats").toString
    spark.read.parquet(vbytePaths.globalStats).drop("postingCodec")
      .write.mode("overwrite").parquet(s"$dir/global_stats")
    val old = IndexBuilder.loadStats(spark, IndexPaths(dir))
    assert(old.postingCodec == Codec.Vbyte)
  }

  test("default configHash unchanged from r4 (vbyte indexes stay updatable)") {
    // the codec term is appended to the hash input only for non-default
    // codecs; a pre-r5 on-disk index's recorded hash must keep matching
    val r4Style = graft.analysis.Analyzer.md5Hex(
      "1.4|0.75|0.25|32|0|128|0|0")
    assert(BuildConfig().configHash == r4Style)
  }
}
