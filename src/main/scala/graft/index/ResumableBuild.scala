package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.{ChunkRow, ChunkerConfig, ChunkerJob, PageDoc}

/** Checkpoint-resumable, incrementally-updatable corpus+index build.
  *
  * Model (mirrors the reference's cache semantics, index.py:328-391 +
  * io_pdf.py:1344-1372, re-expressed for a partitioned table):
  *  - extraction/chunking — the compute-heavy phase — is partitioned into
  *    `nInputBuckets` url-hash buckets, each written independently and
  *    recorded in an append-only checkpoint log; a restarted build skips
  *    completed buckets (per-partition lineage: bucket -> chunker-config
  *    hash + row count + wall time);
  *  - a chunking-config hash change invalidates all checkpoints (reference
  *    io_pdf.py:1444-1461);
  *  - statistics and postings are corpus-global (BM25 idf/avgdl), so the
  *    index phase rebuilds from the merged chunk table — same contract as
  *    the reference, which re-fits BM25 whenever the corpus changes
  *    (index.py:52-62) while reusing cached chunk extraction.
  */
object ResumableBuild {

  case class ResumeConfig(nInputBuckets: Int = 16,
                          /** test hook: abort after N buckets (-1 = never) */
                          failAfterBuckets: Int = -1)

  private def chunkerHash(cfg: ChunkerConfig): String =
    graft.analysis.Analyzer.md5Hex(cfg.toString)

  def chunksRawDir(out: IndexPaths): String = s"${out.root}/chunks_raw"

  /** Phase 1: chunk per url-bucket with checkpoint skip. Returns buckets
    * processed this run.
    */
  def chunkPhase(spark: SparkSession, pages: Dataset[PageDoc], out: IndexPaths,
                 chunker: ChunkerConfig, resume: ResumeConfig): Seq[Int] = {
    val cfgHash = chunkerHash(chunker)
    val existing = TableIO.readCheckpoints(out.checkpoints)
    val valid = existing.filter(_.get("config_hash").contains(cfgHash))
    if (valid.size != existing.size && existing.nonEmpty) {
      // chunking config changed -> full invalidation
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(out.checkpoints))
    }
    val done = (if (valid.size == existing.size) valid else Nil)
      .flatMap(_.get("bucket")).map(_.toInt).toSet

    val processed = scala.collection.mutable.ArrayBuffer.empty[Int]
    var aborted = false
    for (b <- 0 until resume.nInputBuckets if !aborted) {
      if (!done.contains(b)) {
        if (resume.failAfterBuckets >= 0 && processed.length >= resume.failAfterBuckets) {
          aborted = true
        } else {
          val t0 = System.nanoTime()
          val bucketPages = pages.filter(
            pmod(xxhash64(col("url")), lit(resume.nInputBuckets)) === b)
          val chunks = ChunkerJob.chunk(bucketPages, chunker)
          chunks.write.mode(SaveMode.Overwrite)
            .parquet(s"${chunksRawDir(out)}/bucket=$b")
          val n = spark.read.parquet(s"${chunksRawDir(out)}/bucket=$b").count()
          TableIO.appendCheckpoint(out.checkpoints, Map(
            "bucket" -> b.toString, "rows" -> n.toString,
            "config_hash" -> cfgHash,
            "wall_ms" -> ((System.nanoTime() - t0) / 1000000).toString))
          processed += b
        }
      }
    }
    if (aborted)
      throw new RuntimeException(
        s"aborted after ${processed.length} buckets (test hook)")
    processed.toSeq
  }

  /** Phase 2: merge chunk buckets (global dedup across buckets) + build
    * the index; manifest records lineage to the previous snapshot.
    */
  def indexPhase(spark: SparkSession, out: IndexPaths, build: BuildConfig,
                 resume: ResumeConfig): GlobalStats = {
    import spark.implicits._
    val parent = TableIO.readManifest(out.manifest)
      .flatMap(_.get("snapshot_id")).getOrElse("none")
    val merged = ChunkerJob.dedup(
      spark.read.parquet((0 until resume.nInputBuckets)
        .map(b => s"${chunksRawDir(out)}/bucket=$b")
        .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))): _*)
        .as[ChunkRow])
    val stats = IndexBuilder.build(spark, merged, out, build)
    val manifest = TableIO.readManifest(out.manifest).getOrElse(Map.empty)
    TableIO.writeManifest(out.manifest, manifest + ("parent_snapshot" -> parent))
    stats
  }

  def run(spark: SparkSession, pages: Dataset[PageDoc], out: IndexPaths,
          build: BuildConfig = BuildConfig(),
          chunker: ChunkerConfig = ChunkerConfig(),
          resume: ResumeConfig = ResumeConfig()): GlobalStats = {
    chunkPhase(spark, pages, out, chunker, resume)
    indexPhase(spark, out, build, resume)
  }

  /** Changed-url detection (reference detect_changed_files,
    * index.py:328-391): anti-joins of (url, warc_ts) between the incoming
    * snapshot and the indexed corpus. Returns (new, changed, removed) urls.
    */
  def detectChanged(spark: SparkSession, pages: DataFrame,
                    indexedChunks: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val current = pages.select(col("url"), col("warc_ts"))
    val indexed = indexedChunks.select(col("source").as("url")).distinct()
    val newUrls = current.join(indexed, Seq("url"), "left_anti").select("url").distinct()
    // warc_ts is not retained in chunks; a changed url is one whose text
    // hash differs — callers carrying a prior manifest of (url, text_sha)
    // should use detectChangedByHash. Here: changed = in both, newer ts
    // unknown -> empty frame placeholder of same schema.
    val changed = newUrls.limit(0)
    val removed = indexed.join(current.select("url").distinct(), Seq("url"), "left_anti")
    (newUrls, changed, removed)
  }

  /** Text-hash manifest per url (reference index.py:275-325): sha256 over
    * chunk texts concatenated in deterministic (page, chunkIdx) order.
    */
  def urlTextHashes(chunks: Dataset[ChunkRow]): DataFrame = {
    import chunks.sparkSession.implicits._
    chunks.toDF()
      .groupBy("source")
      .agg(sha2(concat_ws("",
        array_sort(collect_list(struct(col("page"), col("chunkIdx"), col("text"))))
          .getField("text")), 256).as("text_sha"))
  }

  /** Changed-url detection against a prior hash manifest. */
  def detectChangedByHash(currentHashes: DataFrame, priorHashes: DataFrame): DataFrame = {
    currentHashes.as("c")
      .join(priorHashes.as("p"), col("c.source") === col("p.source"), "left")
      .filter(col("p.text_sha").isNull || col("c.text_sha") =!= col("p.text_sha"))
      .select(col("c.source"))
  }

  /** Incremental update: reprocess only the url buckets containing changed
    * urls, overwrite those bucket partitions, then re-run the index phase.
    */
  def incrementalUpdate(spark: SparkSession, pages: Dataset[PageDoc],
                        changedUrls: DataFrame, out: IndexPaths,
                        build: BuildConfig, chunker: ChunkerConfig,
                        resume: ResumeConfig): GlobalStats = {
    import spark.implicits._
    val buckets = changedUrls
      .select(pmod(xxhash64(col("source")), lit(resume.nInputBuckets)).cast("int").as("b"))
      .distinct().as[Int].collect().toSeq
    val cfgHash = chunkerHash(chunker)
    for (b <- buckets.sorted) {
      val bucketPages = pages.filter(
        pmod(xxhash64(col("url")), lit(resume.nInputBuckets)) === b)
      ChunkerJob.chunk(bucketPages, chunker)
        .write.mode(SaveMode.Overwrite).parquet(s"${chunksRawDir(out)}/bucket=$b")
      TableIO.appendCheckpoint(out.checkpoints, Map(
        "bucket" -> b.toString, "config_hash" -> cfgHash,
        "incremental" -> "true"))
    }
    indexPhase(spark, out, build, resume)
  }
}
