package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.corpus.{ChunkerConfig, PageDoc}
import graft.index.{BuildConfig, IndexPaths, ResumableBuild, TableIO}

/** Streaming crawl ingest → incremental index maintenance bridge
  * (SURVEY §1.3 / VERDICT r4 #8): a `readStream` of re-crawled pages
  * drives `detectChanged` + `incrementalUpdate` from `foreachBatch`,
  * against the SAME durable state (crawl store, checkpoints, manifest,
  * sig tables) as the batch `update` CLI — so a stream-fed index is
  * identical to the batch-maintained one.
  *
  * Micro-batch contract:
  *  1. the batch's latest row per url is UPSERTED into a url-bucketed
  *     crawl store (`crawl_pages`, same url-hash modulus as chunks_raw) —
  *     only the buckets containing batch urls are rewritten;
  *  2. (url, warc_ts) diff against the index's url manifest decides
  *     new/changed urls — an unchanged re-delivery triggers nothing;
  *  3. changed urls drive the change-proportional incremental update over
  *     the full store (the update re-chunks only the affected buckets);
  *  4. the url manifest advances only after the update commits, so a
  *     crashed batch replays as a plain re-delivery (idempotent).
  */
object StreamIngest {

  def pagesStore(out: IndexPaths): String = s"${out.root}/crawl_pages"

  /** foreachBatch sink: `stream.writeStream.foreachBatch(sink(...))`. */
  def sink(out: IndexPaths, build: BuildConfig = BuildConfig(),
           chunker: ChunkerConfig = ChunkerConfig(),
           resume: ResumableBuild.ResumeConfig = ResumableBuild.ResumeConfig())
      : (DataFrame, Long) => Unit =
    (batch, _) => ingestBatch(batch, out, build, chunker, resume)

  /** One micro-batch of (url, warc_ts, text[, title]) rows. Also callable
    * on a plain batch frame (the stream/batch parity the specs assert).
    */
  def ingestBatch(batch0: DataFrame, out: IndexPaths, build: BuildConfig,
                  chunker: ChunkerConfig,
                  resume: ResumableBuild.ResumeConfig): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    if (batch0.isEmpty) return
    val withTitle =
      if (batch0.columns.contains("title")) batch0
      else batch0.withColumn("title", lit(null).cast("string"))
    // newest delivery per url within the batch
    val latest = withTitle
      .groupBy("url")
      .agg(max_by(struct(col("warc_ts"), col("text"), col("title")),
        col("warc_ts")).as("r"))
      .select(col("url"), col("r.warc_ts").as("warc_ts"),
        col("r.text").as("text"), col("r.title").as("title"))
      .localCheckpoint(true)

    val store = pagesStore(out)
    val conf = spark.sparkContext.hadoopConfiguration
    def exists(path: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(conf).exists(p)
    }
    val bucketCol = pmod(xxhash64(col("url")), lit(resume.nInputBuckets)).cast("int")

    def pagesOf(df: DataFrame) = df
      .select(col("url"), lit(1).as("page"), col("text"), col("title"))
      .as[PageDoc]

    // bootstrap keys on the URL MANIFEST, written last: a crash after the
    // store write but before the manifest would otherwise strand the
    // stream in the incremental branch reading a manifest that never
    // existed — re-delivery re-runs the (idempotent, checkpoint-resumed)
    // bootstrap instead
    if (!exists(store) || !exists(ResumableBuild.urlManifestPath(out))) {
      latest.withColumn("bucket", bucketCol)
        .repartition(resume.nInputBuckets, col("bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(store)
      ResumableBuild.run(spark, pagesOf(latest), out, build, chunker, resume)
      ResumableBuild.writeUrlManifest(latest.select("url", "warc_ts"), out)
      return
    }

    val manifest = spark.read.parquet(ResumableBuild.urlManifestPath(out))
    val (newU, changed, _) = ResumableBuild.detectChanged(spark, latest, manifest)
    // eager: the union reads `latest` (checkpointed) and the manifest —
    // collect the small changed-url set before any store mutation
    val changedUrls = newU.union(changed).distinct().as[String].collect().toSeq

    // upsert: rewrite only the buckets containing batch urls, keeping the
    // NEWEST (warc_ts) row per url across store ∪ batch — a re-delivered
    // or out-of-order OLDER crawl must not roll stored content back
    // (detectChanged would not flag it, leaving store and index disagreeing
    // until an unrelated same-bucket change silently indexed stale text).
    // Ties prefer the batch row (same crawl re-delivered).
    val buckets = latest.select(bucketCol.as("b")).distinct().as[Int].collect().toSeq
    val merged = spark.read.parquet(store)
      .filter(col("bucket").isin(buckets: _*))
      .select(col("url"), col("warc_ts"), col("text"), col("title"), col("bucket"))
      .withColumn("prio", lit(0))
      .unionByName(latest.withColumn("bucket", bucketCol).withColumn("prio", lit(1)))
      .groupBy("url")
      .agg(max_by(struct(col("warc_ts"), col("text"), col("title"), col("bucket")),
        struct(col("warc_ts"), col("prio"))).as("r"))
      .select(col("url"), col("r.warc_ts").as("warc_ts"), col("r.text").as("text"),
        col("r.title").as("title"), col("r.bucket").as("bucket"))
      .localCheckpoint(true) // materialize BEFORE overwriting what it reads
    merged.repartition(math.max(1, buckets.length), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(store)

    if (changedUrls.nonEmpty) {
      ResumableBuild.incrementalUpdate(spark,
        pagesOf(spark.read.parquet(store)),
        changedUrls.toDF("url"), out, build, chunker, resume)
      // manifest advances only after the update committed
      ResumableBuild.writeUrlManifest(
        spark.read.parquet(store).select("url", "warc_ts"), out)
    }
  }
}
