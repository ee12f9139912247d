package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.{ChunkerConfig, PageDoc, WebPages}
import graft.index.{BuildConfig, IndexBuilder, IndexPaths, ResumableBuild, TableIO}
import graft.query.{Pipeline, PipelineConfig, SparkBackend, Wand}

/** spark-submit entry for the engine itself:
  *
  *   graft.GraftCli build  <indexDir> [nPages] [seed]   — generate + index
  *   graft.GraftCli query  <indexDir> <query...>        — full fusion pipeline
  *   graft.GraftCli wand   <indexDir> <query...>        — block-max WAND top-k
  *   graft.GraftCli stats  <indexDir>                   — manifest + metrics
  */
object GraftCli {

  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: build|query|wand|stats <indexDir> ...")
    val cmd = args(0)
    val paths = IndexPaths(args(1))
    val spark = session()
    import spark.implicits._

    cmd match {
      case "build" =>
        val nPages = if (args.length > 2) args(2).toLong else 10000L
        val seed = if (args.length > 3) args(3).toLong else 42L
        val pages = WebPages.generate(spark, nPages, seed)
          .map(p => PageDoc(p.url, 1, p.text, None))
        val t0 = System.nanoTime()
        val stats = ResumableBuild.run(spark, pages, paths,
          BuildConfig(), ChunkerConfig(), ResumableBuild.ResumeConfig())
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[graft] indexed ${stats.nDocs} chunks from $nPages pages in $secs%.1fs " +
          f"(${stats.nDocs / secs}%.0f chunks/s); vocab=${stats.vocabSize} avgdl=${stats.avgdl}%.2f")
      case "query" =>
        val q = args.drop(2).mkString(" ")
        val backend = new SparkBackend(spark, paths)
        val out = Pipeline.searchTopK(backend, q, PipelineConfig())
        println(s"[graft] query='$q' confidence=${out.confidence.level}(${out.confidence.score})")
        out.results.foreach(r =>
          println(f"  ${r.score.getOrElse(0.0)}%8.3f ${r.source.file}%-40s ${r.text.take(70)}"))
      case "wand" =>
        val q = args.drop(2).mkString(" ")
        val backend = new SparkBackend(spark, paths)
        val top = Wand.topK(spark, paths, backend.stats, q, 10, backend.idfFor)
        println(s"[graft] WAND top-${top.length} for '$q':")
        top.foreach { case (doc, s) => println(f"  $s%10.4f  doc=$doc") }
      case "chunkbench" =>
        val nPages = if (args.length > 2) args(2).toLong else 20000L
        val pages = WebPages.generate(spark, nPages, 42,
          spark.sparkContext.defaultParallelism * 2)
          .map(p => PageDoc(p.url, 1, p.text, None))
        // warm-up
        graft.corpus.ChunkerJob.chunk(pages.limit(500), ChunkerConfig()).count()
        val t0 = System.nanoTime()
        val n = graft.corpus.ChunkerJob.chunk(pages, ChunkerConfig()).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[graft] chunkbench: $n chunks from $nPages pages in $secs%.1fs " +
          f"(${nPages / secs}%.0f pages/s)")
      case "phasebench" =>
        val nPages = if (args.length > 2) args(2).toLong else 40000L
        import spark.implicits._
        def pages = WebPages.generate(spark, nPages, 42,
          spark.sparkContext.defaultParallelism * 2)
          .map(p => PageDoc(p.url, 1, p.text, None))
        def t(label: String)(f: => Long): Unit = {
          f // warm
          val t0 = System.nanoTime()
          val n = f
          println(f"[graft] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        }
        t("gen")(pages.count())
        t("gen+clean")(pages.map(p => graft.analysis.Analyzer.cleanText(p.text).length.toLong)
          .reduce(_ + _))
        val noDedup = pages.mapPartitions { it =>
          it.flatMap { p =>
            val cleaned = graft.analysis.Analyzer.cleanText(p.text)
            if (!graft.analysis.Analyzer.isTextQualityGood(cleaned, 0.5)) Iterator.empty
            else graft.analysis.Analyzer.chunkText(cleaned, "", "sliding", 600, 80).iterator
          }
        }
        t("gen+clean+chunk")(noDedup.count())
        t("full+dedup")(graft.corpus.ChunkerJob.chunk(pages, ChunkerConfig()).count())
      case "postbench" =>
        val nPages = if (args.length > 2) args(2).toLong else 20000L
        val pages = WebPages.generate(spark, nPages, 42,
          spark.sparkContext.defaultParallelism * 2)
          .map(p => PageDoc(p.url, 1, p.text, None))
        val chunks = graft.corpus.ChunkerJob.chunk(pages, ChunkerConfig())
        chunks.write.mode("overwrite").parquet(s"${paths.root}/chunks")
        import spark.implicits._
        val persisted = spark.read.parquet(s"${paths.root}/chunks")
          .as[graft.corpus.ChunkRow]
        IndexBuilder.postings(persisted.limit(500)).count() // warm
        val t0 = System.nanoTime()
        val np = IndexBuilder.postings(persisted).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[graft] postbench: $np postings in $secs%.1fs")
      case "stats" =>
        println(TableIO.readManifest(paths.manifest).getOrElse(Map.empty)
          .toSeq.sortBy(_._1).map { case (k, v) => s"  $k = $v" }.mkString("\n"))
        spark.read.parquet(paths.metrics).show(50, truncate = false)
      case other => sys.error(s"unknown command $other")
    }
    spark.stop()
  }
}
