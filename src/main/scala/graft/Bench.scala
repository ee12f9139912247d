package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.{ChunkerConfig, PageDoc, WebPages}
import graft.index.{BuildConfig, IndexBuilder, IndexPaths}
import graft.query.{Pipeline, PipelineConfig, SparkBackend, Wand}

/** Benchmark main (driver contract): ONE JSON line on stdout.
  *
  * Measures, per BASELINE.md:
  *  - per-query seconds for every SparkEntry catalog entry (sf dir tables);
  *  - index-build throughput (pages/sec, chunks/sec) on the synthetic
  *    input_hint-shaped corpus;
  *  - query latency p50/p95 over the frozen query set (full fusion
  *    pipeline) and WAND top-k;
  *  - scaling efficiency between local[N] and local[4N] on the identical
  *    workload (sandbox stand-in for N vs 4N executors; target >= 0.8).
  */
object Bench {

  private val FrozenQueries = Seq(
    "machine learning algorithms", "quick brown fox",
    "gradient descent optimization methods for neural networks training",
    "transformer attention mechanisms", "climate ocean temperature",
    "nobel prize physics", "spark shuffle partition",
    "posting block compression", "checkpoint lineage executor",
    "index build throughput")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
  }

  /** Index-build + query workload at a given parallelism; returns metrics.
    * A small throwaway build+query first warms JIT/codegen so the N-core and
    * 4N-core measurements see comparable JVM states.
    */
  private def engineWorkload(cpus: Int, nPages: Long): Map[String, Double] = {
    val spark = session(cpus)
    import spark.implicits._
    try {
      val warmDir = IndexPaths(
        java.nio.file.Files.createTempDirectory(s"graft-warm-$cpus").toString)
      val warmPages = WebPages.generate(spark, 400, seed = 7, partitions = cpus)
        .map(p => PageDoc(p.url, 1, p.text, None))
      IndexBuilder.build(spark,
        graft.corpus.ChunkerJob.chunk(warmPages, ChunkerConfig()), warmDir,
        BuildConfig(shufflePartitions = cpus))
      val warmBackend = new SparkBackend(spark, warmDir)
      FrozenQueries.take(3).foreach(q =>
        Pipeline.searchTopK(warmBackend, q, PipelineConfig()))
      Wand.topK(spark, warmDir, warmBackend.stats, FrozenQueries.head, 10,
        warmBackend.idfFor)

      val pages = WebPages.generate(spark, nPages, seed = 42, partitions = cpus * 2)
        .map(p => PageDoc(p.url, 1, p.text, None))
      // min of two full builds — single-run times swing with JIT/GC phase
      val builds = (1 to 2).map { _ =>
        val paths = IndexPaths(
          java.nio.file.Files.createTempDirectory(s"graft-bench-$cpus").toString)
        val (stats, secs) = time {
          val chunks = graft.corpus.ChunkerJob.chunk(pages, ChunkerConfig())
          IndexBuilder.build(spark, chunks, paths, BuildConfig(shufflePartitions = cpus))
        }
        (paths, stats, secs)
      }
      val (paths, stats, buildSecs) = builds.minBy(_._3)
      val backend = new SparkBackend(spark, paths)
      // warm-up
      Pipeline.searchTopK(backend, FrozenQueries.head, PipelineConfig())
      val latencies = FrozenQueries.map { q =>
        time(Pipeline.searchTopK(backend, q, PipelineConfig()))._2
      }
      val wandLatencies = FrozenQueries.map { q =>
        time(Wand.topK(spark, paths, backend.stats, q, 10, backend.idfFor))._2
      }
      Map(
        "build_secs" -> buildSecs,
        "pages_per_sec" -> nPages / buildSecs,
        "chunks_per_sec" -> stats.nDocs / buildSecs,
        "n_chunks" -> stats.nDocs.toDouble,
        "query_p50" -> pct(latencies, 0.50),
        "query_p95" -> pct(latencies, 0.95),
        "wand_p50" -> pct(wandLatencies, 0.50),
        "wand_p95" -> pct(wandLatencies, 0.95))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong
    val smallCpus = math.max(1, cpus / 4)

    // 1. catalog queries on the sf tables
    val spark1 = session(cpus)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark1, sfDir).count() } catch { case _: Throwable => () } // warm
      val (_, secs) = time {
        try fn(spark1, sfDir).count() catch { case _: Throwable => -1L }
      }
      name -> secs
    }
    spark1.stop()

    // 2. engine workload at 4N, then N, on identical input
    val big = engineWorkload(cpus, nPages)
    val small = engineWorkload(smallCpus, nPages)
    val scaleFactor = cpus.toDouble / smallCpus
    val buildEff = (big("pages_per_sec") / small("pages_per_sec")) / scaleFactor

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum + big("build_secs")
    def m(map: Map[String, Double]): String =
      map.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","bench_pages":$nPages,""" +
      s""""engine_local_$cpus":${m(big)},"engine_local_$smallCpus":${m(small)},""" +
      s""""scaling":{"from_cores":$smallCpus,"to_cores":$cpus,""" +
      s""""build_efficiency":${f"$buildEff%.3f"},""" +
      s""""query_p50_small":${f"${small("query_p50")}%.3f"},"query_p50_big":${f"${big("query_p50")}%.3f"}}}""")
  }
}
