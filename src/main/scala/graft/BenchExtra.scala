package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1), SEPARATE from the
  * frozen driver bench: per-query noop-sink timing (§1.4 — computes every
  * column, no count-pruning) and `.explain("formatted")` plan dumps for the
  * plans/r06 evidence files. Never used by the driver; Bench.scala stays
  * the only measured contract.
  *
  *   graft.BenchExtra explain <sfDir> <outDir> [query...]  — plan dumps
  *   graft.BenchExtra noop <sfDir> [query...]              — noop-sink secs
  */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
          else "/tmp"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: explain|noop <sfDir> ...")
    val cmd = args(0)
    val sfDir = args(1)
    val spark = session()
    cmd match {
      case "explain" =>
        val outDir = args(2)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val names = if (args.length > 3) args.drop(3).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        for (n <- names) {
          val df = SparkEntry.queries(n)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$n.txt"), plan)
          println(s"[explain] wrote $outDir/$n.txt")
        }
      case "noop" =>
        val names = if (args.length > 2) args.drop(2).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        for (n <- names) {
          val fn = SparkEntry.queries(n)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
          SparkEntryExtra.clearSearchMemo()
          spark.sparkContext.setJobDescription(s"noop:$n")
          val secs = time {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          spark.sparkContext.setJobDescription(null)
          println(f"[noop] $n: $secs%.3fs")
        }
      case "stage" =>
        // ad-hoc stage isolation probes for the heavy catalog queries
        import graft.spark.Sql
        spark.read.parquet(s"$sfDir/documents.parquet")
          .createOrReplaceTempView("documents")
        def t(label: String)(f: => Unit): Unit = {
          f // warm (JIT + codegen cache)
          println(f"[stage] $label: ${time(f)}%.3fs")
        }
        t("lsh.hs-checkpoint") {
          spark.sql(
            s"""WITH toks AS (SELECT doc_id, ${Sql.tokensSpark("text")} AS tk FROM documents
                              WHERE size(${Sql.tokensSpark("text")}) >= 3)
                SELECT doc_id, ${Sql.shingleHashSpark(Sql.shinglesSpark("tk"))} AS hs FROM toks""")
            .localCheckpoint(true)
            .createOrReplaceTempView("probe_hs")
        }
        t("lsh.hs-recount") { spark.table("probe_hs").count() }
        t("lsh.toks-only") {
          spark.sql(s"SELECT doc_id, ${Sql.tokensSpark("text")} AS tk FROM documents")
            .write.format("noop").mode("overwrite").save()
        }
        t("lsh.hs-nofilter") {
          spark.sql(
            s"""WITH toks AS (SELECT doc_id, ${Sql.tokensSpark("text")} AS tk FROM documents)
                SELECT doc_id, ${Sql.shingleHashSpark(Sql.shinglesSpark("tk"))} AS hs
                FROM toks WHERE size(tk) >= 3""")
            .write.format("noop").mode("overwrite").save()
        }
        SparkEntry.registerMinhashUdfs(spark)
        t("lsh.bands-checkpoint") {
          spark.sql(
            """SELECT doc_id, explode(graft_minhash_bands(hs)) AS band
               FROM probe_hs WHERE size(hs) > 0""")
            .localCheckpoint(true)
            .createOrReplaceTempView("probe_bands")
        }
        t("lsh.pairs-final") {
          spark.sql(
            """WITH ok AS (SELECT band FROM probe_bands GROUP BY band
                           HAVING count(*) BETWEEN 2 AND 50),
                small_bands AS (SELECT b.doc_id, b.band FROM probe_bands b
                                JOIN ok ON b.band = ok.band)
                SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
                FROM small_bands a JOIN small_bands b
                  ON a.band = b.band AND a.doc_id < b.doc_id""").count()
        }
        t("jacc.shingle-checkpoint") {
          spark.sql(
            s"""WITH toks AS (SELECT doc_id, ${Sql.tokensSpark("text")} AS tk FROM documents)
                SELECT DISTINCT doc_id, shingle
                FROM (SELECT doc_id, explode(${Sql.shinglesSpark("tk")}) AS shingle FROM toks)""")
            .localCheckpoint(true)
            .createOrReplaceTempView("probe_jacc_sh")
        }
        t("jacc.pairs-final") {
          spark.sql(
            """WITH rare AS (SELECT shingle FROM probe_jacc_sh
                             GROUP BY shingle HAVING count(*) <= 1000),
              sizes AS (SELECT doc_id, count(*) AS n FROM probe_jacc_sh GROUP BY doc_id),
              shr AS (SELECT sh.doc_id, sh.shingle, s.n FROM probe_jacc_sh sh
                      JOIN rare ON sh.shingle = rare.shingle
                      JOIN sizes s ON s.doc_id = sh.doc_id),
              inter AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS i
                        FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                             AND greatest(a.n, b.n) <= 5 * least(a.n, b.n)
                        GROUP BY a.doc_id, b.doc_id)
              SELECT x, y, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
              FROM inter JOIN sizes sa ON sa.doc_id = x JOIN sizes sb ON sb.doc_id = y
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
              ORDER BY x, y""").count()
        }
        // components: count rounds + per-round cost
        val edges = spark.sql(
          """WITH ok AS (SELECT band FROM probe_bands GROUP BY band
                         HAVING count(*) BETWEEN 2 AND 50),
              small_bands AS (SELECT b.doc_id, b.band FROM probe_bands b
                              JOIN ok ON b.band = ok.band)
              SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
              FROM small_bands a JOIN small_bands b
                ON a.band = b.band AND a.doc_id < b.doc_id""")
        val vertices = spark.table("documents")
          .select(org.apache.spark.sql.functions.col("doc_id").as("id"))
        t("components.minLabel") {
          graft.ops.Components.minLabel(edges, vertices).count()
        }
      case "staticprobe" =>
        // in-JVM micro-profile of the static-cols UDF components over the
        // bench corpus texts (no Spark in the timed loops)
        val texts = graft.corpus.WebPages
          .generate(spark, 4000, 42, 32)
          .collect().iterator.flatMap { p =>
            val cleaned = graft.analysis.Analyzer.cleanText(p.text)
            graft.analysis.Analyzer.chunkText(cleaned, "", "sliding", 600, 80)
          }.toArray
        println(s"[staticprobe] ${texts.length} chunks")
        def t(label: String)(f: String => Unit): Unit = {
          texts.foreach(f) // warm
          val t0 = System.nanoTime()
          texts.foreach(f)
          println(f"[staticprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
        }
        t("tokenize")(s => graft.analysis.Analyzer.tokenize(s): Unit)
        t("patternBonus")(s => graft.analysis.Scoring.patternBonus(s): Unit)
        t("metadataBonus")(s => graft.analysis.Scoring.metadataBonus(s, None): Unit)
        t("gibberish")(s => graft.analysis.Scoring.gibberishPenalty(s): Unit)
        import java.util.regex.Pattern
        val lineNumbers = Pattern.compile("\\b\\d{3,5}\\b", Pattern.UNICODE_CHARACTER_CLASS)
        val doiGib = Pattern.compile("doi:\\S+|10\\.\\d{4,}/\\S+", Pattern.UNICODE_CHARACTER_CLASS)
        val mixed = Pattern.compile("\\b\\d+[a-zA-Z]+\\d*\\b|\\b[a-zA-Z]+\\d+[a-zA-Z]*\\b",
          Pattern.UNICODE_CHARACTER_CLASS)
        val punct = Pattern.compile("(?U)[^\\w\\s]{2,}")
        def scan(p: Pattern)(s: String): Unit = {
          val m = p.matcher(s)
          while (m.find()) ()
        }
        t("gib.lineNumbers")(scan(lineNumbers))
        t("gib.doiGib")(scan(doiGib))
        t("gib.mixed")(scan(mixed))
        t("gib.punct")(scan(punct))
        t("gib.pySplitWalk") { s =>
          val m = graft.analysis.Analyzer.pySplit(s)
          var i = 0
          while (i < m.length) { i += 1 }
        }
        var nMixAdj = 0
        var nDigit3 = 0
        var nDoi = 0
        texts.foreach { s =>
          var mix = false
          var d3 = false
          var run = 0
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            val d = Character.isDigit(c)
            val l = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
            if (d) { run += 1; if (run >= 3) d3 = true } else run = 0
            if (i > 0) {
              val p = s.charAt(i - 1)
              val pd = Character.isDigit(p)
              val pl = (p >= 'a' && p <= 'z') || (p >= 'A' && p <= 'Z')
              if ((pd && l) || (pl && d)) mix = true
            }
            i += 1
          }
          if (mix) nMixAdj += 1
          if (d3) nDigit3 += 1
          if (s.contains("doi:") || s.contains("10.")) nDoi += 1
        }
        println(s"[staticprobe] prescreen hits of ${texts.length}: " +
          s"mixAdj=$nMixAdj digit3=$nDigit3 doi=$nDoi")
      case "bm25probe" =>
        val qname = if (args.length > 2) args(2) else "q_bm25_topk"
        val fn = SparkEntry.queries(qname)
        fn(spark, sfDir).count() // builds views + warms
        def tq(label: String): Unit = {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.count()
          val t2 = System.nanoTime()
          println(f"[bm25probe] $label: construct ${(t1 - t0) / 1e9}%.3fs " +
            f"execute ${(t2 - t1) / 1e9}%.3fs")
        }
        tq("warm1"); tq("warm2"); tq("warm3")
      case "buildstage" =>
        // attribute the build's stats-agg phase: run its pieces SEQUENTIALLY
        // (the real build overlaps the writes) with per-piece wall times.
        // args: buildstage <nPages>  (sfDir arg slot holds nPages here)
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val nPages = sfDir.toLong
        val root = "/dev/shm/graft-buildstage"
        def rm(p: String): Unit = {
          import java.nio.file._
          val pp = Paths.get(p)
          if (Files.exists(pp))
            Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
              .forEach(f => Files.deleteIfExists(f))
        }
        rm(root)
        val pages = graft.corpus.WebPages
          .generate(spark, nPages, 42, spark.sparkContext.defaultParallelism * 2)
          .map(p => graft.corpus.PageDoc(p.url, 1, p.text, None))
        val cfg = graft.index.BuildConfig(shufflePartitions =
          graft.index.BuildConfig.shufflePartitionsFor(
            spark.sparkContext.defaultParallelism))
        def t(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime()
          f
          println(f"[buildstage] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
        }
        for (rep <- 1 to 2) {
          println(s"[buildstage] --- rep $rep ---")
          val chunks = graft.corpus.ChunkerJob
            .chunk(pages, graft.corpus.ChunkerConfig()).toDF()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          t("chunk+dedup+cache")(chunks.count(): Unit)
          val postings = graft.index.IndexBuilder.postings(
            chunks.as[graft.corpus.ChunkRow])
          t("postings-noop") {
            postings.write.format("noop").mode("overwrite").save()
          }
          t("postings-exchange-sorted-noop") {
            postings
              .withColumn("bucket", pmod(xxhash64(col("term")), lit(cfg.nTermBuckets)).cast("int"))
              .withColumn("shard", pmod(xxhash64(col("chunkId")), lit(8)).cast("int"))
              .repartition(cfg.shufflePartitions, col("bucket"), col("shard"))
              .sortWithinPartitions("bucket", "shard", "term", "chunkId")
              .write.format("noop").mode("overwrite").save()
          }
          t("chunks-write") {
            chunks.withColumn("cbucket",
              pmod(xxhash64(col("chunkId")), lit(8)).cast("int"))
              .repartition(cfg.shufflePartitions, col("chunkId"))
              .write.mode("overwrite").partitionBy("cbucket")
              .parquet(s"$root/chunks")
          }
          t("sigs-write") {
            chunks.select(col("chunkId"),
              graft.index.IndexBuilder.sigCol.as("h"),
              graft.index.IndexBuilder.dedupHashCol.as("dhash"))
              .write.mode("overwrite").parquet(s"$root/sigs")
          }
          chunks.unpersist()
        }
        rm(root)
      case other => sys.error(s"unknown subcommand $other")
    }
    spark.stop()
  }
}
