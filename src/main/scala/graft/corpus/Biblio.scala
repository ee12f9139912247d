package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bibliography enrichment (reference io_biblio.py:40-89 + io_pdf.py:508-606):
  * a broadcast-equi dimension join by lowercase basename with DOI fallback,
  * fill-missing-fields-only semantics, plus the fallback citekey generator
  * with deterministic collision suffixing.
  */
object Biblio {

  /** io_pdf.py:558-566 _generate_fallback_citekey. */
  def fallbackCitekey(filename: String): String = {
    val base = filename.lastIndexOf('.') match {
      case -1 => filename
      case i  => filename.substring(0, i)
    }
    val firstChunk = base.split("[ ,_]", 2)(0)
    firstChunk.take(15).toLowerCase(java.util.Locale.ROOT)
  }

  /** io_pdf.py:569-606 _ensure_citekeys_for_corpus, expressed over the
    * per-source view: `sourcesInOrder` lists distinct sources in corpus
    * first-appearance order with any pre-existing citekey. Returns the full
    * source -> citekey map. Collision suffixes: -a..-z then -z1, -z2...
    */
  def assignCitekeys(sourcesInOrder: Seq[(String, Option[String])]): Map[String, String] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    sourcesInOrder.foreach { case (_, k) => k.foreach(used += _) }
    val out = Map.newBuilder[String, String]
    for ((source, existing) <- sourcesInOrder) {
      existing match {
        case Some(k) => out += source -> k
        case None =>
          val fileName = source.split('/').last
          val base = fallbackCitekey(fileName)
          var candidate = base
          var suffixIdx = 0
          while (used.contains(candidate)) {
            val suffix = if (suffixIdx < 26) ('a' + suffixIdx).toChar.toString
                         else s"z${suffixIdx - 25}"
            candidate = s"$base-$suffix"
            suffixIdx += 1
          }
          used += candidate
          out += source -> candidate
      }
    }
    out.result()
  }

  /** Normalize a Better-BibTeX-style JSON export into a join-ready dim:
    * (file_key, doi_key, title, authors, year, doi, start_page, end_page,
    * citekey). Reference io_biblio.py:40-89.
    */
  def loadIndex(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("multiLine", true).json(path)
      .select(
        lower(element_at(split(col("pdfFile"), "/"), -1)).as("file_key"),
        lower(col("doi")).as("doi_key"),
        col("title").as("b_title"),
        expr("filter(transform(authors, a -> CASE " +
          "WHEN trim(a.family) <> '' AND a.given IS NOT NULL AND trim(a.given) <> '' " +
          "THEN concat(trim(a.family), ', ', trim(a.given)) " +
          "WHEN trim(a.family) <> '' THEN trim(a.family) ELSE NULL END), " +
          "x -> x IS NOT NULL)").as("b_authors"),
        col("year").cast("int").as("b_year"),
        col("doi").as("b_doi"),
        col("pages.start").cast("int").as("b_start_page"),
        col("pages.end").cast("int").as("b_end_page"),
        col("citekey").as("b_citekey"))
  }

  /** Fill-missing-only enrichment: filename join first, DOI join as
    * fallback when the filename misses (io_pdf.py:524-553). Broadcast hash
    * joins — the dimension is small.
    */
  def enrich(chunks: Dataset[ChunkRow], biblio: DataFrame): Dataset[ChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val byFile = biblio.as("f")
    val byDoi = biblio.filter(col("doi_key").isNotNull).as("d")
    val joined = chunks.toDF().as("c")
      .withColumn("__fk", lower(element_at(split(col("c.source"), "/"), -1)))
      .join(broadcast(byFile), col("__fk") === col("f.file_key"), "left")
      .join(broadcast(byDoi),
        col("f.file_key").isNull && lower(col("c.meta.doi")) === col("d.doi_key"),
        "left")
    def pick(field: String) =
      when(col("f.file_key").isNotNull, col(s"f.$field"))
        .otherwise(col(s"d.$field"))
    joined.select(
      col("c.chunkId"), col("c.docId"), col("c.source"), col("c.page"),
      col("c.chunkIdx"), col("c.text"),
      struct(
        coalesce(col("c.meta.title"), pick("b_title")).as("title"),
        when(size(col("c.meta.authors")) > 0, col("c.meta.authors"))
          .otherwise(coalesce(pick("b_authors"), array())).as("authors"),
        coalesce(col("c.meta.year"), pick("b_year")).as("year"),
        coalesce(col("c.meta.doi"), pick("b_doi")).as("doi"),
        coalesce(col("c.meta.startPage"), pick("b_start_page")).as("startPage"),
        coalesce(col("c.meta.endPage"), pick("b_end_page")).as("endPage"),
        coalesce(col("c.meta.citekey"), pick("b_citekey")).as("citekey"),
        col("c.meta.venue").as("venue"),
        col("c.meta.publisher").as("publisher"),
        col("c.meta.oaUrl").as("oaUrl")).as("meta"))
      .as[ChunkRow]
  }

  /** TTL freshness split for the DOI-metadata dimension (reference
    * index.py:203-267: cache entries with `updated_at` older than
    * `doi_cache_ttl_days` are stale and must be re-fetched). The engine
    * consumes the fresh half for enrichment; the stale half is the work
    * list for the external enrichment job (out-of-engine I/O per SURVEY
    * §2.12). `asOf` is supplied, never wall clock — determinism.
    */
  def splitByFreshness(dim: DataFrame, asOf: java.sql.Timestamp,
                       ttlDays: Int): (DataFrame, DataFrame) = {
    val cutoff = new java.sql.Timestamp(asOf.getTime - ttlDays * 86400000L)
    val fresh = dim.filter(col("updated_at").isNotNull &&
      col("updated_at") >= lit(cutoff))
    val stale = dim.filter(col("updated_at").isNull ||
      col("updated_at") < lit(cutoff))
    (fresh, stale)
  }

  /** Driver-orchestrated citekey fill over a chunk table: distinct sources
    * in deterministic first-appearance order -> broadcast map -> column
    * fill. (Citekeys are a document-collection feature; the distinct-source
    * collect is bounded by collection size, not corpus size.)
    */
  def ensureCitekeys(chunks: Dataset[ChunkRow]): Dataset[ChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val sources = chunks.toDF()
      .groupBy("source")
      .agg(min(struct(col("page"), col("chunkIdx"))).as("ord"),
        max(col("meta.citekey")).as("existing"))
      .orderBy("source")
      .select("source", "existing").as[(String, Option[String])]
      .collect().toSeq
    val keyMap = assignCitekeys(sources)
    val b = spark.sparkContext.broadcast(keyMap)
    chunks.map { c =>
      if (c.meta.citekey.isDefined) c
      else c.copy(meta = c.meta.copy(citekey = b.value.get(c.source)))
    }
  }
}
