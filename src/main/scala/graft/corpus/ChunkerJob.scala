package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.IndexBuilder

/** An extracted page of a source document — the chunker's input unit
  * (web pages have a single page; multi-page sources keep their index).
  */
case class PageDoc(url: String, page: Int, text: String, title: Option[String])

case class ChunkerConfig(
    pageSplit: String = "sliding",
    windowChars: Int = 600,
    overlapChars: Int = 80,
    qualityCheck: Boolean = true,
    minReadableRatio: Double = 0.5,
    langFilter: Option[String] = None,
    titlePrefix: Boolean = false)

/** Distributed corpus build (SURVEY §2.2/§2.3 build_corpus semantics):
  * clean -> quality gate -> chunk (narrow flatMap) -> keep-first dedup.
  *
  * Dedup is the only shuffle: groupBy(md5(normalized text)) keeping the
  * minimum (url, page, chunkIdx) — the deterministic global order standing
  * in for the reference's list order ("keep first occurrence",
  * io_pdf.py:1219-1242).
  */
object ChunkerJob {

  def fromWebPages(pages: Dataset[WebPage], cfg: ChunkerConfig): Dataset[PageDoc] = {
    import pages.sparkSession.implicits._
    val filtered = cfg.langFilter match {
      case Some(l) => pages.filter(col("lang") === l)
      case None    => pages
    }
    filtered.map(p => PageDoc(p.url, 1, p.text, None))
  }

  def chunk(pages: Dataset[PageDoc], cfg: ChunkerConfig = ChunkerConfig()): Dataset[ChunkRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val pieces = pages.mapPartitions { it =>
      it.flatMap { p =>
        val cleaned = Analyzer.cleanText(p.text)
        if (cfg.qualityCheck && !Analyzer.isTextQualityGood(cleaned, cfg.minReadableRatio))
          Iterator.empty
        else {
          val title = if (cfg.titlePrefix) p.title.getOrElse("") else ""
          Analyzer.chunkText(cleaned, title, cfg.pageSplit, cfg.windowChars, cfg.overlapChars)
            .iterator.zipWithIndex.map { case (piece, idx) =>
              ChunkRow(
                chunkId = IndexBuilder.stableId(s"${p.url}|${p.page}|$idx"),
                docId = IndexBuilder.stableId(p.url),
                source = p.url,
                page = p.page,
                chunkIdx = idx,
                text = piece,
                meta = ChunkMeta(title = p.title))
            }
        }
      }
    }
    dedup(pieces)
  }

  /** Keep-first dedup by md5 of normalized text; first = minimal
    * (source, page, chunkIdx) in the deterministic global order.
    *
    * Fully native (codegen + map-side partial aggregation): the min_by
    * combiner collapses duplicates within each input partition before the
    * shuffle, so shuffle volume is one row per distinct hash per partition —
    * the scalable shape at 10^12 rows. `(?U)\W` matches the analyzer's
    * Unicode-aware normalization (io_pdf.py:1230).
    */
  def dedup(chunks: Dataset[ChunkRow]): Dataset[ChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, md5, regexp_replace, lower}
    val cols = chunks.toDF().columns
    chunks.toDF()
      .withColumn("__norm", regexp_replace(lower(col("text")), "(?U)\\W+", ""))
      .filter(col("__norm") =!= "")
      .withColumn("__h", md5(col("__norm")))
      .groupBy("__h")
      .agg(expr(s"min_by(struct(${cols.mkString(", ")}), " +
        "struct(source, page, chunkIdx)) AS __row"))
      .select(cols.map(c => col(s"__row.$c")): _*)
      .as[ChunkRow]
  }
}
