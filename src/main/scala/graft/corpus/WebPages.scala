package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic Common-Crawl-style corpus in the input_hint shape
  * (url, warc_ts, html, text, lang). Seeded per row index — generation is
  * embarrassingly parallel and reproducible at any partitioning (no wall
  * clock, no shared RNG state).
  */
object WebPages {

  /** Topic head words — every frozen bench query draws from these; they are
    * interleaved into the Zipf rank order below so queries span floored-idf
    * head terms through selective mid-tail terms.
    */
  val Vocab: Array[String] = (
    "retrieval index spark shuffle partition engine ranking corpus token " +
    "stopword analyzer document query search score fusion window sentence " +
    "neural network training gradient transformer attention embedding vector " +
    "crawl web page html parser extract nobel prize physics quantum theory " +
    "climate model ocean temperature satellite measurement experiment " +
    "latency throughput executor broadcast salting skew checkpoint lineage " +
    "compression posting block wand scoring bonus proximity pattern " +
    "machine learning algorithms optimization descent mechanisms build networks").split(" ")

  /** Total vocabulary: topic words at Zipf ranks 8, 11, 14, … (df from ~90%
    * down to ~5% of docs), synthetic `termN` filler elsewhere. Real web text
    * is Zipfian — a uniform tiny vocabulary floors every idf and collapses
    * the score distribution, which hides exactly the skew/pruning behavior
    * a 100 TB index build and WAND top-k must be designed around.
    */
  val VocabSize = 50000
  private val TopicRankStart = 8
  private val TopicRankStep = 3

  def wordAt(rank: Int): String = {
    val t = rank - TopicRankStart
    if (t >= 0 && t % TopicRankStep == 0 && t / TopicRankStep < Vocab.length)
      Vocab(t / TopicRankStep)
    else {
      // letters-only filler (digits would trip the reference's
      // mixed-alphanumeric gibberish heuristic and zero every score)
      val sb = new StringBuilder("zu")
      var r = rank
      while (r > 0) { sb.append(('a' + r % 26).toChar); r /= 26 }
      sb.toString
    }
  }

  private val LnV = math.log(VocabSize.toDouble)

  /** Zipf(s=1) rank in [1, VocabSize]: P(rank <= r) = ln r / ln V. */
  private def zipfRank(u: Double): Int =
    math.min(VocabSize, math.max(1, math.exp(u * LnV).toInt))

  private val Langs = Array("en", "en", "en", "en", "en", "en", "de", "es", "fr", "zh")

  private val BaseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z

  def pageFor(i: Long, seed: Long): WebPage = {
    val rng = new scala.util.Random(seed ^ java.lang.Long.rotateLeft(i * 0x9E3779B97F4A7C15L, 17))
    val n = 50 + rng.nextInt(350)
    val sb = new StringBuilder
    if (rng.nextDouble() < 0.25) sb.append("Abstract ")
    var j = 0
    while (j < n) {
      val w = wordAt(zipfRank(rng.nextDouble()))
      sb.append(w)
      val r = rng.nextDouble()
      if (r < 0.02) sb.append("\u00ad") // soft hyphen inside flow
      if (r >= 0.02 && r < 0.10) sb.append(rng.nextInt(4) match {
        case 0 => ". "
        case 1 => "! "
        case 2 => "? "
        case _ => ", "
      })
      else sb.append(' ')
      // occasional hyphenated line break — exercises de-hyphenation
      if (rng.nextDouble() < 0.01) sb.append("exam-\nple ")
      j += 1
    }
    if (rng.nextDouble() < 0.15) sb.append(" we propose a distributed engine design.")
    if (rng.nextDouble() < 0.08)
      sb.append(" 1480 1481 1482 doi:10.1111/j.1467 10x77 p15q kk21 !!! ???")
    if (rng.nextDouble() < 0.12)
      sb.append(" the quick brown fox jumps over the lazy dog near the river")
    val text = sb.toString
    val url = f"https://example.org/site${i / 10}%05d/page${i % 10}%02d"
    WebPage(url, new Timestamp(BaseEpochMs + i * 1000L),
      s"<html><body>$text</body></html>".getBytes("UTF-8"),
      text, Langs((i % Langs.length).toInt))
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 42,
               partitions: Int = 32): Dataset[WebPage] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => pageFor(i, seed))
  }
}
