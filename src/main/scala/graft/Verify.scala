package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Loud (but non-fatal) unknown-corpus check: the 9 fixture oracles
    // select their scale by sum(n_chars) signature, and an unmatched
    // signature reads as a silent empty oracle. A hard failure here would
    // zero ALL queries if the testdata were ever regenerated, so warn
    // unmistakably and continue — only the fixture-backed queries can
    // mismatch, and this banner names the cause.
    // The probe itself must never abort the dump (a missing/empty
    // documents table would NPE on getLong before any query ran, where
    // each catalog query is individually try-wrapped): probe failure is
    // just an unknown signature.
    val sig = scala.util.Try(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0))
    if (!sig.toOption.exists(s => SparkEntryExtra.FixtureSigs.exists(_._2 == s)))
      System.err.println(
        s"""|!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!
            |[verify] UNKNOWN CORPUS SIGNATURE sum(n_chars)=${
              sig.fold(e => s"<unreadable: ${e.getMessage}>", _.toString)
            } for $sfDir
            |[verify] The 9 reference-run fixture oracles will return empty
            |[verify] results and hash-mismatch. Regenerate the fixtures
            |[verify] (tools/make_fixtures.py) or add the signature to
            |[verify] SparkEntryExtra.FixtureSigs.
            |!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!
            |""".stripMargin)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
