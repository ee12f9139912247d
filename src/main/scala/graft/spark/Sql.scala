package graft.spark

import graft.analysis.Analyzer

/** Builders for *native* (codegen-friendly) SQL expressions shared between
  * the Spark queries and their DuckDB oracle SQL. Tokenization here matches
  * Analyzer.tokenize (reference index.py:38-40) for ASCII inputs; the exact
  * analyzer (NFKC etc.) runs through Udfs where parity demands it.
  */
object Sql {

  /** Stop list as a SQL quoted-literal list, sorted for determinism. */
  lazy val stopListSql: String =
    Analyzer.Stop.toSeq.sorted.map(s => s"'$s'").mkString(", ")

  /** Spark-native tokens array for a text column. */
  def tokensSpark(col: String): String =
    s"filter(transform(regexp_extract_all($col, '[A-Za-z0-9]+', 0), t -> lower(t)), " +
      s"t -> NOT array_contains(array($stopListSql), t))"

  /** DuckDB equivalent of [[tokensSpark]]. */
  def tokensDuck(col: String): String =
    s"list_filter(list_transform(regexp_extract_all($col, '[A-Za-z0-9]+'), t -> lower(t)), " +
      s"t -> NOT list_contains([$stopListSql], t))"

  /** 3-token shingle array from a tokens array column (Spark). */
  def shinglesSpark(toks: String): String =
    s"CASE WHEN size($toks) >= 3 THEN transform(sequence(1, size($toks) - 2), " +
      s"i -> concat_ws(' ', slice($toks, i, 3))) ELSE array() END"

  /** DuckDB equivalent of [[shinglesSpark]]. */
  def shinglesDuck(toks: String): String =
    s"CASE WHEN len($toks) >= 3 THEN list_transform(range(1, len($toks) - 1), " +
      s"i -> array_to_string(list_slice($toks, i, i + 2), ' ')) ELSE [] END"

  /** 32-bit integer shingle hashes: md5's 8-hex-char prefix as an int —
    * ONE digest per shingle; the minhash permutations on top are pure
    * arithmetic (see graft.ops.Minhash).
    */
  def shingleHashSpark(sh: String): String =
    s"transform($sh, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT))"
  def shingleHashDuck(sh: String): String =
    s"list_transform($sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)"

  /** Dedup-normalized text (reference io_pdf.py:1230, ASCII form). */
  def dedupNormSpark(col: String): String =
    s"regexp_replace(lower($col), '[^a-z0-9_]', '')"
  def dedupNormDuck(col: String): String =
    s"regexp_replace(lower($col), '[^a-z0-9_]', '', 'g')"
}
