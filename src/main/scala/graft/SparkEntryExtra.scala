package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{DocIndex, Sql}

/** Batch-2 operators: scoring bonuses (SURVEY §2.4), snippet (§2.11), the
  * engine path itself (WAND + full fusion pipeline over a real persisted
  * index), simhash / chunker / quality-gate (analyzer-exact, rows-only),
  * embedding near-dup + LSH-bucketed ANN, and multimodal binary plumbing.
  * Mixed into SparkEntry.queries / oracleSql.
  */
private[graft] object SparkEntryExtra {

  private val QTerms = Seq("spark", "hash", "join", "scan")
  private val QString = QTerms.mkString(" ")
  // bi/tri-grams of tokenize(QString), all >= 5 chars (scoring.py:57-76)
  private val QNgrams = Seq("spark hash", "hash join", "join scan",
    "spark hash join", "hash join scan")
  private val Patterns = graft.analysis.Analyzer.AnswerPatterns

  // ---------------- LSH signature SQL (16 random hyperplanes) -----------
  // s(i,j) = +1 iff ((i*131 + j) * 2654435761) mod 2^32 >= 2^31 — pure
  // integer arithmetic, identical in Spark and DuckDB.
  private def signCase(i: Int, j: String): String =
    s"(CASE WHEN (($i * 131 + $j) * 2654435761) % 4294967296 >= 2147483648 " +
      "THEN 1.0 ELSE -1.0 END)"

  private def bitSpark(i: Int): String =
    s"CASE WHEN aggregate(sequence(0, 63), 0D, (acc, j) -> acc + " +
      s"CAST(element_at(embedding, j + 1) AS DOUBLE) * ${signCase(i, "j")}) >= 0 " +
      s"THEN ${1 << i} ELSE 0 END"

  private def bitDuck(i: Int): String =
    s"CASE WHEN list_sum(list_transform(range(0, 64), j -> " +
      s"CAST(embedding[j + 1] AS DOUBLE) * ${signCase(i, "j")})) >= 0 " +
      s"THEN ${1 << i} ELSE 0 END"

  private def bucketSpark = (0 until 16).map(bitSpark).mkString(" + ")
  private def bucketDuck = (0 until 16).map(bitDuck).mkString(" + ")

  private def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v)"
  private def normSpark(a: String): String =
    s"sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v))"
  private def dotDuck(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normDuck(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  private def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach { n =>
      spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }

  private def sqlQuery(tables: Seq[String], sparkSql: String)
                      (spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, tables: _*)
    spark.sql(sparkSql)
  }

  def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- scoring bonuses (§2.4), SQL-native ---
    "q_pattern_bonus" -> sqlQuery(Seq("documents"),
      s"""SELECT doc_id, round(CAST(0.05 AS DOUBLE) * (${Patterns.map(p =>
             s"CAST(contains(lower(text), '$p') AS INT)").mkString(" + ")}), 4)
             AS pattern_bonus
          FROM documents ORDER BY doc_id""") _,

    "q_metadata_bonus" -> sqlQuery(Seq("documents"),
      s"""SELECT doc_id, round(
            (CASE WHEN startswith(tl, 'abstract') OR contains(substr(tl, 1, 50), 'abstract')
                  THEN CAST(0.15 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) +
            (CASE WHEN contains(substr(tl, 1, 60), 'result')
                    OR contains(substr(tl, 1, 60), 'conclusion')
                    OR contains(substr(tl, 1, 60), 'summary')
                    OR contains(substr(tl, 1, 60), 'discussion')
                  THEN CAST(0.1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4) AS metadata_bonus
          FROM (SELECT doc_id, trim(lower(text)) AS tl FROM documents)
          ORDER BY doc_id""") _,

    "q_ngram_bonus" -> sqlQuery(Seq("documents"),
      s"""SELECT doc_id, round(CAST(least(${QNgrams.map(n =>
             s"CAST(contains(t, '$n') AS INT)").mkString(" + ")}, 6) AS DOUBLE) / 6, 4)
             AS ngram_bonus
          FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t
                FROM documents)
          ORDER BY doc_id""") _,

    "q_proximity_bonus" -> sqlQuery(Seq("documents"),
      s"""WITH pos AS (
            SELECT doc_id, pos AS i, tok
            FROM (SELECT doc_id, filter(split(lower(text), '\\\\s+'), x -> x <> '') AS tk
                  FROM documents)
            LATERAL VIEW posexplode(tk) pe AS pos, tok
            WHERE tok IN (${QTerms.map(t => s"'$t'").mkString(",")})),
          pairs AS (
            SELECT a.doc_id, min(abs(a.i - b.i)) AS mind
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND a.tok < b.tok AND abs(a.i - b.i) <= 24
            GROUP BY a.doc_id)
          SELECT d.doc_id,
            round(CASE WHEN p.mind IS NULL THEN CAST(0 AS DOUBLE)
                       ELSE 1 - CAST(p.mind AS DOUBLE) / 24 END, 4) AS proximity_bonus
          FROM documents d LEFT JOIN pairs p ON d.doc_id = p.doc_id
          ORDER BY d.doc_id""") _,

    // --- snippet window (§2.11, models.py:81-87 with maxlen 120) ---
    "q_snippet" -> sqlQuery(Seq("documents"),
      s"""SELECT doc_id,
            CASE WHEN length(t) > 120 THEN concat(substr(t, 1, 117), '...') ELSE t END AS snippet
          FROM (SELECT doc_id, replace(trim(text), chr(10), ' ') AS t FROM documents)
          ORDER BY doc_id""") _,

    // --- the engine path: WAND over a real persisted index ---
    "q_wand_topk" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val (paths, backend) = DocIndex.backendFor(spark, dir)
      val top = graft.query.Wand.topK(spark, paths, backend.stats, QString, 20,
        backend.idfFor)
      top.toDF("doc_id", "score")
        .withColumn("score", round(col("score"), 4))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // --- full fusion pipeline over the index (rows-only; exact semantics
    //     proven by the parity suite against the reference) ---
    "q_search_topk" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val (_, backend) = DocIndex.backendFor(spark, dir)
      val out = graft.query.Pipeline.searchTopK(backend, QString,
        graft.query.PipelineConfig())
      out.results.zipWithIndex.map { case (r, i) =>
        (i + 1, r.source.file, r.score.getOrElse(0.0), r.text.take(80))
      }.toDF("rank", "source", "score", "snippet")
    }),

    // --- simhash fingerprints + hamming near-dup pairs (rows-only) ---
    "q_simhash" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val sim = udf((text: String) =>
        f"${graft.ops.TextOps.simhashOfText(text)}%016x")
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), sim(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // --- analyzer-exact chunker + quality gate (rows-only: reference
    //     regexes use backrefs DuckDB's RE2 lacks) ---
    "q_chunker" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)]
      docs.flatMap { case (id, text) =>
        val clean = graft.analysis.Analyzer.cleanText(text)
        graft.analysis.Analyzer.chunkText(clean, "", "sliding", 300, 50)
          .zipWithIndex.map { case (c, i) => (id, i, c.length, c.take(60)) }
      }.toDF("doc_id", "chunk_idx", "chunk_len", "chunk_head")
        .orderBy("doc_id", "chunk_idx")
    }),

    "q_quality_gate" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val good = udf((text: String) =>
        graft.analysis.Analyzer.isTextQualityGood(text, 0.5))
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), good(col("text")).as("quality_ok"))
        .orderBy("doc_id")
    }),

    // --- embedding near-duplicates (cosine >= 0.45, capped id range) ---
    "q_embed_neardup" -> sqlQuery(Seq("embeddings"),
      s"""WITH e AS (SELECT vec_id, embedding,
                 ${normSpark("embedding")} AS nrm
               FROM embeddings WHERE vec_id < 1000),
          p AS (SELECT a.vec_id AS x, b.vec_id AS y,
                 ${dotSpark("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
                FROM e a JOIN e b ON a.vec_id < b.vec_id)
          SELECT x, y, round(cos, 4) AS cos FROM p WHERE cos >= 0.45
          ORDER BY x, y""") _,

    // --- LSH-bucketed ANN (the 10^12-scale path next to brute force) ---
    "q_ann_lsh" -> sqlQuery(Seq("embeddings"),
      s"""WITH sig AS (SELECT vec_id, embedding, ($bucketSpark) AS bucket
               FROM embeddings),
          q AS (SELECT bucket, embedding AS qe FROM sig WHERE vec_id = 0),
          cand AS (SELECT s.vec_id,
                 ${dotSpark("s.embedding", "q.qe")} /
                   (${normSpark("s.embedding")} * ${normSpark("q.qe")}) AS cos
               FROM sig s CROSS JOIN q WHERE s.bucket = q.bucket AND s.vec_id <> 0)
          SELECT vec_id, round(cos, 4) AS cos FROM cand
          ORDER BY cos DESC, vec_id LIMIT 5""") _,

    // --- multimodal binary-column plumbing (decode stubbed; see
    //     graft.ops.Multimodal) ---
    "q_multimodal_stub" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      graft.ops.Multimodal.extractFeatures(rows, "image").toDF()
        .select("id", "kind", "n_bytes", "sha", "width", "height", "sample_hex")
        .orderBy("id")
    })
  )

  def extraOracles: Map[String, String] = Map(
    "q_pattern_bonus" ->
      s"""SELECT doc_id, round(CAST(0.05 AS DOUBLE) * (${Patterns.map(p =>
             s"CAST(contains(lower(text), '$p') AS INT)").mkString(" + ")}), 4)
             AS pattern_bonus
          FROM documents ORDER BY doc_id""",

    "q_metadata_bonus" ->
      s"""SELECT doc_id, round(
            (CASE WHEN starts_with(tl, 'abstract') OR contains(substr(tl, 1, 50), 'abstract')
                  THEN CAST(0.15 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) +
            (CASE WHEN contains(substr(tl, 1, 60), 'result')
                    OR contains(substr(tl, 1, 60), 'conclusion')
                    OR contains(substr(tl, 1, 60), 'summary')
                    OR contains(substr(tl, 1, 60), 'discussion')
                  THEN CAST(0.1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4) AS metadata_bonus
          FROM (SELECT doc_id, trim(lower(text)) AS tl FROM documents)
          ORDER BY doc_id""",

    "q_ngram_bonus" ->
      s"""SELECT doc_id, round(least(${QNgrams.map(n =>
             s"CAST(contains(t, '$n') AS INT)").mkString(" + ")}, 6) / 6.0, 4)
             AS ngram_bonus
          FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents)
          ORDER BY doc_id""",

    "q_proximity_bonus" ->
      s"""WITH toks AS (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
             FROM documents),
          pos0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
                     i -> struct_pack(i := i, tok := tk[i]))) AS u
                   FROM toks),
          pos AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM pos0
                  WHERE u.tok IN (${QTerms.map(t => s"'$t'").mkString(",")})),
          pairs AS (
            SELECT a.doc_id, min(abs(a.i - b.i)) AS mind
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND a.tok < b.tok AND abs(a.i - b.i) <= 24
            GROUP BY a.doc_id)
          SELECT d.doc_id,
            round(CASE WHEN p.mind IS NULL THEN CAST(0 AS DOUBLE)
                       ELSE 1 - CAST(p.mind AS DOUBLE) / 24 END, 4) AS proximity_bonus
          FROM documents d LEFT JOIN pairs p ON d.doc_id = p.doc_id
          ORDER BY d.doc_id""",

    "q_snippet" ->
      s"""SELECT doc_id,
            CASE WHEN length(t) > 120 THEN concat(substr(t, 1, 117), '...') ELSE t END AS snippet
          FROM (SELECT doc_id, replace(trim(text), chr(10), ' ') AS t FROM documents)
          ORDER BY doc_id""",

    // WAND == SQL BM25: strongest cross-engine check of the index path
    "q_wand_topk" ->
      s"""${SparkEntry.bm25OracleScoreSql},
          top AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT 20)
          SELECT doc_id, round(score, 4) AS score FROM top
          ORDER BY round(score, 4) DESC, doc_id""",

    "q_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normDuck("embedding")} AS nrm
               FROM embeddings WHERE vec_id < 1000),
          p AS (SELECT a.vec_id AS x, b.vec_id AS y,
                 ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
                FROM e a JOIN e b ON a.vec_id < b.vec_id)
          SELECT x, y, round(cos, 4) AS cos FROM p WHERE cos >= 0.45
          ORDER BY x, y""",

    "q_ann_lsh" ->
      s"""WITH sig AS (SELECT vec_id, embedding, ($bucketDuck) AS bucket
               FROM embeddings),
          q AS (SELECT bucket, embedding AS qe FROM sig WHERE vec_id = 0),
          cand AS (SELECT s.vec_id,
                 ${dotDuck("s.embedding", "q.qe")} /
                   (${normDuck("s.embedding")} * ${normDuck("q.qe")}) AS cos
               FROM sig s CROSS JOIN q WHERE s.bucket = q.bucket AND s.vec_id <> 0)
          SELECT vec_id, round(cos, 4) AS cos FROM cand
          ORDER BY cos DESC, vec_id LIMIT 5""",

    "q_multimodal_stub" ->
      s"""SELECT doc_id AS id, 'image' AS kind,
            octet_length(b) AS n_bytes, sha256(text) AS sha,
            CAST((octet_length(b) % 640) + 16 AS INT) AS width,
            CAST((octet_length(b) * 31 % 480) + 16 AS INT) AS height,
            lower(substr(hex(b), 1, 16)) AS sample_hex
          FROM (SELECT doc_id, text, encode(text) AS b FROM documents)
          ORDER BY id"""
  )
}
