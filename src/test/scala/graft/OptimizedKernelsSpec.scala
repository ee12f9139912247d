package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Round-6 optimization parity: the fused tight-loop kernels that replaced
  * SQL expression chains must be BIT-identical to the expressions they
  * replaced (the DuckDB oracles still mirror the old SQL forms).
  *
  *  - graft_toks_bands (lshPairs) vs the round-5 two-stage SQL path:
  *    shingleHashSpark(shinglesSpark(tk)) -> graft_minhash_bands(hs),
  *    including the <3-token / empty-bands edge cases the old
  *    `size(tk) >= 3` / `size(hs) > 0` filters handled;
  *  - graft_vdot / graft_vnorm / graft_lshbucket (ANN family) vs the
  *    interpreted aggregate/zip_with/transform lambdas.
  */
class OptimizedKernelsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("graft_toks_bands == round-5 shingleHash SQL + minhash bands UDF") {
    import spark.implicits._
    SparkEntry.registerMinhashUdfs(spark)
    val rng = new scala.util.Random(7)
    val vocab = Vector("spark", "hash", "join", "scan", "Merge", "sort",
      "window", "x9", "Zebra17", "q")
    val docs = (0 until 40).map { i =>
      // lengths 0..12 cover the <3-token edge; mixed case exercises the
      // lowercase-before-hash ordering (tokens are pre-lowercased by the
      // tokenizer in production; here we lowercase explicitly)
      (i.toLong, Seq.fill(rng.nextInt(13))(vocab(rng.nextInt(vocab.length)).toLowerCase))
    }
    docs.toDF("doc_id", "tk").createOrReplaceTempView("kern_toks")
    val fused = spark.sql(
      """SELECT doc_id, explode(graft_toks_bands(tk)) AS band
         FROM kern_toks""")
      .as[(Long, String)].collect().sorted.toSeq
    val old = spark.sql(
      s"""WITH hs AS (SELECT doc_id,
              ${graft.spark.Sql.shingleHashSpark(graft.spark.Sql.shinglesSpark("tk"))} AS hs
            FROM kern_toks WHERE size(tk) >= 3)
          SELECT doc_id, explode(graft_minhash_bands(hs)) AS band
          FROM hs WHERE size(hs) > 0""")
      .as[(Long, String)].collect().sorted.toSeq
    assert(fused == old)
    assert(fused.nonEmpty, "test corpus must produce bands")
  }

  test("gibberishPenalty prescreen never skips a matchable pattern") {
    // unconditional mirror of the pre-round-6 implementation
    import java.util.regex.Pattern
    val lineNumbers = Pattern.compile("\\b\\d{3,5}\\b", Pattern.UNICODE_CHARACTER_CLASS)
    val doiGib = Pattern.compile("doi:\\S+|10\\.\\d{4,}/\\S+", Pattern.UNICODE_CHARACTER_CLASS)
    val mixed = Pattern.compile("\\b\\d+[a-zA-Z]+\\d*\\b|\\b[a-zA-Z]+\\d+[a-zA-Z]*\\b",
      Pattern.UNICODE_CHARACTER_CLASS)
    val punct = Pattern.compile("(?U)[^\\w\\s]{2,}")
    val yearLike = Pattern.compile("^[12]\\d{3}$")
    val validShort = Set("p", "pp", "ch", "vol", "no", "ed", "v", "n")
    def reference(text: String, threshold: Double): Double = {
      if (text == null || text.length < 20) return 1.0
      var g = 0L
      def lenSum(p: Pattern): Long = {
        val m = p.matcher(text)
        var s = 0L
        while (m.find()) s += m.end() - m.start()
        s
      }
      g += lenSum(lineNumbers) + lenSum(doiGib)
      val mm = mixed.matcher(text)
      while (mm.find()) {
        val pat = mm.group()
        val skip = pat.length <= 3 && !validShort.contains(pat.toLowerCase(java.util.Locale.ROOT))
        if (!skip && !yearLike.matcher(pat).matches()) g += pat.length
      }
      g += lenSum(punct)
      for (w <- graft.analysis.Analyzer.pySplit(text) if w.length > 2) {
        val d = w.count(_.isDigit)
        if (d.toDouble / w.length > 0.5) g += w.length
      }
      val ratio = if (text.nonEmpty) g.toDouble / text.length else 0.0
      if (ratio <= threshold) 1.0
      else {
        val range = 0.50 - threshold
        math.max(0.0, 1.0 - math.min(ratio - threshold, range) / range)
      }
    }
    val rng = new scala.util.Random(13)
    val frags = Seq("word", "1234", "ab12", "12ab", "doi:10.1/x", "10.5555/j",
      "2021", "p3", "x", "!!", "a1b2c3", "987", "١٢٣", // Arabic digits
      "𝟎𝟏𝟐", // supplementary math digits
      "mixed7text", "plain words here", "§§", "e.g.")
    for (trial <- 0 until 300) {
      val s = Seq.fill(3 + rng.nextInt(12))(frags(rng.nextInt(frags.length)))
        .mkString(" ")
      assert(graft.analysis.Scoring.gibberishPenalty(s, 0.20) == reference(s, 0.20),
        s"trial=$trial text=$s")
    }
  }

  test("graft_vdot/vnorm/lshbucket == round-5 HOF lambda expressions") {
    import spark.implicits._
    SparkEntryExtra.registerVecUdfs(spark)
    val rng = new scala.util.Random(11)
    val vecs = (0 until 25).map(i =>
      (i.toLong, Array.fill(64)((rng.nextGaussian() * 3).toFloat)))
    vecs.toDF("vec_id", "embedding").createOrReplaceTempView("kern_vecs")
    def signCase(i: Int, j: String): String =
      s"(CASE WHEN (($i * 131 + $j) * 2654435761) % 4294967296 >= 2147483648 " +
        "THEN 1.0 ELSE -1.0 END)"
    def bitSpark(i: Int): String =
      s"CASE WHEN aggregate(sequence(0, 63), 0D, (acc, j) -> acc + " +
        s"CAST(element_at(embedding, j + 1) AS DOUBLE) * ${signCase(i, "j")}) >= 0 " +
        s"THEN ${1 << i} ELSE 0 END"
    for (planes <- Seq(8, 16)) {
      val oldBucket = spark.sql(
        s"""SELECT vec_id, (${(0 until planes).map(bitSpark).mkString(" + ")}) AS b
            FROM kern_vecs""").as[(Long, Int)].collect().toMap
      val newBucket = spark.sql(
        s"""SELECT vec_id, graft_lshbucket(embedding, $planes) AS b
            FROM kern_vecs""").as[(Long, Int)].collect().toMap
      assert(newBucket == oldBucket, s"planes=$planes")
    }
    val q = vecs.head._2
    spark.createDataset(Seq(Tuple1(q))).toDF("qe").createOrReplaceTempView("kern_q")
    val oldDot = spark.sql(
      """SELECT v.vec_id,
           aggregate(zip_with(v.embedding, q.qe,
                     (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                     0D, (acc, v2) -> acc + v2) AS d,
           sqrt(aggregate(transform(v.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     0D, (acc, v2) -> acc + v2)) AS n
         FROM kern_vecs v CROSS JOIN kern_q q""")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val newDot = spark.sql(
      """SELECT v.vec_id, graft_vdot(v.embedding, q.qe) AS d,
                graft_vnorm(v.embedding) AS n
         FROM kern_vecs v CROSS JOIN kern_q q""")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // bit-exact, not approximate: same float-op order is the contract
    assert(newDot == oldDot)
  }
}
