package graft.query

/** Sparse TF-IDF vectors + cosine for MMR's numpy-free fallback
  * (reference diversity.py:24-100 `simple_tfidf_vectors` /
  * `cosine_similarity_sparse`). Note: in the reference these are defined
  * but never called — the actual no-numpy MMR path degrades to plain
  * top-k by relevance (diversity.py:189-191), which [[Pipeline]] mirrors
  * via the `mmrEnabled` flag. Implemented here so the full §2.10 surface
  * exists for library users, with golden parity against the executed
  * reference functions.
  */
object TfidfFallback {

  /** Reference tokenize (diversity.py:34-35): `\b\w+\b` on lowercased
    * text; `\w` is unicode word in Python 3, matched with (?U) here.
    */
  def tokenize(text: String): Vector[String] =
    "(?U)\\w+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector

  /** diversity.py:24-79 — returns (doc sparse vectors, query vector).
    * tf = count/len; idf = ln(docCount / max(1, df)) with numpy present
    * (`logIdf = true`, the shape the goldens execute), literal 1.0
    * without.
    */
  def vectors(texts: Seq[String], query: String, logIdf: Boolean = true)
      : (Seq[Map[String, Double]], Map[String, Double]) = {
    val docTokens = (texts :+ query).map(tokenize)
    val corpusTokens = docTokens.dropRight(1)
    val docCount = texts.length
    val vocabulary = docTokens.flatten.toSet
    val df: Map[String, Int] =
      vocabulary.iterator.map(t => t -> corpusTokens.count(_.contains(t))).toMap
    def idf(term: String): Double =
      if (logIdf) math.log(docCount.toDouble / math.max(1, df(term))) else 1.0
    def vec(tokens: Vector[String]): Map[String, Double] = {
      if (tokens.isEmpty) return Map.empty
      val tf = tokens.groupBy(identity).map { case (t, xs) => t -> xs.length }
      tf.map { case (t, n) => t -> (n.toDouble / tokens.length) * idf(t) }
    }
    (corpusTokens.map(vec), vec(docTokens.last))
  }

  /** diversity.py:82-100 — cosine over the common support; norms over the
    * FULL vectors; 0.0 for disjoint support or a zero norm.
    */
  def cosineSparse(v1: Map[String, Double], v2: Map[String, Double]): Double = {
    val common = v1.keySet.intersect(v2.keySet)
    if (common.isEmpty) return 0.0
    val dot = common.iterator.map(t => v1(t) * v2(t)).sum
    val n1 = math.sqrt(v1.valuesIterator.map(v => v * v).sum)
    val n2 = math.sqrt(v2.valuesIterator.map(v => v * v).sum)
    if (n1 == 0 || n2 == 0) 0.0 else dot / (n1 * n2)
  }
}
