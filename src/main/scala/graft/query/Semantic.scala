package graft.query

/** Semantic rerank (reference rerank.py:254-309, Run D of the fusion
  * pipeline — disabled by default, config.py:105). The embedding model
  * itself is external (no model runtime in-engine); the engine consumes an
  * [[EmbeddingProvider]] backed by a precomputed embeddings table (FIXTURES
  * §2) or any caller-supplied encoder.
  */
trait EmbeddingProvider extends Serializable {
  /** L2-normalized embedding for a chunk text (None -> rerank is skipped). */
  def embed(text: String): Option[Array[Float]]
  def embedQuery(query: String): Option[Array[Float]]
}

object Semantic {

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i); i += 1 }
    dot
  }

  /** Combined score 0.7*minmax(bm25) + 0.3*cos — exact port. Returns the
    * input scores unchanged when embeddings are unavailable (reference
    * fallback behavior).
    */
  def semanticRerank(query: String, texts: Seq[String], scores: Seq[Double],
                     provider: EmbeddingProvider,
                     alpha: Double = 0.7, beta: Double = 0.3): Seq[Double] = {
    if (texts.isEmpty) return scores
    val queryEmb = provider.embedQuery(query) match {
      case Some(e) => e
      case None    => return scores
    }
    val embs = texts.map(provider.embed)
    if (embs.exists(_.isEmpty)) return scores
    val similarities = embs.map(e => cosine(e.get, queryEmb))
    val normScores =
      if (scores.length > 1) {
        val minS = scores.min
        val maxS = scores.max
        if (maxS > minS) scores.map(s => (s - minS) / (maxS - minS))
        else Seq.fill(scores.length)(1.0)
      } else Seq.fill(scores.length)(1.0)
    scores.indices.map(i => alpha * normScores(i) + beta * similarities(i))
  }

  /** Run D ordering (fusion.py:159-200 without ANN): rerank the top-topn of
    * the pool by combined score, descending, stable on pool order.
    */
  def semanticRun(query: String, pool: IndexedSeq[(Long, String, Double)],
                  topn: Int, provider: EmbeddingProvider): List[Long] = {
    val candidates = pool.take(math.min(topn, pool.length))
    val reranked = semanticRerank(query, candidates.map(_._2),
      candidates.map(_._3), provider)
    val scoreMap = candidates.map(_._1).zip(reranked).toMap
    candidates.map(_._1)
      .sortBy(id => -scoreMap.getOrElse(id, 0.0)).toList
  }
}
