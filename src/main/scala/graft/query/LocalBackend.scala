package graft.query

import graft.analysis.{Analyzer, Scoring}
import graft.corpus.ChunkRow

/** In-memory SearchBackend: the sequential oracle path. Mirrors the
  * reference's dense execution (main.py:133-174) exactly; used by the
  * parity suite and as a cross-check for the distributed engine.
  *
  * Chunks must be in canonical corpus order (the reference's list order);
  * ties in every sort resolve to that order via stable sorting.
  */
final class LocalBackend(val chunks: IndexedSeq[ChunkRow],
                         k1: Double = 1.4, b: Double = 0.75) extends SearchBackend {

  val tokenized: IndexedSeq[Array[String]] = chunks.map(c => Analyzer.tokenize(c.text))
  val stats: Bm25Stats = Bm25.buildLocal(tokenized, k1, b)
  private val tfs = tokenized.map(Bm25.termFreqs)
  private val byId: Map[Long, Int] = chunks.zipWithIndex.map { case (c, i) => c.chunkId -> i }.toMap

  def denseScores(queryTokens: Seq[String]): Array[Double] =
    Array.tabulate(chunks.length)(i =>
      stats.score(queryTokens, tfs(i), tokenized(i).length.toLong))

  /** Dense bonused scores — reference main.py:133-167. */
  def bonusedScores(query: String, bm25Query: String, cfg: PipelineConfig): Array[Double] = {
    val qTokens = Analyzer.tokenize(query).toIndexedSeq
    val bmTokens = if (bm25Query == query) qTokens else Analyzer.tokenize(bm25Query).toIndexedSeq
    val base = denseScores(bmTokens)
    Array.tabulate(chunks.length) { i =>
      Scoring.applyBonuses(base(i), chunks(i).text, query, qTokens,
        chunks(i).meta.title, cfg.proxWindow, cfg.proxLambda, cfg.ngramLambda)
    }
  }

  override def topPool(query: String, bm25Query: String, poolSize: Int,
                       cfg: PipelineConfig): IndexedSeq[(ChunkRow, Double)] = {
    val scores = bonusedScores(query, bm25Query, cfg)
    chunks.indices.sortBy(i => -scores(i)).take(poolSize)
      .map(i => (chunks(i), scores(i))).toIndexedSeq
  }

  override def bm25ScoresFor(queryTokens: Seq[String], sub: Seq[ChunkRow]): Map[Long, Double] =
    sub.map { c =>
      val i = byId(c.chunkId)
      c.chunkId -> stats.score(queryTokens, tfs(i), tokenized(i).length.toLong)
    }.toMap

  override def topDocsForRm3(queryTokens: Seq[String], fbDocs: Int): Seq[String] = {
    val scores = denseScores(queryTokens)
    chunks.indices.sortBy(i => -scores(i)).take(fbDocs).map(i => chunks(i).text)
  }

  override def bonusedScoresFor(query: String, bm25Query: String, ids: Seq[Long],
                                cfg: PipelineConfig): IndexedSeq[(ChunkRow, Double)] = {
    val scores = bonusedScores(query, bm25Query, cfg)
    ids.flatMap(id => byId.get(id).map(i => (chunks(i), scores(i)))).toIndexedSeq
  }
}
