package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN preselect implementations over an embeddings table
  * (chunk_id: long, embedding: array<float>) — the engine-side analog of
  * the reference's FAISS corpus index (semantic_index.py:93-153).
  *
  * [[BruteForceAnn]] is the exact-cosine baseline (full scan, fine to a
  * few million vectors per executor-parallel scan); [[SparkAnnLsh]] is the
  * 10^12-scale path: signed-random-projection buckets computed once at
  * "index build" (a narrow map, cached), query-time candidates limited to
  * the query's bucket plus Hamming-1 probe buckets (multi-probe recovers
  * the recall a single bucket loses), exact cosine only on candidates.
  */
object Ann {
  /** Deterministic signed hyperplane component for (plane i, dim j) —
    * shared with the q_ann_lsh SQL scheme in SparkEntryExtra.
    */
  def sign(i: Int, j: Int): Double =
    if (((i.toLong * 131 + j) * 2654435761L) % 4294967296L >= 2147483648L) 1.0 else -1.0

  def bucketOf(emb: Seq[Float], nPlanes: Int): Int = {
    var b = 0
    var i = 0
    while (i < nPlanes) {
      var dot = 0.0
      var j = 0
      while (j < emb.length) { dot += emb(j) * sign(i, j); j += 1 }
      if (dot >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  def cosine(a: Seq[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Nearest-cell assignment against a (cid-sorted) codebook — ONE
    * definition shared by the serving-time pass and the persisted-cells
    * refresh so the two can never drift (ties break to the lowest cid).
    */
  def assignCell(cents: Array[(Int, Array[Float])], e: Seq[Float]): Int = {
    var best = 0; var bestSim = Double.NegativeInfinity
    for ((cid, ce) <- cents) {
      val s = cosine(e, ce)
      if (s > bestSim) { bestSim = s; best = cid }
    }
    best
  }
}

final class BruteForceAnn(spark: SparkSession, embeddings: DataFrame,
                          provider: EmbeddingProvider) extends AnnPreselector {
  import spark.implicits._
  private val cached = embeddings.select("chunk_id", "embedding")
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  override def preselect(query: String, topn: Int): Seq[Long] =
    provider.embedQuery(query) match {
      case None => Nil
      case Some(qe) =>
        val qv = qe // local capture: the udf closure must not drag `this` in
        val cos = udf((e: Seq[Float]) => Ann.cosine(e, qv))
        cached.withColumn("cos", cos(col("embedding")))
          .orderBy(desc("cos"), asc("chunk_id"))
          .limit(topn)
          .select("chunk_id").as[Long].collect().toSeq
    }
}

/** IVF-flat preselector — the third member of the preselect family
  * (brute / LSH / IVF): an offline-fitted codebook ([[graft.query.Ivf]],
  * or any (cid, embedding) frame), every vector assigned ONCE to its
  * nearest cell, query-time candidates limited to the query's `nprobe`
  * nearest cells, exact cosine only there. The codebook is
  * broadcast-sized (k × dim).
  *
  * `preAssigned` (a (chunk_id, embedding, cell) frame) skips the
  * serving-time assignment pass entirely — at 10^12 vectors that is the
  * PERSISTED cells side table ([[graft.index.EmbeddingTable.refreshCells]]),
  * maintained change-proportionally at index-update time, so constructing
  * a preselector never scans the corpus.
  */
final class IvfAnn(spark: SparkSession, embeddings: DataFrame,
                   centroids: DataFrame, provider: EmbeddingProvider,
                   nprobe: Int = 2,
                   preAssigned: Option[DataFrame] = None) extends AnnPreselector {
  import spark.implicits._
  private val cents: Array[(Int, Array[Float])] = centroids
    .select("cid", "embedding").as[(Int, Seq[Float])].collect()
    .map { case (cid, e) => (cid, e.toArray) }
    .sortBy(_._1)

  // Fallback path: one narrow assignment pass, cached; cell-pruned
  // thereafter. The udf captures the LOCAL codebook array — capturing
  // `this` would drag the (non-serializable) SparkSession into the task
  // closure. A preAssigned frame is NOT persisted: it is a cell-partitioned
  // parquet scan, and persisting it would materialize the whole corpus
  // where the per-query cell filter otherwise prunes to nprobe partitions.
  private val assigned = preAssigned match {
    case Some(pre) => pre.select("chunk_id", "embedding", "cell")
    case None =>
      val cs = cents
      val cellUdf = udf((e: Seq[Float]) => Ann.assignCell(cs, e))
      // the on-disk embedding table keeps null-embedding rows by design —
      // they carry no vector to assign or score
      embeddings.filter(col("embedding").isNotNull)
        .select(col("chunk_id"), col("embedding"))
        .withColumn("cell", cellUdf(col("embedding")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  override def preselect(query: String, topn: Int): Seq[Long] =
    provider.embedQuery(query) match {
      case None => Nil
      case Some(qe) =>
        val probes = cents.map { case (cid, ce) => (cid, Ann.cosine(qe.toSeq, ce)) }
          .sortBy { case (cid, s) => (-s, cid) }.take(nprobe).map(_._1)
        val qv = qe
        val cos = udf((e: Seq[Float]) => Ann.cosine(e, qv))
        assigned.filter(col("cell").isin(probes: _*))
          .withColumn("cos", cos(col("embedding")))
          .orderBy(desc("cos"), asc("chunk_id"))
          .limit(topn)
          .select("chunk_id").as[Long].collect().toSeq
    }
}

final class SparkAnnLsh(spark: SparkSession, embeddings: DataFrame,
                        provider: EmbeddingProvider,
                        nPlanes: Int = 16, probes: Int = 16) extends AnnPreselector {
  import spark.implicits._
  // signature table: one narrow pass at construction, cached — at scale
  // this is a persisted column of the embeddings table
  private val sigs = {
    val np = nPlanes // local capture for the udf closure
    val bucketUdf = udf((e: Seq[Float]) => Ann.bucketOf(e, np))
    embeddings.select("chunk_id", "embedding")
      .withColumn("bucket", bucketUdf(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  override def preselect(query: String, topn: Int): Seq[Long] =
    provider.embedQuery(query) match {
      case None => Nil
      case Some(qe) =>
        val qb = Ann.bucketOf(qe.toSeq, nPlanes)
        // multi-probe: query bucket, then Hamming-1, then Hamming-2
        // neighbors until the probe budget is spent
        val h1 = (0 until nPlanes).map(i => qb ^ (1 << i))
        val h2 = for (i <- 0 until nPlanes; j <- (i + 1) until nPlanes)
          yield qb ^ (1 << i) ^ (1 << j)
        val buckets = (qb +: (h1 ++ h2)).take(1 + probes)
        val qv = qe
        val cos = udf((e: Seq[Float]) => Ann.cosine(e, qv))
        sigs.filter(col("bucket").isin(buckets: _*))
          .withColumn("cos", cos(col("embedding")))
          .orderBy(desc("cos"), asc("chunk_id"))
          .limit(topn)
          .select("chunk_id").as[Long].collect().toSeq
    }
}
