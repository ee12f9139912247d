package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Ivf

/** The offline IVF codebook fit (seeded spherical k-means) must be
  * deterministic, must reproduce the COMMITTED `ivf_centroids` fixture the
  * q_ann_ivf oracle reads in both dialects, and the resulting IVF recall
  * must meet the quality floor (>= 0.8, and >= the 1.0 the r4 seed
  * stand-in achieved on this fixture).
  */
class IvfFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixtures = SparkEntryExtra.FixturesBase
  private lazy val cemb = spark.read.parquet(s"$fixtures/dims/clustered_embeddings.parquet")

  private def centroidRows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Seq[Float])] = {
    import spark.implicits._
    df.select("cid", "embedding").as[(Int, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  test("k-means fit is deterministic run-over-run and regenerates the committed fixture") {
    val a = centroidRows(Ivf.fit(spark, cemb, k = 16, iters = 10, seed = 42))
    val b = centroidRows(Ivf.fit(spark, cemb, k = 16, iters = 10, seed = 42))
    assert(a == b, "same input + same seed must fit the identical codebook")
    val committed = centroidRows(
      spark.read.parquet(s"$fixtures/dims/ivf_centroids.parquet"))
    assert(a == committed,
      "fit no longer reproduces the committed ivf_centroids fixture — " +
        "regenerate it via `runMain graft.query.IvfFit` and re-verify q_ann_ivf")
    assert(a.length == 16 && a.forall(_._2.length == 64))
    // unit-norm centroids (spherical k-means invariant)
    for ((cid, e) <- a) {
      val n = math.sqrt(e.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"centroid $cid norm $n")
    }
  }

  test("IvfAnn preselector (cell-pruned serving path) recall@10 >= 0.8, top-1 exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = cemb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val provider = new graft.query.EmbeddingProvider {
      def embed(t: String): Option[Array[Float]] = None
      def embedQuery(q: String): Option[Array[Float]] = Some(vecs(0L).toArray)
    }
    val emb = cemb.select(col("vec_id").as("chunk_id"), col("embedding"))
      .filter(col("chunk_id") =!= 0L)
    val centroids = spark.read.parquet(s"$fixtures/dims/ivf_centroids.parquet")
    val ann = new graft.query.IvfAnn(spark, emb, centroids, provider, nprobe = 2)
    val got = ann.preselect("any", 10)
    assert(got.nonEmpty)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / math.sqrt(na * nb)
    }
    val brute = vecs.iterator.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(e, vecs(0L))) }.toSeq
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val recall = brute.toSet.intersect(got.toSet).size / 10.0
    assert(recall >= 0.8, s"IvfAnn recall@10 $recall < 0.8")
    assert(got.head == brute.head, "top-1 must survive IVF cell pruning")
  }

  test("q_ann_ivf with the fitted codebook keeps recall@5 >= 0.8 vs brute force") {
    import spark.implicits._
    val vecs = cemb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val q = vecs(0L)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / math.sqrt(na * nb)
    }
    val brute = vecs.iterator.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(e, q)) }.toSeq
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    val served = SparkEntry.queries("q_ann_ivf")(spark, "/root/testdata/sf0.001")
      .select("vec_id").as[Long].collect().toSet
    val recall = brute.intersect(served).size / 5.0
    assert(recall >= 0.8, s"recall@5 $recall < 0.8")
    // the r4 seed stand-in scored 1.0 on this fixture; the fitted codebook
    // must not regress below it
    assert(recall >= 1.0 - 1e-9, s"fitted codebook recall $recall < stand-in's 1.0")
  }
}
