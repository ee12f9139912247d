package graft.query

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Offline IVF coarse-quantizer fit: seeded spherical k-means over an
  * embeddings table (the build job behind `q_ann_ivf`'s codebook — the
  * engine-side analog of FAISS's IVF training, reference
  * semantic_index.py:93-153 trains its index offline the same way).
  *
  * Scale shape: the k-means++ INIT reads a bounded, deterministic sample
  * (init quality needs only a sketch of the distribution); each Lloyd
  * iteration is one distributed pass — centroids broadcast, nearest-cell
  * assignment and per-partition partial sums in `mapPartitions` (map-side
  * combine: k×dim doubles per task), merged on the driver in a SORTED
  * (cell, partition) order so the float summation order — and therefore
  * the fitted codebook — is reproducible run-over-run on the same input.
  * No wall-clock or unseeded randomness anywhere: the committed centroid
  * fixture is regenerable bit-for-bit (IvfFitSpec).
  */
object Ivf {

  private def cosineSim(c: Array[Double], e: Seq[Float]): Double = {
    var dot = 0.0; var ne = 0.0
    var i = 0
    while (i < e.length) {
      dot += c(i) * e(i); ne += e(i).toDouble * e(i)
      i += 1
    }
    if (ne == 0) 0.0 else dot / math.sqrt(ne) // centroids pre-normalized
  }

  private def nearest(cents: Array[Array[Double]], e: Seq[Float]): Int = {
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val s = cosineSim(cents(c), e)
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0) v else { val s = 1.0 / math.sqrt(n); v.map(_ * s) }
  }

  /** k-means++ seeding over the driver-side sample (D² sampling with a
    * seeded RNG — standard published init, deterministic here).
    */
  private def kppInit(sample: IndexedSeq[Seq[Float]], k: Int, seed: Long)
      : Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    val first = sample(rng.nextInt(sample.length))
    val cents = scala.collection.mutable.ArrayBuffer(
      normalized(first.map(_.toDouble).toArray))
    while (cents.length < k) {
      // distance = 1 - cos to the nearest chosen centroid
      val d2 = sample.map { e =>
        val d = 1.0 - cents.iterator.map(c => cosineSim(c, e)).max
        d * d
      }
      val total = d2.sum
      if (total <= 0) {
        cents += normalized(sample(rng.nextInt(sample.length)).map(_.toDouble).toArray)
      } else {
        var r = rng.nextDouble() * total
        var i = 0
        while (i < d2.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
        cents += normalized(sample(i).map(_.toDouble).toArray)
      }
    }
    cents.toArray
  }

  /** Fit `k` unit-norm centroids; returns a (cid: int, embedding:
    * array<float>) frame ordered by cid. `sampleCap` bounds the init
    * sample (vec_id order — deterministic).
    */
  def fit(spark: SparkSession, embeddings: DataFrame, k: Int,
          iters: Int = 10, seed: Long = 42, sampleCap: Int = 100000): DataFrame = {
    import spark.implicits._
    val embDS = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    val sample = embDS.orderBy("vec_id").limit(sampleCap)
      .map(_._2).collect().toIndexedSeq
    require(sample.nonEmpty, "empty embeddings table")
    var cents = kppInit(sample, k, seed)

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val kk = k
      // one distributed pass: (partitionId, cell, partialSum, count)
      val partials = embDS.mapPartitions { it =>
        val cs = bc.value
        val dim = cs(0).length
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Long](kk)
        it.foreach { case (_, e) =>
          val c = nearest(cs, e)
          val s = sums(c)
          var i = 0
          while (i < dim) { s(i) += e(i); i += 1 }
          counts(c) += 1
        }
        val pid = org.apache.spark.TaskContext.getPartitionId()
        (0 until kk).iterator.filter(counts(_) > 0)
          .map(c => (pid, c, sums(c).toSeq, counts(c)))
      }.collect()
      bc.destroy()
      // sorted merge: float-sum order fixed by (cell, partition), so the
      // fit is reproducible on the same input partitioning
      val next = cents.clone() // empty cells keep their previous centroid
      partials.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (c, rows) =>
        val dim = cents(0).length
        val acc = new Array[Double](dim)
        var n = 0L
        rows.sortBy(_._1).foreach { case (_, _, s, cnt) =>
          var i = 0
          while (i < dim) { acc(i) += s(i); i += 1 }
          n += cnt
        }
        next(c) = normalized(acc.map(_ / n))
      }
      cents = next
    }
    cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }.toSeq
      .toDF("cid", "embedding")
      .orderBy("cid")
  }
}

/** CLI for the offline codebook build:
  * `runMain graft.query.IvfFit <embeddings.parquet> <outDir> [k] [iters] [seed]`
  */
object IvfFit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IvfFit <embeddingsParquet> <outDir> [k] [iters] [seed]")
    val k = if (args.length > 2) args(2).toInt else 16
    val iters = if (args.length > 3) args(3).toInt else 10
    val seed = if (args.length > 4) args(4).toLong else 42L
    val spark = SparkSession.builder()
      .appName("graft-ivf-fit").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val emb = spark.read.parquet(args(0))
      Ivf.fit(spark, emb, k, iters, seed)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(args(1))
    } finally spark.stop()
  }
}
