package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-election
  * step of a near-dup pipeline (LSH/Jaccard pairs → components → one
  * canonical doc per cluster, reference dedup keeps first:
  * indexing.py:178-204 keep-first over exact groups; this is its
  * transitive-closure generalization for NEAR-dup graphs).
  *
  * Algorithm: iterative min-label propagation — every vertex starts
  * labeled with its own id; each round takes the min of its own and its
  * neighbors' labels; fixpoint = per-component min id, a deterministic
  * canonical label. Rounds = component diameter, and each round is ONE
  * shuffle (join + groupBy-min with map-side partial aggregation).
  *
  * Scale shape: near-dup components are overwhelmingly tiny and
  * shallow (duplicate families, mirror chains), so diameter-bounded
  * rounds beat the O(log n)-round star-contraction algorithms
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) on constant factors; for adversarial long-path graphs that
  * published contraction family is the drop-in upgrade — the seam is
  * this one function. Label frames are eagerly localCheckpoint'd each
  * round: the loop would otherwise stack a lineage of self-joins, and
  * convergence is detected with a count (a scalar action, never a
  * driver-side collect of vertices).
  */
object Components {

  /** @param edges    (x, y) undirected pairs, any orientation, dups ok
    * @param vertices (id) — every vertex to label, isolated ones included
    * @return (id, lbl) where lbl = min id reachable from id
    */
  def minLabel(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
               maxRounds: Int = 64): DataFrame = {
    val sym = edges.select(col("x").cast("long").as("src"), col("y").cast("long").as("dst"))
      .union(edges.select(col("y").cast("long").as("src"), col("x").cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // the loop runs over edge-TOUCHED vertices only: a vertex with no edge
    // is its own component and can never change, so shuffling it every
    // round would make each round corpus-sized instead of pair-graph-sized
    // (at web scale the dup graph is a sliver of the corpus); singletons
    // are unioned back once at the end
    var labels = sym.select(col("src").as("id"))
      .distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select("id", "lbl").union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.lbl") < col("o.lbl")).count()
      labels = next
    }
    // labels only ever decrease, so non-convergence means the graph's
    // diameter exceeded maxRounds — refuse to return a wrong labeling
    require(changed == 0,
      s"components did not converge in $maxRounds rounds (pathological graph?)")
    val singletons = vertices.select(col("id").cast("long"))
      .distinct()
      .join(labels, Seq("id"), "left_anti")
      .withColumn("lbl", col("id"))
    labels.unionByName(singletons)
  }
}
