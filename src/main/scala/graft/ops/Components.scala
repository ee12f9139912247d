package graft.ops

import org.apache.spark.sql.DataFrame
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
  * convergence is detected with a narrow exact-sum aggregate over the
  * checkpointed labels (a scalar action — no per-round join, never a
  * driver-side collect of vertices).
  */
object Components {

  /** @param edges     (x, y) undirected pairs, any orientation, dups ok
    * @param vertices  (id) — every vertex to label, isolated ones included
    * @param maxRounds largest component DIAMETER supported; the loop runs
    *                  at most maxRounds+1 iterations (diameter rounds of
    *                  change + one confirming zero-change round)
    * @return (id, lbl) where lbl = min id reachable from id
    */
  def minLabel(edges: DataFrame, vertices: DataFrame,
               maxRounds: Int = 64): DataFrame = {
    // checkpoint the (possibly expensive) pair plan ONCE before the
    // symmetrizing union references it twice — relying on exchange reuse
    // to dedupe the two identical subtrees is optimizer luck
    val base = edges.select(col("x").cast("long").as("x"), col("y").cast("long").as("y"))
      .localCheckpoint(true)
    val sym = base.select(col("x").as("src"), col("y").as("dst"))
      .union(base.select(col("y").as("src"), col("x").as("dst")))
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
    // labels only ever DECREASE, so the exact decimal sum over the (fixed)
    // vertex set strictly decreases iff any label changed — convergence is
    // a narrow aggregate over the just-checkpointed frame, not a
    // join-and-count second shuffle per round
    def lblSum(df: DataFrame): java.math.BigDecimal =
      // empty label frame (edge-less graph) sums to NULL -> zero
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = lblSum(labels)
    var changed = true
    var round = 0
    while (changed && round <= maxRounds) {
      round += 1
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select("id", "lbl").union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val nextSum = lblSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
    }
    // non-convergence means the graph's diameter exceeded maxRounds —
    // refuse to return a wrong labeling
    require(!changed,
      s"component diameter exceeds maxRounds=$maxRounds (pathological graph?)")
    val singletons = vertices.select(col("id").cast("long"))
      .distinct()
      .join(labels, Seq("id"), "left_anti")
      .withColumn("lbl", col("id"))
    labels.unionByName(singletons)
  }
}
