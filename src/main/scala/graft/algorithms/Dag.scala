package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DAG kernels: topological layering and weighted critical paths via
  * longest-path relaxation (extends the reference's traversal family,
  * src/algorithms/traversal.rs, to the scheduling/lineage-DAG analyses a
  * large pipeline orchestrator needs — stage depth and the critical
  * chain that bounds end-to-end latency).
  *
  * The kernel is frontier Bellman relaxation specialized to DAGs:
  * dist(v) = max over incoming edges (dist(u) + w), every node seeded at
  * 0, so dist is the longest-path cost from any source and, with unit
  * weights, the Kahn/Coffman–Graham layer. On a DAG the fixpoint lands
  * after `depth` rounds (depth = longest path edge count); each round is
  * ONE frontier⋈edges hash join, a map-side-combined max roll-up, and a
  * monotone improve-filter. State is one (id, dist) row per node — the
  * kernel scales to any |V| that shuffles, and rounds are bounded by DAG
  * depth, which scheduling/build graphs keep shallow by construction.
  * Weights stay BIGINT end to end so the fold is exact in every engine.
  *
  * A cyclic input cannot converge; the round cap throws instead of
  * spinning, which doubles as distributed cycle detection (a clean
  * finish certifies acyclicity of the reachable subgraph). That
  * certification requires strictly positive weights — a zero-weight
  * cycle improves nothing and would converge silently — so weights are
  * validated w ≥ 1 up front (free: the min rides the edge materialize).
  */
object Dag {

  /** (id, dist): longest-path cost from any source to `id` over the
    * directed `edges` (src, dst, w). Sources and isolated nodes keep
    * dist 0. Throws if no fixpoint within `maxRounds` (cycle).
    *
    * Dual regime like the other iterative kernels: under
    * [[Tuning.broadcastThreshold]] the relaxation runs as a packed
    * driver loop (a depth-round fixpoint on a tiny graph is pure
    * scheduler floor distributed); past the gate the frontier joins
    * below are the 100 TB path. Both branches compute the identical
    * integer fixpoint (regime-pinned). */
  def longestPaths(nodes: DataFrame, edges: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, "longestPaths needs maxRounds >= 1")
    // Materialize the edge view once — it is re-joined every round. The
    // min-weight probe rides the same job: the acyclicity certification
    // below (clean finish ⇒ no cycle) is only sound for strictly
    // positive weights — a zero-weight cycle converges without throwing
    // — so reject w < 1 up front rather than silently weakening the
    // guarantee.
    val (e, mE) = Probe.checkpointObserved(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w")),
      count(lit(1)).as("m"), min(col("w")).as("wmin"))
    require(mE("m").asInstanceOf[Long] == 0L ||
        mE("wmin").asInstanceOf[Long] >= 1L,
      "longestPaths needs strictly positive integer weights (w >= 1): " +
        "a zero-weight cycle would converge and defeat cycle detection")
    val (n0, mN) = Probe.checkpointObserved(
      nodes.select(col("id")).distinct(), count(lit(1)).as("n"))
    if (mE("m").asInstanceOf[Long] <= Tuning.broadcastThreshold &&
        mN("n").asInstanceOf[Long] <= Tuning.broadcastThreshold)
      return longestPathsLocal(n0, e, maxRounds)
    var best = n0.withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = best
    var improved = 1L
    var round = 0
    while (improved > 0 && round < maxRounds) {
      round += 1
      // Relax out-edges of the frontier; per-target max combines
      // map-side before the shuffle.
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (frontier("dist") + e("w")).as("cd"))
        .groupBy("id").agg(max("cd").as("cd"))
      // Improvement probe rides the checkpoint job (one job per round).
      val (imp, m) = Probe.checkpointObserved(
        cand.join(best, Seq("id"))
          .filter(col("cd") > col("dist"))
          .select(col("id"), col("cd").as("dist")),
        count(lit(1)).as("n"))
      improved = m("n").asInstanceOf[Long]
      if (improved > 0) {
        best = best.join(imp.withColumnRenamed("dist", "nd"), Seq("id"), "left")
          .select(col("id"), coalesce(col("nd"), col("dist")).as("dist"))
          .localCheckpoint()
        frontier = imp
      }
    }
    if (improved > 0)
      throw new IllegalStateException(
        s"longestPaths did not converge in $maxRounds rounds — input has a cycle")
    best
  }

  /** Driver-gated twin: the same max-relaxation to the same fixpoint,
    * as a packed edge sweep (round ≡ one pass over the edge array —
    * exactly the distributed round's relax set, so the two regimes are
    * bit-identical on integer dists). */
  private def longestPathsLocal(idsCk: DataFrame, e: DataFrame,
                                maxRounds: Int): DataFrame = {
    val spark = idsCk.sparkSession
    val Array(idArr) = LocalGraph.packed(idsCk.select(col("id").cast("long")), 1)
    // Edges restricted to the node universe, exactly like the
    // distributed loop (frontier ⊆ universe; non-universe dsts are
    // dropped at the improve join and never propagate).
    val universe = idArr.toSet
    val Array(srcL0, dstL0, wL0) = LocalGraph.packed(
      e.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long")), 3)
    val keep = srcL0.indices.filter(k =>
      universe.contains(srcL0(k)) && universe.contains(dstL0(k))).toArray
    val srcL = keep.map(srcL0); val dstL = keep.map(dstL0)
    val wL = keep.map(wL0)
    val idx = new LocalGraph.Index(idArr.length + srcL.length)
    idArr.foreach(idx.ix)
    val srcIx = srcL.map(idx.ix); val dstIx = dstL.map(idx.ix)
    val dist = new Array[Long](idx.size)
    val m = srcIx.length
    var improved = true
    var round = 0
    while (improved && round < maxRounds) {
      round += 1
      improved = false
      var k = 0
      while (k < m) {
        val nd = dist(srcIx(k)) + wL(k)
        if (nd > dist(dstIx(k))) { dist(dstIx(k)) = nd; improved = true }
        k += 1
      }
    }
    if (improved)
      throw new IllegalStateException(
        s"longestPaths did not converge in $maxRounds rounds — input has a cycle")
    import spark.implicits._
    idArr.toSeq.map(id => (id, dist(idx.get(id)))).toDF("id", "dist")
  }

  /** Topological layer per node: longest-path depth under unit weights
    * (layer 0 = sources; every edge crosses strictly upward). */
  def topoLayers(nodes: DataFrame, edges: DataFrame, maxRounds: Int): DataFrame =
    longestPaths(nodes, edges.select(col("src"), col("dst"), lit(1L).as("w")),
      maxRounds)
      .select(col("id"), col("dist").as("layer"))

  /** Critical-path cost per node: the heaviest chain of work that must
    * finish before `id` can (exact BIGINT weight sums). */
  def criticalPath(nodes: DataFrame, edges: DataFrame, maxRounds: Int): DataFrame =
    longestPaths(nodes, edges, maxRounds)
      .select(col("id"), col("dist").as("cost"))
}
