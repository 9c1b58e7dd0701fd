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
  * finish certifies acyclicity of the reachable subgraph).
  */
object Dag {

  /** (id, dist): longest-path cost from any source to `id` over the
    * directed `edges` (src, dst, w). Sources and isolated nodes keep
    * dist 0. Throws if no fixpoint within `maxRounds` (cycle). */
  def longestPaths(nodes: DataFrame, edges: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, "longestPaths needs maxRounds >= 1")
    // Materialize the edge view once — it is re-joined every round.
    val (e, _) = Probe.checkpointObserved(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w")),
      count(lit(1)).as("m"))
    var best = nodes.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
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
