package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Centrality measures (reference: src/algorithms/centrality.rs). */
object Centrality {

  /** Degree centrality: (out+in)/(n-1), multi-edges counted per edge
    * (centrality.rs:6). Two map-side-combined aggregations + left joins. */
  def degreeCentrality(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.count().toDouble
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("od"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("idg"))
    nodes.select("id")
      .join(out, Seq("id"), "left_outer")
      .join(in, Seq("id"), "left_outer")
      .select(col("id"),
        ((coalesce(col("od"), lit(0L)) + coalesce(col("idg"), lit(0L))) /
          lit(n - 1.0)).as("centrality"))
  }

  /** Betweenness centrality by level-synchronous Brandes, all sources
    * simultaneously: forward pass accumulates shortest-path counts σ per
    * (source, node) level by level; backward pass folds dependencies
    * δ(v) = Σ_succ σ(v)/σ(w)·(1+δ(w)) from the deepest level up.
    * Normalized by (n-1)(n-2) over ordered pairs, directed edges — the
    * contract of the reference's betweenness_centrality (centrality.rs:33;
    * the reference follows one arbitrary parent tree per source, which is
    * iteration-order-dependent — this computes the standard all-paths
    * definition, identical on graphs with unique shortest paths).
    *
    * State is (s,v)-keyed: O(|sources|·reach) rows per level, partitioned
    * on the join key throughout. Exact mode (all sources) is meant for
    * label-bounded subgraphs; at data scale use [[betweennessSampled]],
    * which bounds state at O(k·n). */
  def betweenness(nodes: DataFrame, edges: DataFrame, maxDepth: Int): DataFrame =
    brandes(nodes, edges, maxDepth, None)

  /** Brandes estimator over k deterministic hash-picked sources (the k
    * nodes with the smallest shared-md5 hash60 of their id — reproducible
    * in any engine): E[bc] is the exact value; contributions are scaled
    * by n/k (Brandes–Pich sampling). Exact mode is the k ≥ n case. */
  def betweennessSampled(nodes: DataFrame, edges: DataFrame, maxDepth: Int,
                         k: Int): DataFrame =
    brandes(nodes, edges, maxDepth, Some(k))

  private def brandes(nodes: DataFrame, edges: DataFrame, maxDepth: Int,
                      sampleK: Option[Int]): DataFrame = {
    // One materialization of the (usually label-filtered) edge view; the
    // per-level joins then probe the checkpoint instead of re-running the
    // upstream scan+filter each level.
    val e = edges.select("src", "dst").localCheckpoint()
    val n = nodes.count().toDouble
    val (sources, scale) = sampleK match {
      case None => (nodes.select("id"), 1.0)
      case Some(k) =>
        val srcs = nodes.select("id")
          .orderBy(graft.pipeline.TextOps.hash60(col("id").cast("string"), "bc:").asc,
            col("id").asc)
          .limit(k).localCheckpoint()
        (srcs, n / srcs.count().toDouble)
    }
    var frontier = sources.select(col("id").as("s"), col("id").as("v"))
      .withColumn("sigma", lit(1.0)).localCheckpoint()
    var visited = frontier.select("s", "v")
    val levels = ArrayBuffer(frontier)
    var d = 0
    while (d < maxDepth && !frontier.isEmpty) {
      d += 1
      frontier = frontier.join(e, frontier("v") === e("src"))
        .select(col("s"), e("dst").as("v"), col("sigma"))
        .groupBy("s", "v").agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti").localCheckpoint()
      if (!frontier.isEmpty) {
        visited = visited.unionByName(frontier.select("s", "v")).localCheckpoint()
        levels += frontier
      }
    }
    // Backward dependency accumulation.
    var delta: DataFrame = null // (s, v, delta) at the level being folded
    val deltas = ArrayBuffer.empty[DataFrame]
    for (lvl <- levels.length - 1 to 1 by -1) {
      val wl =
        if (delta == null) levels(lvl).withColumn("delta", lit(0.0))
        else levels(lvl).join(delta, Seq("s", "v"), "left_outer")
          .select(col("s"), col("v"), col("sigma"),
            coalesce(col("delta"), lit(0.0)).as("delta"))
      val msgs = wl.join(e, wl("v") === e("dst"))
        .select(col("s"), e("src").as("v"),
          ((lit(1.0) + col("delta")) / col("sigma")).as("m"))
        .groupBy("s", "v").agg(sum("m").as("msum"))
      delta = levels(lvl - 1).join(msgs, Seq("s", "v"), "inner")
        .select(col("s"), col("v"), (col("sigma") * col("msum")).as("delta"))
        .localCheckpoint()
      deltas += delta
    }
    val norm = (n - 1.0) * (n - 2.0)
    val raw =
      if (deltas.isEmpty) nodes.select(col("id"), lit(0.0).as("bc"))
      else deltas.reduce(_ unionByName _)
        .filter(col("v") =!= col("s"))
        .groupBy(col("v").as("id")).agg(sum("delta").as("d"))
        .select(col("id"), (lit(scale) * col("d") / lit(norm)).as("bc"))
    nodes.select("id").join(raw, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("bc"), lit(0.0)).as("bc"))
  }
}
