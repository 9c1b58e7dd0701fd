package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-expansion traversals, the Spark re-expression of the
  * reference's queue-based BFS/Dijkstra family (reference:
  * src/algorithms/traversal.rs:61 bfs, :402 reachable_nodes;
  * src/algorithms/shortest_path.rs:326 bfs_shortest_path, :405 dijkstra;
  * src/algorithms/astar.rs).
  *
  * Each level is one hash join frontier⋈edges (edges pre-partitioned by
  * src, so chained levels reuse the partitioning) plus an anti-join or
  * min-aggregate roll-up. `localCheckpoint` after every level cuts the
  * lineage so deep traversals keep flat plans; on a real cluster swap it
  * for `checkpoint` on reliable storage.
  */
object Traversal {

  /** Multi-source BFS: (id, dist BIGINT) for every node within `maxDepth`
    * hops of a seed, dist = hop count of the first (shortest) visit. */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select("src", "dst")
    var visited = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = frontier.select("id")
        .join(e, col("id") === e("src"))
        .select(e("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(depth.toLong)).localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
    }
    visited
  }

  /** Fixed-iteration Bellman-Ford relaxation: (id, dist DOUBLE) minimum
    * path weight from the seed set. Equals the reference's Dijkstra
    * (shortest_path.rs:405) on non-negative weights once iterations ≥
    * shortest-path hop diameter; deterministic because path sums are the
    * same IEEE additions in any engine and MIN is order-free. */
  def bellmanFord(wedges: DataFrame, seeds: DataFrame, iterations: Int): DataFrame = {
    val e = wedges.select("src", "dst", "weight")
    var dist = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0.0)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(e("dst").as("id"), (dist("dist") + e("weight")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min("dist").as("dist")).localCheckpoint()
    }
    dist
  }
}
