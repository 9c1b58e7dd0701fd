package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural algorithms: triangles, clustering coefficients, k-core
  * (reference: src/algorithms/triangle.rs, kcore.rs).
  */
object Structure {

  /** Oriented triangle enumeration on a simple undirected graph given as
    * (a<b) pairs: each triangle appears exactly once as (x<y<z). The id
    * orientation bounds the join fan-out the same way degree-ordering
    * does in the classic node-iterator (triangle.rs:46). Two shuffle
    * joins, no cartesian. */
  def triangles(pedges: DataFrame): DataFrame =
    pedges.as("e1")
      .join(pedges.as("e2"), col("e1.b") === col("e2.a"))
      .join(pedges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))

  /** Per-node triangle participation: (id, tri_cnt). */
  def trianglesPerNode(pedges: DataFrame): DataFrame = {
    val t = triangles(pedges)
    t.select(col("x").as("id"))
      .unionByName(t.select(col("y").as("id")))
      .unionByName(t.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("tri_cnt"))
  }

  /** Nodes surviving `rounds` synchronous peel rounds of the k-core
    * (kcore.rs:60): each round recomputes degrees within the surviving
    * induced subgraph and drops nodes with degree < k. With rounds ≥ the
    * peel depth this is exactly the k-core (the spec asserts convergence);
    * both engines run the same fixed round count so results match by
    * construction either way. Returns the surviving node set. */
  def kcoreMembers(symEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = symEdges.select("src", "dst")
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      alive = e
        .join(alive.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("id").localCheckpoint()
    }
    alive
  }

  /** Degree of each node within the subgraph induced by `members`. */
  def inducedDegrees(symEdges: DataFrame, members: DataFrame): DataFrame =
    symEdges.select("src", "dst")
      .join(members.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree"))
}
