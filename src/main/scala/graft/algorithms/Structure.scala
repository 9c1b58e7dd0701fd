package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural algorithms: triangles, clustering coefficients, k-core
  * (reference: src/algorithms/triangle.rs, kcore.rs).
  */
object Structure {

  /** Triangle enumeration on a simple undirected graph given as (a<b)
    * pairs, via the degree-ordered node-iterator (triangle.rs:46): edges
    * are oriented low-degree → high-degree (id tiebreak), which is
    * acyclic, so each triangle is emitted exactly once — and out-degrees
    * are bounded by O(√m), keeping the wedge join at O(m^1.5) even on
    * skewed graphs. The (x,y,z) labels depend on the orientation but the
    * triangle node-sets (and thus all counts) do not. */
  def triangles(pedges: DataFrame,
                broadcastCloseMaxEdges: Long = 4000000L): DataFrame = {
    val deg = pedges.select(col("a").as("v"))
      .unionByName(pedges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val o = pedges
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("s"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("t"))
    // The wedge stream (e1⋈e2) is the big intermediate. While the edge
    // set fits an executor (≤ broadcastCloseMaxEdges rows), close it
    // against a broadcast so wedge rows never shuffle; past that the
    // broadcast hint would OOM the driver at scale, so the close becomes
    // a key-partitioned shuffle join on (s,t) — the strategy is decided
    // by a cheap count on the (usually cached) oriented edge list.
    val wedges = o.as("e1")
      .join(o.as("e2"), col("e1.t") === col("e2.s"))
    val e3 = o.as("e3")
    val closeCond = col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t")
    val closed =
      if (pedges.count() <= broadcastCloseMaxEdges) wedges.join(broadcast(e3), closeCond)
      else wedges.join(e3, closeCond)
    closed.select(col("e1.s").as("x"), col("e1.t").as("y"), col("e2.t").as("z"))
  }

  /** Per-node triangle participation: (id, tri_cnt). Single pass over
    * the triangle stream — each row explodes into its three corners
    * (a 3-branch union would re-run the wedge join once per corner). */
  def trianglesPerNode(pedges: DataFrame,
                       broadcastCloseMaxEdges: Long = 4000000L): DataFrame =
    perNodeCounts(triangles(pedges, broadcastCloseMaxEdges))

  /** Corner-count aggregation for an (x,y,z) triangle frame — split out
    * so callers holding a cached triangle frame can reuse it. */
  def perNodeCounts(tris: DataFrame): DataFrame =
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri_cnt"))

  /** Nodes surviving `rounds` synchronous peel rounds of the k-core
    * (kcore.rs:60): each round recomputes degrees within the surviving
    * induced subgraph and drops nodes with degree < k. With rounds ≥ the
    * peel depth this is exactly the k-core (the spec asserts convergence);
    * both engines run the same fixed round count so results match by
    * construction either way. Returns the surviving node set. */
  def kcoreMembers(symEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // The induced edge set only ever shrinks: filter it down each round
    // instead of re-probing the full graph, and stop early at a fixpoint
    // (all remaining rounds would be no-ops, so the result is identical
    // to running the full `rounds`).
    var e = symEdges.select("src", "dst").localCheckpoint()
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint()
    var aliveCount = alive.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      r += 1
      val next = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("id").localCheckpoint()
      val nextCount = next.count()
      if (nextCount == aliveCount) converged = true
      else {
        e = e.join(next.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(next.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .localCheckpoint()
        alive = next
        aliveCount = nextCount
      }
    }
    alive
  }

  /** Full k-core decomposition: (id, core) with core(v) = the largest k
    * such that v survives k-peeling — exactly the reference's
    * k_core_decomposition (kcore.rs:60: nodes removed while peeling at
    * level k get value k-1). Driver-side loop over k with an inner peel
    * fixpoint; O(degeneracy · peel-depth) Spark jobs, so intended for
    * bounded graphs — at data scale, distributed core decomposition
    * switches to the iterated-h-index algorithm (same output). */
  def coreNumbers(symEdges: DataFrame, maxK: Int = 1000): DataFrame = {
    var e = symEdges.select("src", "dst").localCheckpoint()
    var remaining = e.select(col("src").as("id")).distinct().localCheckpoint()
    var remainingCount = remaining.count()
    var result: Option[DataFrame] = None
    var k = 1
    while (remainingCount > 0 && k <= maxK) {
      var stable = false
      while (!stable && remainingCount > 0) {
        val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
        val survivors = deg.filter(col("d") >= k).select("id").localCheckpoint()
        val survivorCount = survivors.count()
        if (survivorCount == remainingCount) stable = true
        else {
          val removed = remaining.join(survivors, Seq("id"), "left_anti")
            .withColumn("core", lit(k.toLong - 1))
          result = Some(result.fold(removed)(_ unionByName removed).localCheckpoint())
          e = e.join(survivors.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(survivors.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .localCheckpoint()
          remaining = survivors
          remainingCount = survivorCount
        }
      }
      k += 1
    }
    result.fold(remaining.withColumn("core", lit(maxK.toLong)))(r =>
      if (remainingCount == 0) r
      else r.unionByName(remaining.withColumn("core", lit(maxK.toLong))))
  }

  /** Degree of each node within the subgraph induced by `members`. */
  def inducedDegrees(symEdges: DataFrame, members: DataFrame): DataFrame =
    symEdges.select("src", "dst")
      .join(members.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree"))
}
