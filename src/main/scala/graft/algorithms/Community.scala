package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community / partition algorithms (reference: src/algorithms/community.rs,
  * louvain.rs, scc.rs, pagerank.rs), re-expressed as iterative DataFrame
  * fixpoints with map-side-combined message aggregation.
  */
object Community {

  /** Connected components by iterative min-label propagation over a
    * symmetric edge view. The reference BFS-labels components in visit
    * order (community.rs:6); the partition is identical here with labels
    * canonicalized to the minimum node id of each component (order-free).
    *
    * Convergence probe: per-node labels only ever decrease, so the exact
    * decimal sum of labels is strictly monotone and equality ⇔ fixpoint.
    * Scale note: plain propagation needs O(diameter) rounds; for
    * 100 TB-scale graphs with long chains switch to large-star/small-star
    * (alternating pointer-doubling) — same output contract. */
  def connectedComponents(nodes: DataFrame, symEdges: DataFrame, maxIter: Int): DataFrame = {
    val e = symEdges.select("src", "dst")
    var comp = nodes.select(col("id"), col("id").as("component")).localCheckpoint()
    var prev: java.math.BigDecimal = null
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      iter += 1
      val msgs = comp.join(e, comp("id") === e("src"))
        .select(e("dst").as("id"), col("component"))
      comp = comp.unionByName(msgs)
        .groupBy("id").agg(min("component").as("component")).localCheckpoint()
      val s = comp.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
      done = prev != null && prev.compareTo(s) == 0
      prev = s
    }
    comp
  }

  /** One synchronous pass of the reference's Louvain phase 1
    * (louvain.rs:6): every node adopts the community — initially the
    * singleton {neighbor} — holding the largest number of its incident
    * edge endpoints (out+in). The reference sweeps nodes sequentially and
    * breaks ties by hash-map iteration order; here all nodes move at once
    * and ties break to the smallest community id, which is deterministic
    * and order-free. Input is the symmetric edge multiset (multiplicity =
    * weight). Output: (id, community). */
  def louvainOnePass(symEdges: DataFrame): DataFrame = louvain(symEdges, 1)

  /** Iterated synchronous passes of the same move rule: each pass every
    * node adopts the community holding the most of its incident edge
    * endpoints under the *current* assignment (ties → smallest community
    * id). The reference's sequential sweep loop (louvain.rs:27) made
    * deterministic by moving synchronously. */
  def louvain(symEdges: DataFrame, passes: Int): DataFrame = {
    val e = symEdges.select("src", "dst")
    var comm = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("community")).localCheckpoint()
    for (_ <- 1 to passes) {
      comm = e.join(comm.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src"), col("community")).agg(count(lit(1)).as("wt"))
        .groupBy(col("src").as("id"))
        .agg(max_by(col("community"),
          struct(col("wt"), (-col("community")).as("nd"))).as("community"))
        .localCheckpoint()
    }
    comm
  }

  /** SCC count / single-SCC test (reference scc.rs:160 count_scc, :233
    * is_strongly_connected) on top of sccByClosure. */
  def countScc(nodes: DataFrame, edges: DataFrame, doublings: Int): Long =
    sccByClosure(nodes, edges, doublings).select("scc_id").distinct().count()

  def isStronglyConnected(nodes: DataFrame, edges: DataFrame, doublings: Int): Boolean =
    countScc(nodes, edges, doublings) == 1L

  /** Strongly connected components via reflexive transitive-closure
    * doubling: scc_id(v) = min u with v⇝u and u⇝v (reference scc.rs:58,
    * Tarjan — same partition, canonical min-id labels). Closure is O(n²)
    * rows, intended for bounded derived graphs (dims, rollups); at data
    * scale use forward-backward pivoting instead. `doublings` rounds cover
    * paths of length 2^doublings. */
  def sccByClosure(nodes: DataFrame, edges: DataFrame, doublings: Int): DataFrame = {
    var reach = nodes.select(col("id").as("src"), col("id").as("dst"))
      .unionByName(edges.select("src", "dst")).distinct().localCheckpoint()
    for (_ <- 1 to doublings) {
      val r2 = reach.as("x").join(reach.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      reach = reach.unionByName(r2).distinct().localCheckpoint()
    }
    reach.as("f").join(reach.as("b"),
        col("f.src") === col("b.dst") && col("f.dst") === col("b.src"))
      .select(col("f.src").as("id"), col("f.dst").as("peer"))
      .groupBy("id").agg(min("peer").as("scc_id"))
  }

  /** PageRank mirroring the reference exactly (pagerank.rs:9):
    * rank' = (1-d)/n + d·Σ_in rank/outdeg over the edge multiset
    * (multi-edges contribute once per edge), dangling mass dropped,
    * final sum-normalization. Rank stays id-partitioned across
    * iterations; contributions are partially aggregated map-side. */
  def pageRank(nodes: DataFrame, edges: DataFrame, damping: Double,
               iterations: Int): DataFrame = {
    val ids = nodes.select("id")
    val n = ids.count().toDouble
    val e = edges.select("src", "dst")
    val outdeg = e.groupBy(col("src").as("src")).agg(count(lit(1)).as("odeg"))
    // out-degree is loop-invariant: attach it to the edge table once, so
    // each iteration is one hash join + one map-side-combined aggregation
    val eDeg = e.join(outdeg, Seq("src")).localCheckpoint()
    var rank = ids.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (i <- 1 to iterations) {
      // qualified aliases, not captured Columns: `rank` carries `eDeg` in
      // its lineage after the first un-checkpointed iteration, and
      // attribute references into it would be ambiguous
      val contribs = rank.as("r").join(eDeg.as("edg"), col("r.id") === col("edg.src"))
        .select(col("edg.dst").as("id"), (col("r.rank") / col("edg.odeg")).as("c"))
        .groupBy("id").agg(sum("c").as("m"))
      rank = ids.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0)))
            .as("rank"))
      // lineage cut every few rounds is enough — a 3-iteration plan is
      // still flat, and skipping the eager materialization saves 2 jobs
      if (i % 3 == 0 || i == iterations) rank = rank.localCheckpoint()
    }
    val total = rank.agg(sum("rank")).head.getDouble(0)
    rank.select(col("id"), (col("rank") / lit(total)).as("rank"))
  }
}
