package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
                broadcastCloseMaxEdges: Long = Tuning.broadcastThreshold): DataFrame = {
    // The edge count for the broadcast gate rides the edge-list
    // checkpoint (Dataset.observe) — no bare count job, and the four
    // consumers below (degree build, two orientation joins, adjacency)
    // probe the materialized list instead of re-running its upstream.
    val (pe, mE) = Probe.checkpointObserved(
      pedges.select("a", "b"), count(lit(1)).as("n"))
    val deg = pe.select(col("a").as("v"))
      .unionByName(pe.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // The degree table is |V| rows — broadcast it into the orientation
    // joins so `o` (computed twice below: adjacency build + probe side)
    // is a map-only pipeline over the cached edge list, not two shuffle
    // joins re-run per consumer. Above the threshold (driver memory
    // guard) it falls back to shuffle joins.
    val fits = mE("n").asInstanceOf[Long] <= broadcastCloseMaxEdges
    val degJ = if (fits) broadcast(deg) else deg
    val o = pe
      .join(degJ.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(degJ.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("s"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("t"))
    // Close each oriented edge (s,t) against the *intersection of the
    // out-neighbor arrays* of its endpoints: w ∈ N⁺(s)∩N⁺(t) ⇔ (s,t,w)
    // is a triangle, emitted exactly once (the orientation is acyclic).
    // This never materializes the wedge stream — the old e1⋈e2 join
    // produced Σ outdeg² intermediate rows (~32M at sf0.1) where this
    // plan's biggest frame is |E| rows carrying per-node arrays bounded
    // by the O(√m) oriented out-degree (measured 23 s → 9 s for the
    // q_clustering chain at sf0.1). While the edge set fits an executor
    // (≤ broadcastCloseMaxEdges rows ⇒ arrays total ~8B·|E|), the
    // adjacency frame is broadcast so edges never shuffle; past that it
    // becomes a key-partitioned shuffle join — decided by a cheap count
    // on the (usually cached) oriented edge list.
    val adj = o.groupBy(col("s")).agg(collect_list(col("t")).as("ns"))
    val adjB = if (fits) broadcast(adj) else adj
    o.join(adjB.select(col("s"), col("ns").as("nss")), Seq("s"))
      .join(adjB.select(col("s").as("t"), col("ns").as("nst")), Seq("t"))
      .select(col("s").as("x"), col("t").as("y"),
        explode(array_intersect(col("nss"), col("nst"))).as("z"))
  }

  /** Per-node triangle participation: (id, tri_cnt). Single pass over
    * the triangle stream — each row explodes into its three corners
    * (a 3-branch union would re-run the wedge join once per corner). */
  def trianglesPerNode(pedges: DataFrame,
                       broadcastCloseMaxEdges: Long = Tuning.broadcastThreshold): DataFrame =
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
    // Delta peeling: the edge list is scanned, never rebuilt. Each round
    // removes the currently-under-k nodes and *decrements* the surviving
    // degrees by the edges incident to the removed set (a semi-join
    // against the — small, broadcast — dead set + one map-side-combined
    // count), instead of re-aggregating degrees over a re-materialized
    // shrinking edge list. Degree rows (|V|-bounded) are the only state
    // that mutates; decrements targeting already-removed nodes drop out
    // in the anti-join. Synchronous-round semantics are unchanged, so
    // with rounds ≥ the peel depth this is exactly the k-core and the
    // fixed-round oracle matches by construction either way; early
    // convergence when nothing dies (all remaining rounds are no-ops).
    val e = symEdges.select("src", "dst").localCheckpoint()
    var deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      r += 1
      // Count rides the checkpoint job (Dataset.observe) — one job per
      // peel round instead of two.
      val (dead, mD) = Probe.checkpointObserved(
        deg.filter(col("d") < k).select("id"), count(lit(1)).as("n"))
      val deadCount = mD("n").asInstanceOf[Long]
      if (deadCount == 0L) converged = true
      else {
        val db = if (deadCount <= Tuning.broadcastThreshold) broadcast(dead) else dead
        val decr = e.join(db.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .groupBy(col("dst").as("id")).agg(count(lit(1)).as("dec"))
        deg = deg.join(db, Seq("id"), "left_anti")
          .join(decr, Seq("id"), "left_outer")
          .select(col("id"), (col("d") - coalesce(col("dec"), lit(0L))).as("d"))
          .localCheckpoint()
      }
    }
    deg.select("id")
  }

  /** Full k-core decomposition: (id, core) with core(v) = the largest k
    * such that v survives k-peeling — exactly the reference's
    * k_core_decomposition (kcore.rs:60: nodes removed while peeling at
    * level k get value k-1). Computed distributively by iterated
    * h-index (Lü et al., Nat. Commun. 7:10168, 2016): seed
    * c(v) = deg(v); each round c(v) := H({c(u) : u ~ v}) = the largest
    * h such that ≥ h neighbors currently have value ≥ h. The sequence
    * is pointwise non-increasing and its fixpoint is the core number,
    * so Σc is monotone and equality ⇔ converged — detected on the
    * observed checkpoint sum, one Spark job per round.
    *
    * Scale: state is |V| (id, c) rows; each round is one join (c
    * broadcast while driver-sized, shuffle past the gate) + a per-node
    * window rank (sorts each adjacency list inside its shuffle
    * partition — spillable, never driver-bound, no global sort) + one
    * map-side-combined max. This replaces the former driver-side loop
    * over k (O(degeneracy · peel-depth) jobs); round count is the
    * h-index convergence depth — small on dense/low-diameter graphs,
    * O(diameter) worst case on long paths, guarded by `maxIter`. */
  def coreNumbers(symEdges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = symEdges.select("src", "dst").localCheckpoint()
    val (c0, m0) = Probe.checkpointObserved(
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("c")),
      sum("c").as("s"), count(lit(1)).as("n"))
    var c = c0
    val n = m0("n").asInstanceOf[Long]
    val small = n <= Tuning.broadcastThreshold
    var prev = if (n == 0L) 0L else m0("s").asInstanceOf[Long]
    val w = Window.partitionBy("src").orderBy(col("cn").desc)
    var done = n == 0L
    var it = 0
    while (!done) {
      it += 1
      if (it > maxIter) throw new IllegalStateException(
        s"coreNumbers did not converge within $maxIter h-index rounds")
      val cj = c.select(col("id").as("dst"), col("c").as("cn"))
      // H-index via the sorted-rank identity: H(values) =
      // max_r min(value_r, r) with values ranked descending.
      val (ck, m) = Probe.checkpointObserved(
        e.join(if (small) broadcast(cj) else cj, Seq("dst"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .select(col("src"), least(col("cn"), col("rn")).as("h"))
          .groupBy(col("src").as("id")).agg(max("h").as("c")),
        sum("c").as("s"))
      c = ck
      val s = m("s").asInstanceOf[Long]
      done = s == prev
      prev = s
    }
    c.select(col("id"), col("c").as("core"))
  }

  /** Degree of each node within the subgraph induced by `members`. */
  def inducedDegrees(symEdges: DataFrame, members: DataFrame): DataFrame =
    symEdges.select("src", "dst")
      .join(members.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree"))
}
