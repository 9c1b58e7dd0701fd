package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community / partition algorithms (reference: src/algorithms/community.rs,
  * louvain.rs, scc.rs, pagerank.rs), re-expressed as iterative DataFrame
  * fixpoints with map-side-combined message aggregation.
  */
object Community {

  /** Connected components with pointer doubling: each round hooks every
    * node to the minimum label in its closed neighborhood, then shortcuts
    * `component := component(component)` (Shiloach–Vishkin / the
    * shortcutting half of large-star–small-star), so label distance to the
    * component minimum halves per round — O(log n) rounds even on long
    * chains, vs O(diameter) for plain propagation. The reference
    * BFS-labels components in visit order (community.rs:6); the partition
    * is identical here with labels canonicalized to the minimum node id of
    * each component (order-free).
    *
    * Convergence probe: per-node labels only ever decrease, so the exact
    * decimal sum of labels is strictly monotone and equality ⇔ fixpoint. */
  def connectedComponents(nodes: DataFrame, symEdges: DataFrame, maxIter: Int): DataFrame =
    ccWithRounds(nodes, symEdges, maxIter)._1

  /** connectedComponents + the number of rounds it took to converge
    * (exposed so the chain-graph spec can assert the O(log n) bound). */
  private[graft] def ccWithRounds(nodes: DataFrame, symEdges: DataFrame,
                                  maxIter: Int): (DataFrame, Int) = {
    val e = symEdges.select("src", "dst")
    var comp = nodes.select(col("id"), col("id").as("component")).localCheckpoint()
    var prev: java.math.BigDecimal = null
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      iter += 1
      val msgs = comp.join(e, comp("id") === e("src"))
        .select(e("dst").as("id"), col("component"))
      // localCheckpoint before the self-join: materializes the hook step
      // (Catalyst cannot self-join a live Union plan) and makes the
      // shortcut a clean same-generation p(p(v)).
      val hooked = comp.unionByName(msgs)
        .groupBy("id").agg(min("component").as("component")).localCheckpoint()
      // Shortcut: jump to the label's own label. Labels are always node
      // ids, so the self-join always hits; left_outer + coalesce only
      // guards isolated seeds.
      comp = hooked.as("a")
        .join(hooked.select(col("id").as("component"), col("component").as("_gp")).as("b"),
          Seq("component"), "left_outer")
        .select(col("id"), coalesce(col("_gp"), col("component")).as("component"))
        .localCheckpoint()
      val s = comp.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
      done = prev != null && prev.compareTo(s) == 0
      prev = s
    }
    (comp, iter)
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
    * is_strongly_connected) on top of scc. */
  def countScc(nodes: DataFrame, edges: DataFrame): Long =
    scc(nodes, edges).select("scc_id").distinct().count()

  def isStronglyConnected(nodes: DataFrame, edges: DataFrame): Boolean =
    countScc(nodes, edges) == 1L

  /** Strongly connected components — trimming + forward min-label
    * coloring + backward BFS from color roots, the multi-pivot
    * generalization of forward-backward pivoting (every color class is a
    * pivot, all processed simultaneously; Slota-style coloring SCC).
    * Same partition as the reference's Kosaraju (scc.rs:58), labels
    * canonicalized to the minimum member id (order-free). State is
    * O(|V|) rows per step - never the O(n^2) transitive closure.
    *
    * Each outer round over the still-unassigned subgraph:
    *   1. Trim to a fixpoint: a node with no in-edges or no out-edges
    *      inside the active subgraph is a singleton SCC (scc_id = own id).
    *   2. Color: propagate color(v) = the active id minimal in
    *      (xxhash64(id), id) order that reaches v. Hash order (not id
    *      order) so that an adversarial condensation chain in
    *      ascending-id order still yields many simultaneous roots — the
    *      expected number of rounds is O(log levels) (record-minima
    *      argument), where id order degrades to one root (and one level)
    *      per round. Each fixpoint step combines one edge-hop with a
    *      pointer-doubling shortcut through the current color (sound:
    *      color(v) reaches v and color(color(v)) reaches color(v), so
    *      color(color(v)) reaches v) — O(log diameter) steps instead of
    *      O(diameter). Per-node colors are lexicographically
    *      non-increasing, so the pair (sum hash, sum id) is monotone and
    *      equality <=> fixpoint.
    *   3. Collect: for a root u (color(u) = u), SCC(u) = {v : color(v)
    *      = u and v reaches u}. Every v->...->u path lies entirely
    *      inside color class u (anything reaching an on-path node also
    *      reaches u, so no order-smaller color can appear on the path —
    *      the argument holds for any total order on ids), so one
    *      backward BFS from all roots along transposed active edges,
    *      restricted to rows whose color equals the root's id, finds
    *      exactly the root SCCs - all color classes in parallel.
    *   4. Assign those SCCs, drop them from the active set, repeat.
    *   Finally relabel each SCC to its minimum member id (one
    *   aggregation; roots are hash-minima, the public contract is
    *   min-id labels).
    *
    * Termination: every outer round assigns at least one SCC — the
    * hash-minimal active node is always a color root (every other
    * active node orders after it), so `remaining` strictly decreases
    * and the loop runs to completion unbounded (no round cap to
    * mis-tune, ADVICE r3). A zero-progress round is mathematically
    * unreachable and guarded by an IllegalStateException. */
  def scc(nodes: DataFrame, edges: DataFrame): DataFrame = {
    var active = nodes.select("id").localCheckpoint()
    var out: Option[DataFrame] = None
    var remaining = active.count()
    while (remaining > 0) {
      val beforeRound = remaining
      // Active-subgraph edge view (self-loops never extend an SCC).
      var e = edges.select("src", "dst").filter(col("src") =!= col("dst"))
        .join(active.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(active.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      // 1. Trim singleton SCCs to a fixpoint.
      var trimming = true
      while (trimming && remaining > 0) {
        val hasOut = e.select(col("src").as("id")).distinct()
        val hasIn = e.select(col("dst").as("id")).distinct()
        val keep = active.join(hasOut, Seq("id"), "left_semi")
          .join(hasIn, Seq("id"), "left_semi").localCheckpoint()
        val keepCount = keep.count()
        if (keepCount == remaining) trimming = false
        else {
          val singletons = active.join(keep, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc_id"))
          out = Some(out.fold(singletons)(_ unionByName singletons).localCheckpoint())
          active = keep
          remaining = keepCount
          e = e.join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .localCheckpoint()
        }
      }
      if (remaining > 0) {
        // 2. Forward min-(hash,id) coloring: one edge-hop + one
        // pointer-doubling shortcut per fixpoint step.
        var color = active
          .select(col("id"), xxhash64(col("id")).as("chash"), col("id").as("cid"))
          .localCheckpoint()
        var prevH: java.math.BigDecimal = null
        var prevI: java.math.BigDecimal = null
        var stable = false
        while (!stable) {
          val hopMsgs = color.join(e, color("id") === e("src"))
            .select(e("dst").as("id"), col("chash"), col("cid"))
          val jumpMsgs = color.as("a")
            .join(color.select(col("id").as("cid"), col("chash").as("_jh"),
              col("cid").as("_jc")).as("b"), Seq("cid"))
            .select(col("a.id").as("id"), col("_jh").as("chash"), col("_jc").as("cid"))
          color = color.unionByName(hopMsgs).unionByName(jumpMsgs)
            .groupBy("id").agg(min(struct(col("chash"), col("cid"))).as("m"))
            .select(col("id"), col("m.chash").as("chash"), col("m.cid").as("cid"))
            .localCheckpoint()
          val s = color.agg(
            sum(col("chash").cast("decimal(38,0)")).as("h"),
            sum(col("cid").cast("decimal(38,0)")).as("i")).head
          val (sh, si) = (s.getDecimal(0), s.getDecimal(1))
          stable = prevH != null && prevH.compareTo(sh) == 0 &&
            prevI.compareTo(si) == 0
          prevH = sh; prevI = si
        }
        val colorOf = color.select("id", "cid").localCheckpoint()
        // 3. Backward BFS from the color roots inside their color class.
        var assigned = colorOf.filter(col("cid") === col("id"))
          .select(col("id"), col("id").as("scc_id")).localCheckpoint()
        var frontier = assigned
        while (!frontier.isEmpty) {
          frontier = frontier.join(e, frontier("id") === e("dst"))
            .select(e("src").as("id"), col("scc_id"))
            .distinct()
            .join(colorOf, Seq("id"))
            .filter(col("cid") === col("scc_id")).drop("cid")
            .join(assigned, Seq("id"), "left_anti")
            .localCheckpoint()
          assigned = assigned.unionByName(frontier).localCheckpoint()
        }
        // 4. Remove the resolved SCCs and iterate on the remainder.
        out = Some(out.fold(assigned)(_ unionByName assigned).localCheckpoint())
        active = active.join(assigned, Seq("id"), "left_anti").localCheckpoint()
        remaining = active.count()
      }
      if (remaining >= beforeRound)
        throw new IllegalStateException(
          "scc round made no progress — unreachable: the hash-minimal active node is always a color root")
    }
    // Canonicalize: public labels are the minimum member id, independent
    // of which member was the hash-order root (idempotent for trim
    // singletons). One aggregation + one join over |V| rows.
    val raw = out.getOrElse(nodes.select(col("id"), col("id").as("scc_id")).limit(0))
    val relabel = raw.groupBy("scc_id").agg(min("id").as("_lbl"))
    raw.join(relabel, Seq("scc_id"))
      .select(col("id"), col("_lbl").as("scc_id"))
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
