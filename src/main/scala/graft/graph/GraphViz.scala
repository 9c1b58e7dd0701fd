package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph visualization surface (reference `src/visualization/` —
  * `layout.rs` circle/force/hierarchical layouts, `export.rs` DOT and
  * Cytoscape-JSON exports, `visualization_test.rs`).
  *
  * Re-expressed Spark-first with one deliberate semantic upgrade: the
  * reference lays out nodes in `Vec`/HashMap iteration order and seeds
  * the force layout from `thread_rng`, so its coordinates are
  * run-dependent; here every layout is a DETERMINISTIC function of the
  * data (id-ordered ranks, hash-seeded force start), which is what
  * makes the circle and hierarchical layouts hash-oracle-able — a
  * stronger contract than the reference's own unit tests.
  *
  * Scale: a visualization view is driver-sized BY DEFINITION (the
  * point is to render it), so [[toDot]]/[[toCytoscapeJson]] require an
  * explicit node cap and induce edges against the capped node set
  * before collecting. The layout FRAMES are still DataFrame plans: the
  * circle trig is codegen arithmetic over a row_number (the one
  * unpartitioned window in this module — bounded by the view cap, and
  * whitelisted as such in PlanSpec), and the hierarchical layers ride
  * [[graft.algorithms.Traversal.bfsDistances]] — the dual-regime
  * multi-source BFS, so the layer pass itself would still run on a
  * cluster-sized graph even though no one renders one. */
object GraphViz {

  final case class LayoutConfig(width: Double = 800.0, height: Double = 600.0,
                                nodeSpacing: Double = 50.0,
                                layerSpacing: Double = 100.0)

  /** Induce edges against the capped node-id frame BEFORE collecting:
    * two broadcast semi-joins on the ≤maxNodes id set, so only the
    * induced edge rows ever cross to the driver — the full edge table
    * stays distributed no matter how large the graph is. */
  private def inducedEdges(edges: DataFrame, cappedIds: DataFrame): DataFrame = {
    val ids = broadcast(cappedIds.select(col("id").cast("long").as("id")))
    edges
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(edges.columns.map(col).toIndexedSeq: _*)
  }

  /** Circle layout (`layout.rs` CircleLayout::apply): nodes on a ring
    * of radius spacing·n/2π around the canvas center, angle
    * 2πi/n in id order (the reference uses Vec order — id order is the
    * deterministic equivalent). One row_number + codegen trig. */
  def circleLayout(nodes: DataFrame,
                   cfg: LayoutConfig = LayoutConfig()): DataFrame = {
    val w = Window.orderBy("id")
    val withN = nodes.select(col("id"))
      .withColumn("i", row_number().over(w).cast("double") - 1.0)
      .crossJoin(broadcast(nodes.agg(count(lit(1)).cast("double").as("n"))))
    val angle = lit(2.0 * math.Pi) * col("i") / col("n")
    val radius = lit(cfg.nodeSpacing) * col("n") / lit(2.0 * math.Pi)
    withN.select(col("id"),
        round(lit(cfg.width / 2) + radius * cos(angle), 6).as("x"),
        round(lit(cfg.height / 2) + radius * sin(angle), 6).as("y"))
      .orderBy("id")
  }

  /** Hierarchical layout (`layout.rs` HierarchicalLayout): layer = BFS
    * depth from the root set (in-degree-0 nodes; every node if none —
    * the reference's fallback), nodes ranked by id within their layer,
    * x centered per layer, y = 50 + layer·layerSpacing (top-to-bottom).
    * The reference's per-root sequential BFS makes shared descendants'
    * layers depend on HashMap iteration order; the simultaneous
    * multi-source BFS here computes the order-free min depth. Layers
    * ride the dual-regime [[graft.algorithms.Traversal.bfsDistances]];
    * nodes unreached within `maxDepth` land in layer 0 like the
    * reference's isolated-node rule. */
  def hierarchicalLayout(nodes: DataFrame, edges: DataFrame, maxDepth: Int,
                         cfg: LayoutConfig = LayoutConfig(),
                         leftToRight: Boolean = false): DataFrame = {
    val ids = nodes.select("id").distinct().localCheckpoint()
    val e = edges.select("src", "dst")
    val roots = ids.join(e.select(col("dst").as("id")).distinct(),
      Seq("id"), "left_anti")
    val seeds = if (roots.isEmpty) ids else roots
    val dist = graft.algorithms.Traversal.bfsDistances(e, seeds, maxDepth)
    val layers = ids.join(dist, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("dist"), lit(0L)).as("layer"))
    val byLayer = Window.partitionBy("layer")
    val ranked = layers
      .withColumn("i", row_number().over(byLayer.orderBy("id")).cast("double") - 1.0)
      .withColumn("sz", count(lit(1)).over(byLayer).cast("double"))
    val along = round(lit(50.0) +
      col("layer").cast("double") * lit(cfg.layerSpacing), 6)
    val across = round(lit((if (leftToRight) cfg.height else cfg.width) / 2) +
      (col("i") - col("sz") / 2.0) * lit(cfg.nodeSpacing), 6)
    val (x, y) = if (leftToRight) (along, across) else (across, along)
    ranked.select(col("id"), col("layer"), x.as("x"), y.as("y"))
      .orderBy("id")
  }

  /** Force-directed layout (`layout.rs` ForceDirectedLayout):
    * repulsion r/d² between every pair, spring k·(d−L) along edges,
    * damped velocity integration — but seeded from hash60(id) instead
    * of `thread_rng`, so the result is a pure function of the graph.
    * Runs on the driver over an explicitly capped view (the all-pairs
    * force model is O(n²) per iteration BY DESIGN — the reference's
    * own shape; a capped view is the only honest input). */
  def forceLayout(nodes: DataFrame, edges: DataFrame, maxNodes: Int = 2000,
                  iterations: Int = 50, repulsion: Double = 10000.0,
                  springLength: Double = 100.0, springK: Double = 0.1,
                  cfg: LayoutConfig = LayoutConfig()): Seq[(Long, Double, Double)] = {
    val capped = nodes.select(col("id").cast("long").as("id")).distinct()
      .orderBy("id").limit(maxNodes).localCheckpoint()
    val ids = capped.collect().map(_.getLong(0))
    val es = inducedEdges(
        edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst")), capped)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = ids.length
    if (n == 0) return Seq.empty
    // hash-seeded start inside the middle 60% of the canvas
    def h(id: Long, salt: String): Double = {
      val bytes = java.security.MessageDigest.getInstance("MD5")
        .digest(s"viz:$salt:$id".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(bytes).getLong(0) & Long.MaxValue
      v.toDouble / Long.MaxValue
    }
    val px = ids.map(id => cfg.width * 0.2 + h(id, "x") * cfg.width * 0.6).toArray
    val py = ids.map(id => cfg.height * 0.2 + h(id, "y") * cfg.height * 0.6).toArray
    val ix = ids.zipWithIndex.toMap
    val vx = new Array[Double](n); val vy = new Array[Double](n)
    for (_ <- 0 until iterations) {
      val fx = new Array[Double](n); val fy = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (i != j) {
            val dx = px(i) - px(j); val dy = py(i) - py(j)
            val d2 = dx * dx + dy * dy
            val d = math.max(math.sqrt(d2), 1.0)
            val f = repulsion / math.max(d2, 1.0)
            fx(i) += f * dx / d; fy(i) += f * dy / d
          }
          j += 1
        }
        i += 1
      }
      es.foreach { case (a, b) =>
        val (ia, ib) = (ix(a), ix(b))
        val dx = px(ib) - px(ia); val dy = py(ib) - py(ia)
        val d = math.max(math.sqrt(dx * dx + dy * dy), 1.0)
        val f = springK * (d - springLength)
        fx(ia) += f * dx / d; fy(ia) += f * dy / d
        fx(ib) -= f * dx / d; fy(ib) -= f * dy / d
      }
      i = 0
      while (i < n) {
        vx(i) = (vx(i) + fx(i)) * 0.85; vy(i) = (vy(i) + fy(i)) * 0.85
        px(i) = math.min(math.max(px(i) + vx(i), 0.0), cfg.width)
        py(i) = math.min(math.max(py(i) + vy(i), 0.0), cfg.height)
        i += 1
      }
    }
    ids.indices.map(i => (ids(i), px(i), py(i)))
  }

  /** Neighborhood subgraph view (reference `GraphView`
    * subgraph/`test_subgraph_view`): the k-hop BFS ball around a root
    * plus its INDUCED edges (both endpoints inside the ball) — the
    * standard "show me this node's neighborhood" extraction feeding
    * [[toDot]]/[[toCytoscapeJson]]/the layouts. Rides the dual-regime
    * [[graft.algorithms.Traversal.bfsDistances]]; the induced-edge
    * join is two semi-joins against the ball, never an edge collect. */
  def neighborhoodView(edges: DataFrame, rootId: Long, hops: Int): DataFrame = {
    val spark = edges.sparkSession
    val implicits = spark.implicits
    import implicits._
    val seeds = Seq(rootId).toDF("id")
    val ball = graft.algorithms.Traversal
      .bfsDistances(edges.select("src", "dst"), seeds, hops)
      .select("id").localCheckpoint()
    edges.select(col("src"), col("dst"))
      .join(ball.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ball.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst").distinct()
      .orderBy("src", "dst")
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Graphviz DOT export (`export.rs` DotExport): digraph with the
    * reference's global node style and rankdir, one line per node
    * (label) and per edge (rel_type label), id-ordered for
    * deterministic output. Caps + induces before collecting. */
  def toDot(nodes: DataFrame, edges: DataFrame, maxNodes: Int = 1000,
            title: Option[String] = None): String = {
    val capped = nodes.select(col("id").cast("long").as("id"),
        coalesce(col("name"), col("id").cast("string")).as("label"))
      .orderBy("id").limit(maxNodes).localCheckpoint()
    val ns = capped.collect()
    val es = inducedEdges(
        edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"),
          coalesce(col("rel_type"), lit("")).as("rel")), capped)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy { case (a, b, rel) => (a, b, rel) }
    val sb = new StringBuilder
    sb ++= "digraph G {\n"
    sb ++= "  node [shape=box, style=rounded];\n"
    sb ++= "  rankdir=TB;\n"
    title.foreach(t => sb ++= s"  // Title: $t\n")
    sb ++= s"  // Nodes: ${ns.length}, Edges: ${es.length}\n\n"
    ns.foreach { r =>
      sb ++= s"""  "${r.getLong(0)}" [label="${escape(r.getString(1))}"];\n"""
    }
    sb ++= "\n"
    es.foreach { case (a, b, rel) =>
      val attr = if (rel.isEmpty) "" else s""" [label="${escape(rel)}"]"""
      sb ++= s"""  "$a" -> "$b"$attr;\n"""
    }
    sb ++= "}\n"
    sb.toString
  }

  /** Cytoscape.js-compatible JSON export (`export.rs` JsonExport):
    * elements with node `data.id`/`data.label` and edge
    * `data.source`/`data.target`/`data.rel`, id-ordered. */
  def toCytoscapeJson(nodes: DataFrame, edges: DataFrame,
                      maxNodes: Int = 1000): String = {
    val capped = nodes.select(col("id").cast("long").as("id"),
        coalesce(col("name"), col("id").cast("string")).as("label"))
      .orderBy("id").limit(maxNodes).localCheckpoint()
    val ns = capped.collect()
    val es = inducedEdges(
        edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"),
          coalesce(col("rel_type"), lit("")).as("rel")), capped)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy { case (a, b, rel) => (a, b, rel) }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val nodeJson = ns.map(r =>
      s"""{"data":{"id":${jstr(r.getLong(0).toString)},"label":${jstr(r.getString(1))}}}""")
    val edgeJson = es.zipWithIndex.map { case ((a, b, rel), i) =>
      s"""{"data":{"id":${jstr(s"e$i")},"source":${jstr(a.toString)},"target":${jstr(b.toString)},"rel":${jstr(rel)}}}"""
    }
    s"""{"elements":{"nodes":[${nodeJson.mkString(",")}],"edges":[${edgeJson.mkString(",")}]}}"""
  }
}
