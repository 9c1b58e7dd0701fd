package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphViz

/** Visualization surface vs reference `visualization_test.rs`: layout
  * bounds/ordering contracts and export-format content checks, plus
  * the determinism upgrade (identical output across invocations). */
class GraphVizSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("circle layout keeps every node inside the canvas (test_circle_layout)") {
    val nodes = (1L to 10L).toDF("id")
    val pos = GraphViz.circleLayout(nodes).collect()
    assert(pos.length == 10)
    pos.foreach { r =>
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 800.0)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 600.0)
    }
    // deterministic: same input → same coordinates
    val again = GraphViz.circleLayout(nodes).collect()
    assert(pos.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("hierarchical layout: child layers sit strictly below parents " +
      "(test_hierarchical_layout_top_to_bottom)") {
    // chain 1→2→3 plus sibling 4 under 1
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = GraphViz.hierarchicalLayout(nodes, edges, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got(1L)._1 == 0L && got(2L)._1 == 1L && got(4L)._1 == 1L &&
      got(3L)._1 == 2L)
    assert(got(2L)._3 > got(1L)._3 && got(3L)._3 > got(2L)._3)
    // siblings share y, differ in x
    assert(got(2L)._3 == got(4L)._3 && got(2L)._2 != got(4L)._2)
  }

  test("hierarchical layout left-to-right: deeper layers move right " +
      "(test_hierarchical_layout_left_to_right)") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphViz.hierarchicalLayout(nodes, edges, 10, leftToRight = true)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got(2L)._1 > got(1L)._1 && got(3L)._1 > got(2L)._1)
  }

  test("hierarchical layout: rootless cycle falls back to all-roots, layer 0") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = GraphViz.hierarchicalLayout(nodes, edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("force layout: in-bounds, deterministic, pulls an edge pair " +
      "closer than the isolated node (test_force_directed_layout)") {
    val nodes = Seq(1L, 2L, 9L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphViz.forceLayout(nodes, edges)
    assert(got.length == 3)
    got.foreach { case (_, x, y) =>
      assert(x >= 0.0 && x <= 800.0 && y >= 0.0 && y <= 600.0)
    }
    val p = got.map { case (id, x, y) => id -> (x, y) }.toMap
    def d(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    // the spring-connected pair ends closer together than either end
    // is to the unconnected node
    assert(d(p(1L), p(2L)) < d(p(1L), p(9L)) &&
      d(p(1L), p(2L)) < d(p(2L), p(9L)))
    assert(got == GraphViz.forceLayout(nodes, edges))
  }

  test("DOT export contains digraph, labels, rel types (test_dot_export)") {
    val nodes = Seq((1L, "Alice"), (2L, "Bob")).toDF("id", "name")
    val edges = Seq((1L, 2L, "KNOWS")).toDF("src", "dst", "rel_type")
    val dot = GraphViz.toDot(nodes, edges, title = Some("t"))
    assert(dot.contains("digraph G"))
    assert(dot.contains("node [shape=box, style=rounded]"))
    assert(dot.contains("rankdir=TB"))
    assert(dot.contains("\"Alice\"") && dot.contains("\"Bob\""))
    assert(dot.contains("\"1\" -> \"2\" [label=\"KNOWS\"]"))
    assert(dot.contains("// Nodes: 2, Edges: 1"))
    // quotes in labels escape, edges to capped-out nodes drop
    val odd = Seq((1L, "say \"hi\"")).toDF("id", "name")
    assert(GraphViz.toDot(odd, edges.filter(lit(false)))
      .contains("say \\\"hi\\\""))
    val capped = GraphViz.toDot(nodes, edges, maxNodes = 1)
    assert(!capped.contains("->"))
  }

  test("Cytoscape JSON export is parseable shape with node/edge data " +
      "(test_json_export)") {
    val nodes = Seq((1L, "Alice"), (2L, "Bob")).toDF("id", "name")
    val edges = Seq((1L, 2L, "KNOWS")).toDF("src", "dst", "rel_type")
    val js = GraphViz.toCytoscapeJson(nodes, edges)
    assert(js.startsWith("{\"elements\":{\"nodes\":["))
    assert(js.contains("\"id\":\"1\"") && js.contains("\"label\":\"Alice\""))
    assert(js.contains("\"source\":\"1\"") && js.contains("\"target\":\"2\""))
    assert(js.contains("\"rel\":\"KNOWS\""))
    // control characters and quotes stay valid JSON
    val tricky = Seq((1L, "a\"b\nc")).toDF("id", "name")
    val js2 = GraphViz.toCytoscapeJson(tricky, edges.filter(lit(false)))
    assert(js2.contains("a\\\"b\\u000ac"))
  }
}
