package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.cypher.Mutations

/** CREATE/MERGE/SET/DELETE as immutable DataFrame edits (no DuckDB oracle
  * — the oracle side has no mutable graph; reference executor.rs mutation
  * paths are covered by these direct assertions instead). */
class CypherMutationSpec extends SparkSpec {

  private def mini: PropertyGraph = {
    val implicits = spark.implicits
    import implicits._
    PropertyGraph(
      Seq((1L, "Person", "A"), (2L, "Person", "B")).toDF("id", "label", "name"),
      Seq((1L, 2L, "KNOWS", 1.0)).toDF("src", "dst", "rel_type", "weight"))
  }

  test("CREATE single node") {
    val g2 = Mutations(mini, "CREATE (p:Person {id: 100, name: 'X'})")
    assert(g2.nodes.count() == 3)
    assert(g2.nodes.filter(col("id") === 100).head.getString(2) == "X")
  }

  test("CREATE chain adds nodes and a typed edge") {
    val g2 = Mutations(mini,
      "CREATE (a:Person {id: 101, name: 'Y'})-[:KNOWS]->(b:Person {id: 102, name: 'Z'})")
    assert(g2.nodes.count() == 4)
    val e = g2.edges.filter(col("src") === 101 && col("dst") === 102).collect()
    assert(e.length == 1 && e(0).getAs[String]("rel_type") == "KNOWS")
  }

  test("MERGE is a no-op when the pattern matches") {
    val g2 = Mutations(mini, "MERGE (p:Person {id: 1, name: 'A'})")
    assert(g2.nodes.count() == 2)
    val g3 = Mutations(mini, "MERGE (p:Person {id: 50, name: 'New'})")
    assert(g3.nodes.count() == 3)
  }

  test("SET updates a property on matched nodes only") {
    val g2 = Mutations(mini, "MATCH (p:Person {id: 1}) SET p.name = 'AA'")
    assert(g2.nodes.filter(col("id") === 1).head.getString(2) == "AA")
    assert(g2.nodes.filter(col("id") === 2).head.getString(2) == "B")
  }

  test("SET with WHERE narrows the match") {
    val g2 = Mutations(mini, "MATCH (p:Person) WHERE p.name = 'B' SET p.name = 'BB'")
    assert(g2.nodes.filter(col("name") === "BB").count() == 1)
  }

  test("DELETE removes node and incident edges") {
    val g2 = Mutations(mini, "MATCH (p:Person {id: 2}) DELETE p")
    assert(g2.nodes.count() == 1)
    assert(g2.edges.count() == 0) // the KNOWS edge pointed at 2
  }

  // ---- MATCH…CREATE (tests/cypher_create_test.rs MATCH-create path) ----

  test("MATCH…CREATE adds an edge between matched nodes, one per match row") {
    val g2 = Mutations(mini,
      "MATCH (a:Person {name: 'A'}) MATCH (b:Person {name: 'B'}) CREATE (a)-[:LIKES]->(b)")
    assert(g2.nodes.count() == 2) // no new nodes
    val e = g2.edges.filter(col("rel_type") === "LIKES").collect()
    assert(e.length == 1 && e(0).getAs[Long]("src") == 1L && e(0).getAs[Long]("dst") == 2L)
  }

  test("MATCH…CREATE mixes a bound endpoint with a new literal-id node") {
    val g2 = Mutations(mini,
      "MATCH (a:Person {id: 1}) CREATE (a)-[:OWNS]->(c:Person {id: 200, name: 'C'})")
    assert(g2.nodes.count() == 3)
    val e = g2.edges.filter(col("rel_type") === "OWNS").collect()
    assert(e.length == 1 && e(0).getAs[Long]("dst") == 200L)
  }

  test("MATCH…CREATE fans out over all match rows") {
    val g2 = Mutations(mini,
      "MATCH (a:Person) CREATE (a)-[:MARKED]->(h:Person {id: 300, name: 'Hub'})")
    assert(g2.edges.filter(col("rel_type") === "MARKED").count() == 2) // one per person
  }

  test("MATCH…CREATE respects an incoming arrow") {
    val g2 = Mutations(mini,
      "MATCH (a:Person {id: 1}) MATCH (b:Person {id: 2}) CREATE (a)<-[:REV]-(b)")
    val e = g2.edges.filter(col("rel_type") === "REV").collect()
    assert(e.length == 1 && e(0).getAs[Long]("src") == 2L && e(0).getAs[Long]("dst") == 1L)
  }

  // ---- MERGE hooks (tests/merge_comprehensive_test.rs) ----

  test("MERGE ON CREATE SET applies only when creating") {
    val g2 = Mutations(mini,
      "MERGE (n:Person {id: 60, name: 'David'}) ON CREATE SET n.name = 'Created'")
    assert(g2.nodes.filter(col("id") === 60).head.getString(2) == "Created")
    // existing pattern: ON CREATE must NOT fire
    val g3 = Mutations(mini,
      "MERGE (n:Person {id: 1, name: 'A'}) ON CREATE SET n.name = 'X'")
    assert(g3.nodes.filter(col("id") === 1).head.getString(2) == "A")
  }

  test("MERGE ON MATCH SET applies only when the pattern exists") {
    val g2 = Mutations(mini,
      "MERGE (n:Person {id: 1, name: 'A'}) ON MATCH SET n.name = 'Seen'")
    assert(g2.nodes.filter(col("id") === 1).head.getString(2) == "Seen")
    assert(g2.nodes.count() == 2)
    // created pattern: ON MATCH must NOT fire
    val g3 = Mutations(mini,
      "MERGE (n:Person {id: 61, name: 'E'}) ON MATCH SET n.name = 'X'")
    assert(g3.nodes.filter(col("id") === 61).head.getString(2) == "E")
  }

  test("rel MERGE ON CREATE SET sets a relationship property (multi_rel_merge)") {
    val g2 = Mutations(mini,
      "MERGE (a:Person {id: 1, name: 'A'})-[r:FRIENDS]->(b:Person {id: 2, name: 'B'}) " +
      "ON CREATE SET r.weight = 9.5")
    val e = g2.edges.filter(col("rel_type") === "FRIENDS").collect()
    assert(e.length == 1 && e(0).getAs[Double]("weight") == 9.5)
    assert(g2.nodes.count() == 2) // endpoints matched, not duplicated
  }

  // ---- relationship SET / DELETE (executor.rs rel mutation paths) ----

  test("SET on a relationship variable updates matched edges only") {
    val g2 = Mutations(mini,
      "MATCH (a:Person {id: 1})-[r:KNOWS]->(b:Person) SET r.weight = 2.5")
    assert(g2.edges.head.getAs[Double]("weight") == 2.5)
    // non-matching pattern leaves edges untouched
    val g3 = Mutations(mini,
      "MATCH (a:Person {id: 2})-[r:KNOWS]->(b:Person) SET r.weight = 9.9")
    assert(g3.edges.head.getAs[Double]("weight") == 1.0)
  }

  test("DELETE on a relationship variable removes the edge, keeps nodes") {
    val g2 = Mutations(mini,
      "MATCH (a:Person {id: 1})-[r:KNOWS]->(b:Person {id: 2}) DELETE r")
    assert(g2.edges.count() == 0)
    assert(g2.nodes.count() == 2)
  }

  // ---- FOREACH (tests/foreach_test.rs) ----

  test("FOREACH updates listed ids, skips nonexistent, empty list no-ops") {
    val g2 = Mutations(mini, "FOREACH (n IN [1, 999] | SET n.name = 'done')")
    assert(g2.nodes.filter(col("name") === "done").count() == 1) // only id 1
    assert(g2.nodes.count() == 2)
    val g3 = Mutations(mini, "FOREACH (n IN [] | SET n.name = 'x')")
    assert(g3.nodes.filter(col("name") === "x").count() == 0)
  }

  test("FOREACH multiple SET assignments") {
    val g2 = Mutations(mini, "FOREACH (n IN [1, 2] | SET n.name = 'm', n.label = 'Tagged')")
    assert(g2.nodes.filter(col("name") === "m" && col("label") === "Tagged").count() == 2)
  }

  // ---- constraint-enforced writes (tests/constraints_test.rs flow) ----

  private def personConstraints = {
    val cm = new graft.graph.Constraints.ConstraintManager
    cm.addConstraint(graft.graph.Constraints.uniqueness("Person", "name"))
    cm
  }

  test("checked CREATE: uniqueness-conforming write accepted") {
    val g2 = Mutations.applyChecked(mini,
      "CREATE (p:Person {id: 100, name: 'X'})", personConstraints)
    assert(g2.nodes.count() == 3)
  }

  test("checked CREATE: duplicate unique value rejected, pre-state intact") {
    val g = mini
    val ex = intercept[Mutations.ConstraintViolationException] {
      Mutations.applyChecked(g,
        "CREATE (p:Person {id: 100, name: 'A'})", personConstraints)
    }
    assert(ex.getMessage.contains("Uniqueness constraint violated"))
    assert(ex.getMessage.contains("name"))
    assert(g.nodes.count() == 2) // caller keeps the pre-state graph
  }

  test("checked CREATE: missing required property rejected (existence)") {
    val cm = new graft.graph.Constraints.ConstraintManager
    cm.addConstraint(graft.graph.Constraints.existence("Person", "name"))
    val ex = intercept[Mutations.ConstraintViolationException] {
      Mutations.applyChecked(mini, "CREATE (p:Person {id: 200})", cm)
    }
    assert(ex.getMessage.contains("missing required property"))
    assert(ex.getMessage.contains("name"))
  }

  test("checked SET: update into a duplicate unique value rejected") {
    val ex = intercept[Mutations.ConstraintViolationException] {
      Mutations.applyChecked(mini,
        "MATCH (p:Person {id: 2}) SET p.name = 'A'", personConstraints)
    }
    assert(ex.getMessage.contains("Uniqueness constraint violated"))
    // the same SET to a fresh value passes
    val ok = Mutations.applyChecked(mini,
      "MATCH (p:Person {id: 2}) SET p.name = 'C'", personConstraints)
    assert(ok.nodes.filter(col("name") === "C").count() == 1)
  }

  test("checked MERGE: ON CREATE landing on a duplicate rejected") {
    val ex = intercept[Mutations.ConstraintViolationException] {
      Mutations.applyChecked(mini,
        "MERGE (p:Person {id: 300, name: 'B'})", personConstraints)
    }
    assert(ex.getMessage.contains("Uniqueness"))
    // matching MERGE is a no-op and passes the check
    val ok = Mutations.applyChecked(mini,
      "MERGE (p:Person {id: 1, name: 'A'})", personConstraints)
    assert(ok.nodes.count() == 2)
  }
}
