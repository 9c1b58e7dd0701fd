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
}
