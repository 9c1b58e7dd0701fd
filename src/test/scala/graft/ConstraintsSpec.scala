package graft

import org.apache.spark.sql.functions._
import graft.graph.{Constraints, PropertyGraph}
import graft.cypher.Mutations

/** Constraint semantics mirroring tests/constraints_test.rs. */
class ConstraintsSpec extends SparkSpec {
  import Constraints._

  private def mini: PropertyGraph = {
    val implicits = spark.implicits
    import implicits._
    PropertyGraph(
      Seq((1L, "User", "alice@x.com"), (2L, "User", "bob@x.com"),
        (3L, "Admin", null.asInstanceOf[String]))
        .toDF("id", "label", "email"),
      Seq.empty[(Long, Long, String, Double)].toDF("src", "dst", "rel_type", "weight"))
  }

  test("uniqueness constraint: valid graph, then violated by a duplicate CREATE") {
    val m = new ConstraintManager
    m.addConstraint(uniqueness("User", "email"))
    assert(m.isValid(mini))
    // duplicate email (test_constraint_prevents_duplicate_creation)
    val dup = Mutations(mini, "CREATE (u:User {id: 4, email: 'alice@x.com'})")
    val v = m.validate(dup).collect()
    assert(v.length == 1 && v(0).getAs[String]("value") == "alice@x.com"
      && v(0).getAs[Long]("n") == 2L)
    assert(!m.isValid(dup))
  }

  test("existence constraint counts null-property nodes of the label only") {
    val m = new ConstraintManager
    m.addConstraint(existence("User", "email"))
    assert(m.isValid(mini)) // the null email is on an Admin, not a User
    m.addConstraint(existence("Admin", "email"))
    val v = m.validate(mini).collect()
    assert(v.length == 1 && v(0).getAs[String]("kind") == "existence"
      && v(0).getAs[Long]("n") == 1L)
  }

  test("constraints only apply to their label; multiple per label allowed") {
    val m = new ConstraintManager
    m.addConstraint(uniqueness("User", "email"))
    m.addConstraint(existence("User", "email"))
    assert(m.forLabel("User").length == 2 && m.forLabel("Admin").isEmpty)
    assert(m.count == 2)
  }

  test("drop constraint and duplicate add rejection") {
    val m = new ConstraintManager
    m.addConstraint(uniqueness("User", "email"))
    assertThrows[IllegalArgumentException](m.addConstraint(uniqueness("User", "email")))
    assert(m.dropConstraint("User", "email", Uniqueness))
    assert(!m.dropConstraint("User", "email", Uniqueness)) // already gone
    assert(m.all.isEmpty)
    assert(m.validate(mini).isEmpty) // no constraints → no violations
  }

  test("violations on the TPC-H graph match a direct aggregation") {
    val graph = graft.graph.GraphBuilder.tpch(spark, sfDir)
    val v = Constraints.violations(graph, uniqueness("Customer", "mktsegment"))
      .collect().map(r => r.getAs[String]("value") -> r.getAs[Long]("n")).toMap
    val direct = graph.labeled("Customer").groupBy("mktsegment").count()
      .filter(col("count") > 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == direct && v.nonEmpty)
    // ids are unique → uniqueness(id) holds for every label
    assert(Constraints.violations(graph, uniqueness("Customer", "id")).isEmpty)
  }
}
