package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Schema constraints (reference: src/constraints/mod.rs —
  * ConstraintManager holding uniqueness/existence constraints per
  * (label, property), validated node by node against the store;
  * tests/constraints_test.rs).
  *
  * Re-expressed set-oriented: one aggregation scan validates an entire
  * label and returns the *violating groups/rows* as a DataFrame (empty ⇔
  * valid), instead of a per-node verdict — on an immutable graph the
  * enforcement point is "validate after mutation", and a single
  * hash-aggregate over the label is the scalable form of the reference's
  * per-node index probe. */
object Constraints {

  sealed trait ConstraintType { def name: String }
  case object Uniqueness extends ConstraintType { val name = "uniqueness" }
  case object Existence extends ConstraintType { val name = "existence" }

  /** (type, label, property) — `key` matches the reference's identity
    * (constraints/mod.rs:52). */
  final case class Constraint(ctype: ConstraintType, label: String, property: String) {
    def key: String = s"${ctype.name}:$label:$property"
  }
  def uniqueness(label: String, property: String): Constraint =
    Constraint(Uniqueness, label, property)
  def existence(label: String, property: String): Constraint =
    Constraint(Existence, label, property)

  /** Violations of one constraint: (label, property, kind, value, n).
    * Uniqueness → one row per duplicated value (n = group size > 1);
    * existence → one row (value null, n = number of null-property
    * nodes). Empty result ⇔ the constraint holds. */
  def violations(graph: PropertyGraph, c: Constraint): DataFrame = {
    val nodes = graph.labeled(c.label)
    val head = Seq(lit(c.label).as("label"), lit(c.property).as("property"),
      lit(c.ctype.name).as("kind"))
    c.ctype match {
      case Uniqueness =>
        nodes.filter(col(c.property).isNotNull)
          .groupBy(col(c.property).cast("string").as("value"))
          .agg(count(lit(1)).cast("bigint").as("n"))
          .filter(col("n") > 1)
          .select(head :+ col("value") :+ col("n"): _*)
      case Existence =>
        nodes.filter(col(c.property).isNull)
          .agg(count(lit(1)).cast("bigint").as("n"))
          .filter(col("n") > 0)
          .select(head :+ lit(null).cast("string").as("value") :+ col("n"): _*)
    }
  }

  /** Registry with the reference ConstraintManager's surface:
    * add (duplicate key rejected), drop, enumerate, validate. */
  final class ConstraintManager {
    private val cs = TrieMap.empty[String, Constraint]

    def addConstraint(c: Constraint): Unit = {
      require(cs.putIfAbsent(c.key, c).isEmpty,
        s"constraint already exists: ${c.key}")
    }
    def dropConstraint(label: String, property: String,
                       ctype: ConstraintType): Boolean =
      cs.remove(Constraint(ctype, label, property).key).isDefined
    def all: Seq[Constraint] = cs.values.toSeq.sortBy(_.key)
    def forLabel(label: String): Seq[Constraint] = all.filter(_.label == label)
    def count: Int = cs.size

    /** Violations of every registered constraint in one frame. */
    def validate(graph: PropertyGraph): DataFrame =
      all.map(violations(graph, _)).reduceOption(_ unionByName _)
        .getOrElse(graph.nodes.sparkSession.range(0)
          .select(lit("").as("label"), lit("").as("property"),
            lit("").as("kind"), lit("").as("value"), lit(0L).as("n")))

    def isValid(graph: PropertyGraph): Boolean =
      all.forall(c => violations(graph, c).isEmpty)
  }
}
