package graft.ops

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chained/functional query API — the Spark re-expression of the
  * reference's `Query` builder (reference: src/query.rs).
  *
  * Everything stays a lazy DataFrame plan: label/property predicates are
  * pushed into the parquet scan by Catalyst, traversal hops are
  * hash-joins against the src-partitioned edge table, and aggregates are
  * partial-aggregated map-side. Nothing collects to the driver.
  *
  * Traversal multiplicity matches the reference: `out()` yields one row
  * per edge followed (multi-edges produce duplicates) until `distinct()`
  * (reference src/query.rs:130,357).
  */
final class GraphQuery private (
    val graph: PropertyGraph,
    private val current: DataFrame, // always has "id"; props iff hasProps
    private val hasProps: Boolean) {

  private def withProps: DataFrame =
    if (hasProps) current
    else current.join(graph.nodes, Seq("id"), "inner")

  private def next(df: DataFrame, props: Boolean) =
    new GraphQuery(graph, df, props)

  // ---- filters (reference src/query.rs:82-128) ----
  def wherePropEq(key: String, expected: String): GraphQuery =
    next(withProps.filter(col(key) === expected), props = true)

  def wherePropIntEq(key: String, expected: Long): GraphQuery =
    next(withProps.filter(col(key) === expected), props = true)

  def wherePropIntGt(key: String, min: Long): GraphQuery =
    next(withProps.filter(col(key) > min), props = true)

  // range-index lookups (reference src/index_advanced.rs:330-470 —
  // greater_or_equal / less_than / less_or_equal / range); each is a
  // plain comparison Catalyst pushes into the parquet scan exactly
  // like wherePropIntGt
  def wherePropIntGe(key: String, min: Long): GraphQuery =
    next(withProps.filter(col(key) >= min), props = true)

  def wherePropIntLt(key: String, max: Long): GraphQuery =
    next(withProps.filter(col(key) < max), props = true)

  def wherePropIntLe(key: String, max: Long): GraphQuery =
    next(withProps.filter(col(key) <= max), props = true)

  /** Inclusive [lo, hi] range lookup (index_advanced.rs:470 `range`). */
  def wherePropIntBetween(key: String, lo: Long, hi: Long): GraphQuery =
    next(withProps.filter(col(key) >= lo && col(key) <= hi), props = true)

  def where(cond: Column): GraphQuery =
    next(withProps.filter(cond), props = true)

  // ---- traversal (reference src/query.rs:130-355) ----
  private def hop(relTypes: Seq[String], reverse: Boolean): DataFrame = {
    val e0 = if (relTypes.isEmpty) graph.edges
             else graph.edges.filter(col("rel_type").isin(relTypes: _*))
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    current.select(col("id"))
      .join(e0, col("id") === col(from), "inner")
      .select(col(to).as("id"))
  }

  def out(relTypes: String*): GraphQuery =
    next(hop(relTypes, reverse = false), props = false)

  def in(relTypes: String*): GraphQuery =
    next(hop(relTypes, reverse = true), props = false)

  /** Nodes reachable via 'relTypes paths of length in [minHops, maxHops],
    * as a distinct node set per hop-depth union (reference
    * src/query.rs:171 out_variable_length). Bounded iteration — each hop
    * is one hash-join on the src-partitioned edges. */
  def outVariableLength(minHops: Int, maxHops: Int, relTypes: String*): GraphQuery =
    varLength(minHops, maxHops, relTypes, Hop.Out)

  def inVariableLength(minHops: Int, maxHops: Int, relTypes: String*): GraphQuery =
    varLength(minHops, maxHops, relTypes, Hop.In)

  def undirectedVariableLength(minHops: Int, maxHops: Int, relTypes: String*): GraphQuery =
    varLength(minHops, maxHops, relTypes, Hop.Undirected)

  private object Hop extends Enumeration { val Out, In, Undirected = Value }

  private def varLength(minHops: Int, maxHops: Int, relTypes: Seq[String],
                        dir: Hop.Value): GraphQuery = {
    require(minHops >= 0 && maxHops >= minHops, "bad hop bounds")
    val base = dir match {
      case Hop.Undirected => graph.undirectedEdges
      case _              => graph.edges
    }
    val e = (if (relTypes.isEmpty) base
             else base.filter(col("rel_type").isin(relTypes: _*)))
      .select(col("src"), col("dst"))
    val reverse = dir == Hop.In
    var frontier = current.select("id").distinct()
    var acc: Option[DataFrame] = if (minHops == 0) Some(frontier) else None
    for (depth <- 1 to maxHops) {
      val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
      frontier = frontier
        .join(e, col("id") === col(from), "inner")
        .select(col(to).as("id")).distinct()
      if (depth >= minHops)
        acc = Some(acc.fold(frontier)(_ unionByName frontier))
    }
    next(acc.get.distinct(), props = false)
  }

  // ---- shaping (reference src/query.rs:357-469) ----
  def distinct(): GraphQuery = next(current.select("id").distinct(), props = false)

  /** Deterministic total order: requested key, then id tiebreak. */
  def orderBy(key: String, ascending: Boolean): GraphQuery = {
    val k = if (ascending) col(key).asc_nulls_last else col(key).desc_nulls_last
    next(withProps.orderBy(k, col("id").asc), props = true)
  }

  def skip(n: Int): GraphQuery = next(withProps.offset(n), props = true)
  def limit(n: Int): GraphQuery = next(withProps.limit(n), props = true)
  def paginate(offset: Int, limitCount: Int): GraphQuery =
    next(withProps.offset(offset).limit(limitCount), props = true)

  /** Pin the current result in the session cache — the analogue of the
    * reference's cached query paths (src/query.rs:34 new_cached, :654
    * collect_nodes_cached, :685 count_cached). */
  def cached(): GraphQuery = next(withProps.persist(), props = true)

  // ---- terminals (reference src/query.rs:471-652) ----
  /** Node rows, stable column order. */
  def collectNodes(cols: String*): DataFrame = {
    val selected = if (cols.isEmpty) Seq("id", "label", "name") else cols
    withProps.select(selected.map(col): _*)
  }

  def df: DataFrame = withProps

  def count(): DataFrame =
    current.agg(count_if(lit(true)).cast("bigint").as("cnt"))

  def sumInt(key: String): DataFrame =
    withProps.agg(coalesce(sum(col(key).cast("bigint")), lit(0L)).as("sum_val"))

  def avgInt(key: String): DataFrame =
    withProps.agg(round(avg(col(key).cast("double")), 6).as("avg_val"))

  def sumDouble(key: String): DataFrame =
    withProps.agg(round(sum(col(key)), 4).as("sum_val"))

  /** Linear-interpolation percentile (reference src/query.rs:534). */
  def percentileCont(key: String, p: Double): DataFrame =
    withProps.agg(round(percentile(col(key).cast("double"), lit(p)), 6)
      .as("percentile_val"))

  /** SAMPLE stdev/variance — the reference query builder divides by n-1
    * (src/query.rs:586,623) and returns None for n<2; stddev_samp/var_samp
    * likewise yield NULL on singleton input. (The reference's *Cypher*
    * STDEV is population — see cypher.Compiler.) */
  def stdev(key: String): DataFrame =
    withProps.agg(round(stddev_samp(col(key).cast("double")), 6).as("stdev_val"))

  def variance(key: String): DataFrame =
    withProps.agg(round(var_samp(col(key).cast("double")), 6).as("variance_val"))
}

object GraphQuery {
  /** Label scan entry point (reference src/query.rs:43 from_label).
    * Catalyst pushes the label predicate into the node scan. */
  def fromLabel(graph: PropertyGraph, label: String): GraphQuery =
    new GraphQuery(graph, graph.labeled(label), hasProps = true)

  /** Point-lookup entry (reference src/query.rs:60) — same plan shape as
    * fromLabel + filter; the "index" is parquet predicate pushdown. */
  def fromLabelAndPropEq(graph: PropertyGraph, label: String, key: String,
                         expected: String): GraphQuery =
    fromLabel(graph, label).wherePropEq(key, expected)

  def fromLabelAndPropIntEq(graph: PropertyGraph, label: String, key: String,
                            expected: Long): GraphQuery =
    fromLabel(graph, label).wherePropIntEq(key, expected)

  def all(graph: PropertyGraph): GraphQuery =
    new GraphQuery(graph, graph.nodes, hasProps = true)

  /** Start from an arbitrary id set (algorithm entry points). */
  def fromIds(graph: PropertyGraph, ids: DataFrame): GraphQuery =
    new GraphQuery(graph, ids.select("id"), hasProps = false)
}
