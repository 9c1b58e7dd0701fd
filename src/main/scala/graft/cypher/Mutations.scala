package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Ast._

/** Cypher mutation statements compiled to DataFrame edits of the node/edge
  * tables (reference: src/cypher/ast.rs:150-199 + executor.rs mutation
  * paths; the reference mutates its store in place — here each statement
  * returns a new immutable PropertyGraph, the Spark-native equivalent of
  * an append/overwrite of the backing table).
  *
  * CREATE/MERGE node patterns must carry a label and an explicit `id`
  * property (id allocation is the caller's concern in a distributed
  * setting — a sequence scan for max-id would be a full-table bottleneck).
  */
object Mutations {

  def apply(graph: PropertyGraph, cypher: String): PropertyGraph =
    mutate(graph, Parser.parse(cypher))

  def mutate(graph: PropertyGraph, stmt: Statement): PropertyGraph = stmt match {
    case Create(pat)        => create(graph, pat)
    case Merge(pat)         => merge(graph, pat)
    case SetStmt(m, as)     => setProps(graph, m, as)
    case DeleteStmt(m, vs)  => delete(graph, m, vs)
    case _ =>
      throw new IllegalArgumentException("not a mutation statement — use Cypher.query")
  }

  private def litCol(l: Literal): Column = lit(l.value)

  /** One node row conforming to the nodes schema, props → columns. */
  private def nodeRow(graph: PropertyGraph, np: NodePattern): DataFrame = {
    val label = np.label.getOrElse(
      throw new IllegalArgumentException("CREATE node needs a label"))
    val props = np.props.toMap
    require(props.contains("id"), "CREATE node needs an explicit id property")
    val cols = graph.nodes.schema.fields.map { f =>
      val c = f.name match {
        case "label" => lit(label)
        case n if props.contains(n) => litCol(props(n))
        case _ => lit(null)
      }
      c.cast(f.dataType).as(f.name)
    }
    graph.nodes.sparkSession.range(1).select(cols.toIndexedSeq: _*)
  }

  private def edgeRow(graph: PropertyGraph, src: Long, dst: Long, rel: RelPattern): DataFrame = {
    val relType = rel.relTypes.headOption.getOrElse(
      throw new IllegalArgumentException("CREATE relationship needs a type"))
    val cols = graph.edges.schema.fields.map { f =>
      val c = f.name match {
        case "src"      => lit(src)
        case "dst"      => lit(dst)
        case "rel_type" => lit(relType)
        case "weight"   => lit(1.0)
        case _          => lit(null)
      }
      c.cast(f.dataType).as(f.name)
    }
    graph.edges.sparkSession.range(1).select(cols.toIndexedSeq: _*)
  }

  private def nodeId(np: NodePattern): Long = np.props.toMap.get("id") match {
    case Some(IntLit(v)) => v
    case _ => throw new IllegalArgumentException("node in pattern needs literal id")
  }

  private def create(graph: PropertyGraph, pat: Pattern): PropertyGraph = {
    val nodePats = pat.start :: pat.steps.map(_._2)
    val newNodes = nodePats.filter(_.label.isDefined).map(nodeRow(graph, _))
    val nodes = (graph.nodes :: newNodes).reduce(_ unionByName _)
    val chain = pat.start :: pat.steps.map(_._2)
    val newEdges = pat.steps.zipWithIndex.map { case ((rel, _), i) =>
      val (s, d) = (nodeId(chain(i)), nodeId(chain(i + 1)))
      rel.direction match {
        case Direction.In => edgeRow(graph, d, s, rel)
        case _            => edgeRow(graph, s, d, rel)
      }
    }
    val edges = (graph.edges :: newEdges).reduce(_ unionByName _)
    PropertyGraph(nodes, edges)
  }

  /** MERGE: create the pattern only when no match exists (executor.rs
    * merge path; ON CREATE/ON MATCH property hooks not supported). */
  private def merge(graph: PropertyGraph, pat: Pattern): PropertyGraph = {
    val exists = !new Compiler(graph).patternCtx(pat).df.isEmpty
    if (exists) graph else create(graph, pat)
  }

  private def setProps(graph: PropertyGraph, m: MatchClause,
                       assigns: List[(String, String, Literal)]): PropertyGraph = {
    val ctx = new Compiler(graph).patternFiltered(m)
    var nodes = graph.nodes
    assigns.groupBy(_._1).foreach { case (v, as) =>
      require(ctx.df.columns.contains(v), s"SET variable '$v' not bound")
      val ids = ctx.df.select(col(v).as("id")).distinct()
        .withColumn("_upd", lit(true))
      var df = nodes.join(ids, Seq("id"), "left_outer")
      as.foreach { case (_, p, value) =>
        df = df.withColumn(p,
          when(col("_upd"), litCol(value).cast(nodes.schema(p).dataType))
            .otherwise(col(p)))
      }
      nodes = df.drop("_upd")
    }
    PropertyGraph(nodes, graph.edges)
  }

  /** DELETE v: removes matched nodes and their incident edges (the
    * reference's DETACH-style delete, executor.rs delete path). */
  private def delete(graph: PropertyGraph, m: MatchClause,
                     vars: List[String]): PropertyGraph = {
    val ctx = new Compiler(graph).patternFiltered(m)
    val ids = vars.map { v =>
      require(ctx.df.columns.contains(v), s"DELETE variable '$v' not bound")
      ctx.df.select(col(v).as("id"))
    }.reduce(_ unionByName _).distinct()
    val nodes = graph.nodes.join(ids, Seq("id"), "left_anti")
    val edges = graph.edges
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .select(graph.edges.columns.map(col).toIndexedSeq: _*)
    PropertyGraph(nodes, edges)
  }
}
