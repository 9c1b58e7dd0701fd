package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphBuilder
import graft.cypher.{Ast, Cypher, Parser}
import Ast._

class CypherSpec extends SparkSpec {

  lazy val graph = GraphBuilder.tpch(spark, sfDir)

  test("parser: node pattern with label, props, alias and aggregates") {
    val q = Parser.parse(
      "MATCH (c:Customer {mktsegment: 'BUILDING'})-[r:PLACED]->(o:Order) " +
      "WHERE o.totalprice > 1000 RETURN c.name AS n, COUNT(*) AS cnt " +
      "ORDER BY cnt DESC SKIP 1 LIMIT 5").asInstanceOf[Query]
    val m = q.clauses.head.asInstanceOf[MatchClause]
    assert(m.pattern.start == NodePattern(Some("c"), Some("Customer"),
      List("mktsegment" -> StrLit("BUILDING"))))
    val (rel, node) = m.pattern.steps.head
    assert(rel == RelPattern(Some("r"), List("PLACED"), Direction.Out, None))
    assert(node == NodePattern(Some("o"), Some("Order"), Nil))
    assert(m.where.contains(Cmp(">", Prop("o", "totalprice"), Lit(IntLit(1000)))))
    assert(q.ret.items == List(
      RetExpr(Prop("c", "name"), Some("n")),
      RetAgg(AggFunc.Count, None, None, Some("cnt"))))
    assert(q.ret.orderBy == List(OrderItem(Ident("cnt"), ascending = false)))
    assert(q.ret.skip.contains(1) && q.ret.limit.contains(5))
  }

  test("parser: reserved words usable as variable names in expressions") {
    // BEGIN/START/… are transaction keywords, but a variable named
    // `start` (or `count`, unparenthesized) must still parse in
    // expression position — the same k.raw fallback ident() gives
    // labels/properties (ADVICE r13)
    val q = Parser.parse(
      "MATCH (start:Customer) WHERE start.nationkey = 1 " +
      "RETURN start.name AS n, start AS s").asInstanceOf[Query]
    val m = q.clauses.head.asInstanceOf[MatchClause]
    assert(m.pattern.start.variable.contains("start"))
    assert(m.where.contains(Cmp("=", Prop("start", "nationkey"), Lit(IntLit(1)))))
    assert(q.ret.items == List(
      RetExpr(Prop("start", "name"), Some("n")),
      RetExpr(Ident("start"), Some("s"))))
    // an aggregate keyword WITHOUT '(' is a plain variable reference
    val q2 = Parser.parse("MATCH (count:Order) RETURN count.orderkey AS k")
      .asInstanceOf[Query]
    assert(q2.ret.items == List(RetExpr(Prop("count", "orderkey"), Some("k"))))
    // end-to-end through the compiler
    val viaStart = Cypher.query(graph,
      "MATCH (start:Customer {nationkey: 1}) RETURN COUNT(*) AS c")
      .head.getLong(0)
    val viaC = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1}) RETURN COUNT(*) AS c")
      .head.getLong(0)
    assert(viaStart == viaC && viaC > 0)
  }

  test("parser: directions and var-length") {
    val q = Parser.parse("MATCH (a)<-[:T]-(b)--(c)-[*2..3]->(d) RETURN a.id").asInstanceOf[Query]
    val steps = q.clauses.head.asInstanceOf[MatchClause].pattern.steps
    assert(steps(0)._1.direction == Direction.In)
    assert(steps(1)._1.direction == Direction.Both)
    assert(steps(2)._1 == RelPattern(None, Nil, Direction.Out, Some((2, Some(3)))))
    val u = Parser.parse("MATCH (a)-[*]->(b) RETURN a.id").asInstanceOf[Query]
    val ustep = u.clauses.head.asInstanceOf[MatchClause].pattern.steps.head._1
    assert(ustep.varLength.contains((1, None))) // '*' = 1..unbounded (ast.rs:52-54)
  }

  test("rel-type alternation [:A|B] unions both types") {
    val both = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[:PLACED|CONTAINS]->(x) RETURN COUNT(*) AS c")
      .head.getLong(0)
    val placed = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[:PLACED]->(x) RETURN COUNT(*) AS c")
      .head.getLong(0)
    assert(both == placed) // customers have no CONTAINS edges: same count
    val parsed = Parser.parse("MATCH (a)-[:A|B|:C]->(b) RETURN a.id").asInstanceOf[Query]
    assert(parsed.clauses.head.asInstanceOf[MatchClause]
      .pattern.steps.head._1.relTypes == List("A", "B", "C"))
  }

  test("match + property filter equals direct join") {
    val viaCypher = Cypher.query(graph,
      "MATCH (c:Customer {mktsegment: 'BUILDING'})-[:PLACED]->(o:Order) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    val direct = GraphBuilder.table(spark, sfDir, "orders")
      .join(GraphBuilder.table(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey")).count()
    assert(viaCypher == direct && viaCypher > 0)
  }

  test("optional match keeps unmatched rows with nulls") {
    val df = Cypher.query(graph,
      "MATCH (r:Region) OPTIONAL MATCH (r)<-[:PLACED]-(x) RETURN r.name AS name, x.label AS xl")
    val rows = df.collect()
    assert(rows.length == graph.labeled("Region").count())
    assert(rows.forall(_.isNullAt(1))) // nothing PLACED into a region
  }

  test("undirected hop counts both directions with multiplicity") {
    val cnt = Cypher.query(graph,
      "MATCH (n:Nation {name: 'NATION_3'})-[e]-(x) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    val nid = graph.labeled("Nation").filter(col("name") === "NATION_3")
      .head.getLong(0)
    val expected = graph.edges.filter(col("src") === nid || col("dst") === nid).count()
    assert(cnt == expected && cnt > 0)
  }

  test("var-length binds one row per simple path (path-multiset semantics)") {
    // *1..1 == plain single hop with multiplicity (one row per edge)
    val h1 = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*1..1]->(x) RETURN c.id AS s, x.id AS t").count()
    val h1direct = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-->(x) RETURN c.id AS s, x.id AS t").count()
    assert(h1 == h1direct)
    // *1..2 count = edges + 2-edge walks with no node revisit, by hand
    val starts = graph.labeled("Customer")
      .filter(col("nationkey") === 1).select(col("id").as("s"))
    val e = graph.edges.select("src", "dst")
    val l1 = starts.join(e, col("s") === col("src")).select(col("s"), col("dst"))
    val l2 = l1.join(e.withColumnRenamed("src", "mid").withColumnRenamed("dst", "d2"),
        col("dst") === col("mid"))
      .filter(col("d2") =!= col("s") && col("d2") =!= col("dst"))
    val expected = l1.count() + l2.count()
    val got = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*1..2]->(x) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    assert(got == expected && got > 0)
  }

  test("var-length distinct-pairs opt-in dedups endpoints") {
    val paths = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*1..2]->(x) RETURN c.id AS s, x.id AS t")
    val pairs = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*1..2]->(x) RETURN c.id AS s, x.id AS t",
      distinctPairsVarLength = true)
    assert(pairs.count() == paths.distinct().count())
    assert(pairs.count() < paths.count()) // CONTAINS multi-edges collapse
  }

  test("unbounded * iterates to the simple-path fixpoint") {
    // deepest simple walk from a customer: c->order->part / c->nation->region,
    // so * must equal *1..3 (frontier drains at depth 3)
    val unbounded = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*]->(x) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    val bounded = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*1..3]->(x) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    assert(unbounded == bounded && unbounded > 0)
  }

  test("*m.. with minHops beyond the deepest simple path is empty, not a crash") {
    val cnt = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*6..]->(x) RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    assert(cnt == 0)
    val cnt2 = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*6..]->(x) RETURN COUNT(*) AS cnt",
      distinctPairsVarLength = true).head.getLong(0)
    assert(cnt2 == 0)
  }

  test("distinct-pairs first-visit pruning agrees between bounded and unbounded") {
    val bounded = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*2..12]->(x) RETURN c.id AS s, x.id AS t",
      distinctPairsVarLength = true)
    val unbounded = Cypher.query(graph,
      "MATCH (c:Customer {nationkey: 1})-[*2..]->(x) RETURN c.id AS s, x.id AS t",
      distinctPairsVarLength = true)
    assert(bounded.except(unbounded).isEmpty && unbounded.except(bounded).isEmpty)
  }

  test("WITH pipeline with aggregate + HAVING-style WHERE") {
    val df = Cypher.query(graph,
      "MATCH (c:Customer)-[:PLACED]->(o:Order) " +
      "WITH c.nationkey AS nk, COUNT(*) AS cnt WHERE cnt > 50 RETURN nk, cnt")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 50))
    assert(rows.length < 25) // threshold actually filtered something
  }

  test("UNION distinct vs UNION ALL") {
    val all = Cypher.query(graph,
      "MATCH (r:Region) RETURN r.label AS l UNION ALL MATCH (n:Region) RETURN n.label AS l")
    val dist = Cypher.query(graph,
      "MATCH (r:Region) RETURN r.label AS l UNION MATCH (n:Region) RETURN n.label AS l")
    assert(all.count() == 10 && dist.count() == 1)
  }

  test("IS NULL / EXISTS / IN / regex / NOT") {
    assert(Cypher.query(graph,
      "MATCH (n) WHERE n.psize IS NOT NULL RETURN COUNT(*) AS c").head.getLong(0)
      == graph.labeled("Part").count())
    assert(Cypher.query(graph,
      "MATCH (n) WHERE EXISTS(n.mktsegment) RETURN COUNT(*) AS c").head.getLong(0)
      == graph.labeled("Customer").count())
    assert(Cypher.query(graph,
      "MATCH (n:Nation) WHERE n.name IN ['NATION_3', 'NO_SUCH'] RETURN COUNT(*) AS c")
      .head.getLong(0) == 1)
    assert(Cypher.query(graph,
      "MATCH (n:Nation) WHERE n.name =~ 'NATION_1' RETURN COUNT(*) AS c")
      .head.getLong(0) == 11)
    assert(Cypher.query(graph,
      "MATCH (n:Nation) WHERE NOT n.name = 'NATION_3' RETURN COUNT(*) AS c")
      .head.getLong(0) == 24)
  }

  test("aggregates: min/max/avg/stdev/percentile/collect") {
    val row = Cypher.query(graph,
      "MATCH (c:Customer) RETURN MIN(c.acctbal) AS mn, MAX(c.acctbal) AS mx, " +
      "AVG(c.acctbal) AS av, STDEV(c.acctbal) AS sd, " +
      "PERCENTILECONT(c.acctbal, 0.5) AS p50, COUNT(DISTINCT c.mktsegment) AS segs").head
    assert(row.getDouble(0) < row.getDouble(1))
    assert(row.getDouble(3) > 0)
    assert(row.getDouble(4) >= row.getDouble(0) && row.getDouble(4) <= row.getDouble(1))
    assert(row.getLong(5) == 5)
    val coll = Cypher.query(graph,
      "MATCH (r:Region) RETURN COLLECT(r.name) AS names").head.getSeq[String](0)
    assert(coll.toSet.size == 5)
  }

  test("ORDER BY hidden (non-returned) column") {
    val names = Cypher.query(graph,
      "MATCH (sp:Supplier) RETURN sp.name AS name ORDER BY sp.acctbal DESC LIMIT 3")
      .collect().map(_.getString(0))
    val direct = graph.labeled("Supplier")
      .orderBy(col("acctbal").desc).limit(3).select("name")
      .collect().map(_.getString(0))
    assert(names.sameElements(direct))
  }

  test("explicit GROUP BY + ORDER BY aggregate (reference SQL-ism extension)") {
    // mirrors cypher_aggregation_execution_test.rs:227
    val rows = Cypher.query(graph,
      "MATCH (c:Customer) RETURN c.mktsegment, COUNT(*) " +
      "GROUP BY c.mktsegment ORDER BY COUNT(*) DESC LIMIT 3").collect()
    assert(rows.length == 3)
    assert(rows.sliding(2).forall(p => p(0).getLong(1) >= p(1).getLong(1)))
    val direct = graph.labeled("Customer").groupBy("mktsegment").count()
      .orderBy(col("count").desc).limit(3).collect().map(_.getLong(1))
    assert(rows.map(_.getLong(1)).sameElements(direct))
    // GROUP BY of something not returned is rejected
    assertThrows[IllegalArgumentException](Cypher.query(graph,
      "MATCH (c:Customer) RETURN COUNT(*) GROUP BY c.name"))
  }

  test("CALL subquery: uncorrelated, empty, and LIMIT forms") {
    // mirrors tests/call_subquery_test.rs basic / empty / limit cases
    assert(Cypher.query(graph,
      "CALL { MATCH (n:Nation) WHERE n.name =~ 'NATION_1' RETURN n.name AS name } RETURN name")
      .count() == 11)
    assert(Cypher.query(graph,
      "CALL { MATCH (n:Nation) WHERE n.name = 'NO_SUCH' RETURN n.name AS name } RETURN name")
      .isEmpty)
    assert(Cypher.query(graph,
      "CALL { MATCH (p:Part) RETURN p LIMIT 2 } RETURN p").count() == 2)
  }

  test("CALL subquery feeding an outer aggregate") {
    val c = Cypher.query(graph,
      "CALL { MATCH (p:Part) WHERE p.psize > 45 RETURN p } RETURN COUNT(*) AS cnt")
      .head.getLong(0)
    assert(c == graph.labeled("Part").filter(col("psize") > 45).count() && c > 0)
  }

  test("CALL subquery with a literal WITH import (call_enhanced shape)") {
    // the reference marks this SKIPPED in its own tests — works here
    val cnt = Cypher.query(graph,
      "CALL { WITH 45 AS min_size MATCH (p:Part) WHERE p.psize > min_size " +
      "RETURN p.name AS name } RETURN COUNT(*) AS cnt").head.getLong(0)
    assert(cnt == graph.labeled("Part").filter(col("psize") > 45).count() && cnt > 0)
  }

  test("CALL … IN (vars) correlates the subquery on the outer binding") {
    val rows = Cypher.query(graph,
      "MATCH (r:Region) " +
      "CALL { MATCH (n:Nation)-[:IN_REGION]->(r) RETURN r, COUNT(*) AS nations } IN (r) " +
      "RETURN r.name AS rname, nations").collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) == 5L))
  }

  test("aggregating CALL with an extra grouping key inner-joins — no fabricated rows") {
    // The inner query groups by (r, nname): several/zero rows per outer
    // row, so the left-outer COUNT→0 fill would fabricate a
    // (nname=NULL, cnt=0) row per unmatched region — neither SQL nor
    // openCypher grouping semantics produces one (ADVICE r4).
    val rows = Cypher.query(graph,
      "MATCH (r:Region) " +
      "CALL { MATCH (n:Nation)-[:IN_REGION]->(r) WHERE n.name = 'NATION_1' " +
      "RETURN r, n.name AS nname, COUNT(*) AS cnt } IN (r) " +
      "RETURN r.name AS rname, nname, cnt").collect()
    assert(rows.length == 1 && rows(0).getString(1) == "NATION_1" &&
      rows(0).getLong(2) == 1L)
    // the pure-aggregate form still preserves every outer row
    val all = Cypher.query(graph,
      "MATCH (r:Region) " +
      "CALL { MATCH (n:Nation)-[:IN_REGION]->(r) WHERE n.name = 'NATION_1' " +
      "RETURN r, COUNT(*) AS cnt } IN (r) " +
      "RETURN r.name AS rname, cnt").collect()
    assert(all.length == 5 && all.map(_.getLong(1)).sum == 1L)
  }

  test("rel variable property access") {
    val row = Cypher.query(graph,
      "MATCH (o:Order)-[l:CONTAINS]->(p:Part) RETURN SUM(l.quantity) AS q").head
    val direct = GraphBuilder.table(spark, sfDir, "lineitem")
      .agg(sum(col("l_quantity"))).head.getDouble(0)
    assert(math.abs(row.getDouble(0) - direct) < 1e-6)
  }

  test("cypher pager: cursor walk mirrors the reference streaming contract") {
    // QueryCursor::with_query over a Cypher MATCH — 25 nations at
    // pageSize 10 is exactly streaming_query_test.rs's
    // test_pagination_with_small_page_size shape (3 pages: 10/10/5)
    val pager = Cypher.pager(graph,
      "MATCH (n:Nation) RETURN n.id AS id, n.name AS name",
      orderKeys = Seq("id"), pageSize = 10)
    assert(pager.total == 25 && pager.totalPages == 3)
    assert(pager.progress == 0.0)
    var seen = Vector.empty[Long]
    var pages = 0
    while (pager.hasMore) {
      val p = pager.nextPage()
      val ids = p.data.collect().map(_.getAs[Long]("id"))
      assert(p.isFirstPage == (p.page == 0) && p.isLastPage == (p.page == 2))
      assert(ids.length == (if (p.page == 2) 5 else 10))
      seen ++= ids
      pages += 1
    }
    assert(pages == 3 && !pager.hasMore && pager.progress == 1.0)
    // one deterministic total order, no row lost or repeated
    assert(seen == seen.sorted && seen.distinct.length == 25)
    // out-of-range random access behaves like the reference's page 4
    assert(pager.page(3).data.count() == 0L && !pager.page(3).hasMore)
    pager.close()
  }

  // ---- list-valued properties (values/value.rs:11 Value::List) ----

  test("parser: x IN v.prop parses to InProp, x IN [list] stays In") {
    val q = Parser.parse(
      "MATCH (o:Order) WHERE 42 IN o.partkeys RETURN o.id AS id")
      .asInstanceOf[Query]
    assert(q.clauses.head.asInstanceOf[MatchClause].where
      .contains(InProp(Lit(IntLit(42)), Prop("o", "partkeys"))))
    val lit = Parser.parse(
      "MATCH (n:Nation) WHERE n.name IN ['A', 'B'] RETURN n.id AS id")
      .asInstanceOf[Query]
    assert(lit.clauses.head.asInstanceOf[MatchClause].where.exists(_.isInstanceOf[In]))
  }

  test("IN over the partkeys list property matches the CONTAINS edges") {
    // every order whose list contains part P is exactly every order
    // with a CONTAINS edge to P — the list column is derived from the
    // same lineitem rows
    val pid = GraphBuilder.PartTag * GraphBuilder.TAG + 42L
    val viaList = Cypher.query(graph,
      s"MATCH (o:Order) WHERE $pid IN o.partkeys RETURN o.id AS id")
      .collect().map(_.getLong(0)).sorted
    val viaEdges = graph.edges
      .filter(col("rel_type") === "CONTAINS" && col("dst") === pid)
      .select("src").distinct().collect().map(_.getLong(0)).sorted
    assert(viaList.nonEmpty && viaList.sameElements(viaEdges))
    // non-Order nodes carry a NULL list: membership is never satisfied
    val nonOrder = Cypher.query(graph,
      s"MATCH (c:Customer) WHERE $pid IN c.partkeys RETURN c.id AS id")
    assert(nonOrder.count() == 0L)
  }
}
