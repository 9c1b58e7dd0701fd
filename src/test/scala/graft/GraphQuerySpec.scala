package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphBuilder
import graft.ops.GraphQuery

class GraphQuerySpec extends SparkSpec {

  lazy val graph = GraphBuilder.tpch(spark, sfDir)

  test("graph construction: node counts per label match source tables") {
    val counts = graph.nodes.groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = Map(
      "Region" -> GraphBuilder.table(spark, sfDir, "region").count(),
      "Nation" -> GraphBuilder.table(spark, sfDir, "nation").count(),
      "Customer" -> GraphBuilder.table(spark, sfDir, "customer").count(),
      "Supplier" -> GraphBuilder.table(spark, sfDir, "supplier").count(),
      "Part" -> GraphBuilder.table(spark, sfDir, "part").count(),
      "Order" -> GraphBuilder.table(spark, sfDir, "orders").count())
    assert(counts == raw)
  }

  test("edges: CONTAINS has one edge per lineitem (multi-edge preserved)") {
    val li = GraphBuilder.table(spark, sfDir, "lineitem").count()
    assert(graph.outEdges("CONTAINS").count() == li)
  }

  test("node id spaces do not collide") {
    assert(graph.nodes.groupBy("id").count().filter(col("count") > 1).isEmpty)
  }

  test("out traversal matches a direct join") {
    val viaApi = GraphQuery.fromLabelAndPropIntEq(graph, "Customer", "nationkey", 3L)
      .out("PLACED").count().collect()(0).getLong(0)
    val direct = GraphBuilder.table(spark, sfDir, "orders").as("o")
      .join(GraphBuilder.table(spark, sfDir, "customer")
        .filter(col("c_nationkey") === 3), col("o_custkey") === col("c_custkey"))
      .count()
    assert(viaApi == direct && viaApi > 0)
  }

  test("in traversal reverses out") {
    val nOut = GraphQuery.fromLabel(graph, "Customer").out("PLACED")
      .count().collect()(0).getLong(0)
    val nIn = GraphQuery.fromLabel(graph, "Order").in("PLACED")
      .count().collect()(0).getLong(0)
    assert(nOut == nIn)
  }

  test("variable-length [1..2] = 1-hop ∪ 2-hop distinct sets") {
    val q = GraphQuery.fromLabelAndPropIntEq(graph, "Customer", "nationkey", 1L)
    val vl = q.outVariableLength(1, 2, "PLACED", "CONTAINS").df
      .select("id").distinct().count()
    val h1 = q.out("PLACED", "CONTAINS").distinct().df.select("id")
    val h2 = q.out("PLACED", "CONTAINS").out("PLACED", "CONTAINS").distinct()
      .df.select("id")
    assert(vl == h1.union(h2).distinct().count())
  }

  test("order/skip/limit deterministic") {
    val rows = GraphQuery.fromLabel(graph, "Customer")
      .orderBy("acctbal", ascending = false).skip(5).limit(10)
      .collectNodes("id", "acctbal").collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getDouble(1))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("aggregates: count/sum/avg/percentile/stdev") {
    val cnt = GraphQuery.fromLabel(graph, "Customer").count()
      .collect()(0).getLong(0)
    assert(cnt > 0)
    val med = GraphQuery.fromLabel(graph, "Customer")
      .percentileCont("acctbal", 0.5).collect()(0).getDouble(0)
    assert(!med.isNaN)
    val sd = GraphQuery.fromLabel(graph, "Customer").stdev("acctbal")
      .collect()(0).getDouble(0)
    assert(sd > 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).collect().length > 0)
  }

  test("every query name has either an oracle or is known rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("cached() pins the stage and preserves results") {
    val q = GraphQuery.fromLabel(graph, "Supplier").wherePropIntGt("nationkey", 10L)
    val plain = q.count().head.getLong(0)
    val viaCache = q.cached()
    assert(viaCache.count().head.getLong(0) == plain)
    assert(viaCache.df.storageLevel.useMemory)
    viaCache.df.unpersist()
  }

  test("save/load round-trips the graph through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    GraphBuilder.save(graph, dir)
    val loaded = GraphBuilder.load(spark, dir)
    assert(loaded.nodes.count() == graph.nodes.count())
    assert(loaded.edges.count() == graph.edges.count())
    // parquet reads come back nullable — compare names + types only
    assert(loaded.nodes.schema.map(f => (f.name, f.dataType)) ==
           graph.nodes.schema.map(f => (f.name, f.dataType)))
    val a = GraphQuery.fromLabel(loaded, "Customer").count().head.getLong(0)
    val b = GraphQuery.fromLabel(graph, "Customer").count().head.getLong(0)
    assert(a == b)
  }

  test("label-scan plan pushes the filter into the node view, not post-join") {
    val plan = GraphQuery.fromLabel(graph, "Customer")
      .collectNodes("id", "name").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("QueryPager: page-walk mirrors the reference streaming query contract") {
    // mirrors tests/streaming_query_test.rs: 25 nations, page size 10 →
    // pages of 10/10/5, has_more/is_first/is_last/total_pages/progress
    val pager = new graft.ops.QueryPager(
      GraphQuery.fromLabel(graph, "Nation"), "name", 10)
    assert(pager.total == 25 && pager.totalPages == 3)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var pages = 0
    while (pager.hasMore) {
      val p = pager.nextPage()
      pages += 1
      assert(p.page == pages - 1 && p.pageSize == 10 && p.total == 25)
      assert(p.isFirstPage == (pages == 1) && p.isLastPage == (pages == 3))
      val rows = p.data.collect().map(_.getAs[Long]("id"))
      assert(rows.length == (if (pages < 3) 10 else 5))
      assert(p.hasMore == (pages < 3))
      seen ++= rows
    }
    assert(pages == 3 && !pager.hasMore && pager.progress == 1.0)
    assert(seen.distinct.size == 25, "pages must be disjoint and exhaustive")
    // random access past the end: empty page, not an error (page4 case)
    val p4 = pager.page(3)
    assert(p4.data.isEmpty && !p4.hasMore && !p4.isLastPage)
    // deterministic re-fetch: the same page slices the same cached order
    assert(pager.page(1).data.collect().map(_.getAs[Long]("id")).toSeq ==
      seen.slice(10, 20).toSeq)
    pager.close()
  }
}
