package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.cypher.{Ast, Parser, Transactions}
import graft.cypher.Transactions._

/** BEGIN/COMMIT/ROLLBACK statements — parse variants mirrored from
  * tests/cypher_transaction_test.rs, lifecycle semantics from
  * executor.rs:1685-1722 re-expressed over immutable frames (BEGIN =
  * free snapshot, COMMIT publishes the staged graph, ROLLBACK drops
  * it; no DuckDB oracle — the oracle side has no transactions). */
class CypherTransactionSpec extends SparkSpec {

  private def mini: PropertyGraph = {
    val implicits = spark.implicits
    import implicits._
    PropertyGraph(
      Seq((1L, "Person", "A"), (2L, "Person", "B")).toDF("id", "label", "name"),
      Seq((1L, 2L, "KNOWS", 1.0)).toDF("src", "dst", "rel_type", "weight"))
  }

  // ---- parse variants (cypher_transaction_test.rs:11-92) ----

  test("parse BEGIN variants") {
    for (q <- Seq("BEGIN", "BEGIN TRANSACTION", "BEGIN;", "BEGIN TRANSACTION;",
        "begin", "begin transaction", "START", "START TRANSACTION",
        "start transaction"))
      assert(Parser.parse(q) == Ast.BeginTx, s"for: $q")
  }

  test("parse COMMIT variants") {
    for (q <- Seq("COMMIT", "COMMIT TRANSACTION", "COMMIT;",
        "COMMIT TRANSACTION;", "commit", "commit transaction"))
      assert(Parser.parse(q) == Ast.CommitTx, s"for: $q")
  }

  test("parse ROLLBACK variants") {
    for (q <- Seq("ROLLBACK", "ROLLBACK TRANSACTION", "ROLLBACK;",
        "ROLLBACK TRANSACTION;", "rollback", "rollback transaction"))
      assert(Parser.parse(q) == Ast.RollbackTx, s"for: $q")
  }

  test("parse tolerates surrounding whitespace") {
    for (q <- Seq("  BEGIN  ", "  COMMIT  ", "  ROLLBACK  ",
        "\nBEGIN\n", "\tCOMMIT\t", "\n\nROLLBACK\n\n"))
      assert(Parser.parse(q).isInstanceOf[Ast.Statement], s"for: $q")
  }

  // ---- lifecycle (cypher_transaction_test.rs:96-190) ----

  test("BEGIN starts a transaction") {
    val s = new TxSession(mini)
    assert(s.activeTransactionCount == 0)
    assert(s.execute("BEGIN") == TransactionStarted)
    assert(s.activeTransactionCount == 1)
  }

  test("COMMIT publishes staged mutations") {
    val s = new TxSession(mini)
    s.execute("BEGIN")
    s.execute("CREATE (p:Person {id: 100, name: 'X'})")
    // staged: session sees 3 nodes, committed readers still see 2
    assert(s.graph.nodes.count() == 3)
    assert(s.committedGraph.nodes.count() == 2)
    assert(s.execute("COMMIT") == TransactionCommitted)
    assert(s.activeTransactionCount == 0)
    assert(s.completedTransactionCount == 1)
    assert(s.committedGraph.nodes.count() == 3)
  }

  test("ROLLBACK discards staged mutations") {
    val s = new TxSession(mini)
    s.execute("BEGIN")
    s.execute("CREATE (p:Person {id: 100, name: 'X'})")
    s.execute("MATCH (p:Person {id: 1}) SET p.name = 'AA'")
    assert(s.graph.nodes.count() == 3)
    assert(s.execute("ROLLBACK") == TransactionRolledBack)
    assert(s.activeTransactionCount == 0)
    assert(s.completedTransactionCount == 1)
    assert(s.graph.nodes.count() == 2)
    assert(s.graph.nodes.filter(col("id") === 1).head.getString(2) == "A")
  }

  test("COMMIT without active transaction errors") {
    val s = new TxSession(mini)
    val e = intercept[NoActiveTransactionException](s.execute("COMMIT"))
    assert(e.getMessage.contains("No active transaction"))
  }

  test("ROLLBACK without active transaction errors") {
    val s = new TxSession(mini)
    val e = intercept[NoActiveTransactionException](s.execute("ROLLBACK"))
    assert(e.getMessage.contains("No active transaction"))
  }

  test("auto-commit outside a transaction") {
    val s = new TxSession(mini)
    s.execute("CREATE (p:Person {id: 100, name: 'X'})")
    assert(s.committedGraph.nodes.count() == 3)
  }

  test("nested BEGIN: inner rollback keeps outer stage, outer commit publishes") {
    val s = new TxSession(mini)
    s.execute("BEGIN")
    s.execute("CREATE (p:Person {id: 100, name: 'X'})")
    s.execute("BEGIN") // nested level, as the reference stacks begins
    assert(s.activeTransactionCount == 2)
    s.execute("CREATE (p:Person {id: 101, name: 'Y'})")
    assert(s.graph.nodes.count() == 4)
    s.execute("ROLLBACK") // inner level only
    assert(s.graph.nodes.count() == 3)
    s.execute("COMMIT")
    assert(s.committedGraph.nodes.count() == 3)
    assert(s.completedTransactionCount == 2)
  }

  test("read query inside a transaction sees the staged state") {
    val s = new TxSession(mini)
    s.execute("BEGIN")
    s.execute("CREATE (p:Person {id: 100, name: 'X'})")
    s.execute("MATCH (p:Person) RETURN COUNT(*) AS n") match {
      case Rows(df) => assert(df.head.getLong(0) == 3L)
      case other    => fail(s"expected rows, got $other")
    }
    s.execute("ROLLBACK")
    s.execute("MATCH (p:Person) RETURN COUNT(*) AS n") match {
      case Rows(df) => assert(df.head.getLong(0) == 2L)
      case other    => fail(s"expected rows, got $other")
    }
  }
}
