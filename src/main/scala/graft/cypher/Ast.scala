package graft.cypher

/** Cypher AST — structurally mirrors the reference's
  * src/cypher/ast.rs:1-220 (NodePattern/RelPattern/Direction ≅ ast.rs:38-63,
  * Condition ≅ ast.rs:76-91, ReturnItem/AggFunc ≅ ast.rs:100-145), with the
  * query body generalized to a clause *pipeline* (any number of
  * MATCH/OPTIONAL MATCH and WITH stages) — a superset of the reference's
  * single match+with+where+return record.
  */
object Ast {

  sealed trait Direction
  object Direction {
    case object Out extends Direction  // ->
    case object In extends Direction   // <-
    case object Both extends Direction // -
  }

  final case class NodePattern(
      variable: Option[String],
      label: Option[String],
      props: List[(String, Literal)])

  /** varLength: Some((min, maxOpt)) for *, *n, *m..n (ast.rs:52-55 —
    * `*` = 1..unbounded, `*n` = 1..n, maxOpt None = unbounded, matching
    * the reference's Option<usize> max_hops).
    * relTypes: empty = any type; >1 = alternation `[:A|B]` (a graft
    * extension over the reference's single type). */
  final case class RelPattern(
      variable: Option[String],
      relTypes: List[String],
      direction: Direction,
      varLength: Option[(Int, Option[Int])])

  final case class Pattern(
      start: NodePattern,
      steps: List[(RelPattern, NodePattern)])

  sealed trait Literal { def value: Any }
  final case class StrLit(value: String) extends Literal
  final case class IntLit(value: Long) extends Literal
  final case class DoubleLit(value: Double) extends Literal
  final case class BoolLit(value: Boolean) extends Literal
  case object NullLit extends Literal { def value: Any = null }

  sealed trait Expr
  final case class Prop(variable: String, prop: String) extends Expr // var.prop
  final case class Ident(name: String) extends Expr // bare column (post-WITH) or node var
  final case class Lit(lit: Literal) extends Expr
  final case class ListExpr(items: List[Expr]) extends Expr

  sealed trait Cond
  final case class Cmp(op: String, lhs: Expr, rhs: Expr) extends Cond // = <> < > <= >=
  final case class And(l: Cond, r: Cond) extends Cond
  final case class Or(l: Cond, r: Cond) extends Cond
  final case class Not(c: Cond) extends Cond
  final case class RegexMatch(lhs: Expr, regex: String) extends Cond // =~ (unanchored, as reference)
  final case class Exists(variable: String, prop: String) extends Cond
  final case class IsNull(e: Expr) extends Cond
  final case class IsNotNull(e: Expr) extends Cond
  final case class In(e: Expr, items: List[Expr]) extends Cond
  /** `x IN v.prop` where the property is LIST-VALUED (values/value.rs:11
    * Value::List → an array column): membership in the stored list, not
    * in a literal list. */
  final case class InProp(e: Expr, listExpr: Expr) extends Cond

  sealed trait AggFunc
  object AggFunc {
    case object Sum extends AggFunc
    case object Avg extends AggFunc
    case object Min extends AggFunc
    case object Max extends AggFunc
    case object Count extends AggFunc
    case object Collect extends AggFunc
    case object StDev extends AggFunc // population, as query.rs:586
    case object PercentileCont extends AggFunc
    case object PercentileDisc extends AggFunc
  }

  sealed trait RetItem { def alias: Option[String] }
  final case class RetExpr(expr: Expr, alias: Option[String]) extends RetItem
  /** distinct=COUNT(DISTINCT …); expr None = COUNT(*) (ast.rs:128 Count). */
  final case class RetAgg(func: AggFunc, expr: Option[Expr], param: Option[Double],
                          alias: Option[String], distinct: Boolean = false) extends RetItem

  final case class OrderItem(expr: Expr, ascending: Boolean)

  /** Output column name of a RETURN/WITH item (alias, else derived) —
    * shared by the compiler's projection and the parser's resolution of
    * `ORDER BY COUNT(*)`-style aggregate references. */
  def defaultName(item: RetItem): String = item match {
    case RetExpr(Ident(v), a)   => a.getOrElse(v)
    case RetExpr(Prop(v, p), a) => a.getOrElse(s"${v}_$p")
    case RetExpr(_, a)          => a.getOrElse("expr")
    case RetAgg(f, e, _, a, _) =>
      a.getOrElse {
        val base = f.toString.toLowerCase
        e match {
          case Some(Prop(_, p)) => s"${base}_$p"
          case Some(Ident(v))   => s"${base}_$v"
          case _                => if (f == AggFunc.Count) "cnt" else base
        }
      }
  }

  sealed trait Clause
  final case class MatchClause(pattern: Pattern, optional: Boolean,
                               where: Option[Cond]) extends Clause
  final case class WithClause(items: List[RetItem], where: Option[Cond]) extends Clause
  /** CALL { subquery } [IN (vars)] (ast.rs:205 CallStatement): the inner
    * query runs against the graph and its returned columns join into the
    * outer pipeline — on `inputVars` when given (correlated; the inner
    * query must RETURN those vars), else on any shared column names,
    * else as a cross join (uncorrelated). */
  final case class CallClause(inner: Query, inputVars: List[String]) extends Clause

  final case class ReturnClause(
      items: List[RetItem],
      distinct: Boolean,
      orderBy: List[OrderItem],
      skip: Option[Int],
      limit: Option[Int])

  sealed trait Statement
  final case class Query(clauses: List[Clause], ret: ReturnClause) extends Statement
  final case class Union(left: Statement, right: Statement, all: Boolean) extends Statement

  // Mutation surface (ast.rs:150-199) — compiled to DataFrame edits on the
  // node/edge tables (exercised in ScalaTest; no DuckDB mutable-graph oracle).
  /** CREATE pat, or MATCH … CREATE pat: `matches` are the preceding MATCH
    * clauses whose bound node variables the pattern may reference
    * (executor.rs MATCH…CREATE path). */
  final case class Create(pattern: Pattern,
                          matches: List[MatchClause] = Nil) extends Statement
  final case class SetStmt(m: MatchClause, assignments: List[(String, String, Literal)]) extends Statement
  final case class DeleteStmt(m: MatchClause, variables: List[String]) extends Statement
  /** MERGE pat [ON CREATE SET …] [ON MATCH SET …] (ast.rs:185
    * MergeStatement on_create/on_match). */
  final case class Merge(pattern: Pattern,
                         onCreate: List[(String, String, Literal)] = Nil,
                         onMatch: List[(String, String, Literal)] = Nil) extends Statement
  /** FOREACH (v IN [ids] | SET v.p = lit, …) (ast.rs:193
    * ForeachStatement): batch property update over a literal id list;
    * ids that match no stored node are skipped. */
  final case class Foreach(variable: String, list: List[Literal],
                           assignments: List[(String, String, Literal)]) extends Statement

  /** Transaction statements (ast.rs:13-16 BeginTransaction /
    * CommitTransaction / RollbackTransaction; parser.rs:963-999 accepts
    * BEGIN|START [TRANSACTION] / COMMIT [TRANSACTION] / ROLLBACK
    * [TRANSACTION], each with an optional trailing `;`). Executed by
    * [[Transactions.TxSession]] — on immutable Spark frames BEGIN is a
    * free snapshot (keep the current graph reference), COMMIT publishes
    * the staged graph, ROLLBACK discards it. */
  case object BeginTx extends Statement
  case object CommitTx extends Statement
  case object RollbackTx extends Statement
}
