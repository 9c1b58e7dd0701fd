package graft.cypher

import Ast._
import Lexer._

/** Recursive-descent Cypher parser (reference: src/cypher/parser.rs —
  * same surface, no parser-combinator dependency).
  *
  * statement  := query (UNION [ALL] query)* | CREATE pat | MERGE pat
  *             | MATCH … SET a.b = lit, … | MATCH … DELETE v, …
  * query      := clause* RETURN [DISTINCT] items [ORDER BY …] [SKIP n] [LIMIT n]
  * clause     := [OPTIONAL] MATCH pattern [WHERE cond] | WITH items [WHERE cond]
  */
final class Parser(tokens: Vector[Token]) {
  private var pos = 0
  private def peek: Token = tokens(pos)
  private def peek2: Token = if (pos + 1 < tokens.length) tokens(pos + 1) else EOF
  private def advance(): Token = { val t = peek; pos += 1; t }
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"cypher parse error at token $pos ($peek): $msg")

  private def expectSym(s: String): Unit = advance() match {
    case Sym(`s`) => ()
    case t        => fail(s"expected '$s', got $t")
  }
  private def expectKw(s: String): Unit = advance() match {
    case Kw(`s`) => ()
    case t       => fail(s"expected $s, got $t")
  }
  private def at(s: String): Boolean = peek == Sym(s)
  private def atKw(s: String): Boolean = peek match {
    case Kw(`s`) => true
    case _       => false
  }
  private def eatSym(s: String): Boolean = { if (at(s)) { pos += 1; true } else false }
  private def eatKw(s: String): Boolean = { if (atKw(s)) { pos += 1; true } else false }
  private def ident(): String = advance() match {
    case Id(s)     => s
    case k: Kw     => k.raw // allow keywords as labels/props (e.g. Order, count)
    case t         => fail(s"expected identifier, got $t")
  }

  def parseStatement(): Statement = {
    val first = parseSingle()
    var result = first
    while (atKw("UNION")) {
      advance()
      val all = eatKw("ALL")
      val right = parseSingle()
      result = Union(result, right, all)
    }
    if (peek != EOF) fail("trailing input")
    result
  }

  /** `SET`-style assignment list: v.prop = literal, … */
  private def parseAssigns(): List[(String, String, Literal)] = {
    val assigns = List.newBuilder[(String, String, Literal)]
    var more = true
    while (more) {
      val v = ident(); expectSym("."); val p = ident(); expectSym("=")
      assigns += ((v, p, parseLiteral()))
      more = eatSym(",")
    }
    assigns.result()
  }

  /** MERGE pattern [ON CREATE SET …] [ON MATCH SET …] (either order). */
  private def parseMerge(): Statement = {
    val pat = parsePattern()
    var onCreate = List.empty[(String, String, Literal)]
    var onMatch = List.empty[(String, String, Literal)]
    while (atKw("ON")) {
      advance()
      if (eatKw("CREATE")) { expectKw("SET"); onCreate = parseAssigns() }
      else if (eatKw("MATCH")) { expectKw("SET"); onMatch = parseAssigns() }
      else fail("expected CREATE or MATCH after ON")
    }
    Merge(pat, onCreate, onMatch)
  }

  /** FOREACH (v IN [lits] | SET v.p = lit, …). */
  private def parseForeach(): Statement = {
    expectSym("(")
    val v = ident()
    expectKw("IN")
    expectSym("[")
    val lits = List.newBuilder[Literal]
    if (!at("]")) {
      lits += parseLiteral()
      while (eatSym(",")) lits += parseLiteral()
    }
    expectSym("]")
    expectSym("|")
    expectKw("SET")
    val assigns = parseAssigns()
    expectSym(")")
    assigns.foreach { case (av, _, _) =>
      if (av != v) fail(s"FOREACH SET must target the loop variable '$v', got '$av'")
    }
    Foreach(v, lits.result(), assigns)
  }

  private def parseSingle(): Statement = {
    // transaction statements (parser.rs:963-999): BEGIN|START
    // [TRANSACTION], COMMIT [TRANSACTION], ROLLBACK [TRANSACTION],
    // optional trailing ';'
    if (atKw("BEGIN") || atKw("START")) {
      advance(); eatKw("TRANSACTION"); eatSym(";"); return BeginTx
    }
    if (atKw("COMMIT")) {
      advance(); eatKw("TRANSACTION"); eatSym(";"); return CommitTx
    }
    if (atKw("ROLLBACK")) {
      advance(); eatKw("TRANSACTION"); eatSym(";"); return RollbackTx
    }
    if (atKw("CREATE")) { advance(); return Create(parsePattern()) }
    if (atKw("MERGE")) { advance(); return parseMerge() }
    if (atKw("FOREACH")) { advance(); return parseForeach() }
    val clauses = List.newBuilder[Clause]
    var done = false
    while (!done) {
      if (atKw("OPTIONAL")) {
        advance(); expectKw("MATCH")
        val pat = parsePattern()
        val w = if (eatKw("WHERE")) Some(parseCond()) else None
        clauses += MatchClause(pat, optional = true, w)
      } else if (atKw("MATCH")) {
        advance()
        val pat = parsePattern()
        val w = if (eatKw("WHERE")) Some(parseCond()) else None
        clauses += MatchClause(pat, optional = false, w)
      } else if (atKw("WITH")) {
        advance()
        val items = parseRetItems()
        val w = if (eatKw("WHERE")) Some(parseCond()) else None
        clauses += WithClause(items, w)
      } else if (atKw("CALL")) {
        advance(); expectSym("{")
        val inner = parseSingle() match {
          case q: Query => q
          case other    => fail(s"CALL subquery must be a read query, got $other")
        }
        expectSym("}")
        val inputVars = if (eatKw("IN")) {
          expectSym("(")
          val vs = List.newBuilder[String]
          vs += ident()
          while (eatSym(",")) vs += ident()
          expectSym(")")
          vs.result()
        } else Nil
        clauses += CallClause(inner, inputVars)
      } else done = true
    }
    val built = clauses.result()
    if (atKw("CREATE")) {
      advance()
      val matches = built.map {
        case m: MatchClause => m
        case c => fail(s"MATCH…CREATE allows only MATCH clauses before CREATE, got $c")
      }
      if (matches.isEmpty) fail("unreachable: bare CREATE handled above")
      return Create(parsePattern(), matches)
    }
    if (atKw("SET")) {
      advance()
      val assigns = parseAssigns()
      built match {
        case (m: MatchClause) :: Nil => return SetStmt(m, assigns)
        case _ => fail("SET requires a single MATCH clause")
      }
    }
    if (atKw("DELETE")) {
      advance()
      val vars = List.newBuilder[String]
      vars += ident()
      while (eatSym(",")) vars += ident()
      built match {
        case (m: MatchClause) :: Nil => return DeleteStmt(m, vars.result())
        case _ => fail("DELETE requires a single MATCH clause")
      }
    }
    expectKw("RETURN")
    val distinct = eatKw("DISTINCT")
    val items = parseRetItems()
    // Explicit GROUP BY (reference parser.rs:589 — a SQL-ism extension):
    // implicit grouping already groups by every non-aggregate item, so the
    // keys must BE the non-aggregate return items — every key a return
    // item, and every non-aggregate return item a key (otherwise
    // `RETURN a, b, COUNT(*) GROUP BY a` would silently group by (a, b),
    // diverging from the SQL semantics this extension claims).
    if (eatKw("GROUP")) {
      expectKw("BY")
      val keys = List.newBuilder[Expr]
      var more = true
      while (more) {
        val g = parseExpr()
        val ok = items.exists { case RetExpr(e, _) => e == g; case _ => false }
        if (!ok) fail(s"GROUP BY $g must reference a non-aggregate RETURN item")
        keys += g
        more = eatSym(",")
      }
      val keySet = keys.result().toSet
      items.foreach {
        case RetExpr(e, _) if !keySet.contains(e) =>
          fail(s"non-aggregate RETURN item $e must appear in GROUP BY")
        case _ => ()
      }
    }
    var orderBy = List.empty[OrderItem]
    if (eatKw("ORDER")) {
      expectKw("BY")
      val ob = List.newBuilder[OrderItem]
      var more = true
      while (more) {
        // ORDER BY COUNT(*) / SUM(x.p) …: resolve the aggregate against
        // the RETURN items (alias-insensitive) and sort by its output
        // column (cypher_aggregation_execution_test.rs:227).
        val e: Expr = peek match {
          case Kw(k) if aggKws.contains(k) && peek2 == Sym("(") =>
            val ragg = parseRetItem().asInstanceOf[RetAgg]
            items.collectFirst {
              case it: RetAgg if it.func == ragg.func && it.expr == ragg.expr &&
                it.param == ragg.param && it.distinct == ragg.distinct =>
                Ident(Ast.defaultName(it))
            }.getOrElse(fail(s"ORDER BY aggregate must also appear in RETURN"))
          case _ => parseExpr()
        }
        val asc = if (eatKw("DESC")) false else { eatKw("ASC"); true }
        ob += OrderItem(e, asc)
        more = eatSym(",")
      }
      orderBy = ob.result()
    }
    val skip = if (eatKw("SKIP")) Some(parseInt()) else None
    val limit = if (eatKw("LIMIT")) Some(parseInt()) else None
    Query(clauses.result(), ReturnClause(items, distinct, orderBy, skip, limit))
  }

  private def parseInt(): Int = advance() match {
    case Num(s) if !s.contains('.') => s.toInt
    case t => fail(s"expected integer, got $t")
  }

  // ---- patterns ----
  private def parsePattern(): Pattern = {
    val start = parseNode()
    val steps = List.newBuilder[(RelPattern, NodePattern)]
    var more = true
    while (more) {
      if (at("-") || at("<-")) {
        val rel = parseRel()
        val node = parseNode()
        steps += ((rel, node))
      } else more = false
    }
    Pattern(start, steps.result())
  }

  private def parseNode(): NodePattern = {
    expectSym("(")
    // keywords bind as node variables too (the k.raw fallback): the
    // variable position is unambiguous — only ':', '{' or ')' can follow
    val variable = peek match {
      case Id(s)  => advance(); Some(s)
      case k: Kw  => advance(); Some(k.raw)
      case _      => None
    }
    val label = if (eatSym(":")) Some(ident()) else None
    val props = if (at("{")) parseProps() else Nil
    expectSym(")")
    NodePattern(variable, label, props)
  }

  private def parseProps(): List[(String, Literal)] = {
    expectSym("{")
    val out = List.newBuilder[(String, Literal)]
    var more = !at("}")
    while (more) {
      val k = ident(); expectSym(":")
      out += ((k, parseLiteral()))
      more = eatSym(",")
    }
    expectSym("}")
    out.result()
  }

  private def parseRel(): RelPattern = {
    val incoming = eatSym("<-")
    if (!incoming) expectSym("-")
    var variable: Option[String] = None
    var relTypes: List[String] = Nil
    var varLength: Option[(Int, Option[Int])] = None
    if (eatSym("[")) {
      peek match {
        case Id(s)  => advance(); variable = Some(s)
        case k: Kw  => advance(); variable = Some(k.raw) // same fallback
        case _      => ()
      }
      if (eatSym(":")) {
        val ts = List.newBuilder[String]
        ts += ident()
        while (eatSym("|")) { eatSym(":"); ts += ident() } // [:A|B] or [:A|:B]
        relTypes = ts.result()
      }
      if (eatSym("*")) {
        // * | *n | *m..n | *m.. (ast.rs:52-55: * = 1..unbounded, *n = 1..n;
        // the unbounded form iterates to the simple-path fixpoint)
        varLength = peek match {
          case Num(a) =>
            advance()
            if (eatSym("..")) {
              val b = peek match {
                case Num(_) => Some(parseInt())
                case _      => None // *m..
              }
              Some((a.toInt, b))
            } else Some((1, Some(a.toInt)))
          case _ =>
            if (eatSym("..")) Some((1, Some(parseInt())))
            else Some((1, None))
        }
      }
      expectSym("]")
    }
    val outgoing = eatSym("->")
    if (!outgoing) expectSym("-") // '-' closes both incoming and undirected rels
    if (incoming && outgoing) fail("relationship cannot be both <- and ->")
    val dir =
      if (incoming) Direction.In
      else if (outgoing) Direction.Out
      else Direction.Both
    RelPattern(variable, relTypes, dir, varLength)
  }

  // ---- conditions ----
  private def parseCond(): Cond = {
    var l = parseAnd()
    while (eatKw("OR")) l = Or(l, parseAnd())
    l
  }
  private def parseAnd(): Cond = {
    var l = parseNot()
    while (eatKw("AND")) l = And(l, parseNot())
    l
  }
  private def parseNot(): Cond =
    if (eatKw("NOT")) Not(parseNot()) else parsePrim()

  private def parsePrim(): Cond = {
    if (atKw("EXISTS")) {
      advance(); expectSym("(")
      val v = ident(); expectSym("."); val p = ident()
      expectSym(")")
      return Exists(v, p)
    }
    if (at("(")) {
      // lookahead: '(' starts a parenthesized condition (patterns can't
      // appear in WHERE in this subset)
      advance()
      val c = parseCond()
      expectSym(")")
      return c
    }
    val lhs = parseExpr()
    peek match {
      case Sym(op @ ("=" | "<" | ">" | "<=" | ">=" | "<>")) =>
        advance(); Cmp(if (op == "!=") "<>" else op, lhs, parseExpr())
      case Sym("!=") => advance(); Cmp("<>", lhs, parseExpr())
      case Sym("=~") =>
        advance()
        advance() match {
          case Str(re) => RegexMatch(lhs, re)
          case t       => fail(s"expected regex string after =~, got $t")
        }
      case Kw("IS") =>
        advance()
        if (eatKw("NOT")) { expectKw("NULL"); IsNotNull(lhs) }
        else { expectKw("NULL"); IsNull(lhs) }
      case Kw("IN") =>
        advance()
        if (at("[")) {
          advance()
          val items = List.newBuilder[Expr]
          if (!at("]")) {
            items += parseExpr()
            while (eatSym(",")) items += parseExpr()
          }
          expectSym("]")
          In(lhs, items.result())
        } else InProp(lhs, parseExpr()) // x IN v.listProp (Value::List)
      case t => fail(s"expected comparison operator, got $t")
    }
  }

  // ---- expressions ----
  private def parseLiteral(): Literal = advance() match {
    case Str(s)       => StrLit(s)
    case Num(s)       => if (s.contains('.')) DoubleLit(s.toDouble) else IntLit(s.toLong)
    case Kw("TRUE")   => BoolLit(true)
    case Kw("FALSE")  => BoolLit(false)
    case Kw("NULL")   => NullLit
    case Sym("-") => advance() match {
      case Num(s) => if (s.contains('.')) DoubleLit(-s.toDouble) else IntLit(-s.toLong)
      case t      => fail(s"expected number after '-', got $t")
    }
    case t => fail(s"expected literal, got $t")
  }

  /** Keywords that keep their keyword meaning at expression start —
    * literals and condition operators. Every OTHER keyword in
    * expression position is a variable reference (the same k.raw
    * fallback ident() applies to labels/properties): reserving
    * BEGIN/START/… for transactions must not break a query whose
    * variable is named `start` (MATCH (start:Person) RETURN start). */
  private val exprReserved = Set("TRUE", "FALSE", "NULL", "NOT", "EXISTS")

  private def parseExpr(): Expr = peek match {
    case Id(v) =>
      advance()
      if (eatSym(".")) Prop(v, ident()) else Ident(v)
    case Str(_) | Num(_) | Kw("TRUE") | Kw("FALSE") | Kw("NULL") | Sym("-") =>
      Lit(parseLiteral())
    case k: Kw if !exprReserved(k.s) =>
      advance()
      if (eatSym(".")) Prop(k.raw, ident()) else Ident(k.raw)
    case Sym("[") =>
      advance()
      val items = List.newBuilder[Expr]
      if (!at("]")) {
        items += parseExpr()
        while (eatSym(",")) items += parseExpr()
      }
      expectSym("]")
      ListExpr(items.result())
    case t => fail(s"expected expression, got $t")
  }

  // ---- return items ----
  private val aggKws = Map(
    "COUNT" -> AggFunc.Count, "SUM" -> AggFunc.Sum, "AVG" -> AggFunc.Avg,
    "MIN" -> AggFunc.Min, "MAX" -> AggFunc.Max, "COLLECT" -> AggFunc.Collect,
    "STDEV" -> AggFunc.StDev, "PERCENTILECONT" -> AggFunc.PercentileCont,
    "PERCENTILEDISC" -> AggFunc.PercentileDisc)

  private def parseRetItems(): List[RetItem] = {
    val out = List.newBuilder[RetItem]
    out += parseRetItem()
    while (eatSym(",")) out += parseRetItem()
    out.result()
  }

  private def parseRetItem(): RetItem = peek match {
    case Kw(k) if aggKws.contains(k) && peek2 == Sym("(") =>
      advance(); expectSym("(")
      val func = aggKws(k)
      val distinct = eatKw("DISTINCT")
      val expr = if (eatSym("*")) None else Some(parseExpr())
      val param = if (eatSym(",")) Some(parseLiteral() match {
        case DoubleLit(d) => d
        case IntLit(i)    => i.toDouble
        case l            => fail(s"expected numeric parameter, got $l")
      }) else None
      expectSym(")")
      val alias = if (eatKw("AS")) Some(ident()) else None
      RetAgg(func, expr, param, alias, distinct)
    case _ =>
      val e = parseExpr()
      val alias = if (eatKw("AS")) Some(ident()) else None
      RetExpr(e, alias)
  }
}

object Parser {
  def parse(cypher: String): Statement =
    Lexer.tokenize(cypher) match {
      case Left(err)   => throw new IllegalArgumentException(s"cypher lex error: $err")
      case Right(toks) => new Parser(toks).parseStatement()
    }
}
