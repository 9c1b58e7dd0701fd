package graft.cypher

/** Hand-written tokenizer (reference: src/cypher/parser.rs tokenizing
  * stage). Keywords are case-insensitive; identifiers keep their case.
  */
object Lexer {
  sealed trait Token
  /** Uppercased keyword; `raw` keeps the original spelling so words like
    * `Order` or `count` can still be used as labels/properties/aliases. */
  final case class Kw(s: String)(val raw: String) extends Token
  final case class Id(s: String) extends Token      // identifier
  final case class Str(s: String) extends Token     // 'x' or "x"
  final case class Num(s: String) extends Token     // 123 or 1.5
  final case class Sym(s: String) extends Token     // punctuation / operators
  case object EOF extends Token

  private val keywords = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "AS", "AND", "OR", "NOT",
    "IN", "IS", "NULL", "EXISTS", "ORDER", "BY", "ASC", "DESC", "SKIP",
    "LIMIT", "DISTINCT", "UNION", "ALL", "CREATE", "MERGE", "SET", "DELETE",
    "ON", "FOREACH", "CALL",
    "BEGIN", "START", "TRANSACTION", "COMMIT", "ROLLBACK",
    "TRUE", "FALSE", "COUNT", "SUM", "AVG", "MIN", "MAX", "COLLECT", "STDEV",
    "PERCENTILECONT", "PERCENTILEDISC", "GROUP")

  def tokenize(input: String): Either[String, Vector[Token]] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        val word = input.substring(start, i)
        val up = word.toUpperCase
        out += (if (keywords(up)) Kw(up)(word) else Id(word))
      } else if (c.isDigit) {
        val start = i
        while (i < n && input(i).isDigit) i += 1
        if (i + 1 < n && input(i) == '.' && input(i + 1).isDigit) {
          i += 1
          while (i < n && input(i).isDigit) i += 1
        }
        out += Num(input.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input(i) == '\\' && i + 1 < n) { sb += input(i + 1); i += 2 }
          else if (input(i) == quote) { closed = true; i += 1 }
          else { sb += input(i); i += 1 }
        }
        if (!closed) return Left(s"unterminated string at offset $i")
        out += Str(sb.toString)
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "<=" | ">=" | "<>" | "!=" | "=~" | "->" | "<-" | ".." =>
            out += Sym(two); i += 2
          case _ =>
            "()[]{}:,.|=<>-+*/;" .indexOf(c) match {
              case -1 => return Left(s"unexpected character '$c' at offset $i")
              case _  => out += Sym(c.toString); i += 1
            }
        }
      }
    }
    out += EOF
    Right(out.result())
  }
}
