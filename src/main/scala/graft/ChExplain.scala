package graft

/** CH-faithful EXPLAIN SYNTAX: a small ClickHouse-SQL parser, the
  * TreeRewriter/TreeOptimizer display passes, and a printer mirroring
  * the reference formatter (ref src/Parsers/ASTFunction.cpp
  * formatImplWithoutAlias operator/paren rules,
  * ASTSelectQuery.cpp/ASTExpressionList.cpp clause and list layout,
  * ASTTablesInSelectQuery.cpp join rendering,
  * ASTSelectWithUnionQuery.cpp union flattening). Statements outside
  * the supported grammar return None and the caller keeps its
  * translated-text fallback.
  */
object ChExplain {

  // ===================== lexer =====================

  sealed trait Tok
  final case class TId(s: String, quoted: Boolean) extends Tok
  final case class TNum(s: String) extends Tok
  final case class TStr(raw: String) extends Tok // raw = escaped body, no quotes
  final case class TOp(s: String) extends Tok

  private def lex(input: String): Option[Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && input.charAt(i + 1) == '-') {
        while (i < n && input.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && input.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n &&
          !(input.charAt(i) == '*' && input.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '\'') {
        val sb = new java.lang.StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val d = input.charAt(i)
          if (d == '\\' && i + 1 < n) { sb.append(d).append(input.charAt(i + 1)); i += 2 }
          else if (d == '\'') {
            if (i + 1 < n && input.charAt(i + 1) == '\'') { sb.append("\\'"); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(d); i += 1 }
        }
        if (!done) return None
        out += TStr(sb.toString)
      } else if (c == '`' || c == '"') {
        val q = c
        val sb = new java.lang.StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val d = input.charAt(i)
          if (d == q) { done = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        if (!done) return None
        out += TId(sb.toString, quoted = true)
      } else if (c.isDigit ||
        (c == '.' && i + 1 < n && input.charAt(i + 1).isDigit)) {
        val st = i
        if (c == '0' && i + 1 < n &&
          (input.charAt(i + 1) == 'x' || input.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && (input.charAt(i).isLetterOrDigit)) i += 1
        } else {
          while (i < n && input.charAt(i).isDigit) i += 1
          if (i < n && input.charAt(i) == '.') {
            i += 1
            while (i < n && input.charAt(i).isDigit) i += 1
          }
          if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
            val save = i
            i += 1
            if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
            if (i < n && input.charAt(i).isDigit) {
              while (i < n && input.charAt(i).isDigit) i += 1
            } else i = save
          }
        }
        out += TNum(input.substring(st, i))
      } else if (c.isLetter || c == '_' || c == '$') {
        val st = i
        while (i < n && (input.charAt(i).isLetterOrDigit ||
          input.charAt(i) == '_' || input.charAt(i) == '$')) i += 1
        out += TId(input.substring(st, i), quoted = false)
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (Seq("<=", ">=", "!=", "<>", "==", "::", "->", "||").contains(two)) {
          out += TOp(if (two == "<>") "!=" else if (two == "==") "=" else two)
          i += 2
        } else if ("+-*/%=<>()[],.?:".indexOf(c) >= 0) {
          out += TOp(c.toString); i += 1
        } else return None // unknown char (e.g. '@', '#')
      }
    }
    Some(out.result())
  }

  // ===================== AST =====================

  sealed trait E {
    var alias: String = null
    def withAlias(a: String): this.type = { alias = a; this }
  }
  final case class Id(parts: Seq[String]) extends E
  final case class Num(text: String) extends E
  final case class Str(raw: String) extends E // escaped body
  case object NullLit extends E { override def toString = "NullLit" }
  /** generic function; operators use canonical CH internal names. */
  final case class Fn(name: String, args: Seq[E],
    params: Seq[E] = null, distinct: Boolean = false) extends E
  final case class Star(prefix: Seq[String]) extends E
  final case class Tup(items: Seq[E]) extends E // real tuple literal (a, b)
  final case class Arr(items: Seq[E]) extends E
  final case class Lambda(ps: Seq[String], body: E) extends E
  final case class Sub(u: Union) extends E
  /** COLUMNS / APPLY / EXCEPT / REPLACE transformers — parsed opaquely */
  final case class Opaque(text: String) extends E
  /** WITH name AS (subquery) — CH's ASTWithElement layout */
  final case class Cte(name: String, u: Union) extends E

  final case class OrderItem(e: E, desc: Boolean,
    nullsSpec: Boolean = false, nullsFirst: Boolean = false,
    collate: Option[E] = None, withFill: Boolean = false,
    fillFrom: Option[E] = None, fillTo: Option[E] = None,
    fillStep: Option[E] = None)

  sealed trait TableRef { var talias: String = null }
  final case class TTable(name: Seq[String]) extends TableRef
  final case class TFunc(fn: Fn) extends TableRef
  final case class TSub(u: Union) extends TableRef

  final case class JoinElem(
    global: Boolean, strictness: String, // "", ANY, ALL, ASOF, SEMI, ANTI
    kind: String, // INNER, LEFT, RIGHT, FULL, CROSS, COMMA
    t: TableRef, on: Option[E], using: Option[Seq[E]])

  final case class ArrayJoinElem(left: Boolean, items: Seq[E])

  final case class Sel(
    var withItems: Seq[E],
    var distinct: Boolean,
    var items: Seq[E],
    var from: Option[TableRef],
    var fromFinal: Boolean,
    var sample: Option[(E, Option[E])],
    var joins: Seq[JoinElem],
    var arrayJoins: Seq[ArrayJoinElem],
    var prewhere: Option[E],
    var where: Option[E],
    var groupBy: Seq[E],
    var rollup: Boolean, var cube: Boolean, var totals: Boolean,
    var groupingSets: Seq[Seq[E]],
    var having: Option[E],
    var orderBy: Seq[OrderItem],
    var limitBy: Option[(Option[E], E, Seq[E])], // (offset, len, by)
    var limit: Option[(Option[E], E, Boolean)], // (offset, len, withTies)
    var settings: Seq[(String, String)])

  object Sel {
    def empty: Sel = Sel(Nil, distinct = false, Nil, None,
      fromFinal = false, None, Nil, Nil, None, None, Nil,
      rollup = false, cube = false, totals = false, Nil, None, Nil,
      None, None, Nil)
  }

  /** union chain: children interleaved with modes (modes.length ==
    * children.length - 1). mode ∈ UNION ALL / UNION DISTINCT / UNION /
    * INTERSECT [ALL|DISTINCT] / EXCEPT [ALL|DISTINCT] */
  final case class Union(children: Seq[Either[Sel, Union]],
    modes: Seq[String])

  // ===================== parser =====================

  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Tok = if (pos < toks.length) toks(pos) else TOp("<end>")
    def peekAt(k: Int): Tok =
      if (pos + k < toks.length) toks(pos + k) else TOp("<end>")
    def next(): Tok = { val t = peek; pos += 1; t }
    def done: Boolean = pos >= toks.length
    def isKw(t: Tok, kw: String): Boolean = t match {
      case TId(s, false) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def kw(word: String): Boolean =
      if (isKw(peek, word)) { pos += 1; true } else false
    def kws(words: String*): Boolean = {
      val save = pos
      for (w <- words) if (!kw(w)) { pos = save; return false }
      true
    }
    def op(o: String): Boolean = peek match {
      case TOp(s) if s == o => pos += 1; true
      case _ => false
    }
    def expectOp(o: String): Unit =
      if (!op(o)) throw Bail(s"expected $o at $pos got $peek")
    def peekKw(word: String): Boolean = isKw(peek, word)
  }

  private final case class Bail(msg: String) extends RuntimeException(msg)

  private val clauseStoppers = Set("FROM", "PREWHERE", "WHERE", "GROUP",
    "HAVING", "ORDER", "LIMIT", "OFFSET", "SETTINGS", "FORMAT", "UNION",
    "INTERSECT", "EXCEPT", "INTO", "WITH", "ON", "USING", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "GLOBAL", "ANY", "ALL",
    "ASOF", "SEMI", "ANTI", "ARRAY", "FINAL", "SAMPLE", "AS", "ASC",
    "DESC", "DESCENDING", "ASCENDING", "NULLS", "COLLATE", "THEN",
    "WHEN", "ELSE", "END", "BY", "TOTALS", "ROLLUP", "CUBE", "TIES",
    "AND", "OR", "NOT", "BETWEEN", "LIKE", "ILIKE", "IN", "IS",
    "INTERPOLATE", "PASTE", "SELECT", "TO", "STEP", "OUTFILE", "VALUES")

  // --- expressions ---

  /** full expression with optional trailing [AS] alias (ref
    * ParserWithOptionalAlias — the alias binds the WHOLE expression:
    * `number * 2 AS x` aliases the product, not the literal). */
  private def parseExprP(p: P): E = {
    val e = parseLambda(p)
    if (p.peekKw("AS") && !p.isKw(p.peekAt(1), "SELECT")) {
      p.next()
      p.peek match {
        case TId(s, _) => p.next(); e.alias = s
        case _ => throw Bail("bad alias")
      }
    } else p.peek match {
      // implicit alias: a bare identifier directly after the
      // expression (`SELECT number n`)
      case TId(s, false)
          if !clauseStoppers(s.toUpperCase) && e.alias == null =>
        p.next(); e.alias = s
      case TId(s, true) if e.alias == null =>
        p.next(); e.alias = s
      case _ =>
    }
    e
  }

  private def parseLambda(p: P): E = {
    // ident -> body   |   (a, b) -> body
    p.peek match {
      case TId(s, _) if p.peekAt(1) == TOp("->") &&
          !clauseStoppers(s.toUpperCase) =>
        p.next(); p.next()
        return Lambda(Seq(s), parseLambda(p))
      case TOp("(") =>
        // try (id, id, ...) ->
        val save = p.pos
        p.next()
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        var ok = true
        var first = true
        while (ok && !p.op(")")) {
          if (!first && !p.op(",")) ok = false
          else p.peek match {
            case TId(s, _) => ids += s; p.next(); first = false
            case _ => ok = false
          }
        }
        if (ok && p.op("->"))
          return Lambda(ids.toSeq, parseLambda(p))
        p.pos = save
      case _ =>
    }
    parseTernary(p)
  }

  private def parseTernary(p: P): E = {
    val c = parseOr(p)
    if (p.op("?")) {
      val a = parseOr(p)
      p.expectOp(":")
      val b = parseTernary(p)
      Fn("if", Seq(c, a, b))
    } else c
  }

  private def parseOr(p: P): E = {
    var e = parseAnd(p)
    while (p.peekKw("OR")) {
      p.next()
      val r = parseAnd(p)
      e = e match {
        case Fn("or", as, null, false) if e.alias == null => Fn("or", as :+ r)
        case _ => Fn("or", Seq(e, r))
      }
    }
    e
  }

  private def parseAnd(p: P): E = {
    var e = parseNot(p)
    while (p.peekKw("AND")) {
      p.next()
      val r = parseNot(p)
      e = e match {
        case Fn("and", as, null, false) if e.alias == null => Fn("and", as :+ r)
        case _ => Fn("and", Seq(e, r))
      }
    }
    e
  }

  private def parseNot(p: P): E =
    if (p.peekKw("NOT") && !(p.isKw(p.peekAt(1), "LIKE") ||
        p.isKw(p.peekAt(1), "ILIKE") || p.isKw(p.peekAt(1), "IN") ||
        p.isKw(p.peekAt(1), "BETWEEN"))) {
      p.next()
      Fn("not", Seq(parseNot(p)))
    } else parseComparison(p)

  private def parseComparison(p: P): E = {
    var e = parseConcat(p)
    var loop = true
    while (loop) {
      loop = false
      p.peek match {
        case TOp(o) if Seq("=", "!=", "<", ">", "<=", ">=").contains(o) =>
          p.next()
          val r = parseConcat(p)
          val nm = o match {
            case "=" => "equals"; case "!=" => "notEquals"
            case "<" => "less"; case ">" => "greater"
            case "<=" => "lessOrEquals"; case ">=" => "greaterOrEquals"
          }
          e = Fn(nm, Seq(e, r)); loop = true
        case t if p.isKw(t, "LIKE") =>
          p.next(); e = Fn("like", Seq(e, parseConcat(p))); loop = true
        case t if p.isKw(t, "ILIKE") =>
          p.next(); e = Fn("ilike", Seq(e, parseConcat(p))); loop = true
        case t if p.isKw(t, "IN") =>
          p.next(); e = Fn("in", Seq(e, parseInRhs(p))); loop = true
        case t if p.isKw(t, "GLOBAL") &&
            (p.isKw(p.peekAt(1), "IN") || (p.isKw(p.peekAt(1), "NOT") &&
              p.isKw(p.peekAt(2), "IN"))) =>
          p.next()
          if (p.kw("NOT")) { p.kw("IN"); e = Fn("globalNotIn", Seq(e, parseInRhs(p))) }
          else { p.kw("IN"); e = Fn("globalIn", Seq(e, parseInRhs(p))) }
          loop = true
        case t if p.isKw(t, "NOT") =>
          if (p.isKw(p.peekAt(1), "LIKE")) {
            p.next(); p.next(); e = Fn("notLike", Seq(e, parseConcat(p))); loop = true
          } else if (p.isKw(p.peekAt(1), "ILIKE")) {
            p.next(); p.next(); e = Fn("notILike", Seq(e, parseConcat(p))); loop = true
          } else if (p.isKw(p.peekAt(1), "IN")) {
            p.next(); p.next(); e = Fn("notIn", Seq(e, parseInRhs(p))); loop = true
          } else if (p.isKw(p.peekAt(1), "BETWEEN")) {
            p.next(); p.next()
            val lo = parseConcat(p)
            if (!p.kw("AND")) throw Bail("BETWEEN without AND")
            val hi = parseConcat(p)
            e = Fn("or", Seq(Fn("less", Seq(e, lo)), Fn("greater", Seq(e, hi))))
            loop = true
          }
        case t if p.isKw(t, "BETWEEN") =>
          p.next()
          val lo = parseConcat(p)
          if (!p.kw("AND")) throw Bail("BETWEEN without AND")
          val hi = parseConcat(p)
          e = Fn("and", Seq(Fn("greaterOrEquals", Seq(e, lo)),
            Fn("lessOrEquals", Seq(e, hi))))
          loop = true
        case _ =>
      }
    }
    e
  }

  /** IN rhs: subquery, tuple, table identifier, or single value. */
  private def parseInRhs(p: P): E = parseConcat(p)

  private def parseConcat(p: P): E = {
    var e = parseAdditive(p)
    while (p.peek == TOp("||")) {
      p.next()
      val r = parseAdditive(p)
      e = e match {
        case Fn("concat", as, null, false) if e.alias == null =>
          Fn("concat", as :+ r)
        case _ => Fn("concat", Seq(e, r))
      }
    }
    e
  }

  private def parseAdditive(p: P): E = {
    var e = parseMultiplicative(p)
    var loop = true
    while (loop) {
      p.peek match {
        case TOp("+") => p.next(); e = Fn("plus", Seq(e, parseMultiplicative(p)))
        case TOp("-") => p.next(); e = Fn("minus", Seq(e, parseMultiplicative(p)))
        case _ => loop = false
      }
    }
    e
  }

  private def parseMultiplicative(p: P): E = {
    var e = parseUnary(p)
    var loop = true
    while (loop) {
      p.peek match {
        case TOp("*") => p.next(); e = Fn("multiply", Seq(e, parseUnary(p)))
        case TOp("/") => p.next(); e = Fn("divide", Seq(e, parseUnary(p)))
        case TOp("%") => p.next(); e = Fn("modulo", Seq(e, parseUnary(p)))
        case t if p.isKw(t, "MOD") =>
          p.next(); e = Fn("modulo", Seq(e, parseUnary(p)))
        case t if p.isKw(t, "DIV") =>
          p.next(); e = Fn("intDiv", Seq(e, parseUnary(p)))
        case _ => loop = false
      }
    }
    e
  }

  private def parseUnary(p: P): E =
    if (p.op("-")) {
      // a minus DIRECTLY before a number token folds into the literal
      // (ref ParserUnaryExpression); `-(1)` stays negate(1) — 01881
      // pins the difference
      p.peek match {
        case TNum(t) =>
          p.next()
          // integer -0 is the UInt64 literal 0 (Field normalization)
          val txt = if (t.matches("0+")) t else "-" + t
          parsePostfixOps(p, Num(txt))
        case _ => Fn("negate", Seq(parseUnary(p)))
      }
    } else if (p.op("+")) parseUnary(p)
    else parsePostfix(p)

  private def parsePostfix(p: P): E =
    parsePostfixOps(p, parsePrimary(p))

  private def parsePostfixOps(p: P, base: E): E = {
    var e = base
    var loop = true
    while (loop) {
      p.peek match {
        case TOp("[") =>
          p.next()
          val idx = parseExprP(p)
          p.expectOp("]")
          e = Fn("arrayElement", Seq(e, idx))
        case t if p.isKw(t, "IS") &&
            (p.isKw(p.peekAt(1), "NULL") ||
              (p.isKw(p.peekAt(1), "NOT") && p.isKw(p.peekAt(2), "NULL"))) =>
          p.next()
          if (p.kw("NOT")) { p.kw("NULL"); e = Fn("isNotNull", Seq(e)) }
          else { p.kw("NULL"); e = Fn("isNull", Seq(e)) }
        case TOp("::") =>
          p.next()
          val t = parseTypeText(p)
          // a LITERAL operand of :: prints as its quoted column text
          // (ref ParserCastOperator builds CAST('lit', 'Type'); 01852)
          val operand = if (isLiteral(e) && e.alias == null)
            Str(escapeStr(chLitText(e))) else e
          e = Fn("CAST", Seq(operand, Str(escapeStr(t))))
        case TOp(".") =>
          p.next()
          p.peek match {
            case TNum(nn) =>
              p.next(); e = Fn("tupleElement", Seq(e, Num(nn)))
            case TId(s, q) =>
              p.next()
              e match {
                case Id(parts) if e.alias == null => e = Id(parts :+ s)
                case _ => e = Fn("tupleElement", Seq(e, Str(escapeStr(s))))
              }
            case _ => throw Bail("bad dot access")
          }
        case _ => loop = false
      }
    }
    e
  }

  private def escapeStr(s: String): String =
    s.flatMap {
      case '\'' => "\\'"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Type text after `::` / inside CAST(x AS T): identifier with
    * optional parenthesized args, possibly nested. Rebuilt from tokens
    * with CH's canonical spacing (args `, `-separated). */
  private def parseTypeText(p: P): String = {
    val sb = new java.lang.StringBuilder
    p.peek match {
      case TId(s, _) => p.next(); sb.append(s)
      case _ => throw Bail("type expected")
    }
    // Nullable(Int32), Decimal(38, 38), DateTime('UTC'), Array(...)
    if (p.peek == TOp("(")) {
      p.next()
      sb.append('(')
      var first = true
      while (!p.op(")")) {
        if (!first) { p.expectOp(","); sb.append(", ") }
        first = false
        p.peek match {
          case TNum(nn) => p.next(); sb.append(nn)
          case TStr(s) => p.next(); sb.append("'").append(s).append("'")
          case TId(s, _) =>
            p.next()
            sb.append(s)
            if (p.peek == TOp("(")) {
              // nested type args — recurse textually
              var depth = 0
              var go = true
              while (go) {
                p.peek match {
                  case TOp("(") => depth += 1; sb.append('('); p.next()
                  case TOp(")") =>
                    depth -= 1; sb.append(')'); p.next()
                    if (depth == 0) go = false
                  case TOp(",") => sb.append(", "); p.next()
                  case TNum(nn) => sb.append(nn); p.next()
                  case TStr(s2) => sb.append("'").append(s2).append("'"); p.next()
                  case TId(s2, _) => sb.append(s2); p.next()
                  case TOp("=") => sb.append(" = "); p.next()
                  case TOp("-") => sb.append("-"); p.next()
                  case _ => throw Bail("bad type token")
                }
              }
            }
          case _ => throw Bail("bad type arg")
        }
      }
      sb.append(')')
    }
    sb.toString
  }

  private def parsePrimary(p: P): E = {
    p.peek match {
      case TNum(t) => p.next(); Num(t)
      case TStr(s) => p.next(); Str(s)
      case TOp("*") => p.next(); Star(Nil)
      case TOp("(") =>
        p.next()
        // subquery?
        if (p.peekKw("SELECT") || p.peekKw("WITH") || p.peek == TOp("(")) {
          val save = p.pos
          try {
            val u = parseUnionP(p)
            p.expectOp(")")
            return Sub(u)
          } catch { case _: Bail => p.pos = save }
        }
        val items = scala.collection.mutable.ArrayBuffer.empty[E]
        items += parseExprP(p)
        while (p.op(",")) items += parseExprP(p)
        p.expectOp(")")
        if (items.length == 1) items.head else Tup(items.toSeq)
      case TOp("[") =>
        p.next()
        val items = scala.collection.mutable.ArrayBuffer.empty[E]
        if (p.peek != TOp("]")) {
          items += parseExprP(p)
          while (p.op(",")) items += parseExprP(p)
        }
        p.expectOp("]")
        Arr(items.toSeq)
      case t if p.isKw(t, "NULL") => p.next(); NullLit
      case t if p.isKw(t, "INTERVAL") =>
        p.next()
        val v = parseAdditive(p)
        p.peek match {
          case TId(u, false) =>
            p.next()
            val unit = u.toLowerCase.stripSuffix("s")
            Fn("toInterval" + unit.capitalize, Seq(v))
          case _ => throw Bail("bad interval unit")
        }
      case t if p.isKw(t, "EXISTS") && p.peekAt(1) == TOp("(") =>
        p.next(); p.next()
        val u = parseUnionP(p)
        p.expectOp(")")
        Fn("exists", Seq(Sub(u)))
      case t if p.isKw(t, "CASE") =>
        p.next()
        parseCase(p)
      case t if p.isKw(t, "CAST") && p.peekAt(1) == TOp("(") =>
        p.next(); p.next()
        // no alias parsing here — the AS belongs to the CAST syntax
        val e = parseLambda(p)
        if (p.kw("AS")) {
          val ty = parseTypeText(p)
          p.expectOp(")")
          Fn("CAST", Seq(e, Str(escapeStr(ty))))
        } else {
          p.expectOp(",")
          val t2 = parseExprP(p)
          p.expectOp(")")
          Fn("CAST", Seq(e, t2))
        }
      case t if p.isKw(t, "NOT") =>
        p.next(); Fn("not", Seq(parseNot(p)))
      case TId(s, q) =>
        p.next()
        if (!q && p.peek == TOp("(") &&
            !clauseStoppersNoFn(s.toUpperCase)) {
          p.next()
          var distinct = false
          val args = scala.collection.mutable.ArrayBuffer.empty[E]
          if (p.peek != TOp(")")) {
            if (p.peekKw("DISTINCT")) { p.next(); distinct = true }
            args += parseExprP(p)
            while (p.op(",")) args += parseExprP(p)
          }
          p.expectOp(")")
          // parametric aggregate: name(params)(args)
          if (p.peek == TOp("(")) {
            p.next()
            val args2 = scala.collection.mutable.ArrayBuffer.empty[E]
            if (p.peek != TOp(")")) {
              args2 += parseExprP(p)
              while (p.op(",")) args2 += parseExprP(p)
            }
            p.expectOp(")")
            Fn(s, args2.toSeq, params = args.toSeq, distinct = distinct)
          } else if (s.equalsIgnoreCase("count") &&
              args.toSeq == Seq(Star(Nil)))
            Fn("count", Nil, distinct = distinct)
          else Fn(s, args.toSeq, distinct = distinct)
        } else Id(Seq(s))
      case other => throw Bail(s"unexpected $other")
    }
  }

  private val clauseStoppersNoFn = Set[String]()

  private def parseCase(p: P): E = {
    // CASE [expr] WHEN .. THEN .. [ELSE ..] END
    val operand: Option[E] =
      if (p.peekKw("WHEN")) None else Some(parseExprP(p))
    val whens = scala.collection.mutable.ArrayBuffer.empty[(E, E)]
    while (p.kw("WHEN")) {
      val c = parseExprP(p)
      if (!p.kw("THEN")) throw Bail("CASE WHEN without THEN")
      val v = parseExprP(p)
      whens += ((c, v))
    }
    val els = if (p.kw("ELSE")) Some(parseExprP(p)) else None
    if (!p.kw("END")) throw Bail("CASE without END")
    operand match {
      case Some(x) =>
        Fn("caseWithExpression",
          (x +: whens.toSeq.flatMap(w => Seq(w._1, w._2))) ++
            Seq(els.getOrElse(NullLit)))
      case None =>
        val flat = whens.toSeq.flatMap(w => Seq(w._1, w._2)) :+
          els.getOrElse(NullLit)
        if (whens.length == 1) Fn("if", flat) else Fn("multiIf", flat)
    }
  }

  // --- select / union ---

  private def parseUnionP(p: P): Union = {
    val children = scala.collection.mutable.ArrayBuffer
      .empty[Either[Sel, Union]]
    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    def one(): Either[Sel, Union] =
      if (p.op("(")) {
        val u = parseUnionP(p)
        p.expectOp(")")
        Right(u)
      } else Left(parseSelect(p))
    children += one()
    var loop = true
    while (loop) {
      if (p.peekKw("UNION")) {
        p.next()
        val m = if (p.kw("ALL")) "UNION ALL"
          else if (p.kw("DISTINCT")) "UNION DISTINCT" else "UNION"
        modes += m; children += one()
      } else if (p.peekKw("INTERSECT")) {
        p.next()
        val m = if (p.kw("ALL")) "INTERSECT ALL"
          else if (p.kw("DISTINCT")) "INTERSECT DISTINCT" else "INTERSECT"
        modes += m; children += one()
      } else if (p.peekKw("EXCEPT")) {
        p.next()
        val m = if (p.kw("ALL")) "EXCEPT ALL"
          else if (p.kw("DISTINCT")) "EXCEPT DISTINCT" else "EXCEPT"
        modes += m; children += one()
      } else loop = false
    }
    Union(children.toSeq, modes.toSeq)
  }

  private def parseSelect(p: P): Sel = {
    val s = Sel.empty
    if (p.kw("WITH")) {
      val ws = scala.collection.mutable.ArrayBuffer.empty[E]
      var go = true
      while (go) {
        // CTE form: name AS (SELECT ...)
        val save = p.pos
        var done = false
        p.peek match {
          case TId(nm, _) if p.isKw(p.peekAt(1), "AS") &&
              p.peekAt(2) == TOp("(") =>
            p.next(); p.next(); p.next()
            try {
              val u = parseUnionP(p)
              p.expectOp(")")
              ws += Cte(nm, u)
              done = true
            } catch { case _: Bail => p.pos = save }
          case _ =>
        }
        if (!done) ws += parseExprP(p)
        go = p.op(",")
      }
      s.withItems = ws.toSeq
    }
    if (!p.kw("SELECT")) throw Bail("expected SELECT")
    if (p.kw("DISTINCT")) s.distinct = true
    val items = scala.collection.mutable.ArrayBuffer.empty[E]
    items += parseSelectItem(p)
    while (p.op(",")) items += parseSelectItem(p)
    s.items = items.toSeq
    if (p.kw("FROM")) {
      s.from = Some(parseTableRef(p))
      if (p.kw("FINAL")) s.fromFinal = true
      if (p.kw("SAMPLE")) {
        val sz = parseAdditive(p)
        val off = if (p.kw("OFFSET")) Some(parseAdditive(p)) else None
        s.sample = Some((sz, off))
      }
      // joins / array joins
      var loop = true
      while (loop) {
        val save = p.pos
        if (p.kw("ARRAY") && p.kw("JOIN")) {
          val its = scala.collection.mutable.ArrayBuffer.empty[E]
          its += parseSelectItem(p)
          while (p.op(",")) its += parseSelectItem(p)
          s.arrayJoins = s.arrayJoins :+ ArrayJoinElem(left = false, its.toSeq)
        } else {
          p.pos = save
          if (p.kws("LEFT", "ARRAY", "JOIN")) {
            val its = scala.collection.mutable.ArrayBuffer.empty[E]
            its += parseSelectItem(p)
            while (p.op(",")) its += parseSelectItem(p)
            s.arrayJoins = s.arrayJoins :+ ArrayJoinElem(left = true, its.toSeq)
          } else {
            parseJoin(p) match {
              case Some(j) => s.joins = s.joins :+ j
              case None => loop = false
            }
          }
        }
      }
    }
    if (p.kw("PREWHERE")) s.prewhere = Some(parseExprP(p))
    if (p.kw("WHERE")) s.where = Some(parseExprP(p))
    if (p.peekKw("GROUP")) {
      p.next()
      if (!p.kw("BY")) throw Bail("GROUP without BY")
      if (p.kws("GROUPING", "SETS")) {
        p.expectOp("(")
        val sets = scala.collection.mutable.ArrayBuffer.empty[Seq[E]]
        var go = true
        while (go) {
          if (p.op("(")) {
            val es = scala.collection.mutable.ArrayBuffer.empty[E]
            if (p.peek != TOp(")")) {
              es += parseExprP(p)
              while (p.op(",")) es += parseExprP(p)
            }
            p.expectOp(")")
            sets += es.toSeq
          } else sets += Seq(parseExprP(p))
          go = p.op(",")
        }
        p.expectOp(")")
        s.groupingSets = sets.toSeq
      } else {
        val gs = scala.collection.mutable.ArrayBuffer.empty[E]
        gs += parseExprP(p)
        while (p.op(",")) gs += parseExprP(p)
        s.groupBy = gs.toSeq
        if (p.kws("WITH", "ROLLUP")) s.rollup = true
        else if (p.kws("WITH", "CUBE")) s.cube = true
      }
    }
    if (p.kws("WITH", "TOTALS")) s.totals = true
    if (p.kw("HAVING")) s.having = Some(parseExprP(p))
    if (p.peekKw("ORDER")) {
      p.next()
      if (!p.kw("BY")) throw Bail("ORDER without BY")
      val os = scala.collection.mutable.ArrayBuffer.empty[OrderItem]
      def item(): OrderItem = {
        val e = parseExprP(p)
        var desc = false
        if (p.kw("DESC") || p.kw("DESCENDING")) desc = true
        else { p.kw("ASC"); p.kw("ASCENDING") }
        var nullsSpec = false; var nullsFirst = false
        if (p.kw("NULLS")) {
          nullsSpec = true
          if (p.kw("FIRST")) nullsFirst = true else p.kw("LAST")
        }
        val coll = if (p.kw("COLLATE")) Some(parsePrimary(p)) else None
        var wf = false
        var ff: Option[E] = None; var ft: Option[E] = None
        var fs: Option[E] = None
        if (p.kws("WITH", "FILL")) {
          wf = true
          if (p.kw("FROM")) ff = Some(parseAdditive(p))
          if (p.kw("TO")) ft = Some(parseAdditive(p))
          if (p.kw("STEP")) fs = Some(parseAdditive(p))
        }
        OrderItem(e, desc, nullsSpec, nullsFirst, coll, wf, ff, ft, fs)
      }
      os += item()
      while (p.op(",")) os += item()
      s.orderBy = os.toSeq
    }
    // LIMIT [o,] n [BY items] — possibly twice (LIMIT BY then LIMIT)
    var limitSeen = 0
    while (p.peekKw("LIMIT") && limitSeen < 2) {
      p.next()
      limitSeen += 1
      val a = parseAdditive(p)
      var off: Option[E] = None
      var len: E = a
      if (p.op(",")) { off = Some(a); len = parseAdditive(p) }
      if (p.kw("BY")) {
        val bys = scala.collection.mutable.ArrayBuffer.empty[E]
        bys += parseExprP(p)
        while (p.op(",")) bys += parseExprP(p)
        s.limitBy = Some((off, len, bys.toSeq))
      } else if (p.kws("WITH", "TIES")) {
        s.limit = Some((off, len, true))
      } else {
        if (p.kw("OFFSET")) off = Some(parseAdditive(p))
        s.limit = Some((off, len, false))
      }
    }
    if (p.kw("OFFSET")) {
      val off = parseAdditive(p)
      s.limit = s.limit match {
        case Some((_, len, t)) => Some((Some(off), len, t))
        case None => Some((Some(off), null, false))
      }
    }
    if (p.kw("SETTINGS")) {
      val st = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var go = true
      while (go) {
        p.peek match {
          case TId(nm, _) =>
            p.next()
            p.expectOp("=")
            val v = p.next() match {
              case TNum(t) => t
              case TStr(sv) => "'" + sv + "'"
              case TId(sv, _) => "'" + sv + "'"
              case other => throw Bail(s"bad setting value $other")
            }
            st += ((nm, v))
          case _ => throw Bail("bad setting")
        }
        go = p.op(",")
      }
      s.settings = st.toSeq
    }
    s
  }

  private def parseSelectItem(p: P): E = {
    // t.* form
    p.peek match {
      case TId(a, _) if p.peekAt(1) == TOp(".") && p.peekAt(2) == TOp("*") =>
        p.next(); p.next(); p.next()
        return Star(Seq(a))
      case _ =>
    }
    parseExprP(p)
  }

  private def parseTableRef(p: P): TableRef = {
    val t: TableRef = p.peek match {
      case TOp("(") =>
        p.next()
        val u = parseUnionP(p)
        p.expectOp(")")
        TSub(u)
      case TId(nm, q) =>
        p.next()
        if (!q && p.peek == TOp("(")) {
          // table function; a trailing `SETTINGS k = v, ...` argument
          // is an ASTSetQuery child (02377)
          p.next()
          val args = scala.collection.mutable.ArrayBuffer.empty[E]
          var done = false
          if (p.peek != TOp(")")) {
            while (!done) {
              if (p.peekKw("SETTINGS")) {
                p.next()
                val st = scala.collection.mutable.ArrayBuffer.empty[String]
                var go = true
                while (go) {
                  (p.next(), { p.expectOp("="); p.next() }) match {
                    case (TId(k, _), TNum(v)) => st += s"$k = $v"
                    case (TId(k, _), TStr(v)) => st += s"$k = '$v'"
                    case (TId(k, _), TId(v, _)) => st += s"$k = $v"
                    case _ => throw Bail("bad tf setting")
                  }
                  go = p.op(",")
                }
                args += Opaque("SETTINGS " + st.mkString(", "))
                done = true
              } else {
                args += parseExprP(p)
                if (!p.op(",")) done = true
              }
            }
          }
          p.expectOp(")")
          TFunc(Fn(nm, args.toSeq))
        } else if (p.peek == TOp(".")) {
          p.next()
          p.peek match {
            case TId(nm2, _) => p.next(); TTable(Seq(nm, nm2))
            case _ => throw Bail("bad db.table")
          }
        } else TTable(Seq(nm))
      case other => throw Bail(s"bad table ref $other")
    }
    // alias
    if (p.kw("AS")) {
      p.peek match {
        case TId(a2, _) => p.next(); t.talias = a2
        case _ => throw Bail("bad table alias")
      }
    } else p.peek match {
      case TId(a2, false) if !clauseStoppers(a2.toUpperCase) =>
        p.next(); t.talias = a2
      case _ =>
    }
    t
  }

  private def parseJoin(p: P): Option[JoinElem] = {
    val save = p.pos
    var global = false
    var strictness = ""
    var kind = ""
    if (p.op(",")) {
      kind = "COMMA"
    } else {
      if (p.kw("GLOBAL")) global = true
      if (p.kw("ANY")) strictness = "ANY"
      else if (p.kw("ALL")) strictness = "ALL"
      else if (p.kw("ASOF")) strictness = "ASOF"
      else if (p.kw("SEMI")) strictness = "SEMI"
      else if (p.kw("ANTI")) strictness = "ANTI"
      if (p.kw("INNER")) kind = "INNER"
      else if (p.kw("LEFT")) kind = "LEFT"
      else if (p.kw("RIGHT")) kind = "RIGHT"
      else if (p.kw("FULL")) kind = "FULL"
      else if (p.kw("CROSS")) kind = "CROSS"
      // trailing OUTER / secondary strictness position: LEFT ANY JOIN
      p.kw("OUTER")
      if (strictness.isEmpty) {
        if (p.kw("ANY")) strictness = "ANY"
        else if (p.kw("ALL")) strictness = "ALL"
        else if (p.kw("ASOF")) strictness = "ASOF"
        else if (p.kw("SEMI")) strictness = "SEMI"
        else if (p.kw("ANTI")) strictness = "ANTI"
      }
      if (!p.kw("JOIN")) { p.pos = save; return None }
      if (kind.isEmpty) kind = "INNER"
    }
    val t = parseTableRef(p)
    var on: Option[E] = None
    var using: Option[Seq[E]] = None
    if (kind != "CROSS" && kind != "COMMA") {
      if (p.kw("ON")) on = Some(parseExprP(p))
      else if (p.kw("USING")) {
        val paren = p.op("(")
        val us = scala.collection.mutable.ArrayBuffer.empty[E]
        us += parseExprP(p)
        while (p.op(",")) us += parseExprP(p)
        if (paren) p.expectOp(")")
        using = Some(us.toSeq)
      }
    }
    Some(JoinElem(global, strictness, kind, t, on, using))
  }

  // ===================== printer =====================

  final class Out {
    val sb = new java.lang.StringBuilder
    def <<(s: String): Out = { sb.append(s); this }
    def result: Seq[String] = sb.toString.split("\n", -1).toSeq
  }

  /** printed-alias tracking: an aliased subtree printed once again
    * later in the same select prints as just its alias (ref
    * ASTWithAlias::formatImpl printed_asts_with_alias). */
  final class PState {
    val printed = scala.collection.mutable.Set.empty[(Int, String, String)]
    var selId: Int = 0
    var cteNames: Set[String] = Set.empty
  }

  private def fmtId(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name else s"`$name`"

  private def keyE(e: E): String = printExprStr(e, needParens = false,
    new PState, withAlias = false)

  def printExprStr(e: E, needParens: Boolean, st: PState,
      withAlias: Boolean = true): String = {
    val o = new Out
    printExpr(o, e, needParens, 0, st, withAlias)
    o.sb.toString
  }

  private def isLiteral(e: E): Boolean = e match {
    case _: Num | _: Str | NullLit => true
    case Tup(items) => items.forall(isLiteral)
    case Arr(items) => items.forall(isLiteral)
    case _ => false
  }

  /** the CH column text of a literal (Field::dump-ish): numbers as
    * written, strings quoted, arrays/tuples with ", " separators. */
  private def chLitText(e: E): String = e match {
    case Num(t) => t
    case Str(raw) => "'" + raw.replace("\\'", "'") + "'"
    case NullLit => "NULL"
    case Arr(items) => items.map(chLitText).mkString("[", ", ", "]")
    case Tup(items) => items.map(chLitText).mkString("(", ", ", ")")
    case _ => "?"
  }

  // CH literal column text (used by `IN (lit)` rhs etc.)
  private def printExpr(o: Out, e0: E, needParens: Boolean, indent: Int,
      st: PState, withAlias: Boolean = true): Unit = {
    val e = e0
    val alias = if (withAlias) Option(e.alias) else None
    if (alias.nonEmpty) {
      val key = (st.selId, alias.get, keyE(e))
      if (!st.printed.add(key)) { o << fmtId(alias.get); return }
    }
    val np = needParens && alias.nonEmpty
    if (np) o << "("
    printExprNoAlias(o, e, needParens && alias.isEmpty, indent, st)
    alias.foreach { a => o << " AS " << fmtId(a) }
    if (np) o << ")"
  }

  private def printExprNoAlias(o: Out, e: E, needParens: Boolean,
      indent: Int, st: PState): Unit = e match {
    case Id(parts) => o << parts.map(fmtId).mkString(".")
    case Num(t) => o << t
    case Str(raw) => o << "'" << raw << "'"
    case NullLit => o << "NULL"
    case Star(prefix) =>
      if (prefix.nonEmpty) o << prefix.map(fmtId).mkString(".") << ".*"
      else o << "*"
    case Tup(items) =>
      o << "("
      var first = true
      items.foreach { it =>
        if (!first) o << ", "
        first = false
        printExpr(o, it, needParens = false, indent, st)
      }
      o << ")"
    case Arr(items) =>
      o << "["
      var first = true
      items.foreach { it =>
        if (!first) o << ", "
        first = false
        printExpr(o, it, needParens = false, indent, st)
      }
      o << "]"
    case Lambda(ps, body) =>
      if (needParens) o << "("
      if (ps.length == 1) o << ps.head
      else o << "(" << ps.mkString(", ") << ")"
      o << " -> "
      printExpr(o, body, needParens = true, indent, st)
      if (needParens) o << ")"
    case Sub(u) =>
      o << "(\n"
      printUnion(o, u, indent + 1, st)
      o << "\n" << "    " * indent << ")"
    case Opaque(t) => o << t
    case Cte(name, u) =>
      o << fmtId(name) << " AS\n" << "    " * (indent + 1) << "(\n"
      printUnion(o, u, indent + 2, st)
      o << "\n" << "    " * (indent + 1) << ")"
    case f: Fn => printFn(o, f, needParens, indent, st)
  }

  private val binOps = Map(
    "multiply" -> " * ", "divide" -> " / ", "modulo" -> " % ",
    "plus" -> " + ", "minus" -> " - ", "notEquals" -> " != ",
    "lessOrEquals" -> " <= ", "greaterOrEquals" -> " >= ",
    "less" -> " < ", "greater" -> " > ", "equals" -> " = ",
    "like" -> " LIKE ", "ilike" -> " ILIKE ", "notLike" -> " NOT LIKE ",
    "notILike" -> " NOT ILIKE ", "in" -> " IN ", "notIn" -> " NOT IN ",
    "globalIn" -> " GLOBAL IN ", "globalNotIn" -> " GLOBAL NOT IN ")

  private def printFn(o: Out, f: Fn, needParens: Boolean, indent: Int,
      st: PState): Unit = {
    val name = f.name
    val args = f.args
    // unary prefix operators
    if (f.params == null && args.length == 1 &&
        (name == "negate" || name == "not")) {
      val sym = if (name == "negate") "-" else "NOT "
      val argLit = args.head match {
        case _: Num | _: Str | NullLit => true
        case _ => false
      }
      val argIsTupleLit = args.head.isInstanceOf[Tup]
      val litNeedParens = argLit && !argIsTupleLit
      val argNegate = args.head match {
        case Fn("negate", _, _, _) => true
        case _ => false
      }
      val negateNeedParens = name == "negate" && (litNeedParens || argNegate)
      val np = !argLit && needParens && !negateNeedParens
      if (np) o << "("
      o << sym
      if (negateNeedParens) o << "("
      printExpr(o, args.head, needParens = !negateNeedParens, indent, st)
      if (negateNeedParens) o << ")"
      if (np) o << ")"
      return
    }
    // unary postfix IS NULL / IS NOT NULL
    if (f.params == null && args.length == 1 &&
        (name == "isNull" || name == "isNotNull")) {
      if (needParens) o << "("
      printExpr(o, args.head, needParens = true, indent, st)
      o << (if (name == "isNull") " IS NULL" else " IS NOT NULL")
      if (needParens) o << ")"
      return
    }
    // binary operators
    if (f.params == null && args.length == 2 && binOps.contains(name)) {
      if (needParens) o << "("
      printExpr(o, args.head, needParens = true, indent, st)
      o << binOps(name)
      val isIn = name == "in" || name == "notIn" || name == "globalIn" ||
        name == "globalNotIn"
      val rhs = args(1)
      val rhsNeedsExtraParens = isIn && (rhs match {
        case _: Fn | _: Tup | _: Arr | _: Sub => false
        case _ => true
      })
      if (rhsNeedsExtraParens) {
        o << "("
        printExpr(o, rhs, needParens = false, indent, st)
        o << ")"
      } else printExpr(o, rhs, needParens = true, indent, st)
      if (needParens) o << ")"
      return
    }
    if (f.params == null && args.length == 2 && name == "arrayElement") {
      if (needParens) o << "("
      printExpr(o, args.head, needParens = true, indent, st)
      o << "["
      printExpr(o, args(1), needParens = false, indent, st)
      o << "]"
      if (needParens) o << ")"
      return
    }
    if (f.params == null && args.length == 2 && name == "tupleElement") {
      val ok = args(1) match {
        case Num(t) if !t.startsWith("-") && t.forall(_.isDigit) => true
        case _ => false
      }
      if (ok) {
        if (needParens) o << "("
        printExpr(o, args.head, needParens = true, indent, st)
        o << "."
        printExpr(o, args(1), needParens = false, indent, st)
        if (needParens) o << ")"
        return
      }
    }
    if (f.params == null && args.length == 2 && name == "lambda") {
      if (needParens) o << "("
      printExpr(o, args.head, needParens = true, indent, st)
      o << " -> "
      printExpr(o, args(1), needParens = true, indent, st)
      if (needParens) o << ")"
      return
    }
    // n-ary AND / OR
    if (f.params == null && args.length >= 2 &&
        (name == "and" || name == "or")) {
      if (needParens) o << "("
      var first = true
      args.foreach { a =>
        if (!first) o << (if (name == "and") " AND " else " OR ")
        first = false
        printExpr(o, a, needParens = true, indent, st)
      }
      if (needParens) o << ")"
      return
    }
    if (f.params == null && name == "array") {
      o << "["
      var first = true
      args.foreach { a =>
        if (!first) o << ", "
        first = false
        printExpr(o, a, needParens = false, indent, st)
      }
      o << "]"
      return
    }
    if (f.params == null && name == "tuple" && args.length >= 2) {
      o << (if (needParens && f.alias != null) "tuple" else "") << "("
      var first = true
      args.foreach { a =>
        if (!first) o << ", "
        first = false
        printExpr(o, a, needParens = false, indent, st)
      }
      o << ")"
      return
    }
    // generic call
    o << name
    if (f.params != null) {
      o << "("
      var first = true
      f.params.foreach { a =>
        if (!first) o << ", "
        first = false
        printExpr(o, a, needParens = false, indent, st)
      }
      o << ")"
    }
    o << "("
    if (f.distinct) o << "DISTINCT "
    var first = true
    args.foreach { a =>
      if (!first) o << ", "
      first = false
      printExpr(o, a, needParens = false, indent, st)
    }
    o << ")"
  }

  private def printList(o: Out, items: Seq[E], indent: Int, st: PState,
      prependWs: Boolean): Unit = {
    // formatImplMultiline: >1 items each on a new line indented one
    // deeper; single item stays on the keyword's line
    if (items.length > 1) {
      var first = true
      items.foreach { it =>
        if (!first) o << ","
        first = false
        o << "\n" << "    " * (indent + 1)
        printExpr(o, it, needParens = false, indent + 1, st)
      }
    } else if (items.length == 1) {
      if (prependWs) o << " "
      printExpr(o, items.head, needParens = false, indent, st)
    }
  }

  private def printTableRef(o: Out, t: TableRef, indent: Int,
      st: PState): Unit = {
    t match {
      case TTable(name)
          if name.length == 1 && st.cteNames.contains(name.head) =>
        // a CTE reference prints like a subquery: newline, no indent
        // bump, the stored cte name as the identifier (01495)
        o << "\n" << "    " * indent << fmtId(name.head)
      case TTable(name) => o << " " << name.map(fmtId).mkString(".")
      case TFunc(fn) =>
        o << " "
        printFn(o, fn, needParens = false, indent, st)
      case TSub(u) =>
        o << "\n" << "    " * indent << "(\n"
        printUnion(o, u, indent + 1, st)
        o << "\n" << "    " * indent << ")"
    }
    if (t.talias != null) o << " AS " << fmtId(t.talias)
  }

  def printSelect(o: Out, s: Sel, indent: Int, st: PState): Unit = {
    st.selId += 1
    st.cteNames = st.cteNames ++ s.withItems.collect {
      case Cte(n, _) => n }
    val ind = "    " * indent
    if (s.withItems.nonEmpty) {
      o << ind << "WITH"
      printList(o, s.withItems, indent, st, prependWs = true)
      o << "\n"
    }
    o << ind << "SELECT" << (if (s.distinct) " DISTINCT" else "")
    printList(o, s.items, indent, st, prependWs = true)
    s.from.foreach { t =>
      o << "\n" << ind << "FROM"
      printTableRef(o, t, indent, st)
      if (s.fromFinal) o << "\n" << ind << "FINAL"
      s.sample.foreach { case (sz, off) =>
        o << "\n" << ind << "SAMPLE "
        printExpr(o, sz, needParens = false, indent, st)
        off.foreach { of =>
          o << " OFFSET "
          printExpr(o, of, needParens = false, indent, st)
        }
      }
    }
    s.joins.foreach { j =>
      if (j.kind == "COMMA") o << ","
      else {
        o << "\n" << ind
        if (j.global) o << "GLOBAL "
        if (j.kind != "CROSS" && j.strictness.nonEmpty)
          o << j.strictness << " "
        o << (j.kind match {
          case "INNER" => "INNER JOIN"
          case "LEFT" => "LEFT JOIN"
          case "RIGHT" => "RIGHT JOIN"
          case "FULL" => "FULL OUTER JOIN"
          case "CROSS" => "CROSS JOIN"
        })
      }
      printTableRef(o, j.t, indent, st)
      j.using.foreach { us =>
        o << " USING ("
        var first = true
        us.foreach { u =>
          if (!first) o << ", "
          first = false
          printExpr(o, u, needParens = false, indent, st)
        }
        o << ")"
      }
      j.on.foreach { e =>
        o << " ON "
        printExpr(o, e, needParens = false, indent, st)
      }
    }
    s.arrayJoins.foreach { aj =>
      o << "\n" << ind << (if (aj.left) "LEFT " else "") << "ARRAY JOIN"
      printList(o, aj.items, indent, st, prependWs = true)
    }
    s.prewhere.foreach { e =>
      o << "\n" << ind << "PREWHERE "
      printExpr(o, e, needParens = false, indent, st)
    }
    s.where.foreach { e =>
      o << "\n" << ind << "WHERE "
      printExpr(o, e, needParens = false, indent, st)
    }
    if (s.groupBy.nonEmpty) {
      o << "\n" << ind << "GROUP BY"
      printList(o, s.groupBy, indent, st, prependWs = true)
      if (s.rollup) o << "\n" << ind << "    WITH ROLLUP"
      if (s.cube) o << "\n" << ind << "    WITH CUBE"
    }
    if (s.groupingSets.nonEmpty) {
      o << "\n" << ind << "GROUP BY\n" << ind << "    GROUPING SETS ("
      if (s.groupingSets.length > 1) {
        var first = true
        s.groupingSets.foreach { g =>
          if (!first) o << ","
          first = false
          o << "\n" << "    " * (indent + 2) << "("
          var f2 = true
          g.foreach { e =>
            if (!f2) o << ", "
            f2 = false
            printExpr(o, e, needParens = false, indent + 2, st)
          }
          o << ")"
        }
      } else s.groupingSets.foreach { g =>
        o << "("
        var f2 = true
        g.foreach { e =>
          if (!f2) o << ", "
          f2 = false
          printExpr(o, e, needParens = false, indent, st)
        }
        o << ")"
      }
      o << ")"
    }
    if (s.totals) o << "\n" << ind << "    WITH TOTALS"
    s.having.foreach { e =>
      o << "\n" << ind << "HAVING "
      printExpr(o, e, needParens = false, indent, st)
    }
    if (s.orderBy.nonEmpty) {
      o << "\n" << ind << "ORDER BY"
      val many = s.orderBy.length > 1
      var first = true
      s.orderBy.foreach { oi =>
        if (!first) o << ","
        first = false
        if (many) o << "\n" << "    " * (indent + 1) else o << " "
        printExpr(o, oi.e, needParens = false, indent + (if (many) 1 else 0), st)
        o << (if (oi.desc) " DESC" else " ASC")
        if (oi.nullsSpec)
          o << " NULLS " << (if (oi.nullsFirst == !oi.desc) "FIRST"
            else "LAST") // direction==1: FIRST iff nullsFirst
        oi.collate.foreach { ce =>
          o << " COLLATE "
          printExpr(o, ce, needParens = false, indent, st)
        }
        if (oi.withFill) {
          o << " WITH FILL"
          oi.fillFrom.foreach { fe =>
            o << " FROM "; printExpr(o, fe, needParens = false, indent, st)
          }
          oi.fillTo.foreach { fe =>
            o << " TO "; printExpr(o, fe, needParens = false, indent, st)
          }
          oi.fillStep.foreach { fe =>
            o << " STEP "; printExpr(o, fe, needParens = false, indent, st)
          }
        }
      }
    }
    s.limitBy.foreach { case (off, len, bys) =>
      o << "\n" << ind << "LIMIT "
      off.foreach { of =>
        printExpr(o, of, needParens = false, indent, st); o << ", "
      }
      printExpr(o, len, needParens = false, indent, st)
      o << " BY"
      printList(o, bys, indent, st, prependWs = true)
    }
    s.limit.foreach { case (off, len, ties) =>
      if (len == null) {
        o << "\n" << ind << "OFFSET "
        off.foreach(of => printExpr(o, of, needParens = false, indent, st))
      } else {
        o << "\n" << ind << "LIMIT "
        off.foreach { of =>
          printExpr(o, of, needParens = false, indent, st); o << ", "
        }
        printExpr(o, len, needParens = false, indent, st)
        if (ties) o << " WITH TIES"
      }
    }
    if (s.settings.nonEmpty) {
      o << "\n" << ind << "SETTINGS " <<
        s.settings.map { case (k, v) => s"$k = $v" }.mkString(", ")
    }
  }

  def printUnion(o: Out, u: Union, indent: Int, st: PState): Unit = {
    val ind = "    " * indent
    var i = 0
    u.children.foreach { c =>
      if (i > 0) o << "\n" << ind << u.modes(i - 1) << "\n"
      c match {
        case Left(s) => printSelect(o, s, indent, st)
        case Right(un) =>
          if (un.children.length == 1)
            un.children.head match {
              case Left(s) => printSelect(o, s, indent, st)
              case Right(u2) => printUnion(o, u2, indent, st)
            }
          else {
            o << ind << "(\n"
            printUnion(o, un, indent + 1, st)
            o << "\n" << ind << ")"
          }
      }
      i += 1
    }
  }

  // ===================== normalization & passes =====================

  private def conf(name: String, default: String): String =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.ch." + name, default)
    catch { case _: Throwable => default }

  private def confBool(name: String, default: Boolean): Boolean =
    conf(name, if (default) "1" else "0").trim match {
      case "1" | "true" | "True" => true
      case _ => false
    }

  /** Flatten nested unions of the SAME mode; resolve bare UNION to the
    * union_default_mode (ALL unless set). A nested union with a
    * DIFFERENT mode keeps its parens (ref
    * NormalizeSelectWithUnionQueryVisitor). */
  private def normalizeUnion(u: Union): Union = {
    val defMode = conf("union_default_mode", "ALL") match {
      case "'DISTINCT'" | "DISTINCT" => "UNION DISTINCT"
      case _ => "UNION ALL"
    }
    val modes = u.modes.map(m => if (m == "UNION") defMode else m)
    if (u.children.length == 1) {
      u.children.head match {
        case Right(un) => return normalizeUnion(un)
        case Left(s) => return Union(Seq(Left(s)), Nil)
      }
    }
    val uniformMode = modes.distinct.length == 1
    val m = if (modes.nonEmpty) modes.head else defMode
    val newChildren = scala.collection.mutable.ArrayBuffer
      .empty[Either[Sel, Union]]
    val newModes = scala.collection.mutable.ArrayBuffer.empty[String]
    var idx = 0
    u.children.foreach { c =>
      val mode = if (idx == 0) null else modes(idx - 1)
      idx += 1
      val cc: Either[Sel, Union] = c match {
        case Right(un) =>
          val nn = normalizeUnion(un)
          if (nn.children.length == 1) nn.children.head else Right(nn)
        case l => l
      }
      cc match {
        case Right(nn)
            if uniformMode &&
              nn.modes.nonEmpty && nn.modes.distinct == Seq(m) &&
              (m == "UNION ALL" ||
                (m == "UNION DISTINCT" && (mode == null || mode == m))) =>
          // same-mode nested chain flattens into the parent
          var j = 0
          nn.children.foreach { gc =>
            if (mode != null && j == 0) newModes += mode
            else if (j > 0) newModes += m
            newChildren += gc
            j += 1
          }
        case other =>
          if (mode != null) newModes += mode
          newChildren += other
      }
    }
    Union(newChildren.toSeq, newModes.toSeq)
  }

  // ===================== entry =====================

  /** Parse one CH SELECT/UNION statement. Public for tests. */
  def parse(sql: String): Option[Union] = {
    val toks = lex(sql.trim.stripSuffix(";")) match {
      case Some(t) if t.nonEmpty => t
      case _ => return None
    }
    val p = new P(toks)
    try {
      val u = parseUnionP(p)
      // a trailing FORMAT <name> is not part of the displayed query
      if (p.kw("FORMAT")) p.next()
      if (!p.done) return None
      Some(u)
    } catch { case _: Bail => None }
  }

  /** EXPLAIN SYNTAX: parse → passes → print. None = unsupported.
    * An INSERT INTO … [FROM INFILE …] SELECT prefix glues onto the
    * select's first line (ref ASTInsertQuery::formatImpl; 02165). */
  def explainSyntax(sql: String): Option[Seq[String]] = {
    val insRe = ("(?is)^\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?" +
      "(`?[\\w.]+`?)\\s+(FROM\\s+INFILE\\s+('[^']*')\\s+)?" +
      "(?=(WITH|SELECT)\\b)(.*)$").r
    insRe.findFirstMatchIn(sql.trim) match {
      case Some(m) =>
        val prefix = "INSERT INTO " + m.group(1) +
          Option(m.group(3)).map(f => s" FROM INFILE $f").getOrElse("") +
          " "
        explainSyntax(m.group(5)).map {
          case head +: tail => (prefix + head) +: tail
          case other => other
        }
      case None =>
        val u0 = parse(sql).getOrElse(return None)
        try {
          val u1 = normalizeUnion(u0)
          val u2 = ChExplainPasses.run(u1)
          val o = new Out
          printUnion(o, u2, 0, new PState)
          Some(o.result)
        } catch { case _: Throwable => None }
    }
  }
}
