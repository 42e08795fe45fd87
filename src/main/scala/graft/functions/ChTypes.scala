package graft.functions

/** Static ClickHouse type inference over CH expression text — powers
  * `toTypeName(expr)` (ref src/Functions/toTypeName.cpp: returns the
  * *compile-time* type name, so it can be folded to a string literal
  * during translation when the type is statically known).
  *
  * The model follows the reference's literal typing (Field → smallest
  * fitting integer type, ref src/DataTypes/FieldToDataType.cpp), binary
  * arithmetic promotion (ref src/Core/NumberTraits.h: result size =
  * 2 × max(operand sizes) capped at 64 bits, signed if either side is),
  * and least-supertype (ref src/DataTypes/getLeastSupertype.cpp).
  * Inference is best-effort: `None` means "not statically known here",
  * and the caller leaves the SQL untouched.
  */
object ChTypes {

  // ---- type model ----
  sealed trait T { def name: String }
  case class Scalar(name: String) extends T
  case class Nullable(inner: T) extends T {
    def name = s"Nullable(${inner.name})"
  }
  case class LowCard(inner: T) extends T {
    def name = s"LowCardinality(${inner.name})"
  }
  case class Arr(elem: T) extends T { def name = s"Array(${elem.name})" }
  case class Tup(elems: Seq[T]) extends T {
    def name = s"Tuple(${elems.map(_.name).mkString(", ")})"
  }
  case class MapT(k: T, v: T) extends T {
    def name = s"Map(${k.name}, ${v.name})"
  }

  val Nothing_ = Scalar("Nothing")
  val UInt8 = Scalar("UInt8"); val UInt16 = Scalar("UInt16")
  val UInt32 = Scalar("UInt32"); val UInt64 = Scalar("UInt64")
  val Int8 = Scalar("Int8"); val Int16 = Scalar("Int16")
  val Int32 = Scalar("Int32"); val Int64 = Scalar("Int64")
  val Float32 = Scalar("Float32"); val Float64 = Scalar("Float64")
  val Str = Scalar("String"); val DateT = Scalar("Date")
  val Date32T = Scalar("Date32"); val DateTimeT = Scalar("DateTime")
  val BoolT = Scalar("Bool")

  private def isInt(t: T): Boolean = t match {
    case Scalar(n) => n.startsWith("UInt") || n.startsWith("Int") || n == "Bool"
    case _ => false
  }
  private def isFloat(t: T): Boolean = t == Float32 || t == Float64
  private def signed(t: T): Boolean = t match {
    case Scalar(n) => n.startsWith("Int")
    case _ => false
  }
  private def bits(t: T): Int = t match {
    case Scalar("Bool") => 8
    case Scalar(n) => n.dropWhile(!_.isDigit) match {
      case "" => 0
      case d => d.toInt
    }
    case _ => 0
  }
  private def intOf(sgn: Boolean, b: Int): T = {
    val bb = if (b > 128) 256 else if (b > 64) 128 else b
    Scalar((if (sgn) "Int" else "UInt") + bb)
  }
  /** CH nextSize: widths double below 64 bits and CAP at 64 — there is
    * no auto-promotion to Int128 (ref src/DataTypes/NumberTraits.h:32,
    * "(U)Int64 backward compatibility"). Big-int operands (128/256)
    * keep their own width. */
  private def nextBits(b: Int): Int = if (b < 64) b * 2 else b

  // ---- expression AST ----
  sealed trait E
  case class IntL(v: BigInt) extends E
  case class FloL(v: Double) extends E
  case class StrL(v: String) extends E
  case object NullL extends E
  case class BoolL(v: Boolean) extends E
  case class Id(name: String) extends E
  case class Fn(name: String, args: Seq[E]) extends E
  case class ArrL(items: Seq[E]) extends E
  case class TupL(items: Seq[E]) extends E
  case class Bin(op: String, l: E, r: E) extends E
  case class Un(op: String, e: E) extends E
  case class CastE(e: E, tpe: String) extends E
  case class Lambda(params: Seq[String], body: E) extends E

  // ---- tokenizer ----
  private case class Tok(kind: String, text: String)

  private def tokenize(s: String): Option[Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else if (ch == '\'') { done = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!done) return None
        out += Tok("str", sb.toString)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val st = i
        var isFloat = false
        if (c == '0' && i + 1 < n &&
            (s.charAt(i + 1) == 'b' || s.charAt(i + 1) == 'B') &&
            i + 2 < n && (s.charAt(i + 2) == '0' || s.charAt(i + 2) == '1')) {
          // 0b… binary literal (ref Lexer.cpp Number)
          i += 2
          val st2 = i
          while (i < n && (s.charAt(i) == '0' || s.charAt(i) == '1')) i += 1
          out += Tok("bin", s.substring(st2, i))
        } else if (c == '0' && i + 1 < n &&
            (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && Character.digit(s.charAt(i), 16) >= 0) i += 1
          // hex FLOAT: 0x123p4 binary exponent (the CH/C form)
          if (i < n && (s.charAt(i) == 'p' || s.charAt(i) == 'P')) {
            i += 1
            if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
            while (i < n && s.charAt(i).isDigit) i += 1
            out += Tok("hexfloat", s.substring(st, i))
          } else out += Tok("hex", s.substring(st + 2, i))
        } else {
          while (i < n && s.charAt(i).isDigit) i += 1
          if (i < n && s.charAt(i) == '.' &&
              !(i + 1 < n && s.charAt(i + 1) == '.')) { // 1..2 range? no
            isFloat = true; i += 1
            while (i < n && s.charAt(i).isDigit) i += 1
          }
          if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
            val j = i + 1
            val k = if (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-'))
              j + 1 else j
            if (k < n && s.charAt(k).isDigit) {
              isFloat = true; i = k
              while (i < n && s.charAt(i).isDigit) i += 1
            }
          }
          out += Tok(if (isFloat) "float" else "int", s.substring(st, i))
        }
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_'))
          i += 1
        out += Tok("id", s.substring(st, i))
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Seq("->", "::", "<=", ">=", "!=", "==", "||").contains(two)) {
          out += Tok("op", two); i += 2
        } else if ("+-*/%(),[]<>=.?:".indexOf(c) >= 0) {
          out += Tok("op", c.toString); i += 1
        } else return None // unknown char — bail out
      }
    }
    Some(out.result())
  }

  // ---- parser (precedence climbing) ----
  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(o: String): Boolean =
      peek.exists(t => t.kind == "op" && t.text == o) && { pos += 1; true }

    def parseExpr(): Option[E] = parseTernary()

    private def parseTernary(): Option[E] =
      parseBin(0).flatMap { c =>
        if (expectOp("?")) for {
          a <- parseTernary()
          _ <- if (expectOp(":")) Some(()) else None
          b <- parseTernary()
        } yield Fn("if", Seq(c, a, b))
        else Some(c)
      }

    private val levels: Seq[Seq[String]] = Seq(
      Seq("or"), Seq("and"), Seq("=", "==", "!=", "<", ">", "<=", ">="),
      Seq("||"), Seq("+", "-"), Seq("*", "/", "%"))

    private def parseBin(lvl: Int): Option[E] = {
      if (lvl >= levels.length) return parseUnary()
      var left = parseBin(lvl + 1).getOrElse(return None)
      var continue = true
      while (continue) {
        continue = false
        peek match {
          case Some(Tok(k, t))
              if (k == "op" || k == "id") &&
                levels(lvl).contains(t.toLowerCase) =>
            pos += 1
            parseBin(lvl + 1) match {
              case Some(r) => left = Bin(t.toLowerCase, left, r)
                continue = true
              case None => return None
            }
          case _ =>
        }
      }
      Some(left)
    }

    private def parseUnary(): Option[E] = peek match {
      case Some(Tok("op", "-")) => pos += 1
        parseUnary().map {
          case IntL(v) => IntL(-v)
          case FloL(v) => FloL(-v)
          case e => Un("-", e)
        }
      case Some(Tok("id", t)) if t.equalsIgnoreCase("not") => pos += 1
        parseUnary().map(Un("not", _))
      case _ => parsePostfix()
    }

    private def parsePostfix(): Option[E] = {
      var e = parsePrimary().getOrElse(return None)
      var continue = true
      while (continue) {
        continue = false
        peek match {
          case Some(Tok("op", "::")) => pos += 1
            parseTypeName() match {
              case Some(t) => e = CastE(e, t); continue = true
              case None => return None
            }
          case Some(Tok("op", "[")) => pos += 1
            val idx = parseExpr().getOrElse(return None)
            if (!expectOp("]")) return None
            e = Fn("arrayElement", Seq(e, idx)); continue = true
          case Some(Tok("op", ".")) if toks.lift(pos + 1)
              .exists(_.kind == "int") => pos += 1
            val k = next().text.toInt
            e = Fn("tupleElement", Seq(e, IntL(k))); continue = true
          case _ =>
        }
      }
      Some(e)
    }

    /** type name after :: or in CAST( … AS T): greedy word + optional
      * balanced parens/angle args */
    def parseTypeName(): Option[String] = peek match {
      case Some(Tok("id", w)) => pos += 1
        val sb = new StringBuilder(w)
        if (peek.exists(t => t.kind == "op" && t.text == "(")) {
          var depth = 0
          var done = false
          while (!done && pos < toks.length) {
            val t = next()
            if (t.kind == "id" && sb.nonEmpty &&
              sb.last.isLetterOrDigit) sb.append(' ')
            sb.append(t.kind match {
              case "str" => "'" + t.text + "'"
              case _ => t.text
            })
            if (t.kind == "op" && t.text == "(") depth += 1
            if (t.kind == "op" && t.text == ")") { depth -= 1
              if (depth == 0) done = true }
          }
          if (!done) return None
        }
        Some(sb.toString)
      case _ => None
    }

    private def parsePrimary(): Option[E] = peek match {
      case Some(Tok("int", t)) => pos += 1; Some(IntL(BigInt(t)))
      case Some(Tok("hex", t)) => pos += 1; Some(IntL(BigInt(t, 16)))
      case Some(Tok("bin", t)) => pos += 1; Some(IntL(BigInt(t, 2)))
      case Some(Tok("hexfloat", t)) => pos += 1
        Some(FloL(java.lang.Double.parseDouble(t)))
      case Some(Tok("float", t)) => pos += 1; Some(FloL(t.toDouble))
      case Some(Tok("str", t)) => pos += 1; Some(StrL(t))
      case Some(Tok("id", t)) if t.equalsIgnoreCase("null") =>
        pos += 1; Some(NullL)
      case Some(Tok("id", t)) if t.equalsIgnoreCase("inf") =>
        pos += 1; Some(FloL(Double.PositiveInfinity))
      case Some(Tok("id", t)) if t.equalsIgnoreCase("nan") =>
        pos += 1; Some(FloL(Double.NaN))
      case Some(Tok("id", t)) if t.equalsIgnoreCase("true") =>
        pos += 1; Some(BoolL(true))
      case Some(Tok("id", t)) if t.equalsIgnoreCase("false") =>
        pos += 1; Some(BoolL(false))
      case Some(Tok("id", t)) => pos += 1
        if (expectOp("(")) {
          if (t.equalsIgnoreCase("cast")) {
            // CAST(e AS T) keyword form (the 2-arg call form was already
            // rewritten before inference runs)
            val e = parseExpr().getOrElse(return None)
            peek match {
              case Some(Tok("id", as)) if as.equalsIgnoreCase("as") =>
                pos += 1
                val tn = parseTypeName().getOrElse(return None)
                if (!expectOp(")")) return None
                Some(CastE(e, tn))
              case _ => None
            }
          } else {
            val args = Vector.newBuilder[E]
            if (!expectOp(")")) {
              var done = false
              while (!done) {
                val a = parseLambdaOrExpr().getOrElse(return None)
                args += a
                if (expectOp(")")) done = true
                else if (!expectOp(",")) return None
              }
            }
            Some(Fn(t, args.result()))
          }
        } else Some(Id(t))
      case Some(Tok("op", "[")) => pos += 1
        val items = Vector.newBuilder[E]
        if (!expectOp("]")) {
          var done = false
          while (!done) {
            items += parseExpr().getOrElse(return None)
            if (expectOp("]")) done = true
            else if (!expectOp(",")) return None
          }
        }
        Some(ArrL(items.result()))
      case Some(Tok("op", "(")) => pos += 1
        val items = Vector.newBuilder[E]
        var done = false
        while (!done) {
          items += parseExpr().getOrElse(return None)
          if (expectOp(")")) done = true
          else if (!expectOp(",")) return None
        }
        val got = items.result()
        Some(if (got.length == 1) got.head else TupL(got))
      case _ => None
    }

    private def parseLambdaOrExpr(): Option[E] = {
      // `x -> body` or `(x, y) -> body`
      val save = pos
      peek match {
        case Some(Tok("id", p1)) if toks.lift(pos + 1)
            .exists(t => t.kind == "op" && t.text == "->") =>
          pos += 2
          return parseExpr().map(b => Lambda(Seq(p1), b))
        case Some(Tok("op", "(")) =>
          // try param list
          var j = pos + 1
          val ps = Vector.newBuilder[String]
          var ok = true
          var done = false
          while (ok && !done && j < toks.length) {
            (toks(j), toks.lift(j + 1)) match {
              case (Tok("id", p), Some(Tok("op", ","))) => ps += p; j += 2
              case (Tok("id", p), Some(Tok("op", ")"))) => ps += p; j += 2
                done = true
              case _ => ok = false
            }
          }
          if (ok && done && toks.lift(j)
              .exists(t => t.kind == "op" && t.text == "->")) {
            pos = j + 1
            return parseExpr().map(b => Lambda(ps.result(), b))
          }
          pos = save
        case _ =>
      }
      parseExpr()
    }
  }

  def parse(exprText: String): Option[E] = tokenize(exprText).flatMap { ts =>
    val p = new P(ts)
    p.parseExpr().filter(_ => p.pos == ts.length)
  }

  // ---- CH type-name text → T (for CAST / :: targets) ----
  def parseTypeText(t0: String): Option[T] = {
    val t = t0.trim
    val paren = t.indexOf('(')
    val (head, inner) = if (paren < 0) (t, "")
      else (t.substring(0, paren).trim,
        t.substring(paren + 1, t.lastIndexOf(')')).trim)
    def splitTop(s: String): Seq[String] = {
      val out = Vector.newBuilder[String]
      var depth = 0; var st = 0; var inStr = false
      for (i <- 0 until s.length) {
        val c = s.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) { out += s.substring(st, i); st = i + 1 }
      }
      out += s.substring(st)
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    head match {
      case "Nullable" => parseTypeText(inner).map(Nullable)
      case "LowCardinality" => parseTypeText(inner).map(LowCard)
      case "Array" =>
        if (inner.isEmpty) None else parseTypeText(inner).map(Arr)
      case "Tuple" =>
        val rawParts = splitTop(inner)
        val named = rawParts.exists(p => {
          val sp = p.lastIndexOf(' ')
          sp > 0 && !p.contains('(') &&
            p.substring(0, sp).trim.matches("[A-Za-z_]\\w*")
        })
        val parts = rawParts.map { p =>
          // named tuple element `name T`
          val sp = p.lastIndexOf(' ')
          if (sp > 0 && !p.contains('(')) p.substring(sp + 1) else p
        }
        val ts = parts.map(parseTypeText)
        if (!ts.forall(_.isDefined)) None
        // a named tuple prints its element names (toTypeName contract)
        else if (named) Some(Scalar(
          s"Tuple(${rawParts.map(_.trim).mkString(", ")})"))
        else Some(Tup(ts.map(_.get)))
      case "Map" =>
        splitTop(inner) match {
          case Seq(k, v) => for (kt <- parseTypeText(k); vt <- parseTypeText(v))
            yield MapT(kt, vt)
          case _ => None
        }
      case "Decimal32" => Some(Scalar(s"Decimal(9, $inner)"))
      case "Decimal64" => Some(Scalar(s"Decimal(18, $inner)"))
      case "Decimal128" => Some(Scalar(s"Decimal(38, $inner)"))
      case "Decimal" =>
        splitTop(inner) match {
          case Seq(p, s) => Some(Scalar(s"Decimal($p, $s)"))
          case _ => None
        }
      case "DateTime64" =>
        splitTop(inner) match {
          case Seq(s) => Some(Scalar(s"DateTime64($s)"))
          case Seq(s, tz) => Some(Scalar(s"DateTime64($s, $tz)"))
          case _ => None
        }
      case "DateTime" if inner.nonEmpty => Some(Scalar(s"DateTime($inner)"))
      case "FixedString" => Some(Scalar(s"FixedString($inner)"))
      case "UInt8" | "UInt16" | "UInt32" | "UInt64" | "UInt128" | "UInt256" |
          "Int8" | "Int16" | "Int32" | "Int64" | "Int128" | "Int256" |
          "Float32" | "Float64" | "String" | "Date" | "Date32" |
          "DateTime" | "UUID" | "Bool" | "IPv4" | "IPv6" | "Nothing" =>
        Some(Scalar(head))
      case _ => None
    }
  }

  // ---- least supertype (ref getLeastSupertype.cpp, common slice) ----
  def superType(a: T, b: T): Option[T] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (Nullable(x), y) => superType(x, stripN(y)).map(Nullable)
    case (x, Nullable(y)) => superType(stripN(x), y).map(Nullable)
    case (Scalar("Nothing"), y) => Some(y)
    case (x, Scalar("Nothing")) => Some(x)
    case (Arr(x), Arr(y)) => superType(x, y).map(Arr)
    case (Tup(xs), Tup(ys)) if xs.length == ys.length =>
      val zs = xs.zip(ys).map { case (x, y) => superType(x, y) }
      if (zs.forall(_.isDefined)) Some(Tup(zs.map(_.get))) else None
    case (LowCard(x), LowCard(y)) => superType(x, y).map(LowCard)
    case (LowCard(x), y) => superType(x, y)
    case (x, LowCard(y)) => superType(x, y)
    case (x, y) if isInt(x) && isInt(y) =>
      if (signed(x) == signed(y))
        Some(intOf(signed(x), math.max(bits(x), bits(y))))
      else {
        val (s, u) = if (signed(x)) (x, y) else (y, x)
        // an unsigned 64-bit operand promotes the pair to Int128 (ref
        // getLeastSupertype; values ride Decimal(38,0) in this engine)
        Some(intOf(sgn = true, math.max(bits(s), bits(u) * 2)))
      }
    case (x, y) if isFloat(x) && isFloat(y) =>
      Some(if (bits(x) >= 64 || bits(y) >= 64) Float64 else Float32)
    case (x, y) if isFloat(x) && isInt(y) =>
      Some(if (bits(y) * 2 > 32 || bits(x) == 64) Float64 else Float32)
    case (x, y) if isInt(x) && isFloat(y) => superType(y, x)
    case (Scalar("Date"), Scalar("DateTime")) => Some(DateTimeT)
    case (Scalar("DateTime"), Scalar("Date")) => Some(DateTimeT)
    // String absorbs FixedString (ref getLeastSupertype.cpp)
    case (Scalar("String"), Scalar(n)) if n.startsWith("FixedString") =>
      Some(Str)
    case (Scalar(n), Scalar("String")) if n.startsWith("FixedString") =>
      Some(Str)
    // Decimal pair: max integer digits + max scale (ref
    // getLeastSupertype.cpp decimal branch)
    case (Scalar(d1), Scalar(d2))
        if d1.startsWith("Decimal(") && d2.startsWith("Decimal(") =>
      val Re = "Decimal\\((\\d+),\\s*(\\d+)\\)".r
      (Re.findFirstMatchIn(d1), Re.findFirstMatchIn(d2)) match {
        case (Some(a), Some(b)) =>
          val (p1, s1) = (a.group(1).toInt, a.group(2).toInt)
          val (p2, s2) = (b.group(1).toInt, b.group(2).toInt)
          val s = math.max(s1, s2)
          val p = math.min(76, math.max(p1 - s1, p2 - s2) + s)
          Some(Scalar(s"Decimal($p, $s)"))
        case _ => None
      }
    case _ => None
  }
  private def stripN(t: T): T = t match {
    case Nullable(x) => x
    case x => x
  }

  // ---- inference ----
  def literalIntType(v: BigInt): T =
    if (v >= 0) {
      if (v <= 255) UInt8
      else if (v <= 65535) UInt16
      else if (v <= BigInt("4294967295")) UInt32
      else if (v <= BigInt("18446744073709551615")) UInt64
      else Float64 // the CH PARSER reads over-UInt64 literals as Float64
    } else {
      if (v >= -128) Int8
      else if (v >= -32768) Int16
      else if (v >= BigInt("-2147483648")) Int32
      else if (v >= BigInt("-9223372036854775808")) Int64
      else Float64
    }

  /** Binary arithmetic promotion (ref NumberTraits.h
    * ResultOfAdditionMultiplication / ResultOfSubtraction). */
  private def arith(op: String, l: T, r: T): Option[T] = {
    val (lc, rc) = (stripLC(l), stripLC(r))
    val nullable = lc.isInstanceOf[Nullable] || rc.isInstanceOf[Nullable]
    val (a, b) = (stripN(lc), stripN(rc))
    val res: Option[T] = op match {
      case "/" => Some(Float64)
      case "+" | "-" | "*" =>
        if (isFloat(a) || isFloat(b)) {
          val m = math.max(if (isFloat(a)) bits(a) else bits(a) * 2,
            if (isFloat(b)) bits(b) else bits(b) * 2)
          Some(if (m > 32) Float64 else Float32)
        } else if (isInt(a) && isInt(b)) {
          val sgn = signed(a) || signed(b) || op == "-"
          Some(intOf(sgn, nextBits(math.max(bits(a), bits(b)))))
        } else (a, b) match {
          case (Scalar("Date"), t) if isInt(t) => Some(DateT)
          case (t, Scalar("Date")) if isInt(t) => Some(DateT)
          case (Scalar("DateTime"), t) if isInt(t) => Some(DateTimeT)
          case (t, Scalar("DateTime")) if isInt(t) => Some(DateTimeT)
          case _ => None
        }
      case "%" =>
        // ResultOfModulo: signed dividend needs the NEXT size up from
        // the divisor (toInt32(-199) % toUInt8(200) = -199 → Int16)
        if (isFloat(a) || isFloat(b)) Some(Float64)
        else if (isInt(a) && isInt(b)) {
          val sgn = signed(a)
          Some(intOf(sgn, if (sgn) nextBits(bits(b)) else bits(b)))
        } else None
      case _ => None
    }
    res.map(t => if (nullable) Nullable(t) else t)
  }
  private def stripLC(t: T): T = t match {
    case LowCard(x) => x
    case x => x
  }

  /** Infer the CH type of `e` under alias/column environment `env`. */
  def infer(e: E, env: Map[String, T]): Option[T] = {
    def go(e: E, scope: Map[String, T]): Option[T] = e match {
      case IntL(v) => Some(literalIntType(v))
      case FloL(_) => Some(Float64)
      case StrL(_) => Some(Str)
      case NullL => Some(Nullable(Nothing_))
      case BoolL(_) => Some(BoolT)
      case Id(n) => scope.get(n)
      case ArrL(Seq()) => Some(Arr(Nothing_))
      case ArrL(items) =>
        items.map(go(_, scope)).reduce[Option[T]] {
          case (Some(x), Some(y)) => superType(x, y)
          case _ => None
        }.map(Arr)
      case TupL(items) =>
        val ts = items.map(go(_, scope))
        if (ts.forall(_.isDefined)) Some(Tup(ts.map(_.get))) else None
      case CastE(inner, tpe) =>
        // cast_keep_nullable=1 (ref Settings.h + FunctionsConversion.h
        // CastOverloadResolver): CAST of a Nullable source to a
        // non-Nullable target KEEPS the Nullable wrapper; default (0)
        // strips it (01322_cast_keep_nullable)
        val keepNullable = try {
          org.apache.spark.sql.internal.SQLConf.get
            .getConfString("graft.ch.cast_keep_nullable", "0").trim == "1"
        } catch { case _: Throwable => false }
        parseTypeText(tpe).map { t =>
          if (keepNullable && !t.isInstanceOf[Nullable] &&
            go(inner, scope).exists(_.isInstanceOf[Nullable]))
            Nullable(t)
          else t
        }
      case Un("-", IntL(v)) => Some(literalIntType(-v))
      case Un("-", FloL(_)) => Some(Float64)
      case Un("-", x) => go(x, scope).flatMap {
        case t if isInt(t) && !signed(t) =>
          Some(intOf(sgn = true, nextBits(bits(t))))
        case t if isInt(t) || isFloat(t) => Some(t)
        case Nullable(t) if isInt(t) && !signed(t) =>
          Some(Nullable(intOf(sgn = true, nextBits(bits(t)))))
        case Nullable(t) if isInt(t) || isFloat(t) => Some(Nullable(t))
        case _ => None
      }
      case Un("not", x) => go(x, scope).map {
        // NOT over the Bool display type stays Bool; numeric stays UInt8
        // (ref FunctionsLogical registration + 02179 pins)
        case Nullable(t) => Nullable(if (stripLC(t) == BoolT) BoolT else UInt8)
        case t => if (stripLC(t) == BoolT) BoolT else UInt8
      }
      case Bin(op, l, r) if Seq("+", "-", "*", "/", "%").contains(op) =>
        for (lt <- go(l, scope); rt <- go(r, scope); t <- arith(op, lt, rt))
          yield t
      case Bin(op, l, r)
          if Seq("=", "==", "!=", "<", ">", "<=", ">=").contains(op) =>
        for (lt <- go(l, scope); rt <- go(r, scope)) yield
          if (stripLC(lt).isInstanceOf[Nullable] ||
            stripLC(rt).isInstanceOf[Nullable]) Nullable(UInt8) else UInt8
      case Bin("and" | "or", l, r) =>
        // result is Bool when ANY operand is Bool, else UInt8 (02179:
        // toTypeName(1 and true) = Bool, toTypeName(1 and 10) = UInt8)
        for (lt <- go(l, scope); rt <- go(r, scope)) yield {
          def core(t: T): T = stripN(stripLC(t))
          val out = if (core(lt) == BoolT || core(rt) == BoolT) BoolT
            else UInt8
          if (stripLC(lt).isInstanceOf[Nullable] ||
            stripLC(rt).isInstanceOf[Nullable]) Nullable(out) else out
        }
      case Bin("||", l, r) =>
        for (_ <- go(l, scope); _ <- go(r, scope)) yield Str
      case Fn(name, args) => fnType(name, args, scope, go)
      case Lambda(_, _) => None
      case _ => None
    }
    go(e, env)
  }

  private def nullIfAny(args: Seq[T], t: T): T =
    if (args.exists(a => stripLC(a).isInstanceOf[Nullable])) t match {
      case Nullable(_) => t
      case _ => Nullable(t)
    } else t

  private def fnType(name0: String, args: Seq[E], scope: Map[String, T],
      go: (E, Map[String, T]) => Option[T]): Option[T] = {
    val name = name0
    def argT(i: Int): Option[T] =
      if (i < args.length) go(args(i), scope) else None
    def allT: Option[Seq[T]] = {
      val ts = args.map(go(_, scope))
      if (ts.forall(_.isDefined)) Some(ts.map(_.get)) else None
    }
    val fixed: Map[String, T] = Map(
      "toUInt8" -> UInt8, "toUInt16" -> UInt16, "toUInt32" -> UInt32,
      "toUInt64" -> UInt64, "toInt8" -> Int8, "toInt16" -> Int16,
      "toInt32" -> Int32, "toInt64" -> Int64, "toInt128" -> Scalar("Int128"),
      "toInt256" -> Scalar("Int256"), "toUInt128" -> Scalar("UInt128"),
      "toUInt256" -> Scalar("UInt256"),
      "toFloat32" -> Float32, "toFloat64" -> Float64,
      "toString" -> Str, "toDate" -> DateT, "toDate32" -> Date32T,
      "toDateTime" -> DateTimeT,
      "toIPv4" -> Scalar("IPv4"), "toIPv6" -> Scalar("IPv6"),
      "toIPv4OrDefault" -> Scalar("IPv4"), "toIPv6OrDefault" -> Scalar("IPv6"),
      "toIPv4OrNull" -> Nullable(Scalar("IPv4")),
      "toIPv6OrNull" -> Nullable(Scalar("IPv6")),
      "IPv4ToIPv6" -> Scalar("IPv6"), "cutIPv6" -> Str, "toBool" -> BoolT,
      "IPv4StringToNum" -> UInt32, "IPv6StringToNum" -> Scalar("FixedString(16)"),
      "IPv4NumToString" -> Str, "IPv6NumToString" -> Str,
      "isIPv4String" -> UInt8, "isIPv6String" -> UInt8,
      "length" -> UInt64, "count" -> UInt64, "uniq" -> UInt64,
      "uniqExact" -> UInt64,
      "cityHash64" -> UInt64, "sipHash64" -> UInt64, "intHash64" -> UInt64,
      "xxHash64" -> UInt64, "avg" -> Float64, "e" -> Float64,
      "pi" -> Float64, "exp" -> Float64, "log" -> Float64,
      "exp2" -> Float64, "log2" -> Float64, "exp10" -> Float64,
      "log10" -> Float64, "sqrt" -> Float64, "cbrt" -> Float64,
      "sin" -> Float64, "cos" -> Float64, "tan" -> Float64,
      "asin" -> Float64, "acos" -> Float64, "atan" -> Float64,
      "pow" -> Float64, "power" -> Float64, "today" -> DateT,
      "yesterday" -> DateT, "now" -> DateTimeT,
      "toYear" -> UInt16, "toMonth" -> UInt8, "toDayOfMonth" -> UInt8,
      "toDayOfWeek" -> UInt8, "toHour" -> UInt8, "toMinute" -> UInt8,
      "toSecond" -> UInt8, "toQuarter" -> UInt8, "toDayOfYear" -> UInt16,
      "toUnixTimestamp" -> UInt32,
      "concat" -> Str, "substring" -> Str, "upper" -> Str, "lower" -> Str,
      "reverse" -> Str, "trimBoth" -> Str, "repeat" -> Str,
      "replaceAll" -> Str, "replaceOne" -> Str, "hex" -> Str,
      "unhex" -> Str, "bin" -> Str, "base64Encode" -> Str,
      "position" -> UInt64, "positionCaseInsensitive" -> UInt64,
      "match" -> UInt8, "like" -> UInt8, "notLike" -> UInt8,
      "isNull" -> UInt8, "isNotNull" -> UInt8, "isNaN" -> UInt8,
      "isFinite" -> UInt8, "isInfinite" -> UInt8, "empty" -> UInt8,
      "notEmpty" -> UInt8, "isConstant" -> UInt8,
      "lengthUTF8" -> UInt64, "char_length" -> UInt64,
      "indexOf" -> UInt64, "countEqual" -> UInt64,
      "emptyArrayUInt8" -> Arr(UInt8), "emptyArrayUInt16" -> Arr(UInt16),
      "emptyArrayUInt32" -> Arr(UInt32), "emptyArrayUInt64" -> Arr(UInt64),
      "emptyArrayInt8" -> Arr(Int8), "emptyArrayInt16" -> Arr(Int16),
      "emptyArrayInt32" -> Arr(Int32), "emptyArrayInt64" -> Arr(Int64),
      "emptyArrayFloat32" -> Arr(Float32),
      "emptyArrayFloat64" -> Arr(Float64),
      "emptyArrayString" -> Arr(Str), "emptyArrayDate" -> Arr(DateT),
      "splitByChar" -> Arr(Str), "splitByString" -> Arr(Str),
      "alphaTokens" -> Arr(Str)
    )
    if (fixed.contains(name))
      return allT.map(ts => nullIfAny(ts, fixed(name))).orElse(
        if (args.isEmpty) Some(fixed(name)) else None)

    name match {
      case "materialize" | "identity" | "assumeNotNull" | "ignore" =>
        if (name == "ignore") Some(UInt8)
        else if (name == "assumeNotNull") argT(0).map(stripN)
        else argT(0)
      case "toNullable" => argT(0).map {
        case n: Nullable => n
        case t => Nullable(t)
      }
      case "toDateTime64" | "makeDateTime64" =>
        // scale/tz arg positions: toDateTime64(x, s[, tz]);
        // makeDateTime64(y,M,d,h,m,s[,frac[,scale[,tz]]]) default scale 3
        val (scaleIdx, tzIdx) =
          if (name == "toDateTime64") (1, 2) else (7, 8)
        val scale = args.lift(scaleIdx) match {
          case Some(IntL(v)) => v.toInt
          case _ => if (name == "makeDateTime64") 3
            else return None
        }
        val tz = args.lift(tzIdx) match {
          case Some(StrL(z)) => s", '$z'"
          case _ => ""
        }
        Some(Scalar(s"DateTime64($scale$tz)"))
      case "makeDate" => allT.map(ts => nullIfAny(ts, Scalar("Date")))
      case "makeDate32" => allT.map(ts => nullIfAny(ts, Scalar("Date32")))
      case "makeDateTime" =>
        val tz = args.lift(6) match {
          case Some(StrL(z)) => s"('$z')"
          case _ => ""
        }
        allT.map(ts => nullIfAny(ts.take(6), Scalar(s"DateTime$tz")))
      case "snowflakeToDateTime" =>
        val tz = args.lift(1) match {
          case Some(StrL(z)) => s"('$z')"
          case _ => ""
        }
        argT(0).map(t => nullIfAny(Seq(t), Scalar(s"DateTime$tz")))
      case "snowflakeToDateTime64" =>
        val tz = args.lift(1) match {
          case Some(StrL(z)) => s", '$z'"
          case _ => ""
        }
        argT(0).map(t => nullIfAny(Seq(t), Scalar(s"DateTime64(3$tz)")))
      case "dateTimeToSnowflake" | "dateTime64ToSnowflake" =>
        argT(0).map(t => nullIfAny(Seq(t), Int64))
      case "toLowCardinality" => argT(0).map {
        case l: LowCard => l
        case t => LowCard(t)
      }
      case "tuple" => allT.map(Tup)
      case "array" =>
        if (args.isEmpty) Some(Arr(Nothing_))
        else allT.flatMap(ts =>
          ts.map(Option(_)).reduce[Option[T]] {
            case (Some(x), Some(y)) => superType(x, y)
            case _ => None
          }.map(Arr))
      case "map" =>
        if (args.isEmpty || args.length % 2 != 0) None
        else {
          val ks = args.grouped(2).map(p => go(p(0), scope)).toSeq
          val vs = args.grouped(2).map(p => go(p(1), scope)).toSeq
          for {
            k <- ks.reduce((a, b) => for (x <- a; y <- b;
              z <- superType(x, y)) yield z)
            v <- vs.reduce((a, b) => for (x <- a; y <- b;
              z <- superType(x, y)) yield z)
          } yield MapT(k, v)
        }
      case "arrayElement" => argT(0).flatMap {
        case Arr(t) => Some(t)
        case Nullable(Arr(t)) => Some(Nullable(t))
        case _ => None
      }
      case "tupleElement" => (argT(0), args.lift(1)) match {
        case (Some(Tup(ts)), Some(IntL(i)))
            if i >= 1 && i <= ts.length => Some(ts(i.toInt - 1))
        case _ => None
      }
      case "if" => (argT(1), argT(2)) match {
        case (Some(a), Some(b)) => superType(a, b)
        case _ => None
      }
      case "plus" => (argT(0), argT(1)) match {
        case (Some(a), Some(b)) => arith("+", a, b)
        case _ => None
      }
      case "minus" => (argT(0), argT(1)) match {
        case (Some(a), Some(b)) => arith("-", a, b)
        case _ => None
      }
      case "multiply" => (argT(0), argT(1)) match {
        case (Some(a), Some(b)) => arith("*", a, b)
        case _ => None
      }
      case "divide" => Some(Float64)
      case "intDiv" | "intDivOrZero" => (argT(0), argT(1)) match {
        case (Some(a), Some(b)) if isInt(stripN(a)) && isInt(stripN(b)) =>
          Some(nullIfAny(Seq(a, b), intOf(
            signed(stripN(a)) || signed(stripN(b)), bits(stripN(a)))))
        case _ => None
      }
      case "negate" => argT(0).flatMap {
        case t if isInt(stripN(t)) && !signed(stripN(t)) =>
          Some(nullIfAny(Seq(t), intOf(sgn = true, bits(stripN(t)) * 2)))
        case t => Some(t)
      }
      case "abs" => argT(0)
      case "round" | "floor" | "ceil" | "trunc" => argT(0)
      case "toFixedString" => args.lift(1) match {
        case Some(IntL(n)) => Some(Scalar(s"FixedString($n)"))
        case _ => None
      }
      case "toDecimal32" => args.lift(1) match {
        case Some(IntL(s)) => argT(0).map(a =>
          nullIfAny(Seq(a), Scalar(s"Decimal(9, $s)")))
        case _ => None
      }
      case "toDecimal64" => args.lift(1) match {
        case Some(IntL(s)) => argT(0).map(a =>
          nullIfAny(Seq(a), Scalar(s"Decimal(18, $s)")))
        case _ => None
      }
      case "toDecimal128" => args.lift(1) match {
        case Some(IntL(s)) => argT(0).map(a =>
          nullIfAny(Seq(a), Scalar(s"Decimal(38, $s)")))
        case _ => None
      }
      case "toDateTime64" => args.lift(1) match {
        case Some(IntL(s)) => args.lift(2) match {
          case Some(StrL(tz)) => Some(Scalar(s"DateTime64($s, '$tz')"))
          case _ => Some(Scalar(s"DateTime64($s)"))
        }
        case _ => None
      }
      case "arrayMap" => args match {
        case Seq(Lambda(ps, body), rest @ _*) if ps.length == rest.length =>
          val elemTs = rest.map(a => go(a, scope).flatMap {
            case Arr(t) => Some(t)
            case _ => None
          })
          if (elemTs.forall(_.isDefined)) {
            val inner = scope ++ ps.zip(elemTs.map(_.get))
            go(body, inner).map(Arr)
          } else None
        case _ => None
      }
      case "arrayFilter" | "arraySort" | "arrayReverseSort" |
          "arrayDistinct" | "arrayCompact" | "arraySlice" | "arrayConcat" |
          "arrayResize" | "arrayReverse" => argT(0)
      case "arraySum" => argT(0).flatMap {
        case Arr(t) if isInt(t) =>
          Some(if (signed(t)) Int64 else UInt64)
        case Arr(t) if isFloat(t) => Some(Float64)
        case _ => None
      }
      case "arrayJoin" => argT(0).flatMap {
        case Arr(t) => Some(t)
        case _ => None
      }
      case "range" => Some(Arr(UInt64))
      case "sum" => argT(0).map {
        case t if isInt(stripN(t)) =>
          nullIfAny(Seq(t), if (signed(stripN(t))) Int64 else UInt64)
        case t => nullIfAny(Seq(t), Float64)
      }
      case "min" | "max" | "any" | "anyLast" => argT(0)
      case "least" | "greatest" | "LEAST" | "GREATEST" =>
        (argT(0), argT(1)) match {
          case (Some(a), Some(b)) =>
            // Int64 vs UInt64 takes the accurate-comparison special case
            // BEFORE supertyping (ref "new behavior" 00413): least fits
            // the SIGNED type, greatest the UNSIGNED; any other
            // mixed-sign pair promotes normally (Int128 for UInt64 —
            // 01246)
            val (sa, sb) = (stripLC(stripN(a)), stripLC(stripN(b)))
            if (isInt(sa) && isInt(sb) && signed(sa) != signed(sb) &&
              bits(sa) == 64 && bits(sb) == 64)
              Some(if (name.equalsIgnoreCase("least"))
                intOf(sgn = true, 64)
              else intOf(sgn = false, 64))
            else superType(a, b)
          case _ => None
        }
      // random family: the argument (if any) only seeds per-column state,
      // the return type is fixed (ref src/Functions/FunctionsRandom.h)
      case "rand" | "rand32" | "randConstant" => Some(UInt32)
      case "rand64" => Some(UInt64)
      case "randCanonical" => Some(Float64)
      case "randomPrintableASCII" | "randomString" => Some(Scalar("String"))
      // coalesce returns Nullable of the args' supertype (ref
      // FunctionCoalesce: wraps in Nullable unless a tail arg proves
      // non-nullable — the curated tests use all-nullable args)
      case "coalesce" =>
        val ts = args.map(a => go(a, scope))
        if (!ts.forall(_.isDefined)) None
        else {
          def core(t: T): T = t match {
            case LowCard(i) => core(i)
            case Nullable(i) => core(i)
            case x => x
          }
          val anyLC = ts.flatten.exists {
            case LowCard(_) => true
            case Nullable(LowCard(_)) => true
            case _ => false
          }
          val nonNull = ts.flatten.map(core).filter(_ != Nothing_)
          val merged =
            if (nonNull.isEmpty) Some(Nothing_)
            else nonNull.map(Option(_)).reduce[Option[T]] {
              case (Some(x), Some(y)) => superType(x, y)
              case _ => None
            }
          merged.map(t =>
            if (anyLC) LowCard(Nullable(t)) else Nullable(t))
        }
      case "toUnixTimestamp64Milli" | "toUnixTimestamp64Micro" |
          "toUnixTimestamp64Nano" => Some(Int64)
      case "fromUnixTimestamp64Milli" =>
        Some(Scalar("DateTime64(3)"))
      case "fromUnixTimestamp64Micro" =>
        Some(Scalar("DateTime64(6)"))
      case "fromUnixTimestamp64Nano" =>
        Some(Scalar("DateTime64(9)"))
      case "reinterpretAsFixedString" =>
        argT(0).map(t => Scalar(
          s"FixedString(${math.max(bits(stripN(stripLC(t))) / 8, 1)})"))
      case "xor" | "and" | "or" | "not" =>
        // Bool when any operand is Bool, else UInt8 (02179)
        allT.map { ts =>
          val out = if (ts.exists(t => stripN(stripLC(t)) == BoolT)) BoolT
            else UInt8
          if (ts.exists(t => stripLC(t).isInstanceOf[Nullable]))
            Nullable(out) else out
        }
      case "groupBitAnd" | "groupBitOr" | "groupBitXor" |
          "sumWithOverflow" => argT(0)
      // (keys, values) arrays in → Tuple(Array(K), Array(V)) out; the
      // 1-arg tuple form already carries that shape (pinned 01280)
      case "sumMap" | "minMap" | "maxMap" =>
        if (allT.isDefined && allT.get.size >= 2)
          allT.map(ts => Tup(Seq(stripN(ts(0)), stripN(ts(1)))))
        else argT(0)
      case "count" => Some(UInt64)
      // -SimpleState wraps the base aggregate's RESULT type (ref
      // DataTypeCustomSimpleAggregateFunction.cpp)
      case n if n.endsWith("SimpleState") && n.length > 11 =>
        val base = n.dropRight(11)
        fnType(base, args, scope, go).orElse(argT(0))
          .map(t => Scalar(s"SimpleAggregateFunction($base, ${t.name})"))
      // aggregate-combinator chains (ref
      // AggregateFunctionCombinatorFactory.cpp suffix peel): -If drops
      // its trailing condition, -OrNull wraps Nullable, -State/-Merge
      // keep the value type under the value-is-the-state model
      case n if n.endsWith("If") && n.length > 2 =>
        fnType(n.dropRight(2), args.dropRight(1), scope, go)
      case n if n.endsWith("OrNull") && n.length > 6 =>
        fnType(n.dropRight(6), args, scope, go).map {
          case nl: Nullable => nl
          case t => Nullable(t)
        }
      case n if n.endsWith("Merge") && n.length > 5 =>
        fnType(n.dropRight(5), args, scope, go)
      case n if n.endsWith("State") && n.length > 5 =>
        fnType(n.dropRight(5), args, scope, go)
      // initializeAggregation('fnState', args…) carries the CH state
      // type name (ref src/Functions/initializeAggregation.cpp; 02097
      // pins AggregateFunction(uniqExact, Nullable(UInt8)))
      case "initializeAggregation" if args.nonEmpty =>
        args.head match {
          case StrL(raw) =>
            val base0 = raw.trim.replaceAll("\\(.*\\)$", "")
            if (base0.endsWith("State")) {
              val argTs = args.tail.map(a => go(a, scope))
              if (argTs.forall(_.isDefined))
                Some(Scalar(s"AggregateFunction(${base0.dropRight(5)}, " +
                  argTs.map(_.get.name).mkString(", ") + ")"))
              else None
            } else fnType(base0, args.tail, scope, go)
          case _ => None
        }
      case _ => None
    }
  }

  /** Full pipeline: expression text (+ name env) → CH type name. */
  def typeNameOf(exprText: String,
      env: Map[String, T] = Map.empty): Option[String] =
    parse(exprText).flatMap(infer(_, env)).map(_.name)
}
