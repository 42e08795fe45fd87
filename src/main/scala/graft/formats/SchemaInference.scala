package graft.formats

/** CH text-format schema inference (ref src/Formats/SchemaInferenceUtils.cpp,
  * EscapingRuleUtils.cpp): `desc format(Fmt, 'data')` infers CH types from
  * sample rows. Re-expressed directly over a small CH-type AST (the
  * output of DESCRIBE is the CH type NAME, so no Spark types needed).
  *
  * Rules (pinned by 02268/02325/02326/02327/02416/02497/02499/02536/
  * 02587/02674 and Settings.h defaults):
  *  - JSON integers → Int64, other numbers → Float64; Int64+Float64
  *    merge to Float64; integers beyond Int64/UInt64 → Float64
  *  - strings: date "YYYY-MM-DD" → Date, datetime → DateTime64(9), a
  *    fully-numeric string → its number (numbers_from_strings, default
  *    on); conflicts among STRING-SOURCED types fall back to String,
  *    while a true JSON number vs a non-numeric string is TYPE_MISMATCH
  *  - arrays: unify elements → Array(T), else Tuple(t1..tn); a Tuple
  *    whose elements unify with an Array's element merges into the Array
  *  - objects: Map(String, unified values); value conflict → Object
  *    ('json') when allow_experimental_object_type, else String when
  *    read_objects_as_strings (default on), else error
  *  - nulls: Nothing merges into anything and marks nullability;
  *    schema_inference_make_columns_nullable (default on) wraps every
  *    leaf in Nullable
  */
object SchemaInference {

  case class Settings(
      makeNullable: Boolean = true,
      numbersFromStrings: Boolean = true,
      inferIntegers: Boolean = true,
      inferDates: Boolean = true,
      inferDatetimes: Boolean = true,
      objectType: Boolean = false,
      objectsAsStrings: Boolean = true,
      numbersAsStrings: Boolean = false,
      boolsAsNumbers: Boolean = true)

  object Settings {
    def from(get: String => Option[String]): Settings = {
      def b(k: String, d: Boolean) =
        get(k).map(v => v == "1" || v == "true").getOrElse(d)
      Settings(
        makeNullable = b("schema_inference_make_columns_nullable", true),
        numbersFromStrings =
          b("input_format_json_try_infer_numbers_from_strings", true),
        inferIntegers = b("input_format_try_infer_integers", true),
        inferDates = b("input_format_try_infer_dates", true),
        inferDatetimes = b("input_format_try_infer_datetimes", true),
        objectType = b("allow_experimental_object_type", false),
        objectsAsStrings =
          b("input_format_json_read_objects_as_strings", true),
        numbersAsStrings =
          b("input_format_json_read_numbers_as_strings", false),
        boolsAsNumbers =
          b("input_format_json_read_bools_as_numbers", true))
    }
  }

  // ---- CH type AST. `fromString` marks string-sourced leaves (they may
  // fall back to String on conflict); `nullable` records observed nulls.
  sealed trait T { var nullable: Boolean = false }
  case class TNothing() extends T { nullable = true }
  // `unsigned` = value overflowed Int64 but fits UInt64 (ref
  // SchemaInferenceUtils.cpp tryInferNumber:653-708 tries UInt64 before
  // falling back to Float64; Int64+UInt64 merge to UInt64, :81-95)
  case class TInt(fromString: Boolean = false,
      unsigned: Boolean = false) extends T
  case class TFloat(fromString: Boolean = false) extends T
  case class TBool() extends T
  case class TString() extends T
  case class TDate() extends T
  case class TDateTime() extends T
  case class TArray(var elem: T) extends T
  case class TTuple(elems: Seq[T]) extends T
  case class TMap(var value: T) extends T
  case class TObjectJson() extends T

  class InferenceError(msg: String) extends RuntimeException(msg)

  // ---- JSON parser keeping int/float distinction and raw object spans
  sealed trait J
  case object JNull extends J
  case class JBool(v: Boolean) extends J
  case class JInt(v: BigInt) extends J
  case class JFloat(v: Double) extends J
  case class JStr(v: String) extends J
  case class JArr(vs: Seq[J]) extends J
  case class JObj(vs: Seq[(String, J)], raw: String) extends J

  def parseJsonRows(data: String): Seq[JObj] = {
    val p = new JsonP(data)
    val out = scala.collection.mutable.ArrayBuffer.empty[JObj]
    p.ws()
    while (!p.eof) {
      p.value() match {
        case o: JObj => out += o
        case other => throw new InferenceError(s"expected object, got $other")
      }
      p.ws()
      if (!p.eof && (p.peek == ',' || p.peek == ';')) { p.next(); p.ws() }
    }
    out.toSeq
  }

  /** Parse a single leading JSON value; returns (value, chars consumed). */
  def parseOneValue(s: String): (J, Int) = {
    val p = new JsonP(s)
    val v = p.value()
    (v, p.pos)
  }

  private class JsonP(s: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def next(): Char = { val c = s.charAt(i); i += 1; c }
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    def value(): J = {
      ws()
      peek match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => expect("true"); JBool(true)
        case 'f' => expect("false"); JBool(false)
        case 'n' => expect("null"); JNull
        case _ => num()
      }
    }
    private def expect(w: String): Unit = {
      require(s.startsWith(w, i), s"bad JSON at $i"); i += w.length
    }
    private def obj(): J = {
      val start = i
      next() // {
      val fields = scala.collection.mutable.ArrayBuffer.empty[(String, J)]
      ws()
      if (peek == '}') { next(); return JObj(Seq.empty, s.substring(start, i)) }
      var go = true
      while (go) {
        ws()
        val k = str()
        ws(); require(next() == ':', s"expected : at $i")
        fields += ((k, value()))
        ws()
        next() match {
          case ',' => ()
          case '}' => go = false
          case c => throw new InferenceError(s"bad JSON object char $c")
        }
      }
      JObj(fields.toSeq, s.substring(start, i))
    }
    private def arr(): J = {
      next() // [
      val vs = scala.collection.mutable.ArrayBuffer.empty[J]
      ws()
      if (peek == ']') { next(); return JArr(Seq.empty) }
      var go = true
      while (go) {
        vs += value()
        ws()
        next() match {
          case ',' => ()
          case ']' => go = false
          case c => throw new InferenceError(s"bad JSON array char $c")
        }
      }
      JArr(vs.toSeq)
    }
    private def str(): String = {
      require(next() == '"', s"expected string at $i")
      val sb = new StringBuilder
      while (peek != '"') {
        val c = next()
        if (c == '\\') {
          next() match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '/' => sb.append('/')
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'u' =>
              val h = s.substring(i, i + 4); i += 4
              sb.append(Integer.parseInt(h, 16).toChar)
            case other => sb.append(other)
          }
        } else sb.append(c)
      }
      next()
      sb.toString
    }
    private def num(): J = {
      val st = i
      if (!eof && (peek == '-' || peek == '+')) next()
      var isFloat = false
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' ||
        peek == 'E' || peek == '+' || peek == '-')) {
        if (peek == '.' || peek == 'e' || peek == 'E') isFloat = true
        next()
      }
      val txt = s.substring(st, i)
      if (isFloat) JFloat(txt.toDouble)
      else JInt(BigInt(txt))
    }
  }

  // ---- inference of one JSON value → T
  private val dateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val dtRe =
    "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$".r
  private val intRe = "^[+-]?\\d+$".r
  private val floatRe =
    "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

  def inferString(v: String, st: Settings,
      jsonContext: Boolean): T = {
    if (st.inferDates && dateRe.matches(v) && validDate(v)) TDate()
    else if (st.inferDatetimes && dtRe.matches(v)) TDateTime()
    else if (jsonContext && st.numbersFromStrings && st.inferIntegers &&
      intRe.matches(v) && fitsInt64(v)) TInt(fromString = true)
    else if (jsonContext && st.numbersFromStrings && st.inferIntegers &&
      intRe.matches(v) && fitsUInt64(v))
      TInt(fromString = true, unsigned = true)
    else if (jsonContext && st.numbersFromStrings && floatRe.matches(v) &&
      v.exists(_.isDigit)) TFloat(fromString = true)
    else TString()
  }
  private def validDate(v: String): Boolean = {
    val m = v.substring(5, 7).toInt; val d = v.substring(8, 10).toInt
    m >= 1 && m <= 12 && d >= 1 && d <= 31
  }
  private def fitsInt64(v: String): Boolean =
    try { v.toLong; true } catch { case _: Exception => false }
  private def fitsUInt64(v: String): Boolean =
    try {
      val b = BigInt(v)
      b.signum >= 0 && b.bitLength <= 64
    } catch { case _: Exception => false }

  def infer(j: J, st: Settings): T = j match {
    case JNull => TNothing()
    case JBool(_) => TBool()
    case JInt(v) =>
      if (st.inferIntegers && v.bitLength <= 63) TInt()
      else if (st.inferIntegers && v.signum >= 0 && v.bitLength <= 64)
        TInt(unsigned = true)
      else TFloat()
    case JFloat(_) => TFloat()
    case JStr(v) => inferString(v, st, jsonContext = true)
    // a JSON array is a TUPLE until finalization — cross-row merges
    // happen slot-wise, and only at the end do unifiable tuples become
    // arrays (ref SchemaInferenceUtils transformJSONTuplesToArrays)
    case JArr(vs) => TTuple(vs.map(infer(_, st)))
    case JObj(vs, _) =>
      val valueTypes = vs.map(f => infer(f._2, st))
      // an Object-typed value poisons the whole object (02416)
      if (valueTypes.exists(_.isInstanceOf[TObjectJson])) TObjectJson()
      else unifyAll(valueTypes, st) match {
        case Some(t) => TMap(t)
        case None =>
          if (st.objectType) TObjectJson()
          else if (st.objectsAsStrings) TString()
          else throw new InferenceError(
            "Cannot determine type for JSON object " +
              "(enable allow_experimental_object_type or " +
              "input_format_json_read_objects_as_strings)")
      }
  }

  /** Finalize bottom-up: tuples whose (finalized) elements unify become
    * arrays; an empty tuple is Array(Nothing). */
  def finalize(t: T, st: Settings): T = t match {
    case x: TTuple =>
      val elems = x.elems.map(finalize(_, st))
      if (elems.isEmpty) { val a = TArray(TNothing()); a.nullable = x.nullable; a }
      else unifyAll(elems, st) match {
        case Some(u) => val a = TArray(u); a.nullable = x.nullable; a
        case None => val tt = TTuple(elems); tt.nullable = x.nullable; tt
      }
    case x: TArray =>
      val a = TArray(finalize(x.elem, st)); a.nullable = x.nullable; a
    case x: TMap =>
      val m = TMap(finalize(x.value, st)); m.nullable = x.nullable; m
    case other => other
  }

  private def unifyAll(ts: Seq[T], st: Settings): Option[T] = {
    val seed = TNothing(); seed.nullable = false // synthetic fold seed
    ts.foldLeft(Option(seed: T)) {
      case (Some(acc), t) => tryMerge(acc, t, st)
      case (None, _) => None
    }
  }

  /** Merge two inferred types; None = not unifiable (caller decides:
    * Tuple at array level, error/fallback at column level). */
  def tryMerge(a: T, b: T, st: Settings): Option[T] = {
    def nul(t: T, n: Boolean): T = { t.nullable = t.nullable || n; t }
    (a, b) match {
      // a synthetic fold seed carries nullable=false; a REAL null true
      case (x: TNothing, t) => Some(nul(t, x.nullable))
      case (t, y: TNothing) => Some(nul(t, y.nullable))
      case (x: TInt, y: TInt) =>
        Some(nul(TInt(x.fromString && y.fromString,
          x.unsigned || y.unsigned), x.nullable || y.nullable))
      case (x: TFloat, y: TFloat) =>
        Some(nul(TFloat(x.fromString && y.fromString),
          x.nullable || y.nullable))
      case (x: TInt, y: TFloat) =>
        Some(nul(TFloat(x.fromString && y.fromString),
          x.nullable || y.nullable))
      case (x: TFloat, y: TInt) =>
        Some(nul(TFloat(x.fromString && y.fromString),
          x.nullable || y.nullable))
      case (x: TBool, y: TBool) => Some(nul(TBool(), x.nullable || y.nullable))
      // input_format_json_read_bools_as_numbers (default 1, ref
      // Core/Settings.h): a column mixing true/false with numbers reads
      // the bools as numbers
      case (x: TBool, y: TInt) if st.boolsAsNumbers =>
        Some(nul(TInt(y.fromString, y.unsigned), x.nullable || y.nullable))
      case (x: TInt, y: TBool) if st.boolsAsNumbers =>
        Some(nul(TInt(x.fromString, x.unsigned), x.nullable || y.nullable))
      case (x: TBool, y: TFloat) if st.boolsAsNumbers =>
        Some(nul(TFloat(y.fromString), x.nullable || y.nullable))
      case (x: TFloat, y: TBool) if st.boolsAsNumbers =>
        Some(nul(TFloat(x.fromString), x.nullable || y.nullable))
      case (x: TDate, y: TDate) => Some(nul(TDate(), x.nullable || y.nullable))
      case (x: TDateTime, y: TDateTime) =>
        Some(nul(TDateTime(), x.nullable || y.nullable))
      case (x: TDate, y: TDateTime) =>
        Some(nul(TDateTime(), x.nullable || y.nullable))
      case (x: TDateTime, y: TDate) =>
        Some(nul(TDateTime(), x.nullable || y.nullable))
      case (x: TString, y: TString) =>
        Some(nul(TString(), x.nullable || y.nullable))
      // string-sourced conflicts dissolve into String; a true JSON
      // number against a plain string is a type clash — unless
      // read_numbers_as_strings allows the column to fall to String
      case (x, y: TString) if stringSourced(x) ||
          (st.numbersAsStrings && numberT(x)) =>
        Some(nul(TString(), x.nullable || y.nullable))
      case (x: TString, y) if stringSourced(y) ||
          (st.numbersAsStrings && numberT(y)) =>
        Some(nul(TString(), x.nullable || y.nullable))
      case (x, y) if stringSourced(x) && stringSourced(y) &&
          bothStringish(x, y) =>
        Some(nul(TString(), x.nullable || y.nullable))
      case (x: TArray, y: TArray) =>
        tryMerge(x.elem, y.elem, st).map(e =>
          nul(TArray(e), x.nullable || y.nullable))
      case (x: TTuple, y: TTuple) if x.elems.size == y.elems.size =>
        val merged = x.elems.zip(y.elems).map { case (p, q) =>
          tryMerge(p, q, st) }
        if (merged.forall(_.isDefined))
          Some(nul(TTuple(merged.map(_.get)), x.nullable || y.nullable))
        else tupleToArray(x, st).flatMap(ax =>
          tupleToArray(y, st).flatMap(ay => tryMerge(ax, ay, st)))
      case (x: TTuple, y: TArray) =>
        tupleToArray(x, st).flatMap(ax => tryMerge(ax, y, st))
      case (x: TArray, y: TTuple) =>
        tupleToArray(y, st).flatMap(ay => tryMerge(x, ay, st))
      case (x: TTuple, y: TTuple) => // differing sizes: both as arrays
        tupleToArray(x, st).flatMap(ax =>
          tupleToArray(y, st).flatMap(ay => tryMerge(ax, ay, st)))
      case (x: TMap, y: TMap) =>
        tryMerge(x.value, y.value, st) match {
          case Some(v) => Some(nul(TMap(v), x.nullable || y.nullable))
          case None =>
            if (st.objectType) Some(TObjectJson())
            else if (st.objectsAsStrings) Some(TString())
            else None
        }
      // Object absorbs only object-shaped peers — merging with an array
      // or scalar FAILS so a mixed array stays a Tuple (02268)
      case (_: TObjectJson, _: TObjectJson | _: TMap) => Some(TObjectJson())
      case (_: TMap, _: TObjectJson) => Some(TObjectJson())
      // object-as-string absorbed Maps
      case (x: TMap, y: TString) if st.objectsAsStrings =>
        Some(nul(TString(), x.nullable || y.nullable))
      case (x: TString, y: TMap) if st.objectsAsStrings =>
        Some(nul(TString(), x.nullable || y.nullable))
      case _ => None
    }
  }

  private def numberT(t: T): Boolean = t match {
    case _: TInt | _: TFloat => true
    case _ => false
  }
  private def stringSourced(t: T): Boolean = t match {
    case _: TDate | _: TDateTime => true
    case i: TInt => i.fromString
    case f: TFloat => f.fromString
    case _ => false
  }
  private def bothStringish(a: T, b: T): Boolean = true

  /** An array-typed view of a tuple whose elements unify. */
  private def tupleToArray(t: TTuple, st: Settings): Option[TArray] =
    unifyAll(t.elems, st).map(TArray(_))

  // ---- rendering as CH type names
  def render(t: T, st: Settings): String = {
    def leaf(name: String, n: Boolean): String =
      if (st.makeNullable || n) s"Nullable($name)" else name
    t match {
      case x: TNothing => leaf("Nothing", x.nullable)
      case x: TInt => leaf(if (x.unsigned) "UInt64" else "Int64",
        x.nullable)
      case x: TFloat => leaf("Float64", x.nullable)
      case x: TBool => leaf("Bool", x.nullable)
      case x: TString => leaf("String", x.nullable)
      case x: TDate => leaf("Date", x.nullable)
      case x: TDateTime => leaf("DateTime64(9)", x.nullable)
      case x: TArray => s"Array(${render(x.elem, st)})"
      case x: TTuple =>
        s"Tuple(${x.elems.map(render(_, st)).mkString(", ")})"
      case x: TMap => s"Map(String, ${render(x.value, st)})"
      case _: TObjectJson => "Object(Nullable('json'))"
    }
  }

  /** JSONEachRow column inference: per-column fold across rows;
    * `hints` (schema_inference_hints) override inference verbatim. */
  def inferJsonEachRow(data: String, st: Settings,
      hints: Map[String, String] = Map.empty): Seq[(String, String)] = {
    val rows = parseJsonRows(data)
    if (rows.isEmpty)
      throw new InferenceError("Cannot extract table structure: no data")
    val order = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach(r => r.vs.foreach { case (k, _) => order += k })
    order.toSeq.map { col =>
      if (hints.contains(col)) (col, hints(col))
      else {
        var acc: T = { val t = TNothing(); t.nullable = false; t }
        rows.foreach { r =>
          r.vs.find(_._1 == col) match {
            case Some((_, v)) =>
              val t = infer(v, st)
              acc = tryMerge(acc, t, st).getOrElse(
                throw new InferenceError(
                  s"Automatically defined type ${render(acc, st)} for " +
                    s"column '$col' differs from type ${render(t, st)} " +
                    "(TYPE_MISMATCH)"))
            case None => acc.nullable = true
          }
        }
        val fin = finalize(acc, st)
        fin match {
          case _: TNothing =>
            throw new InferenceError(
              s"Cannot determine type of column '$col': only nulls " +
                "(ONLY_NULLS_WHILE_READING_SCHEMA)")
          case _ => ()
        }
        (col, render(fin, st))
      }
    }
  }

  /** Inferred column TYPES with their per-row J values — the data path
    * for `SELECT * FROM format(...)`. */
  def inferJsonColumns(data: String,
      st: Settings): (Seq[String], Seq[T], Seq[Seq[Option[J]]]) = {
    val rows = parseJsonRows(data)
    val order = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach(r => r.vs.foreach { case (k, _) => order += k })
    val cols = order.toSeq
    val types = cols.map { col =>
      var acc: T = { val t = TNothing(); t.nullable = false; t }
      rows.foreach { r =>
        r.vs.find(_._1 == col).foreach { case (_, v) =>
          acc = tryMerge(acc, infer(v, st), st).getOrElse(
            throw new InferenceError("TYPE_MISMATCH"))
        }
      }
      finalize(acc, st)
    }
    val values = rows.map(r => cols.map(c => r.vs.find(_._1 == c).map(_._2)))
    (cols, types, values)
  }
}
