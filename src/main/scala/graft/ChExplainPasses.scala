package graft

/** TreeRewriter / TreeOptimizer passes reproduced at the AST level for
  * EXPLAIN SYNTAX display (ref src/Interpreters/TreeRewriter.cpp,
  * TreeOptimizer.cpp). Each pass is gated on the same setting (with
  * the 23.3 default) the reference uses. */
object ChExplainPasses {
  import ChExplain._

  private def conf(name: String, default: String): String =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.ch." + name, default)
    catch { case _: Throwable => default }

  private def on(name: String, default: Boolean): Boolean =
    conf(name, if (default) "1" else "0").trim match {
      case "1" | "true" | "True" => true
      case _ => false
    }

  // ---------- generic traversal ----------

  private def keep[T <: E](old: E, nw: T): T = {
    if (nw.alias == null && old.alias != null) nw.alias = old.alias
    nw
  }

  /** bottom-up expression transform */
  def tx(e: E)(f: E => E): E = {
    val rec: E = e match {
      case Fn(n, args, params, d) =>
        keep(e, Fn(n, args.map(tx(_)(f)),
          if (params == null) null else params.map(tx(_)(f)), d))
      case Tup(items) => keep(e, Tup(items.map(tx(_)(f))))
      case Arr(items) => keep(e, Arr(items.map(tx(_)(f))))
      case Lambda(ps, b) => keep(e, Lambda(ps, tx(b)(f)))
      case Sub(u) => keep(e, Sub(txU(u)(f)))
      case Cte(n, u) => keep(e, Cte(n, txU(u)(f)))
      case other => other
    }
    val out = f(rec)
    keep(rec, out)
  }

  def txSel(s: Sel)(f: E => E): Sel = {
    s.withItems = s.withItems.map(tx(_)(f))
    s.items = s.items.map(tx(_)(f))
    s.from = s.from.map {
      case t @ TTable(_) => t
      case t @ TFunc(fn) =>
        val n = TFunc(tx(fn)(f).asInstanceOf[Fn]); n.talias = t.talias; n
      case t @ TSub(u) =>
        val n = TSub(txU(u)(f)); n.talias = t.talias; n
    }
    s.joins = s.joins.map { j =>
      val nt = j.t match {
        case t @ TTable(_) => t
        case t @ TFunc(fn) =>
          val n = TFunc(tx(fn)(f).asInstanceOf[Fn]); n.talias = t.talias; n
        case t @ TSub(u) =>
          val n = TSub(txU(u)(f)); n.talias = t.talias; n
      }
      j.copy(t = nt, on = j.on.map(tx(_)(f)),
        using = j.using.map(_.map(tx(_)(f))))
    }
    s.arrayJoins = s.arrayJoins.map(aj =>
      aj.copy(items = aj.items.map(tx(_)(f))))
    s.prewhere = s.prewhere.map(tx(_)(f))
    s.where = s.where.map(tx(_)(f))
    s.groupBy = s.groupBy.map(tx(_)(f))
    s.groupingSets = s.groupingSets.map(_.map(tx(_)(f)))
    s.having = s.having.map(tx(_)(f))
    s.orderBy = s.orderBy.map(oi => oi.copy(e = tx(oi.e)(f),
      collate = oi.collate.map(tx(_)(f)),
      fillFrom = oi.fillFrom.map(tx(_)(f)),
      fillTo = oi.fillTo.map(tx(_)(f)),
      fillStep = oi.fillStep.map(tx(_)(f))))
    s.limitBy = s.limitBy.map { case (o2, l, bys) =>
      (o2.map(tx(_)(f)), tx(l)(f), bys.map(tx(_)(f))) }
    s.limit = s.limit.map { case (o2, l, t) =>
      (o2.map(tx(_)(f)), if (l == null) null else tx(l)(f), t) }
    s
  }

  def txU(u: Union)(f: E => E): Union =
    Union(u.children.map {
      case Left(s) => Left(txSel(s)(f))
      case Right(un) => Right(txU(un)(f))
    }, u.modes)

  /** like eachSel but does NOT descend into WITH-CTE bodies (star
    * expansion must leave `SELECT *` inside a CTE untouched) */
  def eachSelNoCte(u: Union)(f: Sel => Sel): Union =
    Union(u.children.map {
      case Left(s) =>
        val saved = s.withItems
        s.withItems = Nil
        val r = f(deepSel(s)(f))
        r.withItems = saved
        Left(r)
      case Right(un) => Right(eachSelNoCte(un)(f))
    }, u.modes)

  /** per-select structural pass (inside-out: subqueries first) */
  def eachSel(u: Union)(f: Sel => Sel): Union =
    Union(u.children.map {
      case Left(s) => Left(f(deepSel(s)(f)))
      case Right(un) => Right(eachSel(un)(f))
    }, u.modes)

  /** per-select structural pass (top-down: enclosing select first —
    * the duplicate-distinct removal cascades outside-in) */
  def eachSelTopDown(u: Union)(f: Sel => Sel): Union =
    Union(u.children.map {
      case Left(s) => Left(deepSel(f(s))(f, topDown = true))
      case Right(un) => Right(eachSelTopDown(un)(f))
    }, u.modes)

  private def deepSel(s: Sel)(f: Sel => Sel,
      topDown: Boolean = false): Sel = {
    def rec(u: Union): Union =
      if (topDown) eachSelTopDown(u)(f) else eachSel(u)(f)
    def inE(e: E): E = e match {
      case Sub(u) => keep(e, Sub(rec(u)))
      case Cte(n2, u) => keep(e, Cte(n2, rec(u)))
      case Fn(n, args, params, d) =>
        keep(e, Fn(n, args.map(inE),
          if (params == null) null else params.map(inE), d))
      case Tup(items) => keep(e, Tup(items.map(inE)))
      case Arr(items) => keep(e, Arr(items.map(inE)))
      case Lambda(ps, b) => keep(e, Lambda(ps, inE(b)))
      case other => other
    }
    s.items = s.items.map(inE)
    s.withItems = s.withItems.map(inE)
    s.where = s.where.map(inE)
    s.prewhere = s.prewhere.map(inE)
    s.having = s.having.map(inE)
    s.groupBy = s.groupBy.map(inE)
    s.orderBy = s.orderBy.map(oi => oi.copy(e = inE(oi.e)))
    s.from = s.from.map {
      case t @ TSub(u) =>
        val n = TSub(rec(u)); n.talias = t.talias; n
      case other => other
    }
    s.joins = s.joins.map { j =>
      val nt = j.t match {
        case t @ TSub(u) =>
          val n = TSub(rec(u)); n.talias = t.talias; n
        case other => other
      }
      j.copy(t = nt)
    }
    s
  }

  // ---------- passes ----------

  /** case-insensitive function-name resolution + SQL-compatibility
    * aliases (ref FunctionFactory / AggregateFunctionFactory
    * case-insensitive registrations; 01705). */
  private val nameAliases: Map[String, String] = Map(
    "ceiling" -> "ceil", "char_length" -> "lengthUTF8",
    "character_length" -> "lengthUTF8", "database" -> "currentDatabase",
    "datediff" -> "dateDiff", "flatten" -> "arrayFlatten",
    "ifnull" -> "ifNull", "lcase" -> "lower", "locate" -> "position",
    "ln" -> "log", "mid" -> "substring", "mod" -> "modulo",
    "nullif" -> "nullIf", "power" -> "pow", "replace" -> "replaceAll",
    "stddev_pop" -> "stddevPop", "stddev_samp" -> "stddevSamp",
    "substr" -> "substring", "truncate" -> "trunc", "ucase" -> "upper",
    "user" -> "currentUser", "var_pop" -> "varPop",
    "var_samp" -> "varSamp", "week" -> "toWeek",
    "yearweek" -> "toYearWeek", "covar_pop" -> "covarPop",
    "covar_samp" -> "covarSamp", "fqdn" -> "FQDN",
    "array_concat_agg" -> "groupArrayArray")
  private val ciCanonical: Set[String] = Set(
    "sum", "count", "min", "max", "avg", "any", "corr", "abs", "coalesce",
    "concat", "cos", "sin", "tan", "tanh", "exp", "floor", "ceil",
    "greatest", "least", "length", "log", "log10", "log2", "lower",
    "upper", "now", "now64", "pi", "position", "pow", "rand", "reverse",
    "round", "sqrt", "substring", "trunc", "if", "char", "not",
    "stddevPop", "stddevSamp", "varPop", "varSamp", "covarPop",
    "covarSamp", "currentDatabase", "currentUser", "dateDiff", "ifNull",
    "nullIf", "replaceAll", "arrayFlatten", "lengthUTF8", "toWeek",
    "toYearWeek", "cast")
  private val ciLookup: Map[String, String] =
    (nameAliases.values ++ ciCanonical).map(c => c.toLowerCase -> c).toMap

  def normalizeNames(e: E): E = e match {
    case f @ Fn(n, args, params, d) =>
      val lower = n.toLowerCase
      val canon = nameAliases.get(lower)
        .orElse(ciLookup.get(lower))
        .getOrElse(n)
      if (canon == "cast" || lower == "cast") keep(f, Fn("CAST", args, params, d))
      else if (canon != n) keep(f, Fn(canon, args, params, d))
      else f
    case other => other
  }

  private def isTrueLit(e: E): Boolean = e match {
    case Num(t) =>
      try t.toDouble != 0.0 catch { case _: Throwable => false }
    case _ => false
  }
  private def isFalseLit(e: E): Boolean = e match {
    case Num(t) =>
      try t.toDouble == 0.0 catch { case _: Throwable => false }
    case NullLit => true
    case _ => false
  }

  /** if(constant, a, b) folds (ref
    * OptimizeIfWithConstantConditionVisitor — unconditional). */
  def constantIf(e: E): E = e match {
    case Fn("if", Seq(c, a, b), null, false) =>
      if (isTrueLit(c)) keep(e, a)
      else if (isFalseLit(c)) keep(e, b)
      else e
    case other => other
  }

  /** literal comparisons fold to 0/1 and a constant-true WHERE drops
    * (ref ExpressionAnalyzer early constant folding; 01029). */
  private def numOf(e: E): Option[BigDecimal] = e match {
    case Num(t) => try Some(BigDecimal(t)) catch { case _: Throwable => None }
    case _ => None
  }
  def foldConstCompare(e: E): E = e match {
    case Fn(op, Seq(l, r), null, false)
        if Seq("equals", "notEquals", "less", "greater", "lessOrEquals",
          "greaterOrEquals").contains(op) =>
      (numOf(l), numOf(r)) match {
        case (Some(a), Some(b)) =>
          val res = op match {
            case "equals" => a == b
            case "notEquals" => a != b
            case "less" => a < b
            case "greater" => a > b
            case "lessOrEquals" => a <= b
            case "greaterOrEquals" => a >= b
          }
          keep(e, Num(if (res) "1" else "0"))
        case _ => e
      }
    case Fn(op @ ("in" | "notIn"), Seq(l, Tup(items)), null, false)
        if numOf(l).nonEmpty && items.forall(numOf(_).nonEmpty) =>
      val hit = items.exists(i => numOf(i) == numOf(l))
      keep(e, Num(if (hit == (op == "in")) "1" else "0"))
    case other => other
  }

  private def dropTrueWhere(s: Sel): Sel = {
    s.where = s.where.filterNot(isTrueLit)
    s.prewhere = s.prewhere.filterNot(isTrueLit)
    s
  }

  /** count(lit)/sum(1) → count() (optimize_normalize_count_variants) */
  def countVariants(e: E): E = e match {
    case Fn("count", Seq(l), null, false)
        if isLiteralNonNull(l) => keep(e, Fn("count", Nil))
    case Fn("sum", Seq(Num("1")), null, false) =>
      keep(e, Fn("count", Nil))
    case other => other
  }

  private def isLiteralNonNull(e: E): Boolean = e match {
    case _: Num | _: Str => e.alias == null
    case _ => false
  }

  private def isConst(e: E): Boolean = e match {
    case _: Num | _: Str | NullLit => true
    case _ => false
  }

  /** sum/min/max over an arithmetic op with one constant operand moves
    * the constant out (ref ArithmeticOperationsInAgrFuncOptimize.cpp;
    * optimize_arithmetic_operations_in_aggregate_functions). The
    * reference only descends ONE level per fixpoint run; min/max swap
    * when multiplied by a negative constant. */
  def arithOutOfAgg(e: E): E = e match {
    case Fn(agg0, Seq(inner: Fn), null, false)
        if Seq("sum", "min", "max", "avg").contains(agg0) =>
      rewriteAggArith(agg0, inner).map(keep(e, _)).getOrElse(e)
    case other => other
  }
  private def isLit(e: E): Boolean = e match {
    case _: Num | _: Str | NullLit => e.alias == null
    case _ => false
  }
  private def negLit(e: E): Boolean = e match {
    case Num(t) => t.startsWith("-")
    case _ => false
  }
  private def rewriteAggArith(agg: String, op: Fn): Option[E] = {
    val supported: Set[String] =
      if (agg == "sum") Set("multiply", "divide")
      else Set("multiply", "divide", "plus", "minus")
    if (op.params != null || op.args.length != 2 ||
      !supported(op.name) || op.alias != null) return None
    def flip(a: String, doFlip: Boolean): String =
      if (!doFlip) a else if (a == "min") "max"
      else if (a == "max") "min" else a
    val (l, r) = (op.args.head, op.args(1))
    if (isLit(l) && !isLit(r)) {
      // sum(1/n) loses accuracy — the reference skips it
      if (op.name == "divide") return None
      val needRev = (op.name == "multiply" && negLit(l)) ||
        op.name == "minus"
      Some(Fn(op.name, Seq(l, Fn(flip(agg, needRev), Seq(r)))))
    } else if (isLit(r)) {
      val needRev = (op.name == "multiply" || op.name == "divide") &&
        negLit(r)
      val agg2 = flip(agg, needRev)
      // the reference's top-down continuation re-visits the NEW first
      // argument: sum(mul(mul(x, c), c)) -> mul(mul(sum(x), c), c)
      val innerAgg: E = l match {
        case lf: Fn if lf.alias == null =>
          rewriteAggArith(agg2, lf).getOrElse(Fn(agg2, Seq(l)))
        case _ => Fn(agg2, Seq(l))
      }
      Some(Fn(op.name, Seq(innerAgg, r)))
    } else None
  }

  /** any(f(...)) distributes into the arguments
    * (optimize_move_functions_out_of_any, default off; 01398). */
  def moveOutOfAny(e: E): E = e match {
    case Fn(any @ ("any" | "anyLast"), Seq(inner), null, false) =>
      inner match {
        case f: Fn if f.name != "arrayJoin" =>
          keep(e, distributeAny(any, f))
        case t: Tup => keep(e, distributeAny(any, t))
        case _ => e
      }
    case other => other
  }
  private def distributeAny(any: String, e: E): E = e match {
    case Fn(n, args, params, d) if params == null && !d =>
      Fn(n, args.map(a => distributeAnyArg(any, a)))
    case Tup(items) => Tup(items.map(a => distributeAnyArg(any, a)))
    case other => Fn(any, Seq(other))
  }
  private def distributeAnyArg(any: String, a: E): E = a match {
    case _ if isConst(a) => a
    case f: Fn => distributeAny(any, f)
    case t: Tup => distributeAny(any, t)
    case other => Fn(any, Seq(other))
  }

  /** count(DISTINCT x) resolves to the count_distinct_implementation
    * aggregate (ref TreeRewriter; default uniqExact). */
  def countDistinct(e: E): E = e match {
    case Fn("count", args, null, true) if args.nonEmpty =>
      keep(e, Fn(conf("count_distinct_implementation", "uniqExact")
        .stripPrefix("'").stripSuffix("'"), args))
    case Fn("countDistinct", args, null, false) if args.nonEmpty =>
      keep(e, Fn(conf("count_distinct_implementation", "uniqExact")
        .stripPrefix("'").stripSuffix("'"), args))
    case other => other
  }

  /** sumIf(1, cond) / sum(if(cond, 1, 0)) → countIf(cond)
    * (optimize_rewrite_sum_if_to_count_if, default off). */
  def sumIfToCountIf(e: E): E = e match {
    case Fn("sumIf", Seq(Num("1"), cond), null, false) =>
      keep(e, Fn("countIf", Seq(cond)))
    case Fn("sum", Seq(Fn(ifn @ ("if" | "multiIf"), Seq(cond, a, b), null, false)), null, false) =>
      (a, b) match {
        case (Num("1"), Num("0")) => keep(e, Fn("countIf", Seq(cond)))
        case (Num("0"), Num("1")) =>
          keep(e, Fn("countIf", Seq(Fn("not", Seq(cond)))))
        case _ => e
      }
    case other => other
  }

  /** multiIf with a single condition prints as if()
    * (optimize_multiif_to_if, default on). */
  def multiIfToIf(e: E): E = e match {
    case Fn("multiIf", Seq(c, a, b), null, false) =>
      keep(e, Fn("if", Seq(c, a, b)))
    case other => other
  }

  /** uniq*(injectiveFn(x)) drops the injective wrapper
    * (optimize_injective_functions_inside_uniq, default on). */
  private val uniqFamily = Set("uniq", "uniqExact", "uniqHLL12",
    "uniqCombined", "uniqCombined64", "uniqTheta")
  private val injectiveOneArg = Set("toString", "toFixedString",
    "hex", "negate", "bitNot", "reverse")
  def injectiveInUniq(e: E): E = e match {
    case Fn(u, args, params, d) if uniqFamily(u) =>
      val na = args.map { a =>
        var x = a
        var go = true
        while (go) {
          x match {
            case Fn(f, Seq(inner), null, false) if injectiveOneArg(f) =>
              x = inner
            case _ => go = false
          }
        }
        x
      }
      if (na != args) keep(e, Fn(u, na, params, d)) else e
    case other => other
  }

  /** (a, b) = (c, d) → (a = c) AND (b = d)
    * (ref TreeOptimizer optimizeTupleComparison / ComparisonTupleElimination). */
  def tupleComparison(e: E): E = e match {
    case Fn("equals", Seq(Tup(ls), Tup(rs)), null, false)
        if ls.length == rs.length && ls.nonEmpty =>
      val eqs = ls.zip(rs).map { case (l, r) => tupleComparison(
        Fn("equals", Seq(l, r))) }
      keep(e, if (eqs.length == 1) eqs.head else Fn("and", eqs))
    case Fn("notEquals", Seq(Tup(ls), Tup(rs)), null, false)
        if ls.length == rs.length && ls.nonEmpty =>
      val nes = ls.zip(rs).map { case (l, r) => tupleComparison(
        Fn("notEquals", Seq(l, r))) }
      keep(e, if (nes.length == 1) nes.head else Fn("or", nes))
    case other => other
  }

  /** remote()/cluster() database.table argument prints as a string
    * literal (ref TableFunctionRemote::parseArguments). */
  private def remoteArgs(u: Union): Union = eachSel(u) { s =>
    def fix(t: TableRef): TableRef = t match {
      case tf @ TFunc(Fn(n, args, p, d))
          if Set("remote", "remoteSecure", "cluster",
            "clusterAllReplicas")(n) =>
        val na = args.zipWithIndex.map {
          case (Id(parts), i) if i >= 1 =>
            Str(parts.mkString("."))
          case (a, _) => a
        }
        val nt = TFunc(Fn(n, na, p, d)); nt.talias = tf.talias; nt
      case other => other
    }
    s.from = s.from.map(fix)
    s.joins = s.joins.map(j => j.copy(t = fix(j.t)))
    s
  }

  /** GROUP BY: drop keys that are functions of other keys
    * (optimize_group_by_function_keys, default on) and constants. */
  private def groupByFunctionKeys(s: Sel): Sel = {
    if (s.groupBy.length <= 1) return s
    def txt(x: E) = ChExplain.printExprStr(x, needParens = false,
      new ChExplain.PState, withAlias = false)
    val keyTexts = scala.collection.mutable.Set(s.groupBy.map(txt): _*)
    // ref GroupByFunctionKeysVisitor KeepFunctionMatcher: walk the key;
    // an identifier outside the key set, a LITERAL, or a zero-arg
    // function forces keeping; a subtree that IS another key stops.
    def mustKeep(root: Fn): Boolean = {
      var keepK = false
      def walk(x: E): Unit = if (!keepK) x match {
        case f @ Fn(_, args, params, _) =>
          if (args.isEmpty) keepK = true
          else if (!keyTexts.contains(txt(f)) || (f eq root)) {
            args.foreach(walk)
            if (params != null && params.nonEmpty) keepK = true
          }
        case i: Id => if (!keyTexts.contains(txt(i))) keepK = true
        case t: Tup =>
          if (!keyTexts.contains(txt(t))) t.items.foreach(walk)
        case _ => keepK = true // literals and everything else
      }
      root.args.foreach(walk)
      if (root.params != null && root.params.nonEmpty) keepK = true
      keepK
    }
    val kept = s.groupBy.filter {
      case f: Fn if f.args.nonEmpty =>
        val k = mustKeep(f)
        // the reference erases as it goes: later keys check against
        // the already-reduced set
        if (!k) keyTexts -= txt(f)
        k
      case _ => true
    }
    if (kept.nonEmpty) s.groupBy = kept
    s
  }

  /** min/max/any/anyLast of a GROUP BY key collapses to the key
    * (optimize_aggregators_of_group_by_keys, default on). */
  private def aggregatorsOfKeys(s: Sel): Sel = {
    if (s.groupBy.isEmpty) return s
    val keyTexts = s.groupBy.map(g => ChExplain.printExprStr(g,
      needParens = false, new ChExplain.PState, withAlias = false)).toSet
    // expression composed ONLY of group keys and constants
    def keysOnly(e: E): Boolean = {
      val txt = ChExplain.printExprStr(e, needParens = false,
        new ChExplain.PState, withAlias = false)
      if (keyTexts.contains(txt)) true
      else e match {
        case Fn(_, args, params, _) =>
          args.nonEmpty && args.forall(a => isConst(a) || keysOnly(a)) &&
            (params == null || params.forall(isConst)) &&
            args.exists(keysOnly)
        case Tup(items) => items.forall(a => isConst(a) || keysOnly(a)) &&
          items.exists(keysOnly)
        case _ => false
      }
    }
    def strip(e: E): E = tx(e) {
      case f @ Fn("min" | "max" | "any" | "anyLast", Seq(k), null, false)
          if keysOnly(k) =>
        keep(f, k)
      case other => other
    }
    s.items = s.items.map(strip)
    s.orderBy = s.orderBy.map(oi => oi.copy(e = strip(oi.e)))
    s.having = s.having.map(strip)
    s
  }

  /** ORDER BY: remove items that are deterministic functions of other
    * order keys (optimize_redundant_functions_in_order_by, on) and
    * unwrap monotonous functions
    * (optimize_monotonous_functions_in_order_by, off). */
  private def redundantOrderBy(s: Sel): Sel = {
    if (s.orderBy.length <= 1) return s
    val texts = s.orderBy.map(oi => ChExplain.printExprStr(oi.e,
      needParens = false, new ChExplain.PState, withAlias = false))
    val keep = scala.collection.mutable.ArrayBuffer.empty[OrderItem]
    val seen = scala.collection.mutable.Set.empty[String]
    s.orderBy.zip(texts).foreach { case (oi, txt) =>
      val isFnOfSeen = oi.e match {
        case _: Fn =>
          var sawKey = false
          var foreign = false
          def walk(x: E): Unit = {
            val t2 = ChExplain.printExprStr(x, needParens = false,
              new ChExplain.PState, withAlias = false)
            if (seen.contains(t2)) sawKey = true
            else x match {
              case Fn(_, args, params, _) =>
                args.foreach(walk)
                if (params != null) params.foreach(walk)
              case Tup(items) => items.foreach(walk)
              case Arr(items) => items.foreach(walk)
              case _: Id => foreign = true
              case _ =>
            }
          }
          walk(oi.e)
          sawKey && !foreign
        case _ => false
      }
      if (!isFnOfSeen && !seen.contains(txt)) {
        keep += oi
        seen += txt
      }
    }
    if (keep.nonEmpty) s.orderBy = keep.toSeq
    s
  }

  /** An unexpandable construct — the caller falls back to the legacy
    * string formatter. */
  final case class Unsupported(msg: String) extends RuntimeException(msg)

  /** `SELECT *` expands to the source's visible columns (ref
    * TranslateQualifiedNamesVisitor star expansion). Bails out when
    * the column set isn't known so the legacy path can try. */
  private def expandStars(u: Union): Union = eachSelNoCte(u) { s =>
    def colsOf(t: TableRef): Seq[String] = t match {
      case TTable(name) =>
        val full = name.mkString(".")
        if (full.equalsIgnoreCase("system.one")) Seq("dummy")
        else graft.ChSql.starVisibleColumns(full)
          .orElse(graft.ChSql.knownTableColumns(full))
          .orElse(graft.ChSql.starVisibleColumns(name.last))
          .orElse(graft.ChSql.knownTableColumns(name.last))
          .getOrElse(throw Unsupported(s"star over $full"))
      case TFunc(Fn("numbers" | "numbers_mt", _, _, _)) => Seq("number")
      case TFunc(Fn("executable" | "input", args, _, _)) =>
        // the structure argument 'name Type, name Type' carries the
        // output columns
        args.collectFirst {
          case Str(raw) if raw.matches("(?s)\\w+\\s+\\w.*") =>
            raw.split(",").toSeq.map(_.trim.split("\\s+").head)
        }.getOrElse(throw Unsupported("no structure arg"))
      case TFunc(Fn("zeros", _, _, _)) => Seq("zero")
      case TFunc(Fn("one", _, _, _)) => Seq("dummy")
      // a subquery's output names: item aliases, else the column name
      // (inner stars were already expanded — eachSel runs inside-out)
      case TSub(u) =>
        def selOf(x: Either[Sel, Union]): Sel = x match {
          case Left(s2) => s2
          case Right(u2) => selOf(u2.children.head)
        }
        selOf(u.children.head).items.map {
          case it if it.alias != null => it.alias
          case Id(parts) => parts.last
          case _ => throw Unsupported("star over computed subquery item")
        }
      case _ => throw Unsupported("star over non-table")
    }
    def expand(items: Seq[E]): Seq[E] =
      items.flatMap {
        case Star(Nil) if s.joins.isEmpty =>
          val t = s.from.getOrElse(throw Unsupported("star without FROM"))
          colsOf(t).map(c => Id(Seq(c)))
        case Star(Nil) if s.joins.length == 1 =>
          // a two-table join: colliding names print qualified on the
          // RIGHT side, the left side stays bare (01083)
          val lt = s.from.getOrElse(throw Unsupported("star without FROM"))
          val rt = s.joins.head.t
          def nameOf(t: TableRef): String = Option(t.talias).getOrElse(
            t match {
              case TTable(parts) => parts.last
              case _ => throw Unsupported("star over unnamed join side")
            })
          val lcols = colsOf(lt)
          val rcols = colsOf(rt)
          // USING columns appear once (from the left side)
          val using = s.joins.head.using.getOrElse(Nil).collect {
            case Id(ps) => ps.last }.toSet
          lcols.map(c => Id(Seq(c))) ++
            rcols.filterNot(using).map(c =>
              if (lcols.contains(c)) Id(Seq(nameOf(rt), c))
              else Id(Seq(c)))
        case st: Star => throw Unsupported("qualified star")
        case other => Seq(other)
      }
    if (s.items.exists(_.isInstanceOf[Star]))
      s.items = expand(s.items)
    s.limitBy = s.limitBy.map { case (o2, l, bys) =>
      (o2, l, if (bys.exists(_.isInstanceOf[Star])) expand(bys) else bys)
    }
    s
  }

  /** if(c, v, if(...)) chains collapse into multiIf
    * (optimize_if_chain_to_multiif, default off; 01388). */
  def ifChainToMultiIf(e: E): E = e match {
    case Fn("if", Seq(c, v, Fn("if", inner, null, false)), null, false)
        if inner.length == 3 =>
      keep(e, Fn("multiIf", Seq(c, v) ++ inner))
    case Fn("if", Seq(c, v, Fn("multiIf", inner, null, false)), null, false) =>
      keep(e, Fn("multiIf", Seq(c, v) ++ inner))
    case other => other
  }

  /** aggregate_functions_null_for_empty=1 appends -OrNull to the
    * common aggregates (ref TreeRewriter appendOrNullSuffix; 01528,
    * 01706). */
  private val orNullable = Set("sum", "count", "avg", "min", "max",
    "any", "anyLast", "sumIf", "countIf", "avgIf", "minIf", "maxIf",
    "anyIf")
  def nullForEmpty(e: E): E = e match {
    case Fn(n, args, params, d) if orNullable(n) =>
      val (base, suffix) =
        if (n.endsWith("If")) (n.dropRight(2), "OrNullIf")
        else (n, "OrNull")
      keep(e, Fn(base + suffix, args, params, d))
    case other => other
  }

  /** optimize_duplicate_order_by_and_distinct (default off): a
    * sorting query drops its subqueries' ORDER BY (no LIMIT there),
    * and an outer DISTINCT over a same-column DISTINCT subquery drops
    * (ref DuplicateOrderByVisitor / DuplicateDistinctVisitor). */
  private def outName(e: E): String =
    if (e.alias != null) e.alias
    else ChExplain.printExprStr(e, needParens = false,
      new ChExplain.PState, withAlias = false)

  private def duplicateOrderByAndDistinct(s: Sel): Sel = {
    def subSels(t: TableRef): Seq[Sel] = t match {
      case TSub(u) => u.children.collect { case Left(x) => x }
      case _ => Nil
    }
    if (s.orderBy.nonEmpty) {
      // cascades through every nested subquery (ref
      // DuplicateOrderByVisitor erases below the first sorting query),
      // stopping at LIMIT-bearing subqueries
      def clear(sel: Sel): Unit = {
        if (sel.limit.isEmpty && sel.limitBy.isEmpty) {
          sel.orderBy = Nil
          (sel.from.toSeq.flatMap(subSels) ++
            sel.joins.flatMap(j => subSels(j.t))).foreach(clear)
        }
      }
      (s.from.toSeq.flatMap(subSels) ++ s.joins.flatMap(j => subSels(j.t)))
        .foreach(clear)
    }
    // ref TreeOptimizer getDistinctNames/optimizeDuplicateDistinct:
    // names propagate through plain projections of distinct subqueries
    def simpleSubselect(sel: Sel): Option[Sel] =
      if (sel.joins.nonEmpty || sel.arrayJoins.nonEmpty) None
      else sel.from match {
        case Some(TSub(Union(Seq(Left(inner)), _)))
            if inner.settings.isEmpty => Some(inner)
        case _ => None
      }
    def distinctNames(sel: Sel): Set[String] = {
      if (sel.items.isEmpty) return Set.empty
      val implicitD: Set[String] =
        if (sel.distinct) Set.empty
        else simpleSubselect(sel).map(distinctNames).getOrElse(Set.empty)
      if (!sel.distinct && implicitD.isEmpty) return Set.empty
      val names = scala.collection.mutable.Set.empty[String]
      sel.items.foreach {
        case i @ Id(parts) =>
          val short = parts.last
          if (sel.distinct || implicitD.contains(short))
            names += (if (i.alias != null) i.alias else short)
        case other if sel.distinct && other.alias != null =>
          names += other.alias
        case _ =>
      }
      if (!sel.distinct && names.size != implicitD.size) Set.empty
      else names.toSet
    }
    if (s.distinct) {
      simpleSubselect(s).foreach { sub =>
        val dn = distinctNames(sub)
        val selected = scala.collection.mutable.Set.empty[String]
        var ok = dn.nonEmpty
        s.items.foreach {
          case Id(parts) =>
            val short = parts.last
            if (!dn.contains(short)) ok = false else selected += short
          case _ => ok = false
        }
        if (ok && selected.size == dn.size) s.distinct = false
      }
    }
    s
  }

  /** enable_optimize_predicate_expression (default on): WHERE
    * conjuncts over a FROM-subquery are cloned into the subquery's
    * WHERE — or HAVING when they touch an aggregate output — with
    * identifiers substituted by the subquery's aliased item ASTs (the
    * printer's printed-alias rule then renders them as the alias; ref
    * src/Interpreters/PredicateExpressionsOptimizer.cpp). The outer
    * predicate stays. */
  private val aggNames = Set("sum", "count", "min", "max", "avg", "any",
    "anyLast", "uniq", "uniqExact", "uniqHLL12", "uniqCombined",
    "groupArray", "groupUniqArray", "argMin", "argMax", "corr", "topK",
    "stddevPop", "stddevSamp", "varPop", "varSamp", "covarPop",
    "covarSamp", "median", "quantile", "quantiles", "sumIf", "countIf",
    "avgIf", "minIf", "maxIf")
  private def containsAgg(e: E): Boolean = e match {
    case Fn(n, args, params, _) =>
      aggNames(n) || args.exists(containsAgg) ||
        (params != null && params.exists(containsAgg))
    case Tup(items) => items.exists(containsAgg)
    case Arr(items) => items.exists(containsAgg)
    case Lambda(_, b) => containsAgg(b)
    case _ => false
  }
  private val pushBlockedFns = Set("rand", "rand64", "randConstant",
    "now", "now64", "today", "yesterday", "ignore", "indexHint",
    "arrayJoin", "rowNumberInAllBlocks", "rowNumberInBlock",
    "runningDifference", "runningAccumulate", "neighbor",
    "currentDatabase", "currentUser", "uptime", "version")
  private def pushBlocked(e: E): Boolean = e match {
    case Fn(n, args, params, _) =>
      pushBlockedFns(n) || args.exists(pushBlocked) ||
        (params != null && params.exists(pushBlocked))
    case Tup(items) => items.exists(pushBlocked)
    case Arr(items) => items.exists(pushBlocked)
    case Lambda(_, b) => pushBlocked(b)
    case _: Sub => true
    case _ => false
  }
  private def identsOf(e: E): Set[String] = e match {
    case Id(parts) => Set(parts.last)
    case Fn(_, args, params, _) =>
      args.flatMap(identsOf).toSet ++
        (if (params == null) Set.empty[String]
         else params.flatMap(identsOf).toSet)
    case Tup(items) => items.flatMap(identsOf).toSet
    case Arr(items) => items.flatMap(identsOf).toSet
    case Lambda(_, b) => identsOf(b)
    case _ => Set.empty
  }
  private def conjuncts(e: E): Seq[E] = e match {
    case Fn("and", args, null, false) if e.alias == null =>
      args.flatMap(conjuncts)
    case other => Seq(other)
  }

  private def predicatePushdown(s: Sel): Sel = {
    val w = s.where.getOrElse(return s)
    if (s.joins.nonEmpty || s.arrayJoins.nonEmpty) return s
    val inner = s.from match {
      case Some(TSub(Union(Seq(Left(i)), _))) => i
      case _ => return s
    }
    if (inner.limit.nonEmpty || inner.limitBy.nonEmpty || inner.totals ||
      inner.settings.nonEmpty || inner.groupingSets.nonEmpty ||
      inner.arrayJoins.nonEmpty || inner.joins.nonEmpty) return s
    if (inner.items.exists(_.isInstanceOf[Star])) return s
    // output name -> item AST
    val byName: Map[String, E] = inner.items.flatMap { it =>
      val n = if (it.alias != null) Some(it.alias) else it match {
        case Id(parts) => Some(parts.last)
        case _ => None
      }
      n.map(_ -> it)
    }.toMap
    val groupKeyTexts = inner.groupBy.map(g => ChExplain.printExprStr(g,
      needParens = false, new ChExplain.PState, withAlias = false)).toSet
    conjuncts(w).foreach { c =>
      val ids = identsOf(c)
      if (ids.nonEmpty && ids.forall(byName.contains) && !pushBlocked(c)) {
        val substituted = tx(c) {
          case i @ Id(parts) if i.alias == null &&
              byName.contains(parts.last) => byName(parts.last)
          case other => other
        }
        val toHaving = ids.exists(n => containsAgg(byName(n)))
        val asKeys = inner.groupBy.isEmpty || ids.forall { n =>
          val it = byName(n)
          val txt = ChExplain.printExprStr(it, needParens = false,
            new ChExplain.PState, withAlias = false)
          groupKeyTexts.contains(txt) || groupKeyTexts.contains(n)
        }
        if (toHaving)
          inner.having = Some(inner.having
            .map(h => Fn("and", Seq(h, substituted)))
            .getOrElse(substituted))
        else if (asKeys)
          inner.where = Some(inner.where
            .map(iw => Fn("and", Seq(iw, substituted)))
            .getOrElse(substituted))
      }
    }
    s
  }

  /** a single-source select drops table/alias qualifiers from its
    * identifiers (ref TranslateQualifiedNamesVisitor; 01495). */
  private def stripQualifiers(s: Sel): Sel = {
    if (s.joins.nonEmpty) return stripQualifiersJoin(s)
    val names: Set[String] = s.from match {
      case Some(t @ TTable(parts)) =>
        Set(parts.last, parts.mkString(".")) ++
          Option(t.talias).toSet ++ s.withItems.collect {
            case Cte(n, _) => n }.toSet
      case Some(t @ TFunc(_)) => Option(t.talias).toSet
      case Some(t @ TSub(_)) => Option(t.talias).toSet
      case None => Set.empty
    }
    if (names.isEmpty) return s
    txSel(s) {
      case i @ Id(parts)
          if parts.length == 2 && names.contains(parts.head) =>
        keep(i, Id(Seq(parts.last)))
      case other => other
    }
  }

  /** comma/CROSS JOIN with equality conjuncts between the two sides
    * becomes ALL INNER JOIN ON … (ref CrossToInnerJoinVisitor;
    * cross_to_inner_join_rewrite default 1). The WHERE keeps the
    * original conjuncts. */
  private def crossToInner(s: Sel): Sel = {
    if (s.joins.length != 1 || s.where.isEmpty) return s
    val j = s.joins.head
    if (j.kind != "COMMA" && j.kind != "CROSS") return s
    val lName: Set[String] = (s.from match {
      case Some(t @ TTable(parts)) =>
        Set(parts.last) ++ Option(t.talias).toSet
      case Some(t) => Option(t.talias).toSet
      case None => Set.empty
    })
    val rName: Set[String] = (j.t match {
      case t @ TTable(parts) => Set(parts.last) ++ Option(t.talias).toSet
      case t => Option(t.talias).toSet
    })
    if (lName.isEmpty || rName.isEmpty) return s
    def side(e: E): Option[Boolean] = e match { // true = right
      case Id(parts) if parts.length == 2 =>
        if (rName.contains(parts.head)) Some(true)
        else if (lName.contains(parts.head)) Some(false)
        else None
      case _ => None
    }
    val onConds = conjuncts(s.where.get).filter {
      case Fn("equals", Seq(l, r), null, false) =>
        (side(l), side(r)) match {
          case (Some(a), Some(b)) => a != b
          case _ => false
        }
      case _ => false
    }
    if (onConds.isEmpty) return s
    val on = if (onConds.length == 1) onConds.head else Fn("and", onConds)
    s.joins = Seq(j.copy(kind = "INNER", strictness = "ALL",
      on = Some(on)))
    s
  }

  /** optimize_functions_to_subcolumns (default off): rewrite reads to
    * type-specific subcolumns using the declared CH column types (ref
    * RewriteFunctionToSubcolumnVisitor; 02115/01872). */
  private def declaredType(col: String): Option[String] =
    try graft.ChSql.declaredColumnType(col)
    catch { case _: Throwable => None }
  def functionsToSubcolumns(e: E): E = e match {
    case Fn(n, Seq(arg @ Id(parts)), null, false) =>
      val col = parts.last
      val t = declaredType(col).getOrElse("")
      val sub: Option[E] = n match {
        case "length" if t.startsWith("Array") =>
          Some(Id(Seq(col + ".size0")))
        case "empty" if t.startsWith("Array") =>
          Some(Fn("equals", Seq(Id(Seq(col + ".size0")), Num("0"))))
        case "notEmpty" if t.startsWith("Array") =>
          Some(Fn("notEquals", Seq(Id(Seq(col + ".size0")), Num("0"))))
        case "isNull" if t.startsWith("Nullable") =>
          Some(Id(Seq(col + ".null")))
        case "isNotNull" if t.startsWith("Nullable") =>
          Some(Fn("not", Seq(Id(Seq(col + ".null")))))
        case "count" if t.startsWith("Nullable") =>
          Some(Fn("sum", Seq(Fn("not", Seq(Id(Seq(col + ".null")))))))
        case "mapKeys" if t.startsWith("Map") =>
          Some(Id(Seq(col + ".keys")))
        case "mapValues" if t.startsWith("Map") =>
          Some(Id(Seq(col + ".values")))
        case _ => None
      }
      sub.map(keep(e, _)).getOrElse(e)
    case Fn("mapContains", Seq(Id(parts), k), null, false)
        if declaredType(parts.last).exists(_.startsWith("Map")) =>
      keep(e, Fn("has", Seq(Id(Seq(parts.last + ".keys")), k)))
    case other => other
  }

  /** with a join, a qualifier drops only when the short name is
    * unambiguous across the sides (01083: n.k -> k, r.k stays). */
  private def stripQualifiersJoin(s: Sel): Sel = {
    if (s.joins.length != 1) return s
    def colsAndName(t: TableRef): Option[(String, Seq[String])] = {
      val nm = Option(t.talias).orElse(t match {
        case TTable(parts) => Some(parts.last)
        case _ => None
      })
      nm.flatMap { n =>
        t match {
          case TTable(parts) =>
            graft.ChSql.starVisibleColumns(parts.mkString("."))
              .orElse(graft.ChSql.knownTableColumns(parts.mkString(".")))
              .orElse(graft.ChSql.starVisibleColumns(parts.last))
              .orElse(graft.ChSql.knownTableColumns(parts.last))
              .map(cs => (n, cs))
          case _ => None
        }
      }
    }
    (colsAndName(s.from.getOrElse(return s)),
      colsAndName(s.joins.head.t)) match {
      case (Some((ln, lcols)), Some((rn, rcols))) =>
        val ambiguous = lcols.toSet.intersect(rcols.toSet)
        txSel(s) {
          case i @ Id(Seq(q, col))
              if (q == ln && lcols.contains(col) &&
                  !ambiguous(col)) ||
                (q == ln && ambiguous(col)) || // left side prints bare
                (q == rn && rcols.contains(col) && !ambiguous(col)) =>
            keep(i, Id(Seq(col)))
          case other => other
        }
      case _ => s
    }
  }

  /** optimize_if_transform_strings_to_enum (default off): string
    * branches of if()/transform() take Enum8 casts with alphabetical
    * numbering (ref OptimizeIfWithStringArgsVisitor; 01324/02497). */
  private def enumTypeOf(vals: Seq[String]): String =
    vals.distinct.sorted.zipWithIndex
      .map { case (v, i) => s"'$v' = ${i + 1}" }
      .mkString("Enum8(", ", ", ")")
  private def escT(t: String): String =
    t.flatMap { case '\'' => "\\'"; case '\\' => "\\\\"; case c => c.toString }
  def ifStringsToEnum(e: E): E = e match {
    case Fn("if", Seq(c, a @ Str(x), b @ Str(y)), null, false) =>
      val t = enumTypeOf(Seq(x, y))
      keep(e, Fn("if", Seq(c,
        Fn("_CAST", Seq(a, Str(escT(t)))),
        Fn("_CAST", Seq(b, Str(escT(t)))))))
    case Fn("transform", Seq(x, arr, vals @ Arr(items), dflt @ Str(d)), null, false)
        if items.forall(_.isInstanceOf[Str]) =>
      val strs = items.collect { case Str(v) => v } :+ d
      val t = enumTypeOf(strs)
      keep(e, Fn("transform", Seq(x, arr,
        Fn("_CAST", Seq(vals, Str(escT(s"Array($t)")))),
        Fn("_CAST", Seq(dflt, Str(escT(t)))))))
    case other => other
  }

  /** optimize_using_constraints (default off): comparisons decided by
    * the table's ASSUME constraints fold to 0/1, and OR/AND chains
    * simplify (ref WhereConstraintsOptimizer; 01622). */
  private def constraintsWhere(s: Sel): Sel = {
    val table = s.from match {
      case Some(TTable(parts)) => parts.last
      case _ => return s
    }
    val cs = graft.golden.DdlEmu.assumeConstraints
      .getOrElse(table, return s)
    // interval per column: (lo, loInc, hi, hiInc)
    val iv = scala.collection.mutable.Map.empty[String,
      (Option[BigDecimal], Boolean, Option[BigDecimal], Boolean)]
    cs.foreach { case (col, op, v) =>
      val (lo, loI, hi, hiI) =
        iv.getOrElse(col, (None, true, None, true))
      val nw = op match {
        case ">=" => (Some(v), true, hi, hiI)
        case ">" => (Some(v), false, hi, hiI)
        case "<=" => (lo, loI, Some(v), true)
        case "<" => (lo, loI, Some(v), false)
        case "=" => (Some(v), true, Some(v), true)
      }
      iv(col) = nw
    }
    // decide cmp(col, v): Some(true)=always, Some(false)=never
    def decide(col: String, op: String, v: BigDecimal): Option[Boolean] = {
      val (lo, loI, hi, hiI) = iv.getOrElse(col, return None)
      def allTrue: Boolean = op match {
        case "<" => hi.exists(h => h < v || (h == v && !hiI))
        case "<=" => hi.exists(h => h <= v)
        case ">" => lo.exists(l => l > v || (l == v && !loI))
        case ">=" => lo.exists(l => l >= v)
        case _ => false
      }
      def allFalse: Boolean = op match {
        case "<" => lo.exists(l => l >= v)
        case "<=" => lo.exists(l => l > v)
        case ">" => hi.exists(h => h <= v)
        case ">=" => hi.exists(h => h < v)
        case "=" =>
          lo.exists(l => l > v || (l == v && !loI)) ||
            hi.exists(h => h < v || (h == v && !hiI))
        case _ => false
      }
      if (allTrue) Some(true) else if (allFalse) Some(false) else None
    }
    def fold(e: E): E = tx(e) {
      case c @ Fn(op0, Seq(Id(parts), Num(v)), null, false)
          if Seq("less", "lessOrEquals", "greater", "greaterOrEquals",
            "equals").contains(op0) =>
        val op = op0 match {
          case "less" => "<"; case "lessOrEquals" => "<="
          case "greater" => ">"; case "greaterOrEquals" => ">="
          case "equals" => "="
        }
        scala.util.Try(BigDecimal(v)).toOption
          .flatMap(bv => decide(parts.last, op, bv)) match {
          case Some(t) => keep(c, Num(if (t) "1" else "0"))
          case None => c
        }
      case a @ Fn("and", args, null, false) =>
        if (args.exists(isFalseLit)) keep(a, Num("0"))
        else {
          val kept2 = args.filterNot(isTrueLit)
          if (kept2.isEmpty) keep(a, Num("1"))
          else if (kept2.length == 1) keep(a, kept2.head)
          else keep(a, Fn("and", kept2))
        }
      case o2 @ Fn("or", args, null, false) =>
        if (args.exists(isTrueLit)) keep(o2, Num("1"))
        else {
          val kept2 = args.filterNot(isFalseLit)
          if (kept2.isEmpty) keep(o2, Num("0"))
          else if (kept2.length == 1) keep(o2, kept2.head)
          else keep(o2, Fn("or", kept2))
        }
      case other => other
    }
    s.where = s.where.map(fold).filterNot(isTrueLit)
    s.prewhere = s.prewhere.map(fold).filterNot(isTrueLit)
    s
  }

  /** optimize_move_to_prewhere (default on): MergeTree reads move the
    * cheapest WHERE conjuncts into PREWHERE (ref
    * src/Storages/MergeTree/MergeTreeWhereOptimizer.cpp): with Wide
    * parts (sizes known) every non-heavy condition moves; with only
    * Compact parts a single condition moves. The WHERE keeps all
    * conjuncts, regrouped as (moved…) AND (rest…). */
  private def typeWidth(t: String): Int = {
    val b = t.trim.replaceAll("(?i)^(Nullable|LowCardinality)\\(", "")
    if (b.matches("(?i)(UInt8|Int8|Enum8|Bool).*")) 1
    else if (b.matches("(?i)(UInt16|Int16|Date|Enum16).*")) 2
    else if (b.matches("(?i)(UInt32|Int32|Float32|DateTime|IPv4).*")) 4
    else if (b.matches("(?i)(UInt64|Int64|Float64|DateTime64|Decimal).*")) 8
    else 100
  }
  private def moveToPrewhere(s: Sel): Sel = {
    if (s.prewhere.nonEmpty || s.joins.nonEmpty || s.where.isEmpty)
      return s
    val table = s.from match {
      case Some(TTable(parts)) => parts.last
      case _ => return s
    }
    val eng = graft.golden.DdlEmu.engineTextOf(table)
      .getOrElse(return s)
    val mtRe = "(?i)^ENGINE = (Replicated)?\\w*MergeTree\\b.*".r
    def isMt(e: String) = mtRe.findFirstIn(e).isDefined
    var sizeKnownCandidate = false
    if (isMt(eng)) sizeKnownCandidate = true
    else {
      val mergeRe = "(?i)^ENGINE = Merge\\(.*?,\\s*'([^']*)'\\)".r
      mergeRe.findFirstMatchIn(eng) match {
        case Some(m) =>
          val rx = ("^(" + m.group(1) + ")$").r
          val members = graft.golden.DdlEmu.knownTables
            .filter(t => rx.findFirstIn(t).isDefined)
          if (members.isEmpty || !members.forall(t =>
            graft.golden.DdlEmu.engineTextOf(t).exists(isMt))) return s
        case None => return s
      }
    }
    // columns and widths of this table
    val colTypes: Map[String, String] =
      graft.ChSql.starVisibleColumns(table)
        .orElse(graft.ChSql.knownTableColumns(table))
        .getOrElse(return s)
        .flatMap(c => graft.ChSql.declaredColumnTypeIn(c,
          Set(table.toLowerCase)).map(c -> _)).toMap
    if (colTypes.isEmpty) return s
    // Wide parts iff rows >= min_rows AND bytes >= min_bytes (defaults
    // 0 / 10485760); bytes estimated from declared widths
    val wide = sizeKnownCandidate && {
      val st = graft.golden.DdlEmu.settingsTextOf(table).getOrElse("")
      def num(k: String, d: Long): Long =
        (k + "\\s*=\\s*(\\d+)").r.findFirstMatchIn(st)
          .map(_.group(1).toLong).getOrElse(d)
      val minRows = num("min_rows_for_wide_part", 0L)
      val minBytes = num("min_bytes_for_wide_part", 10485760L)
      val rows = scala.util.Try(
        org.apache.spark.sql.SparkSession.active.table(table).count())
        .getOrElse(0L)
      val rowW = colTypes.values.map(typeWidth).sum.max(1)
      rows >= minRows && rows * rowW >= minBytes
    }
    val cs = conjuncts(s.where.get)
    def weight(c: E): Option[Int] = {
      val ids = identsOf(c)
      if (ids.isEmpty || pushBlocked(c) || containsAgg(c)) None
      else if (!ids.forall(colTypes.contains)) None
      else Some(ids.toSeq.map(i => typeWidth(colTypes(i))).sum)
    }
    val weighted = cs.map(c => c -> weight(c))
    val movable = weighted.collect { case (c, Some(w)) => (c, w) }
    if (movable.isEmpty) return s
    val moved: Seq[E] =
      if (wide) movable.filter(_._2 < 64).map(_._1)
      else {
        val best = movable.minBy(_._2)
        Seq(best._1)
      }
    if (moved.isEmpty) return s
    val movedSet = moved.toSet
    val rest = cs.filterNot(movedSet)
    def group(xs: Seq[E]): E =
      if (xs.length == 1) xs.head else Fn("and", xs)
    s.prewhere = Some(group(moved))
    s.where =
      if (rest.isEmpty) None
      else Some(Fn("and", Seq(group(moved), group(rest))))
    s
  }

  // ---------- pipeline ----------

  def run(u0: Union): Union = {
    var u = u0
    u = expandStars(u)
    u = remoteArgs(u)
    u = txU(u)(normalizeNames)
    // the OrNull suffix lands in TreeRewriter, BEFORE TreeOptimizer
    // (01706 pins sumOrNull(1) surviving count-variant normalization)
    if (on("aggregate_functions_null_for_empty", default = false))
      u = txU(u)(nullForEmpty)
    u = txU(u)(countDistinct)
    u = txU(u)(foldConstCompare)
    u = eachSel(u)(dropTrueWhere)
    u = txU(u)(constantIf)
    if (on("optimize_if_chain_to_multiif", default = false))
      u = txU(u)(ifChainToMultiIf)
    if (on("optimize_multiif_to_if", default = true))
      u = txU(u)(multiIfToIf)
    if (on("optimize_normalize_count_variants", default = true))
      u = txU(u)(countVariants)
    if (on("optimize_rewrite_sum_if_to_count_if", default = false))
      u = txU(u)(sumIfToCountIf)
    if (on("optimize_arithmetic_operations_in_aggregate_functions",
        default = true))
      u = txU(u)(arithOutOfAgg)
    if (on("optimize_move_functions_out_of_any", default = false))
      u = txU(u)(moveOutOfAny)
    if (on("optimize_injective_functions_inside_uniq", default = true))
      u = txU(u)(injectiveInUniq)
    u = txU(u)(tupleComparison)
    if (on("optimize_group_by_function_keys", default = true))
      u = eachSel(u)(groupByFunctionKeys)
    if (on("optimize_aggregators_of_group_by_keys", default = true))
      u = eachSel(u)(aggregatorsOfKeys)
    if (on("optimize_redundant_functions_in_order_by", default = true))
      u = eachSel(u)(redundantOrderBy)
    if (on("optimize_duplicate_order_by_and_distinct", default = false))
      u = eachSelTopDown(u)(duplicateOrderByAndDistinct)
    if (on("optimize_if_transform_strings_to_enum", default = false))
      u = txU(u)(ifStringsToEnum)
    if (on("optimize_using_constraints", default = false))
      u = eachSel(u)(constraintsWhere)
    if (on("optimize_move_to_prewhere", default = true))
      u = eachSel(u)(moveToPrewhere)
    if (conf("cross_to_inner_join_rewrite", "1").trim != "0")
      u = eachSel(u)(crossToInner)
    if (on("optimize_functions_to_subcolumns", default = false))
      u = txU(u)(functionsToSubcolumns)
    if (on("enable_optimize_predicate_expression", default = true))
      u = eachSelTopDown(u)(predicatePushdown)
    u = eachSelNoCte(u)(stripQualifiers)
    u
  }
}
