package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.ChRegistry

/** ClickHouse SQL dialect shim (SURVEY §7.3 "CH SQL dialect quirks"):
  * light textual rewrites from CH-isms to Spark SQL, then execution with
  * the CH function names registered. Handles the constructs Spark parses
  * differently; anything already ANSI passes through untouched.
  *
  * Covered: PREWHERE→WHERE (ref MergeTreeWhereOptimizer — pushdown makes
  * them equivalent here), FINAL stripped (our tables are already merged;
  * engine-family FINAL semantics are exposed as queries/views instead),
  * FORMAT clause stripped (the result is a DataFrame; formatting is the
  * writer's job), GLOBAL IN→IN (no shard-local sets in Spark's shuffle
  * model), == → =, LIMIT n BY cols → window rewrite hint (unsupported
  * textually; raises with guidance).
  */
object ChSql {

  /** CH composite higher-order fns (lambda under a scalar root — not
    * registrable as temp functions): rewrite f(lambda, arr...) with
    * balanced-paren argument splitting into the Spark composition. The
    * fill/split family accepts CH's multi-array form, where the lambda
    * takes one parameter per array and the FIRST array carries the
    * values (ref src/Functions/array/arrayFill.cpp, arraySplit.cpp). */
  private def predArr(l: String, as: Seq[String]): String = as match {
    case Seq(a) => s"transform($a, $l)"
    case Seq(a, b) => s"zip_with($a, $b, $l)"
    case other => throw new IllegalArgumentException(
      s"HOF with ${other.size} arrays not supported")
  }
  // carry the last pred-true element forward (first element always kept);
  // lambdas may return UInt8 0/1, hence the boolean cast
  private def fillExpr(vals: String, pred: String): String =
    s"aggregate(zip_with($vals, $pred, (v, p) -> struct(v AS v, p AS p)), " +
      s"slice($vals, 1, 0), (acc, s) -> concat(acc, " +
      s"array(if(cast(s.p AS boolean) OR size(acc) = 0, s.v, " +
      s"element_at(acc, -1)))))"
  // group boundaries: 1, every pred-true position (+1 for the reverse
  // form), and n+1; groups are the slices between consecutive bounds
  private def splitExpr(vals: String, pred: String, after: Boolean): String = {
    val shift = if (after) " + 1" else ""
    val bounds = s"array_sort(array_distinct(concat(array(1), " +
      s"filter(zip_with($pred, sequence(1, size($vals)), " +
      s"(p, i) -> if(cast(p AS boolean), i$shift, -1)), x -> x > 0), " +
      s"array(size($vals) + 1))))"
    s"if(size($vals) = 0, slice(array($vals), 1, 0), " +
      s"transform(zip_with(slice($bounds, 1, size($bounds) - 1), " +
      s"slice($bounds, 2, size($bounds) - 1), " +
      s"(s, e) -> slice($vals, s, e - s)), g -> g))"
  }

  private val hofRewrites: Map[String, (String, Seq[String]) => String] = Map(
    "arrayCount" -> ((l, as) => s"size(filter(${as.head}, $l))"),
    "arrayFirst" -> ((l, as) => s"get(filter(${as.head}, $l), 0)"),
    "arrayFirstIndex" -> ((l, as) =>
      s"coalesce(array_position(transform(${as.head}, $l), true), 0L)"),
    "arrayFirstOrNull" -> ((l, as) => s"get(filter(${as.head}, $l), 0)"),
    "arrayLast" -> ((l, as) =>
      s"get(filter(${as.head}, $l), size(filter(${as.head}, $l)) - 1)"),
    "arrayLastOrNull" -> ((l, as) =>
      s"get(filter(${as.head}, $l), size(filter(${as.head}, $l)) - 1)"),
    // last matching 1-based index, 0 when none: max over masked indices
    "arrayLastIndex" -> ((l, as) =>
      s"if(size(${as.head}) = 0, 0, coalesce(array_max(zip_with(" +
        s"transform(${as.head}, $l), sequence(1, size(${as.head})), " +
        s"(p, i) -> if(p, i, 0))), 0))"),
    "arrayFill" -> ((l, as) => fillExpr(as.head, predArr(l, as))),
    "arrayReverseFill" -> ((l, as) =>
      s"reverse(${fillExpr(s"reverse(${as.head})",
        predArr(l, as.map(a => s"reverse($a)")))})"),
    "arraySplit" -> ((l, as) =>
      splitExpr(as.head, predArr(l, as), after = false)),
    "arrayReverseSplit" -> ((l, as) =>
      splitExpr(as.head, predArr(l, as), after = true)))

  /** CH parameterized aggregates: `name(params)(args)` → `name(args,
    * params)` (ref src/Parsers/ASTFunction.h `parameters`). The registry
    * declares these names with the parameter(s) appended after the
    * regular arguments. */
  private val paramAggs = Set("quantile", "quantileExact", "quantiles",
    "quantilesExact", "quantileTiming", "quantilesTiming",
    "quantileTDigest", "quantileExactWeighted", "topK", "uniqUpTo",
    "histogram")

  private[graft] def rewriteParamAggs(sql: String): String = {
    var s = sql
    var changed = true
    def balancedEnd(str: String, open: Int): Int = {
      var depth = 0; var i = open; var inStr = false
      while (i < str.length) {
        val c = str.charAt(i)
        if (inStr) { if (c == '\'' && str.charAt(i - 1) != '\\') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    while (changed) {
      changed = false
      for (name <- paramAggs if !changed) {
        var idx = s.indexOf(name + "(")
        while (idx >= 0 && !changed) {
          val boundary = idx == 0 ||
            (!Character.isLetterOrDigit(s.charAt(idx - 1)) &&
              s.charAt(idx - 1) != '_')
          val pEnd = if (boundary) balancedEnd(s, idx + name.length) else -1
          if (pEnd > 0) {
            var j = pEnd + 1
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            if (j < s.length && s.charAt(j) == '(') {
              val aEnd = balancedEnd(s, j)
              if (aEnd > 0) {
                val params = s.substring(idx + name.length + 1, pEnd).trim
                val args = s.substring(j + 1, aEnd).trim
                s = s.substring(0, idx) +
                  s"$name($args, $params)" + s.substring(aEnd + 1)
                changed = true
              }
            }
          }
          if (!changed) idx = s.indexOf(name + "(", idx + 1)
        }
      }
    }
    s
  }

  private def rewriteHofs(sql: String): String = {
    var s = sql
    var changed = true
    while (changed) {
      changed = false
      for ((name, fmt) <- hofRewrites) {
        val idx = s.indexOf(name + "(")
        if (idx >= 0 &&
          (idx == 0 || (!Character.isLetterOrDigit(s.charAt(idx - 1)) &&
            s.charAt(idx - 1) != '_'))) {
          val open = idx + name.length
          var depth = 0; var i = open; var inStr = false
          val commas = scala.collection.mutable.ArrayBuffer.empty[Int]
          var end = -1
          while (end < 0 && i < s.length) {
            val c = s.charAt(i)
            if (inStr) { if (c == '\'' && s.charAt(i - 1) != '\\') inStr = false }
            else c match {
              case '\'' => inStr = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = i
              case ',' if depth == 1 => commas += i
              case _ =>
            }
            i += 1
          }
          require(end > 0 && commas.nonEmpty, s"cannot parse $name(...) args")
          // the lambda may itself contain depth-1 commas inside its
          // parameter list `(x, y) ->`: the first comma AFTER the arrow
          // (or the only comma for bare `x ->`) separates lambda from arrays
          val arrow = s.indexOf("->", open)
          val argCommas = commas.filter(_ > arrow).toSeq
          val lambda = s.substring(open + 1, argCommas.head).trim
          val arrs = (argCommas :+ end).sliding(2).map {
            case Seq(a, b) => s.substring(a + 1, b).trim
          }.toSeq
          s = s.substring(0, idx) + fmt(lambda, arrs) + s.substring(end + 1)
          changed = true
        }
      }
    }
    s
  }

  /** CH bracket syntax: `[a, b]` literals → `array(a, b)`, and 1-based
    * subscripts `expr[i]` → `element_at(expr, i)` (Spark's `[]` is
    * 0-based for arrays; element_at matches CH's 1-based convention).
    * Char-scan with string-literal awareness; a `[` after an identifier,
    * `)`, or `]` is a subscript, otherwise a literal. */
  private[graft] def rewriteBrackets(sql: String): String = {
    val out = new StringBuilder
    // for each open bracket: ")" to emit at its close
    val stack = scala.collection.mutable.Stack.empty[Char]
    var inStr = false
    var i = 0
    def lastNonSpace: Char = {
      var j = out.length - 1
      while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
      if (j >= 0) out.charAt(j) else ' '
    }
    // a `[` directly after one of these is an array literal, not a
    // subscript on the keyword (`SELECT [1,2]`, `WHERE [1] = ...`)
    val keywords = Set("select", "from", "where", "and", "or", "not", "in",
      "by", "as", "on", "when", "then", "else", "end", "join", "all",
      "distinct", "union", "having", "limit", "offset", "with", "between",
      "like", "is", "if", "case", "using", "interval")
    def trailingWord: String = {
      var j = out.length - 1
      while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
      val e = j
      while (j >= 0 && (out.charAt(j).isLetterOrDigit || out.charAt(j) == '_'))
        j -= 1
      out.substring(j + 1, e + 1)
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'' && sql.charAt(i - 1) != '\\') inStr = false
      } else c match {
        case '\'' => inStr = true; out.append(c)
        case '[' =>
          val prev = lastNonSpace
          val isSubscript = (prev.isLetterOrDigit || prev == '_' ||
            prev == ')' || prev == ']') &&
            !keywords.contains(trailingWord.toLowerCase)
          if (isSubscript) {
            // wrap the base expression: identifier chain or balanced parens
            var j = out.length - 1
            while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
            if (j >= 0 && out.charAt(j) == ')') {
              var depth = 0
              var k = j
              var done = false
              while (!done && k >= 0) {
                out.charAt(k) match {
                  case ')' => depth += 1
                  case '(' => depth -= 1; if (depth == 0) done = true
                  case _ =>
                }
                if (!done) k -= 1
              }
              // include a preceding function name if present
              var f = k - 1
              while (f >= 0 && (out.charAt(f).isLetterOrDigit ||
                out.charAt(f) == '_' || out.charAt(f) == '.')) f -= 1
              out.insert(f + 1, "element_at(")
            } else {
              var k = j
              while (k >= 0 && (out.charAt(k).isLetterOrDigit ||
                out.charAt(k) == '_' || out.charAt(k) == '.')) k -= 1
              out.insert(k + 1, "element_at(")
            }
            out.append(", ")
            stack.push(')')
          } else {
            out.append("array(")
            stack.push(')')
          }
        case ']' if stack.nonEmpty =>
          out.append(stack.pop())
        case _ => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** CH 1-based tuple element access: `t.1` → `tupleElement(t, 1)` —
    * positional, because Spark names a parenthesized tuple's fields
    * after its member expressions, not col1..colN. Only fires when the
    * token before the dot is an identifier or a closing paren/bracket —
    * `0.5` stays a decimal literal. */
  private[graft] def rewriteTupleAccess(sql: String): String = {
    val out = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'' && sql.charAt(i - 1) != '\\') inStr = false
      } else if (c == '\'') { inStr = true; out.append(c) }
      else if (c == '.' && i + 1 < sql.length && sql.charAt(i + 1).isDigit &&
          out.nonEmpty) {
        // token before the dot: identifier not starting with a digit, or )
        var j = out.length - 1
        val prev = out.charAt(j)
        var baseStart = -1
        if (prev == ')') {
          var depth = 0; var k = j; var done = false
          while (!done && k >= 0) {
            out.charAt(k) match {
              case ')' => depth += 1
              case '(' => depth -= 1; if (depth == 0) done = true
              case _ =>
            }
            if (!done) k -= 1
          }
          // include a preceding function name if present
          var f = k - 1
          while (f >= 0 && (out.charAt(f).isLetterOrDigit ||
            out.charAt(f) == '_' || out.charAt(f) == '.')) f -= 1
          baseStart = f + 1
        } else if (prev.isLetterOrDigit || prev == '_') {
          while (j >= 0 && (out.charAt(j).isLetterOrDigit ||
            out.charAt(j) == '_')) j -= 1
          if (!out.charAt(j + 1).isDigit) baseStart = j + 1
        }
        if (baseStart >= 0) {
          var d = i + 1
          while (d < sql.length && sql.charAt(d).isDigit) d += 1
          out.insert(baseStart, "tupleElement(")
          out.append(", ").append(sql.substring(i + 1, d)).append(')')
          i = d - 1
        } else out.append(c)
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  def translate(chSql: String): String = {
    // tuple access runs AFTER brackets so `t[1].1` sees the rewritten
    // `element_at(t, 1)` and wraps it positionally
    var s = rewriteHofs(rewriteTupleAccess(rewriteBrackets(
      rewriteParamAggs(chSql))))
    // FORMAT <name> at the end (CH sends results through an output format)
    s = s.replaceAll("(?i)\\s+FORMAT\\s+\\w+\\s*;?\\s*$", "")
    // PREWHERE behaves as WHERE once pushdown applies
    s = s.replaceAll("(?i)\\bPREWHERE\\b", "WHERE")
    // FINAL modifier after a table ref
    s = s.replaceAll("(?i)\\bFINAL\\b", "")
    // GLOBAL IN / GLOBAL NOT IN
    s = s.replaceAll("(?i)\\bGLOBAL\\s+(NOT\\s+)?IN\\b", "$1IN")
    // join strictness modifiers (ref src/Parsers/ASTTablesInSelectQuery.h):
    // ALL is CH's default (= ANSI); ANY keeps the first match per left row —
    // identical when the right key is unique, which each pinned golden
    // file's hash-diff verifies before we accept the translation
    s = s.replaceAll(
      "(?i)\\b(ALL|ANY)\\s+((?:INNER|LEFT|RIGHT|FULL)\\s+(?:OUTER\\s+)?JOIN)",
      "$2")
    s = s.replaceAll("(?i)\\b(ALL|ANY)\\s+JOIN\\b", "JOIN")
    // == is valid CH equality
    s = s.replaceAll("==", "=")
    // dateDiff('day', a, b) — Spark's parser special-cases dateDiff with an
    // unquoted unit identifier, so unquote+uppercase and use timestampdiff
    s = s.replaceAll("(?i)\\bdateDiff\\(\\s*'(\\w+)'\\s*,", "timestampdiff($1,")
    // zero-arg count() is valid CH (count(*) in ANSI)
    s = s.replaceAll("(?i)\\bcount\\(\\s*\\)", "count(*)")
    // numbers(N) / numbers(offset, N) table function (ref
    // src/TableFunctions/TableFunctionNumbers.cpp) → Spark's range():
    // same lazy integer generator, column renamed to CH's `number`
    s = s.replaceAll("(?i)\\bnumbers(?:_mt)?\\((\\d+)\\s*,\\s*(\\d+)\\)",
      "(SELECT id AS number FROM range($1, $1 + $2))")
    s = s.replaceAll("(?i)\\bnumbers(?:_mt)?\\((\\d+)\\)",
      "(SELECT id AS number FROM range($1))")
    // ARRAY JOIN clause (ref src/Interpreters/ArrayJoinAction.h): the
    // aliased single-array form maps to LATERAL VIEW explode; LEFT ARRAY
    // JOIN keeps empty-array rows → explode_outer. (The alias-less form
    // shadows the source column name — not translated textually.)
    s = s.replaceAll(
      "(?i)\\bLEFT\\s+ARRAY\\s+JOIN\\s+([\\w.]+(?:\\([^()]*\\))?)\\s+AS\\s+(\\w+)",
      "LATERAL VIEW explode_outer($1) __aj AS $2")
    s = s.replaceAll(
      "(?i)\\bARRAY\\s+JOIN\\s+([\\w.]+(?:\\([^()]*\\))?)\\s+AS\\s+(\\w+)",
      "LATERAL VIEW explode($1) __aj AS $2")
    // WITH TOTALS (ref TotalsHavingTransform.h): the totals row is the
    // empty grouping set; Spark's GROUPING SETS computes both in one
    // aggregation pass (totals row carries NULL group keys)
    s = s.replaceAll(
      "(?is)\\bGROUP\\s+BY\\s+(.+?)\\s+WITH\\s+TOTALS\\b",
      "GROUP BY GROUPING SETS (($1), ())")
    // CH allows trailing semicolon
    s = s.replaceAll(";\\s*$", "")
    if (s.matches("(?is).*\\bLIMIT\\s+\\d+\\s+BY\\b.*"))
      throw new IllegalArgumentException(
        "LIMIT n BY is not translated textually; use row_number() OVER " +
          "(PARTITION BY cols ORDER BY ...) <= n (see q_limit_by)")
    s
  }

  // ORDER BY <key> WITH FILL [FROM a TO b [STEP s]] — the integer-key
  // form (ref src/Interpreters/FillingRow.h). The clause is a table
  // operator (it MAKES rows), so it can't stay in the SQL string: strip
  // it, run the base query, and apply operators/WithFill on the result.
  private val FillRe =
    ("(?is)\\bORDER\\s+BY\\s+(\\w+)\\s+WITH\\s+FILL" +
      "(?:\\s+FROM\\s+(-?\\d+)\\s+TO\\s+(-?\\d+)(?:\\s+STEP\\s+(\\d+))?)?" +
      "\\s*$").r

  /** Run a ClickHouse-dialect query: register CH function names + fixture
    * views, translate, execute. */
  def sql(spark: SparkSession, chQuery: String, sfDir: String): DataFrame = {
    ChRegistry.register(spark)
    Tables.register(spark, sfDir)
    if (graft.functions.UserDefinedSqlFunctions.maybeExecute(spark, chQuery))
      spark.emptyDataFrame
    else FillRe.findFirstMatchIn(chQuery.trim.stripSuffix(";")) match {
      case Some(m) =>
        val base = spark.sql(translate(
          FillRe.replaceFirstIn(chQuery.trim.stripSuffix(";"),
            s"ORDER BY ${m.group(1)}")))
        val key = m.group(1)
        val casted = base.withColumn(key,
          org.apache.spark.sql.functions.col(key).cast("bigint"))
        val (from, to) = if (m.group(2) != null)
          (m.group(2).toLong, m.group(3).toLong)
        else {
          val r = casted.agg(org.apache.spark.sql.functions.min(key),
            org.apache.spark.sql.functions.max(key)).collect()(0)
          (r.getLong(0), r.getLong(1))
        }
        val step = Option(m.group(4)).map(_.toLong).getOrElse(1L)
        graft.operators.WithFill.fillLong(spark, casted, key, from, to, step)
          .orderBy(key)
      case None => spark.sql(translate(chQuery))
    }
  }
}
