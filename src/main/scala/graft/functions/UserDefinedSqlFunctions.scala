package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-lambda UDFs: `CREATE FUNCTION name AS (a, b) -> expr`
  * (ref `/root/reference/src/Functions/UserDefined/
  * UserDefinedSQLFunctionFactory.h:18`, interpreter
  * `src/Interpreters/InterpreterCreateFunctionQuery.cpp`).
  *
  * Implemented as macro expansion into the Catalyst tree: the body is
  * parsed once, and at call sites every reference to a parameter name is
  * substituted with the caller's argument expression — exactly CH's
  * behavior (no function-call overhead, fully optimizable/codegen-able).
  */
object UserDefinedSqlFunctions {

  /** Register `name(params…) = body` (body = any SQL expression over the
    * parameter names). */
  def create(spark: SparkSession, name: String, params: Seq[String],
      body: String): Unit = {
    val template = spark.sessionState.sqlParser.parseExpression(body)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      args => {
        require(args.length == params.length,
          s"$name expects ${params.length} args, got ${args.length}")
        val byName = params.zip(args).toMap
        template.transformUp {
          case a: UnresolvedAttribute if a.nameParts.length == 1 &&
            byName.contains(a.nameParts.head) => byName(a.nameParts.head)
        }
      },
      "sql_udf")
  }

  private val CreateFn =
    """(?is)\s*CREATE\s+FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s*\(([^)]*)\)\s*->\s*(.+)""".r
  // single-parameter lambda without parens: CREATE FUNCTION f AS x -> …
  private val CreateFn1 =
    """(?is)\s*CREATE\s+FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(\w+)\s*->\s*(.+)""".r

  /** Execute a CH `CREATE FUNCTION` statement. Returns true if the
    * statement was a CREATE FUNCTION (and was handled). */
  // the body is CH-dialect text (length over arrays, CH names) — it
  // must ride the same translation as any query expression before
  // Spark's parser sees it
  private def chBody(body: String): String =
    graft.ChSql.translate(body.trim.stripSuffix(";")).trim

  private val DropFn =
    """(?is)\s*DROP\s+FUNCTION\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r

  def maybeExecute(spark: SparkSession, statement: String): Boolean =
    statement match {
      case CreateFn(name, params, body) =>
        create(spark, name,
          params.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          chBody(body))
        true
      case CreateFn1(name, param, body) =>
        create(spark, name, Seq(param), chBody(body))
        true
      case DropFn(ifExists, name) =>
        val reg = spark.sessionState.functionRegistry
        val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
        if (!reg.functionExists(id) && ifExists == null)
          sys.error(s"UNKNOWN_FUNCTION: $name")
        reg.dropFunction(id)
        true
      case _ => false
    }
}
