package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executable (external-process) UDFs: rows piped through a shell command
  * line-by-line, one process per partition.
  *
  * Reference: `UserDefinedExecutableFunctionFactory` +
  * `ShellCommandSource` (`/root/reference/src/Functions/UserDefined/
  * UserDefinedExecutableFunctionFactory.h`,
  * `src/Processors/Sources/ShellCommandSource.h`) — CH streams blocks to a
  * child process over pipes. Spark analog: `RDD.pipe`, which does exactly
  * that per partition (process reuse, streaming I/O, no driver round
  * trip).
  */
object ExecutableUdf {

  /** Pipe a single string column through `command`; returns one output
    * line per row as a one-column DataFrame. */
  def pipe(spark: SparkSession, df: DataFrame, col: String,
      command: Seq[String], outCol: String = "value"): DataFrame = {
    import spark.implicits._
    df.select(col).na.drop()
      .rdd.map(_.getString(0))
      .pipe(command)
      .toDF(outCol)
  }

  /** Pipe with row identity: frames each input line as `<id>\t<value>` and
    * expects the command to echo the id column through (awk-style `$1`
    * passthrough), so the output joins back to its input row — the same
    * contract as CH executable UDFs, whose result is a column usable in
    * the SELECT alongside the input columns
    * (ref `src/Functions/UserDefined/UserDefinedExecutableFunctionFactory.h`).
    *
    * @return df with `outCol` appended (left join on `idCol`; rows whose
    *         id the command dropped get NULL). */
  def pipeWithId(spark: SparkSession, df: DataFrame, idCol: String,
      valueCol: String, command: Seq[String],
      outCol: String = "value"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c, split}
    val piped = df.select(c(idCol).cast("string"), c(valueCol).cast("string"))
      .na.drop()
      .rdd.map(r => r.getString(0) + "\t" + r.getString(1))
      .pipe(command)
      .toDF("__line")
      .select(
        split(c("__line"), "\t", 2).getItem(0).as("__pid"),
        split(c("__line"), "\t", 2).getItem(1).as(outCol))
    df.join(piped, df(idCol).cast("string") === c("__pid"), "left")
      .drop("__pid")
  }
}
