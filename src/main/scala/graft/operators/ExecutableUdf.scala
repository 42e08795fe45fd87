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
}
