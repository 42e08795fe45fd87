package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's runtime
  * skew-join splitting, for when the skew is known up front (a handful of
  * mega-keys in a 100 TB fact table).
  *
  * The reference sidesteps this with single-node hash tables
  * (`src/Interpreters/Aggregator.h` two-level tables + shard-local
  * processing); on a shuffle-based engine a hot key must be salted so its
  * rows spread over N reducers.
  */
object Skew {

  /** Salted two-phase aggregation: groupBy(keys + salt) partial → strip
    * salt → final merge. `partials` compute the salted partial, `finals`
    * merge partials — the caller states both halves explicitly (sum/sum,
    * count/sum, min/min, …). */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a random salt in [0, n); the right side is replicated n
    * times with each salt value, so one hot key spreads over n reducers.
    * Right replication costs n× its size — use for dimension-scale right
    * sides with a skewed fact side. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, on :+ "__salt", joinType)
      .drop("__salt")
  }
}
