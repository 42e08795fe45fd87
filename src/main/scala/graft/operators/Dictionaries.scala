package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary lookups (ref `/root/reference/src/Functions/
  * FunctionsExternalDictionaries.h` dictGet/dictGetOrDefault/dictHas;
  * layouts `src/Dictionaries/{Flat,Hashed,RangeHashed}Dictionary.h`).
  *
  * CH keeps dictionaries in RAM on every node and resolves dictGet as an
  * O(1) per-row probe. The Spark-scale equivalent is a BROADCAST of the
  * dimension table: dictGet becomes a broadcast hash join — same per-row
  * probe, already codegen'd, and it scales to any fact-side size. For
  * rangeHashed (valid-from/valid-to versions) the probe is a broadcast
  * range join.
  */
object Dictionaries {

  /** dictGet(dict, value, key): left-joins the broadcast dictionary and
    * appends `asCol` (default-filled). One call per attribute, matching
    * CH's dictGet('d', 'attr', key). */
  def dictGet(
      fact: DataFrame, dict: DataFrame,
      factKey: String, dictKey: String, dictValue: String,
      asCol: String, default: Option[Column] = None): DataFrame = {
    val dim = dict.select(col(dictKey).as("__dk"), col(dictValue).as(asCol))
    val joined = fact.join(broadcast(dim),
      fact(factKey) === col("__dk"), "left").drop("__dk")
    default match {
      case Some(d) => joined.withColumn(asCol, coalesce(col(asCol), d))
      case None => joined
    }
  }

  /** dictHas: membership flag against the broadcast dictionary. */
  def dictHas(fact: DataFrame, dict: DataFrame,
      factKey: String, dictKey: String, asCol: String): DataFrame = {
    val dim = dict.select(col(dictKey).as("__dk")).distinct()
      .withColumn("__present", lit(true))
    fact.join(broadcast(dim), fact(factKey) === col("__dk"), "left")
      .withColumn(asCol, coalesce(col("__present"), lit(false)))
      .drop("__dk", "__present")
  }

  /** rangeHashed dictGet: value valid for [from, to) — broadcast range
    * join, last-write-wins on overlaps via deterministic ordering. */
  def dictGetRange(
      fact: DataFrame, dict: DataFrame,
      factKey: String, atCol: String,
      dictKey: String, fromCol: String, toCol: String, dictValue: String,
      asCol: String): DataFrame = {
    val dim = broadcast(dict.select(
      col(dictKey).as("__dk"), col(fromCol).as("__from"),
      col(toCol).as("__to"), col(dictValue).as(asCol)))
    val joined = fact.join(dim,
      fact(factKey) === col("__dk") &&
        fact(atCol) >= col("__from") && fact(atCol) < col("__to"), "left")
    // overlapping ranges: keep the latest __from per fact row
    val factCols = fact.columns.map(col)
    joined
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(factCols: _*)
          .orderBy(col("__from").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .drop("__dk", "__from", "__to", "__rn")
  }
}
