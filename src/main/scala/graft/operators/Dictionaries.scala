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

  /** Named dictionaries for SQL-callable dictGet('name','attr',key)
    * (ref FunctionsExternalDictionaries.h). CH keeps dictionaries
    * RAM-resident on every node; the analog here is a collected map baked
    * into the expression tree as a literal — same broadcast-size
    * constraint, pure Catalyst (map literal + element_at), no UDF. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Column]]()

  /** Hard cap on dictionary size: the collected map is baked into the
    * expression tree, so it must stay well under broadcast size — a
    * million-pair literal strains the driver and codegen long before the
    * broadcast limit. Beyond this, the right tool is [[dictGet]] — a
    * broadcast join that never collects. */
  val MaxDictRows = 100000

  /** Register `dict` under `name`: collects one key→value map literal per
    * attribute column. Call once per session per dictionary. */
  def createDictionary(name: String, dict: DataFrame, keyCol: String): Unit = {
    val attrs = dict.columns.filter(_ != keyCol)
    val rows = dict.select(keyCol, attrs: _*).limit(MaxDictRows + 1).collect()
    require(rows.length <= MaxDictRows,
      s"dictionary '$name' exceeds $MaxDictRows rows; a map literal this " +
        "size cannot be baked into the plan — use Dictionaries.dictGet " +
        "(broadcast join) for large dimension tables")
    val maps = attrs.zipWithIndex.map { case (a, i) =>
      val pairs = rows.iterator.flatMap { r =>
        if (r.isNullAt(i + 1)) Iterator.empty
        else Iterator(lit(r.get(0)), lit(r.get(i + 1)))
      }.toSeq
      a -> map(pairs: _*)
    }.toMap
    registry.put(name, maps)
  }

  /** dictGet('name', 'attr', key) as a Column (null when absent). */
  def sqlDictGet(name: String, attr: String, key: Column): Column = {
    val dict = registry.get(name)
    require(dict != null, s"unknown dictionary '$name'; call createDictionary")
    val m = dict.getOrElse(attr,
      throw new IllegalArgumentException(s"dictionary '$name' has no attribute '$attr'"))
    element_at(m, key)
  }

  /** dictGetOrDefault('name', 'attr', key, default). */
  def sqlDictGetOrDefault(name: String, attr: String, key: Column,
      default: Column): Column =
    coalesce(sqlDictGet(name, attr, key), default)

  /** dictHas('name', key): true when any attribute map contains the key. */
  def sqlDictHas(name: String, key: Column): Column = {
    val dict = registry.get(name)
    require(dict != null, s"unknown dictionary '$name'; call createDictionary")
    dict.values.map(m => map_contains_key(m, key))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

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
    * join, latest-__from-wins on overlaps.
    *
    * Overlap resolution happens entirely on the (broadcast-size)
    * dictionary side: ranges are flattened into disjoint elementary
    * intervals, each carrying the value of the covering range with the
    * latest __from. The fact side then matches AT MOST ONE interval, so no
    * post-join window is needed — duplicate fact rows are preserved (the
    * old per-fact-row-window formulation silently collapsed them) and the
    * fact table is never shuffled. */
  def dictGetRange(
      fact: DataFrame, dict: DataFrame,
      factKey: String, atCol: String,
      dictKey: String, fromCol: String, toCol: String, dictValue: String,
      asCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = dict.select(
      col(dictKey).as("__dk"), col(fromCol).as("__from"),
      col(toCol).as("__to"), col(dictValue).as(asCol))
    // elementary interval boundaries per key (all windows partition by the
    // dictionary key — dictionary-size data, never the fact table)
    val bounds = d.select(col("__dk"),
      explode(array(col("__from"), col("__to"))).as("__b")).distinct()
    val intervals = bounds
      .withColumn("__e",
        lead(col("__b"), 1).over(Window.partitionBy("__dk").orderBy("__b")))
      .filter(col("__e").isNotNull)
    val flat = intervals.join(d, Seq("__dk"))
      .filter(col("__b") >= col("__from") && col("__b") < col("__to"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__dk"), col("__b"))
          .orderBy(col("__from").desc, col("__to").desc)))
      .filter(col("__rn") === 1)
      .select(col("__dk"), col("__b"), col("__e"), col(asCol))
    fact.join(broadcast(flat),
      fact(factKey) === col("__dk") &&
        fact(atCol) >= col("__b") && fact(atCol) < col("__e"), "left")
      .drop("__dk", "__b", "__e")
  }
}
