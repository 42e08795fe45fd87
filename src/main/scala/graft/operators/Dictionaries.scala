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
      // stored NULLs stay NULL (a Nullable attribute's NULL is a value,
      // not a miss — 01765); membership is decided by the key-set map
      val vT = dict.schema(a).dataType
      val pairs = rows.iterator.flatMap { r =>
        Iterator(lit(r.get(0)),
          if (r.isNullAt(i + 1)) lit(null).cast(vT) else lit(r.get(i + 1)))
      }.toSeq
      a -> map(pairs: _*)
    }.toMap
    registry.put(name, maps)
    keyTypeRegistry.put(name, dict.schema(keyCol).dataType)
    val memberPairs = rows.iterator
      .flatMap(r => Iterator(lit(r.get(0)), lit(true))).toSeq
    memberRegistry.put(name,
      if (memberPairs.isEmpty) map() else map(memberPairs: _*))
  }

  /** Complex (multi-column) keys: the map key is a positional struct;
    * the probe tuple casts to it so field names never mismatch. */
  def createComplexDictionary(name: String, dict: DataFrame,
      keyCols: Seq[String]): Unit = {
    val attrs = dict.columns.filterNot(keyCols.contains)
    val rows = dict.select((keyCols ++ attrs).map(col): _*)
      .limit(MaxDictRows + 1).collect()
    require(rows.length <= MaxDictRows,
      s"dictionary '$name' exceeds $MaxDictRows rows")
    val kN = keyCols.length
    def keyLit(r: org.apache.spark.sql.Row): Column =
      struct(keyCols.indices.map(i =>
        lit(r.get(i)).as(s"_${i + 1}")): _*)
    val maps = attrs.zipWithIndex.map { case (a, i) =>
      val vT = dict.schema(a).dataType
      val pairs = rows.iterator.flatMap { r =>
        Iterator(keyLit(r),
          if (r.isNullAt(kN + i)) lit(null).cast(vT)
          else lit(r.get(kN + i)))
      }.toSeq
      a -> map(pairs: _*)
    }.toMap
    registry.put(name, maps)
    keyTypeRegistry.put(name, org.apache.spark.sql.types.StructType(
      keyCols.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.types.StructField(s"_${i + 1}",
          dict.schema(c).dataType, nullable = true) }))
    val memberPairs = rows.iterator
      .flatMap(r => Iterator(keyLit(r), lit(true))).toSeq
    memberRegistry.put(name,
      if (memberPairs.isEmpty) map() else map(memberPairs: _*))
  }

  /** key-set map for miss-vs-stored-NULL discrimination. */
  private val memberRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Column]()
  /** declared key type — probes cast to it (a BIGINT probe against an
    * INT-keyed map literal is a type error, not a coercion). */
  private val keyTypeRegistry = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.DataType]()

  private def probeKey(name: String, key: Column): Column =
    Option(keyTypeRegistry.get(name)).map(key.cast).getOrElse(key)

  private def memberOf(name: String, key: Column): Column =
    Option(memberRegistry.get(name))
      .map(m => coalesce(element_at(m, probeKey(name, key)), lit(false)))
      .getOrElse(lit(false))

  /** Per-attribute miss values for DDL-created dictionaries: CH's
    * dictGet on a missing key returns the attribute's declared DEFAULT,
    * else the attribute TYPE's default — never NULL (ref
    * FunctionsExternalDictionaries.h getColumn default path). Dictionaries
    * registered programmatically (no entry here) keep null-on-miss. */
  private val attrDefaults =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Column]]()

  def setAttrDefaults(name: String, d: Map[String, Column]): Unit =
    attrDefaults.put(name, d)

  // ---- RANGE_HASHED layout (ref src/Dictionaries/RangeHashedDictionary
  // .h): the 4-arg dictGet('d','a',key,point) probes the interval set of
  // `key` for the one containing `point` (bounds inclusive; a NULL bound
  // is open — 02185). Same literal-map design: key → array of
  // (lo, hi, value) structs, probed with Catalyst `filter`, no UDF. ----

  private val rangeRegistry = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Column]]()

  def createRangeDictionary(name: String, dict: DataFrame, keyCol: String,
      minCol: String, maxCol: String): Unit = {
    val attrs = dict.columns
      .filterNot(c => c == keyCol || c == minCol || c == maxCol)
    val ordered = Seq(keyCol, minCol, maxCol) ++ attrs
    val rows = dict.select(ordered.map(col): _*)
      .limit(MaxDictRows + 1).collect()
    require(rows.length <= MaxDictRows,
      s"range dictionary '$name' exceeds $MaxDictRows rows")
    val loT = dict.schema(minCol).dataType
    val hiT = dict.schema(maxCol).dataType
    def litOf(v: Any, dt: org.apache.spark.sql.types.DataType): Column =
      if (v == null) lit(null).cast(dt) else lit(v)
    val maps = attrs.zipWithIndex.map { case (a, i) =>
      val vT = dict.schema(a).dataType
      val byKey = rows.groupBy(_.get(0)).toSeq
      val entries = byKey.flatMap { case (k, rs) =>
        Seq(lit(k), array(rs.toSeq.map(r => struct(
          litOf(r.get(1), loT).as("lo"),
          litOf(r.get(2), hiT).as("hi"),
          litOf(r.get(i + 3), vT).as("v"))): _*))
      }
      a -> map(entries: _*)
    }.toMap
    rangeRegistry.put(name, maps)
  }

  def isRangeDictionary(name: String): Boolean =
    rangeRegistry.containsKey(name)

  private def rangeHits(name: String, attr: String, key: Column,
      point: Column): Column = {
    val dict = rangeRegistry.get(name)
    require(dict != null, s"unknown range dictionary '$name'")
    val m = dict.getOrElse(attr, throw new IllegalArgumentException(
      s"dictionary '$name' has no attribute '$attr'"))
    filter(element_at(m, key), s =>
      (s.getField("lo").isNull || s.getField("lo") <= point) &&
        (s.getField("hi").isNull || point <= s.getField("hi")))
  }

  def sqlDictGetRangeRaw(name: String, attr: String, key: Column,
      point: Column): Column =
    try_element_at(rangeHits(name, attr, key, point), lit(1))
      .getField("v")

  def sqlDictGetRangePoint(name: String, attr: String, key: Column,
      point: Column): Column = {
    val base = sqlDictGetRangeRaw(name, attr, key, point)
    // a matching interval with a stored NULL value returns NULL — only
    // a MISS takes the declared default (01676 nullable)
    Option(attrDefaults.get(name)).flatMap(_.get(attr))
      .map(d => when(size(rangeHits(name, attr, key, point)) > 0, base)
        .otherwise(d))
      .getOrElse(base)
  }

  def sqlDictGetRangeOrDefault(name: String, attr: String, key: Column,
      point: Column, default: Column): Column =
    when(size(rangeHits(name, attr, key, point)) > 0,
      sqlDictGetRangeRaw(name, attr, key, point)).otherwise(default)

  def sqlDictHasRange(name: String, key: Column, point: Column): Column = {
    val dict = rangeRegistry.get(name)
    require(dict != null, s"unknown range dictionary '$name'")
    val attr = {
      val it = dict.keysIterator
      if (it.hasNext) it.next() else return lit(false)
    }
    coalesce(size(rangeHits(name, attr, key, point)) > 0, lit(false))
  }

  /** Register `alias` as another name for dictionary `name` (DDL names
    * are addressable both db-qualified and folded). */
  def aliasDictionary(name: String, alias: String): Unit = {
    Option(registry.get(name)).foreach(registry.put(alias, _))
    Option(hierRegistry.get(name)).foreach(hierRegistry.put(alias, _))
    Option(attrDefaults.get(name)).foreach(attrDefaults.put(alias, _))
    Option(rangeRegistry.get(name)).foreach(rangeRegistry.put(alias, _))
    Option(memberRegistry.get(name)).foreach(memberRegistry.put(alias, _))
    Option(keyTypeRegistry.get(name)).foreach(keyTypeRegistry.put(alias, _))
  }

  /** Null-on-miss probe (the OrDefault forms coalesce with the CALLER's
    * default, which must win over the attribute default). */
  def sqlDictGetRaw(name: String, attr: String, key: Column): Column = {
    val dict = registry.get(name)
    require(dict != null, s"unknown dictionary '$name'; call createDictionary")
    val m = dict.getOrElse(attr,
      throw new IllegalArgumentException(s"dictionary '$name' has no attribute '$attr'"))
    element_at(m, probeKey(name, key))
  }

  /** dictGet('name', 'attr', key) as a Column: the stored value (NULL
    * included) when the key exists, else the declared/type default for
    * DDL dictionaries (null otherwise). */
  def sqlDictGet(name: String, attr: String, key: Column): Column = {
    val base = sqlDictGetRaw(name, attr, key)
    Option(attrDefaults.get(name)).flatMap(_.get(attr)) match {
      case Some(d) if memberRegistry.containsKey(name) =>
        when(memberOf(name, key), base).otherwise(d)
      case Some(d) => coalesce(base, d)
      case None => base
    }
  }

  /** dictGetOrDefault('name', 'attr', key, default): the caller default
    * applies only on MISS — a stored NULL wins over it. */
  def sqlDictGetOrDefault(name: String, attr: String, key: Column,
      default: Column): Column =
    if (memberRegistry.containsKey(name))
      when(memberOf(name, key), sqlDictGetRaw(name, attr, key))
        .otherwise(default)
    else coalesce(sqlDictGetRaw(name, attr, key), default)

  /** dictHas('name', key): key-set membership. */
  def sqlDictHas(name: String, key: Column): Column = {
    val dict = registry.get(name)
    require(dict != null, s"unknown dictionary '$name'; call createDictionary")
    if (memberRegistry.containsKey(name)) memberOf(name, key)
    else dict.values.map(m => map_contains_key(m, probeKey(name, key)))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  // ---- hierarchical dictionaries (ref src/Dictionaries/
  // HierarchyDictionariesUtils.h getHierarchy:98 / getDescendants:257,
  // registered through dictGetHierarchy/dictGetChildren/
  // dictGetDescendants/dictIsIn in FunctionsExternalDictionaries.h).
  // The hierarchy closure is precomputed ONCE on the bounded dictionary
  // side at registration; per-row lookups stay O(1) map-literal probes,
  // so the fact side never shuffles and the plan is broadcast-shaped at
  // any scale.

  private val MaxHierDepth = 1000 // ref Core/Defines.h:70

  private case class Hier(
      parent: Map[Long, Long],   // key → parent (null-parent rows absent)
      valid: Set[Long],          // keys present in the dictionary
      children: Map[Long, Seq[Long]], // parent → children in key order
      nullableParent: Boolean)   // Nullable parent: NULL is the only root

  private val hierRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Hier]()

  /** Register `dict` as a hierarchical dictionary: `parentCol` is the
    * HIERARCHICAL attribute (parent value 0 / NULL = root, matching the
    * reference's hierarchy_null_value for UInt64 keys). Also registers
    * the flat attributes via [[createDictionary]]. */
  def createHierarchicalDictionary(name: String, dict: DataFrame,
      keyCol: String, parentCol: String,
      nullableParent: Boolean = false,
      reverseChildren: Boolean = false): Unit = {
    createDictionary(name, dict, keyCol)
    val rows = dict.select(col(keyCol).cast("long"),
      col(parentCol).cast("long")).limit(MaxDictRows + 1).collect()
    require(rows.length <= MaxDictRows,
      s"dictionary '$name' exceeds $MaxDictRows rows")
    val valid = rows.iterator.map(_.getLong(0)).toSet
    val parent = rows.iterator.filter(r => !r.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // parent→children from every non-null parent value — including the
    // null value 0, so dictGetChildren(0) lists the roots (01778 pins
    // exactly that)
    val keyOrder = rows.iterator.map(_.getLong(0)).toSeq.zipWithIndex.toMap
    // FLAT keeps source order; HASHED layouts surface the reference's
    // hash-table iteration order, which these goldens pin as the
    // reverse (01778)
    val children = parent.toSeq.groupBy(_._2).map { case (p, kids) =>
      val inOrder = kids.map(_._1).sortBy(keyOrder.getOrElse(_, Int.MaxValue))
      p -> (if (reverseChildren) inOrder.reverse else inOrder) }
    hierRegistry.put(name, Hier(parent, valid, children, nullableParent))
  }

  private def hier(name: String): Hier = {
    val h = hierRegistry.get(name)
    require(h != null,
      s"'$name' is not a hierarchical dictionary; call " +
        "createHierarchicalDictionary")
    h
  }

  /** Hierarchy path [key, parent, …] up to the root; invalid key → [].
    * A walk revisiting a key (cycle) truncates, per getHierarchy's
    * is_loop break. */
  private def pathOf(h: Hier, key: Long): Seq[Long] = {
    if (!h.valid.contains(key)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.HashSet[Long]()
    var k = key
    var depth = 0
    var done = false
    while (!done && depth < MaxHierDepth) {
      if (!seen.add(k)) done = true
      else {
        out += k
        h.parent.get(k) match {
          // non-Nullable UInt64 parents: 0 is the root marker and is
          // never emitted; Nullable parents: NULL is the only root, so
          // a 0 parent is an ordinary key (02316)
          case Some(p) if !h.nullableParent && p == 0L => done = true
          case Some(p) if h.valid.contains(p) => k = p
          // a dangling parent id is included ONCE, then the walk stops
          // (01018: [3,2,1,10000] with no key 10000)
          case Some(p) => out += p; done = true
          case None => done = true
        }
      }
      depth += 1
    }
    out.toSeq
  }

  /** Descendants of `key` in the reference's traversal order (children
    * appended as a block in key order, subtrees expanded last-child
    * first); `level` 0 = all descendants, N = exactly depth N. Mirrors
    * getDescendants' explicit stack, including the cycle bail-out that
    * abandons the remainder of the walk. */
  private def descendantsOf(h: Hier, key: Long, level: Int): Seq[Long] = {
    if (!h.children.contains(key)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.HashSet[Long]()
    var stack = List[(Long, Int)]((key, 0))
    var abort = false
    while (stack.nonEmpty && !abort) {
      val (k, depth) = stack.head
      stack = stack.tail
      if (seen.contains(k)) { abort = true }
      else h.children.get(k) match {
        case Some(kids) if depth < MaxHierDepth &&
            (level == 0 || depth < level) =>
          seen += k
          val d = depth + 1
          kids.foreach { c =>
            if (level == 0) out += c
            else if (d == level) out += c
          }
          val toPush = if (level == 0) kids
            else if (d == level) Seq.empty else kids
          // reference emplaces kids in order then pops from the back →
          // LAST child's subtree expands first; with head-is-top, that
          // is a reversed prepend
          stack = toPush.reverse.map(c => (c, d)).toList ::: stack
        case _ =>
      }
    }
    out.toSeq
  }

  private def longArrayMapCol(entries: Iterable[(Long, Seq[Long])]): Column = {
    val pairs = entries.iterator.flatMap { case (k, v) =>
      Iterator(lit(k), typedLit(v))
    }.toSeq
    if (pairs.isEmpty) typedLit(Map.empty[Long, Seq[Long]]) else map(pairs: _*)
  }

  private val emptyLongArray = typedLit(Seq.empty[Long])

  /** dictGetHierarchy('name', key) → Array[Long] path. */
  def sqlDictGetHierarchy(name: String, key: Column): Column = {
    val h = hier(name)
    val m = longArrayMapCol(h.valid.toSeq.sorted.map(k => k -> pathOf(h, k)))
    coalesce(element_at(m, key.cast("long")), emptyLongArray)
  }

  /** dictGetChildren('name', key) → direct children. */
  def sqlDictGetChildren(name: String, key: Column): Column =
    sqlDictGetDescendants(name, key, 1)

  /** dictGetDescendants('name', key[, level]) — level 0 (default) = all
    * descendants in reference traversal order; level N = exactly depth
    * N. Keys absent from the parent→child index (even valid dictionary
    * keys) → []. */
  def sqlDictGetDescendants(name: String, key: Column,
      level: Int = 0): Column = {
    require(level >= 0, "dictGetDescendants level must be >= 0")
    val h = hier(name)
    val m = longArrayMapCol(h.children.keys.toSeq.sorted
      .map(k => k -> descendantsOf(h, k, level)))
    coalesce(element_at(m, key.cast("long")), emptyLongArray)
  }

  /** dictIsIn('name', child, ancestor): 1 when `ancestor` occurs in
    * `child`'s hierarchy path (a key is in its own hierarchy). */
  def sqlDictIsIn(name: String, child: Column, ancestor: Column): Column = {
    val h = hier(name)
    val m = longArrayMapCol(h.valid.toSeq.sorted.map(k => k -> pathOf(h, k)))
    coalesce(
      array_contains(element_at(m, child.cast("long")),
        ancestor.cast("long")), lit(false)).cast("int")
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
