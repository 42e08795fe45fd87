package graft.golden

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Object('JSON') dynamic subcolumns (ref
  * src/DataTypes/DataTypeObject.h:16, src/Columns/ColumnObject.h:51,
  * tests 01825_type_json_*): the column's schema is the union of every
  * inserted row's paths, with per-path types that WIDEN as inserts
  * arrive (ints by magnitude, int+float → Float64, anything+string →
  * String; same ladder inside arrays). Arrays of OBJECTS flatten to
  * `Nested(...)` groups — per-leaf parallel arrays with shared offsets
  * in the reference's column model — which map here to genuine
  * Spark `ArrayType(StructType)` fields: the tuple/array display and
  * one-level subcolumn reads fall out of Row formatting and
  * GetArrayStructFields, and deeper reads rewrite to `transform(...)`
  * chains ([[rewritePaths]]). Rows that predate a path carry the type
  * default it had when introduced, and type promotions convert
  * already-stored values — both fall out of rebuilding each batch
  * against the CURRENT schema and casting on widen. */
object JsonObject {

  private val mapper = new ObjectMapper()

  /** Evolving schema of one Object column: leaf path → FULL CH type
    * (array dims of enclosing Nested boundaries included), plus the
    * set of paths that are arrays-of-objects (`Nested` boundaries). */
  final case class ObjState(
    types: scala.collection.mutable.LinkedHashMap[String, String],
    arrays: scala.collection.mutable.LinkedHashSet[String],
    var nullable: Boolean = false)

  /** (folded table, column) → evolving schema. */
  private val states = scala.collection.concurrent.TrieMap
    .empty[(String, String), ObjState]
  /** tables with Object columns → those column names in decl order. */
  val objCols =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def reset(): Unit = { states.clear(); objCols.clear() }

  private def emptyState() = ObjState(
    scala.collection.mutable.LinkedHashMap.empty,
    scala.collection.mutable.LinkedHashSet.empty)

  def onCreate(table: String, cols: Seq[String],
      nullables: Set[String] = Set.empty): Unit = {
    objCols(table) = cols
    cols.foreach { c =>
      val st = emptyState()
      // Object(Nullable('JSON')): absent paths stay NULL instead of
      // taking the type default (ref DataTypeObject is_nullable)
      st.nullable = nullables.contains(c)
      states((table, c)) = st
    }
  }

  def onDrop(table: String): Unit = {
    objCols.remove(table)
    states.keys.filter(_._1 == table).foreach(states.remove)
  }

  def onTruncate(table: String): Unit =
    objCols.get(table).foreach(_.foreach { c =>
      val st = emptyState()
      st.nullable = states.get((table, c)).exists(_.nullable)
      states((table, c)) = st
    })

  // ---- type ladder ----

  private def intTypeFor(v: Long): String =
    if (v >= -128 && v <= 127) "Int8"
    else if (v >= -32768 && v <= 32767) "Int16"
    else if (v >= Int.MinValue && v <= Int.MaxValue) "Int32"
    else "Int64"

  /** Values arriving from CH UNSIGNED sources (typed tuples/maps in
    * VALUES inserts) take the UInt ladder (01825_type_json_field pins
    * UInt8/UInt16). Set around the insert by the caller. */
  private[golden] val unsignedHint = new ThreadLocal[Boolean] {
    override def initialValue() = false
  }

  private def uIntTypeFor(v: Long): String =
    if (v >= 0 && v <= 255) "UInt8"
    else if (v >= 0 && v <= 65535) "UInt16"
    else if (v >= 0 && v <= 4294967295L) "UInt32"
    else "UInt64"

  private def rank(t: String): Int = t match {
    case "UInt8" => 0; case "UInt16" => 1
    case "UInt32" => 2; case "UInt64" => 3
    case "Int8" => 0; case "Int16" => 1; case "Int32" => 2
    case "Int64" => 3; case "Float64" => 4; case "String" => 5
    case _ => 5
  }

  private def dimsOf(t: String): Int =
    if (t.startsWith("Array(")) 1 + dimsOf(stripOne(t)) else 0
  private def stripOne(t: String): String =
    if (t.startsWith("Array(")) t.stripPrefix("Array(").stripSuffix(")")
    else t
  private def baseOf(t: String): String =
    if (t.startsWith("Array(")) baseOf(stripOne(t)) else t
  private def wrap(t: String, dims: Int): String =
    if (dims <= 0) t else wrap(s"Array($t)", dims - 1)

  /** Widen two FULL types: base by rank, array depth by max (a path
    * seen as both scalar and array takes the array shape). */
  private def widen(a: String, b: String): String = {
    val w = if (rank(baseOf(a)) >= rank(baseOf(b))) baseOf(a) else baseOf(b)
    wrap(w, math.max(dimsOf(a), dimsOf(b)))
  }

  private def sparkType(t: String): DataType = t match {
    case "UInt8" => ByteType
    case "UInt16" => IntegerType
    case "UInt32" => LongType
    case "UInt64" => LongType
    case "Int8" => ByteType
    case "Int16" => ShortType
    case "Int32" => IntegerType
    case "Int64" => LongType
    case "Float64" => DoubleType
    case "String" => StringType
    case a if a.startsWith("Array(") =>
      // nullable throughout: Spark refuses array casts that would
      // STRIP element nullability (from_json output is nullable), and
      // values are always default-filled before they land
      ArrayType(sparkType(stripOne(a)), containsNull = true)
    case _ => StringType
  }

  private def defaultOf(t: String): Any = t match {
    case "UInt16" => 0
    case "UInt32" => 0L
    case "UInt64" => 0L
    case "UInt8" => 0.toByte
    case "Int8" => 0.toByte
    case "Int16" => 0.toShort
    case "Int32" => 0
    case "Int64" => 0L
    case "Float64" => 0.0
    case "String" => ""
    case a if a.startsWith("Array(") => Seq.empty[Any]
    case _ => ""
  }

  private def scalarType(n: JsonNode): String =
    if (n.isBoolean) "UInt8" // json bools map to UInt8 (01825_bools)
    else if (n.isTextual) "String"
    else if (n.isFloatingPointNumber) "Float64"
    else if (n.isIntegralNumber) {
      if (unsignedHint.get()) uIntTypeFor(n.asLong())
      else intTypeFor(n.asLong())
    } else "String"

  /** Local type of a pure-scalar (possibly nested) array; None when an
    * object hides anywhere inside. */
  private def scalarArrayType(n: JsonNode): Option[String] = {
    val it = n.elements()
    var t = "Int8"
    while (it.hasNext) {
      val e = it.next()
      if (e.isObject) return None
      else if (e.isArray) scalarArrayType(e) match {
        case Some(at) => t = widen(t, at)
        case None => return None
      }
      else t = widen(t, scalarType(e))
    }
    Some(s"Array($t)")
  }

  private def convert(n: JsonNode, t: String): Any = t match {
    case "UInt16" => n.asLong().toInt
    case "UInt32" => n.asLong()
    case "UInt64" => n.asLong()
    case "UInt8" => (if (n.isBoolean) { if (n.asBoolean()) 1L else 0L }
      else n.asLong()).toByte
    case "Int8" => n.asLong().toByte
    case "Int16" => n.asLong().toShort
    case "Int32" => n.asLong().toInt
    case "Int64" => n.asLong()
    case "Float64" => n.asDouble()
    case "String" =>
      if (n.isTextual) n.asText()
      else if (n.isFloatingPointNumber) graft.golden.Golden.fmt(
        java.lang.Double.valueOf(n.asDouble()))
      else n.asText()
    case a if a.startsWith("Array(") =>
      val et = stripOne(a)
      val b = Seq.newBuilder[Any]
      val it = n.elements()
      while (it.hasNext) b += convert(it.next(), et)
      b.result()
    case _ => n.asText()
  }

  // ---- schema tree ----

  /** Local view of one level: leaf (type with enclosing-boundary dims
    * STRIPPED), plain object group, or array-of-objects boundary. */
  private sealed trait TNode
  private case class TLeaf(t: String) extends TNode
  private case class TObj(fields: Seq[(String, TNode)]) extends TNode
  private case class TArr(fields: Seq[(String, TNode)]) extends TNode

  /** Group dotted leaf paths into the level tree (sorted per level —
    * ColumnObject sorts subcolumns), stripping one array dim when
    * descending a Nested boundary. */
  private def buildTree(paths: Seq[(String, String)],
      arrays: String => Boolean, prefix: String): Seq[(String, TNode)] =
    paths.groupBy(_._1.split("\\.", 2)(0)).toSeq.sortBy(_._1)
      .map { case (seg, ps) =>
        val full = if (prefix.isEmpty) seg else s"$prefix.$seg"
        val subs = ps.filter(_._1.contains("."))
          .map { case (p, t) => p.split("\\.", 2)(1) -> t }
        if (arrays(full)) {
          val stripped = subs.map { case (p, t) => p -> stripOne(t) }
          seg -> TArr(buildTree(stripped, arrays, full))
        } else if (subs.nonEmpty)
          seg -> TObj(buildTree(subs, arrays, full))
        else seg -> TLeaf(ps.head._2)
      }

  private def treeOf(st: ObjState): Seq[(String, TNode)] =
    buildTree(st.types.toSeq, p => st.arrays.contains(p), "")

  /** CH display type: `Tuple(k1 String, k2 Nested(k3 String))`. */
  def typeText(table: String, col: String): String =
    states.get((table, col)).map(st =>
      renderGroup(treeOf(st), "Tuple", st.nullable))
      .getOrElse("Object('json')")

  private def renderLeaf(t: String, nul: Boolean): String =
    if (!nul) t
    else if (t.startsWith("Array("))
      s"Array(${renderLeaf(stripOne(t), nul)})"
    else s"Nullable($t)"

  private def renderGroup(fields: Seq[(String, TNode)],
      kind: String, nul: Boolean): String =
    s"$kind(" + fields.map {
      case (seg, TLeaf(t)) => s"$seg ${renderLeaf(t, nul)}"
      case (seg, TObj(sub)) => s"$seg ${renderGroup(sub, "Tuple", nul)}"
      case (seg, TArr(sub)) => s"$seg ${renderGroup(sub, "Nested", nul)}"
    }.mkString(", ") + ")"

  private def sparkTypeOf(n: TNode): DataType = n match {
    case TLeaf(t) => sparkType(t)
    case TObj(fs) => StructType(fs.map { case (s, t) =>
      StructField(s, sparkTypeOf(t), nullable = true) })
    case TArr(fs) => ArrayType(StructType(fs.map { case (s, t) =>
      StructField(s, sparkTypeOf(t), nullable = true) }),
      containsNull = true)
  }

  private def structTypeOf(fields: Seq[(String, TNode)]): StructType =
    StructType(fields.map { case (s, t) =>
      StructField(s, sparkTypeOf(t), nullable = true) })

  // ---- insert-time inference (into a STAGING copy: a rejected batch
  // must not pollute the table's evolving schema) ----

  private def inferValue(v: JsonNode, path: String, dims: Int,
      types: scala.collection.mutable.LinkedHashMap[String, String],
      arrays: scala.collection.mutable.LinkedHashSet[String])
      : Boolean = {
    // a path can't be both a Nested group and a scalar leaf
    // (INCOMPATIBLE_COLUMNS in the reference)
    def put(t: String): Boolean = {
      if (arrays.contains(path)) return false
      types(path) = types.get(path).map(widen(_, t)).getOrElse(t)
      true
    }
    if (v.isObject) {
      val it = v.fields()
      var ok = true
      while (ok && it.hasNext) {
        val e = it.next()
        ok = inferValue(e.getValue,
          if (path.isEmpty) e.getKey else s"$path.${e.getKey}",
          dims, types, arrays)
      }
      ok
    } else if (v.isArray) {
      val elems = {
        val b = Seq.newBuilder[JsonNode]
        val it = v.elements(); while (it.hasNext) b += it.next()
        b.result()
      }
      val objs = elems.count(_.isObject)
      if (elems.isEmpty) {
        // ambiguous until data arrives: an already-known Nested
        // boundary takes []; otherwise a scalar Array(Int8) leaf
        if (arrays.contains(path) || types.contains(path)) true
        else put(wrap("Array(Int8)", dims))
      } else if (objs == elems.length) {
        // an earlier empty-array placeholder yields to the Nested
        // group; a REAL scalar leaf at the same path is a conflict
        if (types.get(path).exists(t => baseOf(t) != "Int8")) false
        else {
          arrays += path
          types.remove(path)
          true
        } && elems.forall { e =>
          val it = e.fields()
          var ok = true
          while (ok && it.hasNext) {
            val f = it.next()
            ok = inferValue(f.getValue, s"$path.${f.getKey}",
              dims + 1, types, arrays)
          }
          ok
        }
      } else if (objs == 0) scalarArrayType(v) match {
        case Some(at) => put(wrap(at, dims))
        case None => false // array nested inside a scalar array holds
                           // objects — not representable
      } else false // mixed objects and scalars in one array
    } else put(wrap(scalarType(v), dims))
  }

  // ---- value materialization against the committed tree ----

  private def valueOf(node: JsonNode, t: TNode,
      nul: Boolean): Any = t match {
    case TLeaf(tt) =>
      if (node == null || node.isNull) {
        if (nul) null else defaultOf(tt)
      } else convert(node, tt)
    case TObj(fs) =>
      Row(fs.map { case (seg, tn) =>
        valueOf(if (node != null && node.isObject) node.get(seg)
          else null, tn, nul)
      }: _*)
    case TArr(fs) =>
      if (node == null || !node.isArray) Seq.empty[Row]
      else {
        val b = Seq.newBuilder[Row]
        val it = node.elements()
        while (it.hasNext) {
          val e = it.next()
          b += Row(fs.map { case (seg, tn) =>
            valueOf(if (e.isObject) e.get(seg) else null, tn, nul)
          }: _*)
        }
        b.result()
      }
  }

  // ---- schema-evolution rebuild of the stored frame ----

  /** CH renders a Float64 that became a String with its shortest form
    * (42 not 42.0) — Spark's double→string cast would keep the `.0`. */
  private def fmtF64(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(c === floor(c) && abs(c) < 1e15,
      c.cast("long").cast("string")).otherwise(c.cast("string"))
  }

  private def castCh(cur: org.apache.spark.sql.Column, curDt: DataType,
      t: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.transform
    (curDt, t) match {
      case (ArrayType(ed, _), a) if a.startsWith("Array(") =>
        transform(cur, x => castCh(x, ed, stripOne(a)))
      case (DoubleType, "String") => fmtF64(cur)
      case _ => cur.cast(sparkType(t))
    }
  }

  private def defaultExpr(t: TNode,
      nul: Boolean = false): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, lit, struct}
    t match {
      case TLeaf(tt) if nul => lit(null).cast(sparkType(tt))
      case TLeaf(tt) => tt match {
        case a if a.startsWith("Array(") => array().cast(sparkType(a))
        case "String" => lit("")
        case _ => lit(0).cast(sparkType(tt))
      }
      case TObj(fs) =>
        struct(fs.map { case (s, tn) => defaultExpr(tn, nul).as(s) }: _*)
      case arr: TArr => array().cast(sparkTypeOf(arr))
    }
  }

  private def rebuildExpr(cur: org.apache.spark.sql.Column,
      curDt: DataType, t: TNode,
      nul: Boolean = false): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{struct, transform}
    t match {
      case TLeaf(tt) => castCh(cur, curDt, tt)
      case TObj(fs) => struct(fs.map { case (seg, tn) =>
        (curDt match {
          case s: StructType if s.fieldNames.contains(seg) =>
            rebuildExpr(cur.getField(seg), s(seg).dataType, tn, nul)
          case _ => defaultExpr(tn, nul)
        }).as(seg)
      }: _*)
      case arr @ TArr(fs) => curDt match {
        case ArrayType(es: StructType, _) =>
          transform(cur, x => struct(fs.map { case (seg, tn) =>
            (if (es.fieldNames.contains(seg))
              rebuildExpr(x.getField(seg), es(seg).dataType, tn, nul)
            else defaultExpr(tn, nul)).as(seg)
          }: _*))
        case _ => defaultExpr(arr)
      }
    }
  }

  /** Parse a JSONEachRow payload (concatenated objects) into rows:
    * (other fields as text, object columns as materialized structs).
    * Widens the schema, returns the rebuilt FULL DataFrame for the
    * table. `current` is the table's present stored frame (object cols
    * typed with the PRE-widen schema). Returns None when a payload
    * shape is unsupported — and in that case the evolving schema is
    * untouched (the staging copy is only committed after the whole
    * batch validates). */
  /** One insert's outcome: the rebuilt full table frame, the batch
    * rows alone (part provenance), and the batch's OWN inferred object
    * schemas (per-PART type snapshots in system.parts_columns). */
  final case class InsertResult(full: DataFrame, batch: DataFrame,
    batchStates: Map[String, ObjState])

  /** JSONEachRow objects may be separated by commas (the reference's
    * reader skips them) — blank them out at top level so the jackson
    * value iterator sees whitespace-separated objects. */
  private[golden] def stripTopCommas(payload: String): String = {
    val sb = new java.lang.StringBuilder(payload)
    var depth = 0; var inStr = false; var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 => sb.setCharAt(i, ' ')
        case _ =>
      }
      i += 1
    }
    sb.toString
  }

  def insertJsonEachRow(spark: SparkSession, table: String,
      decl: Seq[(String, String)], current: DataFrame,
      payload0: String): Option[InsertResult] = {
    val payload = stripTopCommas(payload0)
    val oCols = objCols.getOrElse(table, return None)
    val it = mapper.readerFor(classOf[JsonNode])
      .readValues[JsonNode](payload.trim)
    val batch = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    while (it.hasNext) batch += it.next()
    insertNodes(spark, table, oCols, current,
      batch.toSeq.map(rowNode => (rowNode,
        oCols.map(c => c -> Option(rowNode.get(c)).orNull).toMap)))
  }

  /** JSONAsObject payload: each top-level json object IS the value of
    * the table's single Object column (ref
    * src/Processors/Formats/Impl/JSONAsStringRowInputFormat.cpp). */
  def insertJsonAsObject(spark: SparkSession, table: String,
      current: DataFrame, payload: String): Option[InsertResult] = {
    val oCols = objCols.getOrElse(table, return None)
    val c = oCols.head
    val it = mapper.readerFor(classOf[JsonNode])
      .readValues[JsonNode](payload.trim)
    val batch = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    while (it.hasNext) batch += it.next()
    insertNodes(spark, table, oCols, current,
      batch.toSeq.map(n => (mapper.createObjectNode(),
        Map(c -> (n: JsonNode)))))
  }

  private def insertNodes(spark: SparkSession, table: String,
      oCols: Seq[String], current: DataFrame,
      rows: Seq[(JsonNode, Map[String, JsonNode])])
      : Option[InsertResult] = {
    // stage the widening; commit only when every row is representable
    val staging = oCols.map { c =>
      val st = states((table, c))
      c -> ObjState(st.types.clone(), st.arrays.clone(), st.nullable)
    }.toMap
    // the batch's own schema, inferred from scratch (per-part snapshot)
    val batchStates = oCols.map { c =>
      val st = emptyState()
      st.nullable = states((table, c)).nullable
      c -> st
    }.toMap
    val ok = rows.forall { case (_, objs) =>
      oCols.forall { c =>
        val stg = staging(c); val bst = batchStates(c)
        objs.get(c).flatMap(Option(_)) match {
          case Some(n) if n.isObject || n.isArray =>
            inferValue(n, "", 0, stg.types, stg.arrays) &&
              inferValue(n, "", 0, bst.types, bst.arrays)
          case _ => true
        }
      }
    }
    if (!ok) return None
    oCols.foreach(c => states((table, c)) = staging(c))
    val widened = widenCurrent(table, oCols, current)
    val schema = widened.schema
    // batch rows materialize against the BATCH-LOCAL schema (a value
    // missing there takes the PART-local default — 0 for a UInt8 path
    // that only later widened to String), then CONVERT to the global
    // schema like any stored part (01825_type_json_field row 5 pins
    // '0', not '')
    def batchStOf(c: String): ObjState = {
      val bst = batchStates(c)
      if (bst.types.isEmpty) states((table, c)) else bst
    }
    val batchSchema = StructType(schema.fields.map { f =>
      if (oCols.contains(f.name))
        f.copy(dataType = structTypeOf(treeOf(batchStOf(f.name))))
      else f
    })
    val newRows = rows.map { case (rowNode, objs) =>
      Row(batchSchema.fields.map { f =>
        if (oCols.contains(f.name)) {
          val st = batchStOf(f.name)
          valueOf(objs.getOrElse(f.name, null), TObj(treeOf(st)),
            st.nullable)
        } else {
          val v = Option(rowNode.get(f.name))
          v.map { n =>
            f.dataType match {
              case LongType => n.asLong()
              case IntegerType => n.asInt()
              case DoubleType => n.asDouble()
              case StringType => n.asText()
              case _: DecimalType => BigDecimal(n.asText())
              case DateType => java.sql.Date.valueOf(n.asText())
              case _ => n.asText()
            }
          }.getOrElse(f.dataType match {
            case LongType => 0L
            case IntegerType => 0
            case DoubleType => 0.0
            case _ => ""
          })
        }
      }.toSeq: _*)
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{col => fcol}
    val batchDf0 = spark.createDataFrame(newRows.asJava, batchSchema)
    val batchDf = batchDf0.select(schema.fields.map { f =>
      if (oCols.contains(f.name)) {
        val st = states((table, f.name))
        (if (st.types.isEmpty) fcol(s"`${f.name}`")
        else rebuildExpr(fcol(s"`${f.name}`"),
          batchSchema(f.name).dataType, TObj(treeOf(st)),
          st.nullable)).as(f.name)
      } else fcol(s"`${f.name}`")
    }.toSeq: _*)
    Some(InsertResult(widened.unionByName(batchDf), batchDf,
      batchStates))
  }

  /** Rebuild the stored frame's object columns against the (already
    * committed) widened schema: existing subcolumns cast, new ones
    * take their type default. */
  private def widenCurrent(table: String, oCols: Seq[String],
      current: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => fcol}
    current.select(current.columns.map { c =>
      if (oCols.contains(c)) {
        val st = states((table, c))
        val fields = treeOf(st)
        (if (st.types.isEmpty) fcol(s"`$c`")
        else rebuildExpr(fcol(s"`$c`"), current.schema(c).dataType,
          TObj(fields), st.nullable)).as(c)
      } else fcol(s"`$c`")
    }.toSeq: _*)
  }

  private def nullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullable(f.dataType), nullable = true)))
    case ArrayType(e, _) => ArrayType(nullable(e), containsNull = true)
    case other => other
  }

  /** Null-coalescing rebuild for `from_json` output: missing fields
    * parse as NULL and take the CH type default; missing Nested groups
    * take []. */
  private def normalizeExpr(cur: org.apache.spark.sql.Column,
      tn: TNode, nul: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, struct, transform}
    tn match {
      case l @ TLeaf(t) =>
        if (nul) cur.cast(sparkType(t))
        else coalesce(cur.cast(sparkType(t)), defaultExpr(l))
      case TObj(fs) => struct(fs.map { case (s, sub) =>
        normalizeExpr(cur.getField(s), sub, nul).as(s) }: _*)
      case arr @ TArr(fs) => coalesce(
        transform(cur, x => struct(fs.map { case (s, sub) =>
          normalizeExpr(x.getField(s), sub, nul).as(s) }: _*))
          .cast(sparkTypeOf(arr)),
        defaultExpr(arr))
    }
  }

  /** INSERT SELECT into an Object table: align is the select result
    * renamed to the table's declared columns. Object values arrive as
    * JSON text (a struct source serializes through to_json); the
    * DISTINCT payloads (bounded) drive schema inference, then the
    * batch materializes DISTRIBUTIVELY via from_json — a
    * constant-payload 10^6-row insert never collects. */
  def insertSelect(spark: SparkSession, table: String,
      aligned0: DataFrame, current: DataFrame): Option[InsertResult] = {
    val oCols = objCols.getOrElse(table, return None)
    import org.apache.spark.sql.functions.{col => fcol, from_json,
      to_json}
    // a Map(K, V) source keeps its CH VALUE type on every resulting
    // subcolumn (Map→Object conversion; 01825_type_json_from_map pins
    // UInt64) — the json round-trip would re-compress by magnitude
    val leafHint = scala.collection.mutable.Map.empty[String, String]
    val aligned = aligned0.select(aligned0.columns.map { c =>
      if (oCols.contains(c)) (aligned0.schema(c).dataType match {
        case _: StructType => to_json(fcol(s"`$c`"))
        case MapType(kt, vt, _) =>
          if (kt != StringType)
            sys.error("TYPE_MISMATCH: non-String map key into Object")
          vt match {
            case LongType | IntegerType | ShortType | ByteType =>
              leafHint(c) = "UInt64"
            case _ =>
          }
          to_json(fcol(s"`$c`"))
        case _ => fcol(s"`$c`").cast(StringType)
      }).as(c) else fcol(s"`$c`")
    }.toSeq: _*)
    val staging = oCols.map { c =>
      val st = states((table, c))
      c -> ObjState(st.types.clone(), st.arrays.clone(), st.nullable)
    }.toMap
    val batchStates = oCols.map { c =>
      val st = emptyState()
      st.nullable = states((table, c)).nullable
      c -> st
    }.toMap
    var ok = true
    oCols.foreach { c =>
      val ds = aligned.select(fcol(s"`$c`")).distinct()
        .limit(10001).collect()
      if (ds.length > 10000) ok = false
      else ds.foreach { r =>
        val s = Option(r.getString(0)).getOrElse("")
        if (ok && s.trim.nonEmpty) {
          val n = try mapper.readTree(s)
            catch { case _: Exception => null }
          if (n == null) ok = false
          else if (n.isObject || n.isArray)
            ok = inferValue(n, "", 0, staging(c).types,
              staging(c).arrays) && inferValue(n, "", 0,
              batchStates(c).types, batchStates(c).arrays)
        }
      }
    }
    if (!ok) return None
    // apply the map-source value-type hint to the paths THIS batch
    // introduced (pre-existing paths widen against the hinted type)
    leafHint.foreach { case (c, hint) =>
      val pre = states((table, c)).types
      batchStates(c).types.keys.toSeq.foreach { k =>
        val hinted = wrap(hint, dimsOf(batchStates(c).types(k)))
        batchStates(c).types(k) = hinted
        staging(c).types(k) =
          pre.get(k).map(widen(_, hinted)).getOrElse(hinted)
      }
    }
    oCols.foreach(c => states((table, c)) = staging(c))
    val widened = widenCurrent(table, oCols, current)
    val schema = widened.schema
    val batchDf = aligned.select(schema.fields.map { f =>
      if (oCols.contains(f.name)) {
        val st = states((table, f.name))
        val tn = TObj(treeOf(st))
        normalizeExpr(from_json(fcol(s"`${f.name}`"),
          nullable(sparkTypeOf(tn))), tn, st.nullable)
          .cast(sparkTypeOf(tn)).as(f.name)
      } else fcol(s"`${f.name}`").cast(f.dataType).as(f.name)
    }.toSeq: _*)
    Some(InsertResult(widened.unionByName(batchDf), batchDf,
      batchStates))
  }

  /** Per-leaf-path fraction of rows holding the TYPE DEFAULT in `df`'s
    * object column — what the reference's sparse-serialization chooser
    * measures when writing a part (ISerialization::getKind). Paths
    * inside Nested groups report 0.0 (always Default here). */
  def defaultFractions(df: DataFrame, col: String,
      st: ObjState): Map[String, Double] = {
    import org.apache.spark.sql.functions.{avg, col => fcol, lit, when}
    if (st.types.isEmpty || df == null) return Map.empty
    def hasPath(dt: DataType, segs: List[String]): Boolean =
      (dt, segs) match {
        case (s0: StructType, h :: rest) =>
          s0.fields.find(_.name == h)
            .exists(f => rest.isEmpty || hasPath(f.dataType, rest))
        case _ => false
      }
    val colDt = df.schema.fields.find(_.name == col)
      .map(_.dataType).getOrElse(return Map.empty)
    val leafs = st.types.toSeq.filterNot { case (p, _) =>
      st.arrays.exists(b => p == b || p.startsWith(b + ".")) }
    if (leafs.isEmpty) return Map.empty
    val exprs = leafs.map { case (p, t) =>
      val segs = p.split("\\.").toList
      if (!hasPath(colDt, segs)) avg(lit(1.0)).as(p)
      else {
        val cexp = segs.foldLeft(fcol(s"`$col`"))(_.getField(_))
        val dflt = defaultExpr(TLeaf(t))
        avg(when(cexp.isNull || cexp === dflt, 1.0)
          .otherwise(0.0)).as(p)
      }
    }
    try {
      df.select(exprs: _*).collect().headOption.map { row =>
        leafs.map(_._1).zipWithIndex.map { case (p, i) =>
          p -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i))
        }.toMap
      }.getOrElse(Map.empty)
    } catch { case _: Exception => Map.empty }
  }

  /** Leaf paths of a state in subcolumn (sorted-tree) order, with their
    * full CH types. */
  def leafPaths(st: ObjState): Seq[(String, String)] = {
    def walk(fields: Seq[(String, TNode)], prefix: String,
        full: Map[String, String]): Seq[(String, String)] =
      fields.flatMap { case (seg, tn) =>
        val p = if (prefix.isEmpty) seg else s"$prefix.$seg"
        tn match {
          case TLeaf(_) => Seq(p -> st.types.getOrElse(p, "String"))
          case TObj(sub) => walk(sub, p, full)
          case TArr(sub) => walk(sub, p, full)
        }
      }
    walk(treeOf(st), "", Map.empty)
  }

  /** Flatten a JSON literal's nested objects into dotted-path keys —
    * the text form of a DYNAMIC Object('json') value
    * (`'{"a":{"b":1}}'::JSON` prints `{"a.b":1}`). */
  def flattenLiteral(text: String): String = {
    val n = try mapper.readTree(text)
      catch { case _: Exception => return text }
    if (n == null || !n.isObject) return String.valueOf(n)
    val out = mapper.createObjectNode()
    def walk(node: JsonNode, prefix: String): Unit = {
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        if (e.getValue.isObject) walk(e.getValue, p)
        else out.set[JsonNode](p, e.getValue)
      }
    }
    walk(n, "")
    out.toString
  }

  /** CH type text of a standalone schema state; an empty object column
    * serializes as the `_dummy` placeholder (ref ColumnObject — a part
    * with no subcolumns stores one). */
  def renderState(st: ObjState): String =
    if (st.types.isEmpty) "Tuple(_dummy UInt8)"
    else renderGroup(treeOf(st), "Tuple", st.nullable)

  /** Widen-merge two schema states (what a part merge does to the
    * object column's type). */
  def mergeStates(a: ObjState, b: ObjState): ObjState = {
    val out = ObjState(a.types.clone(), a.arrays.clone(),
      a.nullable || b.nullable)
    b.types.foreach { case (p, t) =>
      out.types(p) = out.types.get(p).map(widen(_, t)).getOrElse(t)
    }
    out.arrays ++= b.arrays
    out.arrays.foreach(p => out.types.remove(p))
    out
  }

  // ---- read-path rewrite: subcolumn access through Nested ----

  /** Rewrite `col.p1.p2...` object-subcolumn reads that cross an
    * array-of-objects boundary mid-path into `transform(...)` chains
    * (Spark's GetArrayStructFields only maps one array level; the
    * reference's flattened columns are arbitrarily deep). Applied to
    * the CH text before translation; a no-op while no Object tables
    * exist. */
  def rewritePaths(sql: String): String = {
    if (states.isEmpty) return sql
    // only queries that NAME an object table participate — another
    // session's concurrent DataFrame work (suites share the JVM) must
    // never see its `data.x` identifiers rewritten
    val low = sql.toLowerCase
    if (!objCols.keysIterator.exists(t => low.contains(t.toLowerCase)))
      return sql
    val cols = states.keysIterator.map(_._2).toSet
    if (cols.isEmpty) return sql
    val rx = ("(?<![\\w.`])(" + cols.map(java.util.regex.Pattern.quote)
      .mkString("|") + ")\\.([A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*)").r
    // a path inside a string literal is data, not a read
    val inStr = new Array[Boolean](sql.length)
    locally {
      var s = false; var i = 0
      while (i < sql.length) {
        inStr(i) = s
        val c = sql.charAt(i)
        if (s) { if (c == '\\') { i += 1 } else if (c == '\'') s = false }
        else if (c == '\'') s = true
        i += 1
      }
    }
    val out = new java.lang.StringBuilder
    var last = 0
    var n = 0
    for (m <- rx.findAllMatchIn(sql) if !inStr(m.start)) {
      val col = m.group(1)
      val segs = m.group(2).split("\\.").toList
      // any registered state for this column name (golden files use
      // one table per object column name)
      val stOpt = states.find { case ((_, c), st) =>
        c == col && st.types.nonEmpty }.map(_._2)
      val rewritten = stOpt.flatMap { st =>
        def rec(base: String, fields: Seq[(String, TNode)],
            path: List[String]): Option[String] = path match {
          case Nil => Some(base)
          case seg :: rest => fields.find(_._1 == seg).flatMap {
            case (_, TArr(sub)) if rest.nonEmpty =>
              val v = s"__oj$n"; n += 1
              rec(v, sub, rest).map(inner =>
                s"transform($base.$seg, $v -> $inner)")
            case (_, TArr(_)) => Some(s"$base.$seg")
            case (_, TObj(sub)) => rec(s"$base.$seg", sub, rest)
            case (_, TLeaf(_)) if rest.isEmpty => Some(s"$base.$seg")
            case _ => None
          }
        }
        val fields = treeOf(st)
        // only pay the rewrite when a boundary is crossed mid-path
        def crosses(fs: Seq[(String, TNode)], path: List[String])
            : Boolean = path match {
          case seg :: rest if rest.nonEmpty =>
            fs.find(_._1 == seg).exists {
              case (_, TArr(_)) => true
              case (_, TObj(sub)) => crosses(sub, rest)
              case _ => false
            }
          case _ => false
        }
        if (crosses(fields, segs)) rec(col, fields, segs) else None
      }
      rewritten.foreach { r =>
        out.append(sql, last, m.start).append(r)
        last = m.end
      }
    }
    if (last == 0) sql
    else { out.append(sql, last, sql.length); out.toString }
  }
}
