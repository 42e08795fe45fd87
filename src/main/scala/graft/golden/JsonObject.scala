package graft.golden

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Object('JSON') dynamic subcolumns (ref
  * src/DataTypes/DataTypeObject.h:16, src/Columns/ColumnObject.h:51,
  * tests 01825_type_json_*): the column's schema is the union of every
  * inserted row's paths, with per-path types that WIDEN as inserts
  * arrive (ints by magnitude, int+float → Float64, anything+string →
  * String; same ladder inside arrays). Rows that predate a path carry
  * the type default it had when introduced, and type promotions
  * convert already-stored values — both fall out of materializing each
  * batch against the CURRENT schema and casting on widen. The column
  * is stored as a real struct, so `data.k1` subcolumn reads are plain
  * Spark field access and the tuple display falls out of Row
  * formatting. */
object JsonObject {

  private val mapper = new ObjectMapper()

  /** path → CH type text, in first-appearance order (displayed
    * sorted). Scalar kinds: Int8/Int16/Int32/Int64/Float64/String and
    * their Array(...) counterparts. */
  final case class ObjState(
    var types: scala.collection.mutable.LinkedHashMap[String, String])

  /** (folded table, column) → evolving schema. */
  private val states = scala.collection.concurrent.TrieMap
    .empty[(String, String), ObjState]
  /** tables with Object columns → those column names in decl order. */
  val objCols =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def reset(): Unit = { states.clear(); objCols.clear() }

  def onCreate(table: String, cols: Seq[String]): Unit = {
    objCols(table) = cols
    cols.foreach(c => states((table, c)) =
      ObjState(scala.collection.mutable.LinkedHashMap.empty))
  }

  def onDrop(table: String): Unit = {
    objCols.remove(table)
    states.keys.filter(_._1 == table).foreach(states.remove)
  }

  def onTruncate(table: String): Unit =
    objCols.get(table).foreach(_.foreach(c =>
      states((table, c)) =
        ObjState(scala.collection.mutable.LinkedHashMap.empty)))

  // ---- type ladder ----

  private def intTypeFor(v: Long): String =
    if (v >= -128 && v <= 127) "Int8"
    else if (v >= -32768 && v <= 32767) "Int16"
    else if (v >= Int.MinValue && v <= Int.MaxValue) "Int32"
    else "Int64"

  private def rank(t: String): Int = t match {
    case "UInt8" => 0
    case "Int8" => 0; case "Int16" => 1; case "Int32" => 2
    case "Int64" => 3; case "Float64" => 4; case "String" => 5
    case _ => 5
  }

  private def widen(a: String, b: String): String = {
    def base(t: String) = t.stripPrefix("Array(").stripSuffix(")")
    val arr = a.startsWith("Array(") || b.startsWith("Array(")
    val w = if (rank(base(a)) >= rank(base(b))) base(a) else base(b)
    if (arr) s"Array($w)" else w
  }

  private def sparkType(t: String): DataType = t match {
    case "UInt8" => ByteType
    case "Int8" => ByteType
    case "Int16" => ShortType
    case "Int32" => IntegerType
    case "Int64" => LongType
    case "Float64" => DoubleType
    case "String" => StringType
    case a if a.startsWith("Array(") =>
      ArrayType(sparkType(a.stripPrefix("Array(").stripSuffix(")")),
        containsNull = false)
    case _ => StringType
  }

  private def defaultOf(t: String): Any = t match {
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
    else if (n.isIntegralNumber) intTypeFor(n.asLong())
    else "String"

  private def typeOf(n: JsonNode): Option[String] =
    if (n.isArray) {
      val it = n.elements()
      var t = "Int8"
      var any = false
      while (it.hasNext) {
        val e = it.next()
        if (e.isObject || e.isArray) return None // nested: unsupported
        t = widen(t, scalarType(e)); any = true
      }
      Some(if (any) s"Array($t)" else "Array(Int8)")
    } else if (n.isObject) None // nested objects flattened by caller
    else Some(scalarType(n))

  private def convert(n: JsonNode, t: String): Any = t match {
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
      val et = a.stripPrefix("Array(").stripSuffix(")")
      val b = Seq.newBuilder[Any]
      val it = n.elements()
      while (it.hasNext) b += convert(it.next(), et)
      b.result()
    case _ => n.asText()
  }

  /** Flatten one level of nested objects into dotted paths. */
  private def flatten(node: JsonNode, prefix: String,
      out: scala.collection.mutable.LinkedHashMap[String, JsonNode])
      : Unit = {
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
      if (e.getValue.isObject) flatten(e.getValue, p, out)
      else out(p) = e.getValue
    }
  }

  /** Group dotted leaf paths into a nested tree (sorted per level). */
  private def tree(paths: Seq[(String, String)])
      : Seq[(String, Either[String, Seq[(String, String)]])] =
    paths.groupBy(_._1.split("\\.", 2)(0)).toSeq.sortBy(_._1)
      .map { case (seg, ps) =>
        val leafs = ps.filter(!_._1.contains("."))
        if (leafs.nonEmpty) seg -> Left(leafs.head._2)
        else seg -> Right(ps.map { case (p0, t) =>
          p0.split("\\.", 2)(1) -> t })
      }

  /** CH display type: `Tuple(k1 String, k2 Tuple(k3 String))`, sorted
    * per level (ColumnObject sorts subcolumns). */
  def typeText(table: String, col: String): String =
    states.get((table, col)).map(st => renderTuple(st.types.toSeq))
      .getOrElse("Object('json')")

  private def renderTuple(paths: Seq[(String, String)]): String =
    "Tuple(" + tree(paths).map {
      case (seg, Left(t)) => s"$seg $t"
      case (seg, Right(sub)) => s"$seg ${renderTuple(sub)}"
    }.mkString(", ") + ")"

  private def structType(st: ObjState): StructType =
    structTypeOf(st.types.toSeq)

  private def structTypeOf(paths: Seq[(String, String)]): StructType =
    StructType(tree(paths).map {
      case (seg, Left(t)) =>
        StructField(seg, sparkType(t), nullable = false)
      case (seg, Right(sub)) =>
        StructField(seg, structTypeOf(sub), nullable = false)
    })

  /** Parse a JSONEachRow payload (concatenated objects) into rows:
    * (other fields as text, object columns as parsed structs). Widens
    * the schema, returns the rebuilt FULL DataFrame for the table.
    * `current` is the table's present stored frame (object cols typed
    * with the PRE-widen schema). Returns None when a payload shape is
    * unsupported (nested arrays of objects). */
  def insertJsonEachRow(spark: SparkSession, table: String,
      decl: Seq[(String, String)], current: DataFrame,
      payload: String): Option[DataFrame] = {
    val oCols = objCols.getOrElse(table, return None)
    val it = mapper.readerFor(classOf[JsonNode])
      .readValues[JsonNode](payload.trim)
    val batch = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    while (it.hasNext) batch += it.next()
    // widen schemas with the batch
    val parsed = batch.toSeq.map { rowNode =>
      oCols.map { c =>
        val flat = scala.collection.mutable.LinkedHashMap
          .empty[String, JsonNode]
        Option(rowNode.get(c)).filter(_.isObject)
          .foreach(o => flatten(o, "", flat))
        val st = states((table, c))
        flat.foreach { case (p, v) =>
          typeOf(v) match {
            case Some(t) =>
              st.types(p) = st.types.get(p).map(widen(_, t)).getOrElse(t)
            case None => return None
          }
        }
        c -> flat
      }.toMap
    }
    // rebuild: cast the CURRENT stored object structs to the widened
    // schema, then append the batch rows materialized against it
    import org.apache.spark.sql.functions.{array, col => fcol, lit,
      struct}
    def defaultLit(t: String): org.apache.spark.sql.Column = t match {
      case a if a.startsWith("Array(") => array().cast(sparkType(a))
      case "String" => lit("")
      case _ => lit(0).cast(sparkType(t))
    }
    val widened = current.select(current.columns.map { c =>
      if (oCols.contains(c)) {
        val st = states((table, c))
        val oldFields = current.schema(c).dataType match {
          case s: StructType => s.fieldNames.toSet
          case _ => Set.empty[String]
        }
        // rebuild field-wise: existing subcolumns CAST to the widened
        // type (0 → '0' on Int→String promotion, the reference's
        // stateful conversion), new subcolumns take their type default
        def hasPath(t0: DataType, segs: List[String]): Boolean =
          (t0, segs) match {
            case (s0: StructType, h :: rest) =>
              s0.fields.find(_.name == h)
                .exists(f => rest.isEmpty || hasPath(f.dataType, rest))
            case _ => false
          }
        def rebuild(paths: Seq[(String, String)],
            prefix: Seq[String]): org.apache.spark.sql.Column = {
          val fields = tree(paths).map {
            case (seg, Left(t)) =>
              val full = prefix :+ seg
              (if (hasPath(current.schema(c).dataType, full.toList))
                full.foldLeft(fcol(s"`$c`"))(_.getField(_))
                  .cast(sparkType(t))
              else defaultLit(t)).as(seg)
            case (seg, Right(sub)) =>
              rebuild(sub.map { case (p, t) => p -> t },
                prefix :+ seg).as(seg)
          }
          struct(fields: _*)
        }
        (if (st.types.isEmpty) fcol(s"`$c`")
          else rebuild(st.types.toSeq, Seq.empty)).as(c)
      } else fcol(s"`$c`")
    }.toSeq: _*)
    val schema = widened.schema
    def buildStruct(paths: Seq[(String, String)],
        flat: collection.Map[String, JsonNode]): Row =
      Row(tree(paths).map {
        case (seg, Left(t)) =>
          flat.get(seg).map(convert(_, t)).getOrElse(defaultOf(t))
        case (seg, Right(sub)) =>
          val inner = flat.collect {
            case (p, v) if p.startsWith(seg + ".") =>
              p.stripPrefix(seg + ".") -> v
          }
          buildStruct(sub, inner)
      }: _*)
    val newRows = parsed.zip(batch.toSeq).map { case (objs, rowNode) =>
      Row(schema.fields.map { f =>
        if (oCols.contains(f.name)) {
          val st = states((table, f.name))
          buildStruct(st.types.toSeq, objs(f.name))
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
    val batchDf = spark.createDataFrame(newRows.asJava, schema)
    Some(widened.unionByName(batchDf))
  }
}
