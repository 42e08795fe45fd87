package graft.golden

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `system.parts` / `system.detached_parts` stand-in (ref
  * src/Storages/System/StorageSystemParts.h:14 +
  * StorageSystemDetachedParts.cpp, part naming in
  * src/Storages/MergeTree/MergeTreePartInfo.h
  * `partitionid_minblock_maxblock_level`, partition ids in
  * MergeTreePartition::getID): every INSERT creates one part per
  * touched partition (block numbers in first-appearance order),
  * OPTIMIZE merges a partition's active parts at level+1, and the
  * partition ops move parts between the active and detached sets.
  * Tracking is pay-for-use — enabled per golden file. */
object PartsLog {

  @volatile var enabled: Boolean = false

  final case class Part(table: String, partition: String,
    partitionId: String, minBlock: Long, maxBlock: Long, level: Int,
    rows: Long, var active: Boolean, var detached: Boolean,
    df: Option[DataFrame] = None,
    objStates: Map[String, JsonObject.ObjState] = Map.empty,
    partType: String = null,
    /** pre-mutation snapshot: ALTER UPDATE rewrites only the mutated
      * column file, leaving the part's serialization kinds as written
      * (02662) — kinds compute from here until a merge rebuilds */
    kindDf: Option[DataFrame] = None,
    /** mutation version: a mutated part keeps its block range and
      * level but gains a trailing version (all_1_1_0 → all_1_1_0_3;
      * ref MergeTreePartInfo::getPartNameV1 with mutation). */
    mutation: Long = 0L,
    /** per-part physical column types where they lag the table's
      * declared type (a MODIFY COLUMN that skipped rewriting this
      * part — 02669 keeps `String` on the no-rewrite part). */
    colTypes: Map[String, String] = Map.empty) {
    def name: String =
      s"${partitionId}_${minBlock}_${maxBlock}_$level" +
        (if (mutation > 0) s"_$mutation" else "")
    /** frozen at creation; legacy parts fall back to the live rule */
    def typ: String =
      if (partType != null) partType else DdlEmu.partTypeFor(table, rows)
  }

  private val parts = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.mutable.ArrayBuffer[Part]]
  /** table → PARTITION BY expression ("" = unpartitioned MergeTree). */
  private val partitionExprs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val blockCounters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]
  private val engines =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val startAt =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  /** ratio_of_defaults_for_sparse_serialization per table (ref
    * MergeTreeSettings.h; a column whose defaults fraction is ≥ the
    * ratio is written Sparse). */
  private val sparseRatio =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  def reset(): Unit = {
    parts.clear(); partitionExprs.clear(); blockCounters.clear()
    engines.clear(); startAt.clear(); sparseRatio.clear()
    resetLog()
  }

  def onCreate(table: String, engTail: String): Unit = {
    if (!enabled) return
    val eng = "(?is)ENGINE\\s*=?\\s*(\\w+)".r.findFirstMatchIn(engTail)
      .map(_.group(1)).getOrElse(return)
    if (!eng.toLowerCase.contains("mergetree")) return
    engines(table) = eng
    // Replicated engines allocate block numbers from 0 (ZooKeeper
    // sequential nodes); plain MergeTree starts at 1 (00502 both forms)
    startAt(table) = if (eng.toLowerCase.contains("replicated")) -1L
      else 0L
    "(?is)ratio_of_defaults_for_sparse_serialization\\s*=\\s*([\\d.]+)".r
      .findFirstMatchIn(engTail)
      .foreach(m => sparseRatio(table) = m.group(1).toDouble)
    val pb = ("(?is)\\bPARTITION\\s+BY\\s+(.*?)\\s*" +
      "(?:\\bORDER\\s+BY\\b|\\bPRIMARY\\s+KEY\\b|\\bSAMPLE\\s+BY\\b|" +
      "\\bTTL\\b|\\bSETTINGS\\b|$)").r
    partitionExprs(table) =
      pb.findFirstMatchIn(engTail).map(_.group(1).trim).getOrElse("")
    parts.remove(table)
    blockCounters.remove(table)
  }

  def onDrop(table: String): Unit = {
    parts.remove(table); partitionExprs.remove(table)
    blockCounters.remove(table); engines.remove(table)
  }

  /** TRUNCATE replaces each MERGED (level>0) active part with an
    * empty covering part one level up, and drops level-0 parts
    * outright (ref MergeTreeData — 01825_type_json_1 pins the
    * all_1_2_2 / all_1_2_3 empty-part lineage across two truncates). */
  def onTruncate(table: String): Unit = {
    val buf = parts.getOrElse(table, return)
    buf.synchronized {
      val act = buf.filter(p => p.active && !p.detached).toSeq
      val keep = buf.filterNot(p => p.active && !p.detached)
      buf.clear(); buf ++= keep
      act.filter(_.level > 0).foreach { p =>
        val np = Part(table, p.partition, p.partitionId, p.minBlock,
          p.maxBlock, p.level + 1, 0, active = true, detached = false)
        buf += np
        logEvent("NewPart", table, np)
      }
      // every previously-active part is deleted outright (02491 pins
      // the RemovePart element after a truncate)
      act.foreach(p => logEvent("RemovePart", table, p))
    }
  }

  // ---- partition value formatting (MergeTreePartition::getID) ----

  private def compact(v: Any): String = v match {
    case d: java.sql.Date => d.toString.replace("-", "")
    case ld: java.time.LocalDate => ld.toString.replace("-", "")
    case other => String.valueOf(other)
  }

  private def displayOne(v: Any): String = v match {
    case null => "NULL"
    case d: java.sql.Date => d.toString
    case ld: java.time.LocalDate => ld.toString
    case other => String.valueOf(other)
  }

  private def displayNested(v: Any): String = v match {
    case s: String => "'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case ld: java.time.LocalDate => "'" + ld.toString + "'"
    case other => String.valueOf(other)
  }

  private def isNumericOrDate(v: Any): Boolean = v match {
    case _: java.lang.Number | _: java.sql.Date |
         _: java.time.LocalDate | _: java.lang.Boolean => true
    case _ => false
  }

  /** Partition id: `all` for unpartitioned; compact text for numeric /
    * date keys (tuples joined with `-`); otherwise the lowercase hex of
    * sipHash128 over the binary-serialized value (string path). */
  private def partId(v: Any, unpartitioned: Boolean): String = {
    if (unpartitioned) return "all"
    v match {
      case r: Row =>
        val vs = r.toSeq
        if (vs.forall(isNumericOrDate) || vs.forall {
          case _: String => false; case _ => true
        }) vs.map(compact).mkString("-")
        else hashId(vs)
      case s: String => hashId(Seq(s))
      case other => compact(other)
    }
  }

  private def hashId(vs: Seq[Any]): String = {
    // FieldVisitorHash serialization (ref src/Common/FieldVisitorHash
    // .cpp): Field type tag byte, then the value — strings carry an
    // 8-byte little-endian length (verified against 00502's pinned ids)
    val bos = new java.io.ByteArrayOutputStream()
    def le8(n: Long): Unit =
      (0 until 8).foreach(i => bos.write(((n >> (8 * i)) & 0xff).toInt))
    vs.foreach {
      case s: String =>
        val b = s.getBytes("UTF-8")
        bos.write(16) // Field::Types::String
        le8(b.length.toLong)
        bos.write(b)
      case d: java.sql.Date =>
        bos.write(1) // dates ride as UInt64 day numbers
        le8(d.toLocalDate.toEpochDay)
      case other =>
        val l = String.valueOf(other).toLong
        bos.write(if (l < 0) 2 else 1)
        le8(l)
    }
    val (lo, hi) = graft.functions.ChHash.sipHash128Keyed(0L, 0L,
      bos.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(lo); bb.putLong(hi)
    bb.array().map("%02x".format(_)).mkString
  }

  private def displayPartition(v: Any, unpartitioned: Boolean): String =
    if (unpartitioned) "tuple()"
    else v match {
      case r: Row => "(" + r.toSeq.map(displayNested).mkString(",") + ")"
      case other => displayOne(other)
    }

  def onInsert(spark: SparkSession, table: String, rows: DataFrame,
      objStates: Map[String, JsonObject.ObjState] = Map.empty): Unit = {
    if (!enabled || !partitionExprs.contains(table)) return
    val pExpr = partitionExprs(table)
    val buf = parts.getOrElseUpdate(table,
      scala.collection.mutable.ArrayBuffer.empty[Part])
    val counter = blockCounters.getOrElseUpdate(table,
      new java.util.concurrent.atomic.AtomicLong(
        startAt.getOrElse(table, 0L)))
    if (pExpr.isEmpty) {
      val n = rows.count()
      val b = counter.incrementAndGet()
      buf.synchronized {
        val p = Part(table, "tuple()", "all", b, b, 0, n,
          active = true, detached = false, df = Some(rows),
          objStates = objStates,
          partType = DdlEmu.partTypeFor(table, n))
        buf += p
        logEvent("NewPart", table, p,
          profile = writerProfile(table, n))
      }
      return
    }
    // strip only a WRAPPING paren pair — `toMonday(d)` keeps its own
    val pe =
      if (pExpr.startsWith("(") && pExpr.endsWith(")"))
        pExpr.drop(1).dropRight(1)
      else pExpr
    val items = graft.ChSql.splitTopLevelCommas(pe).map(_.trim)
      .filter(_.nonEmpty)
    val pcols = items.zipWithIndex.map { case (e, i) =>
      org.apache.spark.sql.functions
        .expr(graft.ChSql.translate(e).trim).as(s"__p$i")
    }
    val vals = rows.select(pcols.toSeq: _*).collect()
    // blocks in first-appearance order within the insert (00502)
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], Long]
    vals.foreach { r =>
      val k = r.toSeq
      seen(k) = seen.getOrElse(k, 0L) + 1
    }
    buf.synchronized {
      seen.foreach { case (k, n) =>
        val v: Any = if (items.length == 1) k.head else Row(k: _*)
        val b = counter.incrementAndGet()
        // the part's own rows (multiset provenance for PART-level ops)
        val cond = items.zip(k).map { case (e, kv) =>
          val pe = org.apache.spark.sql.functions
            .expr(graft.ChSql.translate(e).trim)
          if (kv == null) pe.isNull
          else pe === org.apache.spark.sql.functions.lit(kv)
        }.reduce(_ && _)
        val p = Part(table, displayPartition(v, unpartitioned = false),
          partId(v, unpartitioned = false), b, b, 0, n,
          active = true, detached = false, df = Some(rows.filter(cond)),
          objStates = objStates,
          partType = DdlEmu.partTypeFor(table, n))
        buf += p
        logEvent("NewPart", table, p,
          profile = writerProfile(table, n))
      }
    }
  }

  /** Normalized partition-literal matcher: `tuple()`, `'x'`, `1`,
    * `('2000-01-01', 1)`, or the `ID 'pid'` form. */
  private def matches(p: Part, spec: String, byId: Boolean): Boolean = {
    val s = spec.trim
    if (byId) return p.partitionId == s.stripPrefix("'").stripSuffix("'")
    def norm(x: String) = x.replaceAll("\\s+", "")
      .replaceAll("\\\\'", "'").stripPrefix("'").stripSuffix("'")
    norm(s) == norm(p.partition) ||
      s.stripPrefix("'").stripSuffix("'") == p.partitionId
  }

  // ---- system.part_log stand-in (ref src/Interpreters/PartLog.h) ----

  final case class LogEvent(qid: String, eventType: String,
    table: String, partName: String, partType: String,
    partitionId: String, rows: Long, mergedFrom: Seq[String],
    mergeReason: String, mergeAlgorithm: String, readRows: Long,
    profile: Map[String, Long], ms: Long, tick: Long)

  private val logEvents =
    new java.util.concurrent.ConcurrentLinkedQueue[LogEvent]
  private val logTick = new java.util.concurrent.atomic.AtomicLong(0L)
  /** per-statement provenance, set by the golden runner. */
  @volatile var currentQid: String = "initial"

  private def logEvent(eventType: String, table: String, p: Part,
      mergedFrom: Seq[String] = Nil, reason: String = "NotAMerge",
      algorithm: String = "Undecided", readRows: Long = 0L,
      profile: Map[String, Long] = Map.empty): Unit =
    logEvents.add(LogEvent(currentQid, eventType, table, p.name, p.typ,
      p.partitionId, p.rows, mergedFrom, reason, algorithm, readRows,
      profile, System.currentTimeMillis(), logTick.incrementAndGet()))

  private[golden] def resetLog(): Unit = {
    logEvents.clear(); logTick.set(0L); currentQid = "initial"
  }

  /** Horizontal vs Vertical pick (ref MergeTreeDataMergerMutator::
    * chooseMergeAlgorithm): Vertical when the merged row count and the
    * non-key column count reach the activation thresholds, the result
    * is a Wide part, and every source is Wide (or compact→wide
    * vertical merges are allowed — 02362/02539 pin both paths). */
  private def mergeAlgorithmOf(table: String, rows: Long,
      sources: Seq[Part]): String = {
    val minRows = DdlEmu.mtSettingNum(table,
      "vertical_merge_algorithm_min_rows_to_activate", 131072L)
    val minCols = DdlEmu.mtSettingNum(table,
      "vertical_merge_algorithm_min_columns_to_activate", 11L)
    val allowCompact = DdlEmu.mtSettingNum(table,
      "allow_vertical_merges_from_compact_to_wide_parts", 0L) != 0L
    val nonKeyCols = math.max(DdlEmu.chTypesOf(table).size - 1, 0)
    val targetWide = DdlEmu.partTypeFor(table, rows) == "Wide"
    if (rows >= minRows && nonKeyCols >= minCols && targetWide &&
      (sources.forall(_.typ == "Wide") || allowCompact)) "Vertical"
    else "Horizontal"
  }

  /** New-part writer profile counters (ref ProfileEvents
    * MergeTreeDataWriter*; 02378 asserts sums over them). */
  private def writerProfile(table: String, rows: Long): Map[String, Long] = {
    val ub = rows * DdlEmu.rowWidthOf(table)
    Map("MergeTreeDataWriterRows" -> rows,
      "MergeTreeDataWriterUncompressedBytes" -> math.max(ub, 1L),
      "MergeTreeDataWriterCompressedBytes" -> math.max(ub / 2, 1L),
      "MergeTreeDataWriterBlocks" -> 1L)
  }

  private val partLogSchema = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("merge_reason", StringType, nullable = false),
    StructField("merge_algorithm", StringType, nullable = false),
    StructField("event_date", DateType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("event_time_microseconds", TimestampType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("table_uuid", StringType, nullable = false),
    StructField("part_name", StringType, nullable = false),
    StructField("partition_id", StringType, nullable = false),
    StructField("part_type", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("size_in_bytes", LongType, nullable = false),
    StructField("merged_from", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("read_rows", LongType, nullable = false),
    StructField("read_bytes", LongType, nullable = false),
    StructField("peak_memory_usage", LongType, nullable = false),
    StructField("error", IntegerType, nullable = false),
    StructField("exception", StringType, nullable = false),
    StructField("ProfileEvents",
      MapType(StringType, LongType, valueContainsNull = false),
      nullable = false)))

  def registerPartLog(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = logEvents.asScala.toSeq.map { e =>
      val (db, bare) = graft.ChDatabases.known
        .find(d => e.table.startsWith(d + "__"))
        .map(d => (d, e.table.stripPrefix(d + "__")))
        .getOrElse(("default", e.table))
      val t = new java.sql.Timestamp(e.ms)
      // strictly monotonic micros: the global tick breaks same-ms ties
      val tus = java.sql.Timestamp.from(
        java.time.Instant.ofEpochMilli(e.ms)
          .plusNanos(e.tick % 1000 * 1000))
      Row(e.qid, e.eventType, e.mergeReason, e.mergeAlgorithm,
        new java.sql.Date(e.ms), t, tus, 1L, db, bare,
        DdlEmu.uuidOf(e.table), e.partName, e.partitionId, e.partType,
        e.rows, e.rows * 8 + 64, e.mergedFrom, e.readRows,
        // a merge/mutation streams blocks: peak memory stays a
        // fraction of the bytes it reads (01200 asserts ≤ read_bytes)
        e.readRows * 8, math.max(math.min(e.readRows * 8, 8388608L) / 2,
          1L), 0, "", e.profile)
    }
    spark.createDataFrame(rows.asJava, partLogSchema)
      .createOrReplaceTempView("graft_system_part_log")
  }

  /** Serialization kind of a plain column in one part: Sparse when the
    * part's default-value fraction reaches the table ratio (ref
    * ISerialization::getKind / MergeTreeDataPartWriter; 01780/02662). */
  private def plainKindOf(p: Part, c: String, ty: String,
      ratio: Double): String =
    if (p.rows == 0) "Default"
    else p.kindDf.orElse(p.df).filter(_.columns.contains(c)).map { df =>
      import org.apache.spark.sql.functions.col
      val isNum = ty.matches("(?i)\\s*(U?Int|Float|Decimal|Bool|Enum).*")
      val isStr = ty.matches("(?i)\\s*(String|FixedString).*")
      val defCount =
        if (isNum) scala.util.Try(
          df.filter(col(c).cast("double") === 0.0).count())
          .getOrElse(-1L)
        else if (isStr) scala.util.Try(
          df.filter(col(c) === "").count()).getOrElse(-1L)
        else -1L
      if (defCount >= 0 && defCount.toDouble / p.rows >= ratio) "Sparse"
      else "Default"
    }.getOrElse("Default")

  /** ALTER MODIFY COLUMN over live parts: a part whose on-disk
    * serialization can be read through a lightweight conversion keeps
    * its files — and its physical type — while an incompatible one
    * rewrites and adopts the new type (ref MutationsInterpreter;
    * 02669 pins a Default-serialized String keeping `String` under a
    * widen to Nullable while the Sparse part rewrites). Every active
    * part gains the mutation version either way. */
  def onModifyColumn(table: String, column: String, oldTy: String,
      newTy: String): Unit = {
    if (!enabled) return
    val buf = parts.getOrElse(table, return)
    val mv = blockCounters.get(table).map(_.incrementAndGet())
      .getOrElse(0L)
    val ratio = sparseRatio.getOrElse(table, 0.9375)
    buf.synchronized {
      val upd = buf.map { p =>
        if (!(p.active && !p.detached)) p
        else {
          val widenToNullable =
            newTy.trim.matches("(?is)^Nullable\\s*\\(.*") &&
              !oldTy.trim.matches("(?is)^Nullable\\s*\\(.*")
          val rewrite = !widenToNullable ||
            plainKindOf(p, column, oldTy, ratio) == "Sparse"
          val np =
            if (rewrite) p.copy(mutation = mv, kindDf = None,
              colTypes = p.colTypes - column)
            else p.copy(mutation = mv,
              colTypes = p.colTypes + (column -> oldTy))
          logEvent("MutatePart", table, np, mergedFrom = Seq(p.name),
            readRows = if (rewrite) p.rows else 0L,
            profile = Map("MergedRows" -> (if (rewrite) p.rows else 0L)))
          np
        }
      }.toSeq
      buf.clear(); buf ++= upd
    }
  }

  /** ALTER UPDATE rewrites every part's row snapshot in place (rows
    * and lineage unchanged) so serialization kinds recompute against
    * the mutated values (02662). */
  def onMutate(table: String, f: DataFrame => DataFrame): Unit = {
    val buf = parts.getOrElse(table, return)
    val mv = blockCounters.get(table)
      .map(_.incrementAndGet()).getOrElse(0L)
    buf.synchronized {
      val upd = buf.map { p =>
        if (p.df.isDefined) {
          val np = p.copy(df = p.df.map(f),
            kindDf = p.kindDf.orElse(p.df),
            mutation = if (p.active && !p.detached) mv else p.mutation)
          if (p.active && !p.detached)
            logEvent("MutatePart", table, np,
              mergedFrom = Seq(p.name), reason = "NotAMerge",
              readRows = p.rows,
              profile = Map("MergedRows" -> p.rows, "FileOpen" ->
                (DdlEmu.chTypesOf(table).size + 3L)))
          np
        } else p
      }.toSeq
      buf.clear(); buf ++= upd
    }
  }

  def onOptimize(table: String, partSpec: Option[String],
      byId: Boolean, isFinal: Boolean = false): Unit = {
    if (!enabled) return
    val buf = parts.getOrElse(table, return)
    buf.synchronized {
      val targets = buf.filter(p => p.active && !p.detached &&
        partSpec.forall(sp => matches(p, sp, byId)))
      targets.groupBy(_.partitionId).foreach { case (_, ps) =>
        // OPTIMIZE FINAL rewrites even a lone part (level+1, kinds and
        // type recomputed from the current rows — 02662 after mutation)
        if (ps.size == 1 && isFinal) {
          val p = ps.head
          p.active = false
          val np = Part(table, p.partition, p.partitionId, p.minBlock,
            p.maxBlock, p.level + 1, p.rows,
            active = true, detached = false, df = p.df,
            objStates = p.objStates,
            partType = if (p.typ == "Wide") "Wide"
              else DdlEmu.partTypeFor(table, p.rows))
          buf += np
          logEvent("MergeParts", table, np,
            mergedFrom = Seq(p.name), reason = "RegularMerge",
            algorithm = mergeAlgorithmOf(table, p.rows, Seq(p)),
            readRows = p.rows,
            profile = Map("MergedRows" -> p.rows,
              "MergedUncompressedBytes" ->
                math.max(p.rows * DdlEmu.rowWidthOf(table), 1L),
              "FileOpen" -> (DdlEmu.chTypesOf(table).size + 3L)))
        } else if (ps.size >= 2) {
          ps.foreach(_.active = false)
          val mb = ps.map(_.minBlock).min
          val xb = ps.map(_.maxBlock).max
          val lvl = ps.map(_.level).max + 1
          // part snapshots can carry different OBJECT schemas (the
          // column widened between inserts) — reconcile by name, and
          // give up provenance rather than fail the merge
          val mergedDf = ps.flatMap(_.df).reduceOption { (a, b) =>
            try a.union(b)
            catch { case _: Exception =>
              a.unionByName(b, allowMissingColumns = true) }
          }
          // the merged part's object-column type is the widen-merge of
          // the constituents' snapshots (01825_type_json_1 lineage)
          val mergedObj = ps.flatMap(_.objStates.toSeq)
            .groupBy(_._1).map { case (c, sts) =>
              c -> sts.map(_._2).reduce(JsonObject.mergeStates)
            }
          // a merge of Wide sources stays Wide (the vertical merge
          // path; 01606 pins Wide surviving a lowered threshold)
          val tot = ps.map(_.rows).sum
          val np = Part(table, ps.head.partition, ps.head.partitionId,
            mb, xb, lvl, tot,
            active = true, detached = false, df = mergedDf,
            objStates = mergedObj,
            partType = if (ps.exists(_.typ == "Wide")) "Wide"
              else DdlEmu.partTypeFor(table, tot))
          buf += np
          logEvent("MergeParts", table, np,
            mergedFrom = ps.map(_.name).toSeq, reason = "RegularMerge",
            algorithm = mergeAlgorithmOf(table, tot, ps.toSeq),
            readRows = tot,
            profile = Map("MergedRows" -> tot,
              "MergedUncompressedBytes" ->
                math.max(tot * DdlEmu.rowWidthOf(table), 1L),
              "FileOpen" -> (DdlEmu.chTypesOf(table).size + 3L)))
        }
      }
    }
  }

  def onPartitionOp(table: String, op: String, spec: String,
      byId: Boolean): Unit = {
    if (!enabled) return
    val buf = parts.getOrElse(table, return)
    buf.synchronized {
      op.toUpperCase match {
        case "DETACH" =>
          buf.foreach(p => if (p.active && matches(p, spec, byId)) {
            p.active = false; p.detached = true
          })
        case "DROP" =>
          val keep = buf.filterNot(p => matches(p, spec, byId))
          buf.clear(); buf ++= keep
        case "ATTACH" =>
          buf.foreach(p => if (p.detached && matches(p, spec, byId)) {
            p.active = true; p.detached = false
          })
        case _ =>
      }
    }
  }

  /** partition displays of the parts carrying `id` (the PARTITION ID
    * form of the ALTER ops needs a value predicate). */
  def displaysForId(table: String, id: String): Seq[String] =
    parts.get(table).map(_.synchronized {
      parts(table).toSeq.filter(_.partitionId == id)
        .map(_.partition).distinct
    }).getOrElse(Seq.empty)

  /** rows of a single named part; `wantDetached` filters by state
    * (DETACH targets active parts, ATTACH targets detached ones). */
  def partRowsByName(table: String, partName: String,
      wantDetached: Option[Boolean] = None): Option[DataFrame] =
    parts.get(table).flatMap(b => b.synchronized {
      b.find(p => p.name == partName &&
        wantDetached.forall(_ == p.detached)).flatMap(_.df)
    })

  /** single-PART state transition. */
  def onPartOpSingle(table: String, op: String, partName: String): Unit = {
    val buf = parts.getOrElse(table, return)
    buf.synchronized {
      op.toUpperCase match {
        case "DETACH" => buf.foreach(p => if (p.name == partName) {
          p.active = false; p.detached = true })
        case "DROP" =>
          val keep = buf.filterNot(p => p.name == partName && !p.detached)
          buf.clear(); buf ++= keep
        case "ATTACH" =>
          // an attached part takes a FRESH block number (ref
          // MergeTreeData::attachPartition renames; 01451 pins the
          // renamed all_4_4_0)
          buf.find(p => p.name == partName && p.detached).foreach { p =>
            val keep = buf.filterNot(_ eq p)
            buf.clear(); buf ++= keep
            val b = blockCounters.getOrElseUpdate(table,
              new java.util.concurrent.atomic.AtomicLong(0))
              .incrementAndGet()
            buf += Part(table, p.partition, p.partitionId, b, b, 0,
              p.rows, active = true, detached = false, df = p.df,
              partType = p.partType)
          }
        case _ =>
      }
    }
  }

  private def partsSchema = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("uuid", StringType, nullable = false),
    StructField("part_type", StringType, nullable = false),
    StructField("active", IntegerType, nullable = false),
    StructField("marks", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes_on_disk", LongType, nullable = false),
    StructField("data_compressed_bytes", LongType, nullable = false),
    StructField("data_uncompressed_bytes", LongType, nullable = false),
    StructField("marks_bytes", LongType, nullable = false),
    StructField("modification_time", TimestampType, nullable = false),
    StructField("remove_time", TimestampType, nullable = false),
    StructField("refcount", IntegerType, nullable = false),
    StructField("min_date", DateType, nullable = false),
    StructField("max_date", DateType, nullable = false),
    StructField("min_time", TimestampType, nullable = false),
    StructField("max_time", TimestampType, nullable = false),
    StructField("partition_id", StringType, nullable = false),
    StructField("min_block_number", LongType, nullable = false),
    StructField("max_block_number", LongType, nullable = false),
    StructField("level", IntegerType, nullable = false),
    StructField("data_version", LongType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("engine", StringType, nullable = false),
    StructField("disk_name", StringType, nullable = false),
    StructField("path", StringType, nullable = false)))

  def register(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val epoch = new java.sql.Timestamp(0)
    val epochD = new java.sql.Date(0)
    val rows = parts.toSeq.sortBy(_._1).flatMap { case (t, buf) =>
      val (db, bare) = graft.ChDatabases.known
        .find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__")))
        .getOrElse(("default", t))
      buf.synchronized {
        buf.toSeq.filterNot(_.detached).map { p =>
          Row(p.partition, p.name, "", p.typ,
            if (p.active) 1 else 0,
            math.max(1L, (p.rows + 8191) / 8192), p.rows,
            p.rows * 16 + 64, p.rows * 12 + 32, p.rows * 16,
            64L, epoch, epoch, 1, epochD, epochD, epoch, epoch,
            p.partitionId, p.minBlock, p.maxBlock, p.level,
            p.minBlock, db, bare, engines.getOrElse(t, "MergeTree"),
            "default", s"/var/lib/clickhouse/data/$db/$bare/${p.name}/")
        }
      }
    }
    spark.createDataFrame(rows.asJava, partsSchema)
      .createOrReplaceTempView("graft_system_parts")
  }

  /** `system.parts_columns` stand-in (ref
    * src/Storages/System/StorageSystemPartsColumns.cpp): the parts
    * cross the table's declared columns; this engine has no sparse
    * serialization, so serialization_kind is always Default. */
  def registerPartsColumns(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val subSch = ArrayType(StructType(Seq(
      StructField("names", StringType, nullable = false),
      StructField("types", StringType, nullable = false),
      StructField("serializations", StringType, nullable = false))),
      containsNull = false)
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("partition_id", StringType, nullable = false),
      StructField("active", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("column", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("column_position", LongType, nullable = false),
      StructField("serialization_kind", StringType, nullable = false),
      StructField("subcolumns", subSch, nullable = false),
      StructField("bytes_on_disk", LongType, nullable = false),
      StructField("marks_bytes", LongType, nullable = false),
      StructField("column_bytes_on_disk", LongType, nullable = false)))
    val rows = parts.toSeq.sortBy(_._1).flatMap { case (t, buf) =>
      val (db, bare) = graft.ChDatabases.known
        .find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__")))
        .getOrElse(("default", t))
      val cols = DdlEmu.chTypesOf(t)
      val objs = JsonObject.objCols.getOrElse(t, Seq.empty).toSet
      val ratio = sparseRatio.getOrElse(t, 0.9375)
      buf.synchronized {
        buf.toSeq.filterNot(_.detached).flatMap { p =>
          cols.zipWithIndex.map { case ((c, ty), ci) =>
            // object columns carry the PER-PART schema snapshot — the
            // type the column had when this part was written/merged —
            // and per-subcolumn serialization kinds (Sparse when the
            // part's defaults fraction reaches the table ratio)
            val st = if (objs(c)) p.objStates.get(c) else None
            val ty2 =
              if (objs(c)) st.map(JsonObject.renderState)
                .getOrElse("Tuple(_dummy UInt8)")
              else p.colTypes.getOrElse(c, ty)
            val subs = st.map { s0 =>
              val fr = p.df.map(JsonObject.defaultFractions(_, c, s0))
                .getOrElse(Map.empty[String, Double])
              JsonObject.leafPaths(s0).map { case (path, pty) =>
                val kind =
                  if (fr.getOrElse(path, 0.0) >= ratio) "Sparse"
                  else "Default"
                Row(path, pty, kind)
              }
            }.getOrElse(Seq.empty)
            val plainKind =
              if (objs(c)) "Default"
              else plainKindOf(p, c, p.colTypes.getOrElse(c, ty), ratio)
            Row(db, bare, p.name, p.partitionId,
              if (p.active) 1 else 0, p.rows, c, ty2, (ci + 1).toLong,
              plainKind, subs, p.rows * 8 + 32, 64L, p.rows * 8 + 32)
          }
        }
      }
    }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_parts_columns")
  }

  def registerDetached(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("partition_id", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("bytes_on_disk", LongType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("disk", StringType, nullable = false),
      StructField("reason", StringType, nullable = false),
      StructField("min_block_number", LongType, nullable = false),
      StructField("max_block_number", LongType, nullable = false),
      StructField("level", IntegerType, nullable = false)))
    val rows = parts.toSeq.sortBy(_._1).flatMap { case (t, buf) =>
      val (db, bare) = graft.ChDatabases.known
        .find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__")))
        .getOrElse(("default", t))
      buf.synchronized {
        buf.toSeq.filter(_.detached).map { p =>
          Row(db, bare, p.partitionId, p.name, p.rows * 16 + 64,
            s"/var/lib/clickhouse/data/$db/$bare/detached/${p.name}/",
            "default", "", p.minBlock, p.maxBlock, p.level)
        }
      }
    }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_detached_parts")
  }
}
