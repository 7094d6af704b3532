package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.cdc.ChangeEvent

/** DataSource V2 change-event source: `spark.read.format("graft.sources.CdcSourceV2")
  * .option("path", dir)` over JSON-lines event files (SURVEY.md §4 —
  * "a DataSource V2 Table/ScanBuilder with SupportsPushDownFilters").
  *
  * What it buys over the plain json reader: **scan-level pushdown of the
  * reference's cheap pre-decode filters** (Parser.cpp:679-729 drops
  * non-tracked obj# before any value decode; skip-XID T8 likewise) — a
  * pushed `obj`/`xid`/`op`/`scn` predicate is evaluated on the raw parsed
  * token BEFORE the row (and its five map columns) is materialized, and
  * column pruning skips materializing unused fields entirely. One input
  * partition per file preserves per-log ordering (§2.9: redo order is
  * per-thread/file).
  */
class CdcSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

final class CdcTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft_cdc source requires a 'path' option")
  override def name(): String = s"graft_cdc($path)"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(path)
}

final class CdcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ChangeEvent.schema

  /** Accept predicates the reader can check on raw tokens: equality/IN on
    * obj, xid, op, thread; ranges on scn, seq. Everything else stays with
    * Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, remain) = filters.partition {
      case EqualTo(a, _) => CdcScanBuilder.pushable(a)
      case In(a, _) => CdcScanBuilder.pushable(a)
      case GreaterThan(a, _) => CdcScanBuilder.rangeable(a)
      case GreaterThanOrEqual(a, _) => CdcScanBuilder.rangeable(a)
      case LessThan(a, _) => CdcScanBuilder.rangeable(a)
      case LessThanOrEqual(a, _) => CdcScanBuilder.rangeable(a)
      case _ => false
    }
    pushed = accept
    remain
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new CdcScan(path, required, pushed)
}

object CdcScanBuilder {
  private val pushableCols = Set("obj", "xid", "op", "thread")
  private val rangeableCols = Set("scn", "seq", "offset")
  def pushable(a: String): Boolean = pushableCols.contains(a)
  def rangeable(a: String): Boolean = rangeableCols.contains(a)
}

final class CdcScan(path: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_cdc $path, PushedFilters: ${filters.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] =
    CdcScan.listFiles(path)
      .map(f => CdcInputPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(required, filters)

  /** S5 online polling loop as a micro-batch stream: the offset is the
    * NAME of the last consumed file (content-addressed); each trigger reads
    * files whose log-sequence key sorts strictly after it — the reference's
    * archived-log polling (Replicator.cpp:690-816) with the log switch
    * handled by the offset bump. Files must be immutable once written
    * (the archived-redo contract). */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new CdcMicroBatchStream(path, required, filters)
}

object CdcScan {
  /** Log-sequence sort key: the trailing digit run of the name, numerically
    * (log_10 AFTER log_9, even though 'log_10' < 'log_9' lexicographically —
    * archived-redo names are not zero-padded in general). Non-sequenced
    * names order after sequenced ones, by name. A digit run too long for
    * Long (timestamp-ish / hash-ish suffix) is not a log sequence — treat
    * the name as non-sequenced rather than crash the stream on one file. */
  private val seqRe = """(\d+)\D*$""".r
  def sortKey(name: String): (Long, String) =
    seqRe.findFirstMatchIn(name)
      .flatMap(m => scala.util.Try((m.group(1).toLong, name)).toOption)
      .getOrElse((Long.MaxValue, name))

  /** File list in log-sequence order (deterministic partition numbering). */
  def listFiles(path: String): Array[String] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isFile) Array(dir)
      else {
        val ls = dir.listFiles((f: java.io.File) =>
          f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        if (ls == null) Array.empty[java.io.File] else ls
      }
    files.sortBy(f => sortKey(f.getName)).map(_.getAbsolutePath)
  }
}

/** Stream offset: the last consumed file name ("" = nothing yet). Content-
  * addressed on purpose: an index into the re-sorted listing would shift
  * when a late file sorts before already-consumed ones, re-emitting read
  * files and permanently skipping the new one. */
case class CdcOffset(lastFile: String) extends streaming.Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    m.writeValueAsString(m.createObjectNode().put("lastFile", lastFile))
  }
}

final class CdcMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter]) extends streaming.MicroBatchStream {

  private def baseName(p: String): String = new java.io.File(p).getName
  private def keyOf(off: streaming.Offset): Option[(Long, String)] = {
    val f = off.asInstanceOf[CdcOffset].lastFile
    if (f == null || f.isEmpty) None else Some(CdcScan.sortKey(f))
  }

  // retention guard: archived logs may be deleted while the stream runs;
  // the reported latest offset must never regress below one already seen
  @volatile private var maxSeen: String = ""

  override def initialOffset(): streaming.Offset = CdcOffset("")
  override def latestOffset(): streaming.Offset = {
    val fs = CdcScan.listFiles(path)
    val cur = if (fs.isEmpty) "" else baseName(fs.last)
    val ord = Ordering[(Long, String)]
    if (cur.nonEmpty &&
      (maxSeen.isEmpty || ord.lt(CdcScan.sortKey(maxSeen), CdcScan.sortKey(cur))))
      maxSeen = cur
    CdcOffset(maxSeen)
  }
  override def deserializeOffset(json: String): streaming.Offset = {
    val f = new ObjectMapper().readTree(json).get("lastFile").asText
    // checkpoint restore also seeds the retention guard
    val ord = Ordering[(Long, String)]
    if (f.nonEmpty &&
      (maxSeen.isEmpty || ord.lt(CdcScan.sortKey(maxSeen), CdcScan.sortKey(f))))
      maxSeen = f
    CdcOffset(f)
  }

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val ord = Ordering[(Long, String)]
    val sKey = keyOf(start)
    keyOf(end) match {
      case None => Array.empty
      case Some(eKey) =>
        CdcScan.listFiles(path)
          .filter { f =>
            val k = CdcScan.sortKey(baseName(f))
            sKey.forall(ord.lt(_, k)) && ord.lteq(k, eKey)
          }
          .map(f => CdcInputPartition(f): InputPartition)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(required, filters)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class CdcInputPartition(file: String) extends InputPartition

final class CdcReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CdcPartitionReader(p.asInstanceOf[CdcInputPartition].file, required, filters)
}

/** Line reader: parse JSON → check pushed filters on scalar tokens →
  * materialize ONLY required columns. */
final class CdcPartitionReader(file: String, required: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file)
  private val it = lines.getLines()
  private var current: InternalRow = _

  private def long(n: JsonNode, f: String, default: Long = 0L): Long = {
    val v = n.get(f); if (v == null || v.isNull) default else v.asLong
  }
  private def str(n: JsonNode, f: String): String = {
    val v = n.get(f); if (v == null || v.isNull) null else v.asText
  }

  private def passes(n: JsonNode): Boolean = filters.forall {
    case EqualTo(a, v) => scalarOf(n, a) == v
    case In(a, vs) => vs.contains(scalarOf(n, a))
    case GreaterThan(a, v) => cmp(n, a, v) > 0
    case GreaterThanOrEqual(a, v) => cmp(n, a, v) >= 0
    case LessThan(a, v) => cmp(n, a, v) < 0
    case LessThanOrEqual(a, v) => cmp(n, a, v) <= 0
    case _ => true
  }
  private def scalarOf(n: JsonNode, f: String): Any = f match {
    case "obj" | "scn" | "seq" | "offset" => long(n, f)
    case "thread" | "subScn" | "slot" => long(n, f).toInt
    case _ => str(n, f)
  }
  private def cmp(n: JsonNode, f: String, v: Any): Int =
    java.lang.Long.compare(long(n, f), v.asInstanceOf[Number].longValue)

  private def mapOf(n: JsonNode, f: String): ArrayBasedMapData = {
    val v = n.get(f)
    if (v == null || v.isNull || !v.isObject) null
    else {
      val fields = v.properties().asScala.toSeq
      ArrayBasedMapData(
        fields.map(e => UTF8String.fromString(e.getKey)).toArray[Any],
        fields.map(e =>
          if (e.getValue.isNull) null
          else UTF8String.fromString(e.getValue.asText)).toArray[Any])
    }
  }

  private def materialize(n: JsonNode): InternalRow = {
    val vals = required.fields.map { f =>
      f.name match {
        case "scn" | "seq" | "offset" | "obj" | "bdba" | "tm" => long(n, f.name)
        case "subScn" | "thread" | "slot" => long(n, f.name).toInt
        case "xid" | "op" | "fb" | "ddlText" =>
          Option(str(n, f.name)).map(UTF8String.fromString).orNull
        case "before" | "after" | "suppBefore" | "suppAfter" | "attrs" =>
          mapOf(n, f.name)
        case other => throw new IllegalArgumentException(s"unknown col $other")
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        try {
          val n = mapper.readTree(line)
          // required-field sanity (matches EventSource.wellFormed) + pushdown
          if (n != null && n.isObject && n.hasNonNull("scn") &&
            n.hasNonNull("xid") && n.hasNonNull("op") && passes(n)) {
            current = materialize(n)
            return true
          }
        } catch { case _: Exception => () } // corrupt line: skip (≙ bad block)
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
