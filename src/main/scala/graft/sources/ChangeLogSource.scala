package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 streaming source for an append-only change log — the
  * engine's stand-in for the MySQL binlog connection (SURVEY.md §2.1 S1,
  * §7.4: "the only true custom component"). The reference connects as a
  * fake replica and resumes from a saved `(file, pos)`
  * (`AbstractMySQLBinaryLogConsumer.scala:23-33,124-151`); here the log
  * is a TSV file of change events, the offset is the line position, and
  * Structured Streaming's checkpoint plays the position repository
  * (T5/T6).
  *
  * Deliberate semantics, mirroring the binlog:
  *  - each log **segment** is serial — a binlog is a totally ordered
  *    log; within a segment parallelism begins *downstream* (partition
  *    by connection/table), not at the tail (SURVEY §7.5). When `path`
  *    is a directory its name-sorted files are rotated segments of one
  *    logical log (binlog FLUSH/rotate), the offset carries
  *    (line, segment, byte), and a multi-segment BACKLOG replays with
  *    one input partition per segment — parallel catch-up, serial tail;
  *  - `maxLinesPerTrigger` bounds a micro-batch (backpressure the
  *    reference lacks — its queues were unbounded);
  *  - offsets are monotone line counts; `commit` is a no-op because the
  *    log is immutable (a real binlog source would prune).
  *
  * Row schema = [[ChangeLogSource.schema]] (conn, seq, kind, op, pk,
  * ts_us, value) — feed it `TxPipeline.groupByTransaction` after a
  * `.as[ChangeEvent]`.
  *
  * Record contract: entries are newline-TERMINATED — an unterminated
  * tail (a partially flushed write) is invisible until its terminator
  * lands, so readers never observe half an entry.
  */
object ChangeLogSource {
  val schema: StructType = StructType(Seq(
    StructField("conn", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("op", StringType, nullable = true),
    StructField("pk", StringType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** Escape a field for the TSV frame: a literal tab/newline/backslash
    * in pk or value would otherwise shift or split the record. */
  def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  def unescape(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => out.append('\t'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case '\\' => out.append('\\'); i += 2
          case other => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** NULL sentinel on the wire (MySQL-dump convention): a raw `\N`
    * field is SQL NULL. Unambiguous: a literal backslash in data is
    * escaped to `\\`, so data can never render as a bare `\N` — which
    * makes empty string and NULL distinct, round-trippable values. */
  val NullField: String = "\\N"

  private def renderField(s: String): String =
    if (s == null) NullField else escape(s)

  /** Anchor spacing of the sparse line index: the driver keeps one
    * byte offset per this many lines (8 B / 4096 lines ≈ 2 MB for a
    * billion-line log — a dense per-line index would be 8 GB of driver
    * memory, a real scale-killer); readers seek to the anchor at or
    * before their slice and skip at most granularity-1 lines. */
  val DefaultIndexGranularity: Int = 4096

  /** TSV render of one change event (inverse of the reader). Nullable
    * fields (op, pk, value) accept null and render the `\N` sentinel. */
  def renderLine(conn: Long, seq: Long, kind: String, op: String,
      pk: String, tsUs: Long, value: String): String =
    s"$conn\t$seq\t${escape(kind)}\t${renderField(op)}\t${renderField(pk)}\t$tsUs\t${renderField(value)}"
}

/** Offset = (line, seg, byte) — the global line count across all log
  * segments, plus the (segment index, in-segment byte) of that line so
  * a reader seeks straight to its slice. This is the `(file, pos)`
  * shape of a binlog position generalized over rotation: when the
  * writer rolls to a new segment file (binlog FLUSH/rotate), `seg`
  * advances and `byte` resets, while `line` keeps the total order. */
case class ChangeLogOffset(line: Long, seg: Int, byte: Long)
    extends Offset {
  override def json(): String =
    s"""{"line":$line,"seg":$seg,"byte":$byte}"""
}

object ChangeLogOffset {
  private val Pattern3 =
    """\{"line":(\d+),"seg":(\d+),"byte":(\d+)\}""".r
  private val Pattern2 = """\{"line":(\d+),"byte":(\d+)\}""".r
  def parse(json: String): ChangeLogOffset = json match {
    case Pattern3(l, s, b) => ChangeLogOffset(l.toLong, s.toInt, b.toLong)
    case Pattern2(l, b) => // pre-rotation checkpoint: single segment
      ChangeLogOffset(l.toLong, 0, b.toLong)
    case other => // legacy plain line number
      ChangeLogOffset(other.trim.toLong, 0, -1L)
  }
}

class ChangeLogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangeLogTable(properties.get("path"),
      Option(properties.get("maxLinesPerTrigger")).map(_.toLong)
        .getOrElse(Long.MaxValue),
      Option(properties.get("indexGranularity")).map(_.toInt)
        .getOrElse(ChangeLogSource.DefaultIndexGranularity))
}

class ChangeLogTable(path: String, maxLinesPerTrigger: Long,
    indexGranularity: Int)
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"changelog($path)"
  override def schema(): StructType = ChangeLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeLogSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new ChangeLogMicroBatchStream(path, maxLinesPerTrigger,
          indexGranularity)
    }
}

class ChangeLogMicroBatchStream(path: String, maxLinesPerTrigger: Long,
    indexGranularity: Int = ChangeLogSource.DefaultIndexGranularity)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(indexGranularity > 0, "indexGranularity must be positive")

  // Incremental per-segment SPARSE line index: one anchor byte offset
  // per `indexGranularity` lines (anchors(i) = byte of line i·g), so
  // driver memory is lines/granularity · 8 B — a billion-line segment
  // indexes in ~2 MB instead of the 8 GB a dense per-line index would
  // take. refresh() scans only bytes appended since the last trigger
  // (O(new bytes) per trigger, not O(file)); readers seek to the
  // anchor at or before their slice and skip < granularity lines.
  // Only complete newline-terminated lines are admitted (a partially-
  // flushed tail entry is invisible until its terminator lands —
  // binlog semantics).
  //
  // ROTATION: if `path` is a directory, its files (sorted by name)
  // are the rotated segments of one logical log — the binlog's
  // FLUSH/rotate model. New segments may only be appended after
  // existing ones; a segment stops growing once a later one exists.
  // Historical replay parallelizes across segments (one input
  // partition per segment slice) while the tail stays serial.
  private final class SegmentIndex(val segPath: Path) {
    val anchors = scala.collection.mutable.ArrayBuffer[Long](0L)
    var lines: Long = 0L
    var scannedBytes = 0L
    /** byte length captured when this segment stopped being the tail;
      * a rotated segment growing afterwards would silently renumber
      * every later global line, so it is a hard error (-1 = still
      * the active tail, unfrozen). */
    var frozenLen: Long = -1L
    /** (anchor byte, lines to skip from there) for an in-segment line. */
    def seekFor(line: Long): (Long, Long) = {
      val a = math.min(line / indexGranularity, anchors.length - 1L).toInt
      (anchors(a), line - a.toLong * indexGranularity)
    }
  }

  private val segments = scala.collection.mutable.ArrayBuffer[SegmentIndex]()

  private def scanNewBytes(fs: org.apache.hadoop.fs.FileSystem,
      seg: SegmentIndex): Unit = {
    val len = fs.getFileStatus(seg.segPath).getLen
    if (len <= seg.scannedBytes) return
    val in = fs.open(seg.segPath)
    try {
      in.seek(seg.scannedBytes)
      val buf = new Array[Byte](64 * 1024)
      var pos = seg.scannedBytes
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        while (i < read) {
          if (buf(i) == '\n') {
            seg.lines += 1
            seg.scannedBytes = pos + i + 1
            if (seg.lines % indexGranularity == 0)
              seg.anchors += seg.scannedBytes
          }
          i += 1
        }
        pos += read
        read = in.read(buf)
      }
    } finally in.close()
  }

  /** Natural name order: digit runs compare as numbers, so an unpadded
    * rotation `log.9` → `log.10` still sorts after (plain lexicographic
    * would order the new segment first and kill the stream on the
    * append-only check). */
  private def naturalLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i); val cb = b.charAt(j)
      if (ca.isDigit && cb.isDigit) {
        var i2 = i; while (i2 < a.length && a.charAt(i2).isDigit) i2 += 1
        var j2 = j; while (j2 < b.length && b.charAt(j2).isDigit) j2 += 1
        // strip leading zeros, then compare by length then digits
        var i1 = i; while (i1 < i2 - 1 && a.charAt(i1) == '0') i1 += 1
        var j1 = j; while (j1 < j2 - 1 && b.charAt(j1) == '0') j1 += 1
        val la = i2 - i1; val lb = j2 - j1
        if (la != lb) return la < lb
        var k = 0
        while (k < la) {
          val d = a.charAt(i1 + k) - b.charAt(j1 + k)
          if (d != 0) return d < 0
          k += 1
        }
        i = i2; j = j2
      } else {
        if (ca != cb) return ca < cb
        i += 1; j += 1
      }
    }
    a.length - i < b.length - j
  }

  private def refresh(): Unit = synchronized {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) return
    val status = fs.getFileStatus(root)
    val paths: Seq[Path] =
      if (status.isDirectory)
        fs.listStatus(root).filter(_.isFile).map(_.getPath)
          .sortWith((x, y) => naturalLess(x.getName, y.getName)).toSeq
      else Seq(root)
    require(paths.size >= segments.size &&
      segments.zip(paths).forall { case (s, p) => s.segPath == p },
      s"changelog segments must only be appended; known " +
        s"${segments.map(_.segPath.getName)}, found ${paths.map(_.getName)}")
    paths.drop(segments.size).foreach(p => segments += new SegmentIndex(p))
    segments.zipWithIndex.foreach { case (s, i) =>
      val isTail = i == segments.length - 1
      if (s.frozenLen >= 0) {
        // rotated segments must not grow: appended bytes would shift
        // every later segment's global line numbers and corrupt
        // checkpointed offsets into replays/skips — fail loudly.
        val len = fs.getFileStatus(s.segPath).getLen
        require(len == s.frozenLen,
          s"rotated changelog segment ${s.segPath.getName} grew after " +
            s"rotation (${s.frozenLen} -> $len bytes); rotated segments " +
            "are immutable")
      } else {
        scanNewBytes(fs, s)
        // freeze at the real byte length, not scannedBytes: a rotated
        // segment may end without a trailing newline and those bytes
        // are (correctly) never admitted, but they aren't growth
        if (!isTail) s.frozenLen = fs.getFileStatus(s.segPath).getLen
      }
    }
  }

  private def totalLines: Long = segments.iterator.map(_.lines).sum

  /** Offset fields (seg, byte) for a global line position: the anchor
    * at or before the line in its segment (readers skip the remainder;
    * the byte is informational for humans and direct seeks). */
  private def positionOf(line: Long): (Int, Long) = {
    if (segments.isEmpty) return (0, 0L)
    var base = 0L
    var i = 0
    while (i < segments.length) {
      val s = segments(i)
      if (line < base + s.lines || i == segments.length - 1) {
        val in = math.min(line - base, s.lines)
        return (i, s.seekFor(in)._1)
      }
      base += s.lines
      i += 1
    }
    (segments.length - 1, segments.last.anchors.last)
  }

  private def endOffset: ChangeLogOffset = {
    val t = totalLines
    val (seg, byte) = positionOf(t)
    ChangeLogOffset(t, seg, byte)
  }

  // Trigger.AvailableNow snapshots the end position up front and drains
  // to it in rate-limited batches
  private var availableNowTarget: Option[ChangeLogOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    availableNowTarget = Some(endOffset)
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxLinesPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxLinesPerTrigger)

  override def initialOffset(): Offset = ChangeLogOffset(0L, 0, 0L)

  /** Admission-controlled advance: at most `limit` lines past `start`,
    * never past the (possibly snapshotted) end of the log. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    refresh()
    val end = availableNowTarget.getOrElse(endOffset)
    val s = start.asInstanceOf[ChangeLogOffset]
    val cappedLine = limit match {
      case mr: ReadMaxRows => math.min(end.line, s.line + mr.maxRows())
      case _ => end.line
    }
    if (cappedLine <= s.line) s
    else {
      val (seg, byte) = positionOf(cappedLine)
      ChangeLogOffset(cappedLine, seg, byte)
    }
  }

  override def latestOffset(): Offset = { refresh(); endOffset }

  override def reportLatestOffset(): Offset = { refresh(); endOffset }

  override def deserializeOffset(json: String): Offset =
    ChangeLogOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** One partition per segment slice — a multi-segment backlog replays
    * in parallel (each reader seeks within its own file); within a
    * single segment the slice stays one serial partition (total order
    * at the tail, SURVEY §7.5). */
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeLogOffset]
    val e = end.asInstanceOf[ChangeLogOffset]
    if (e.line <= s.line) return Array.empty
    refresh() // idempotent; rebuilds the index after a restart
    val parts = Array.newBuilder[InputPartition]
    var base = 0L
    segments.foreach { seg =>
      val segStart = math.max(s.line - base, 0L)
      val segEnd = math.min(e.line - base, seg.lines)
      if (segEnd > segStart) {
        val (anchorByte, skip) = seg.seekFor(segStart)
        parts += ChangeLogInputPartition(seg.segPath.toString,
          segStart, segEnd, anchorByte, skip)
      }
      base += seg.lines
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangeLogInputPartition]
      new ChangeLogPartitionReader(p.path, p.startLine, p.endLine,
        p.startByte, p.skipLines)
    }
}

case class ChangeLogInputPartition(path: String, startLine: Long,
    endLine: Long, startByte: Long, skipLines: Long = 0L)
    extends InputPartition

/** Streams lines [startLine, endLine) of the log, parsing TSV into
  * InternalRows — the row-materialization step (S5) at the source.
  * Seeks to the sparse-index anchor byte and skips at most
  * granularity-1 lines to reach the slice. */
class ChangeLogPartitionReader(path: String, startLine: Long,
    endLine: Long, startByte: Long, skipLines: Long = 0L)
    extends PartitionReader[InternalRow] {

  private val in: BufferedReader = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val stream = fs.open(p)
    stream.seek(startByte)
    val r = new BufferedReader(new InputStreamReader(stream,
      StandardCharsets.UTF_8))
    var toSkip = skipLines
    while (toSkip > 0 && r.readLine() != null) toSkip -= 1
    r
  }
  private var pos = startLine
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (pos >= endLine) return false
    val line = in.readLine()
    if (line == null) return false
    pos += 1
    val f = line.split("\t", -1)
    // `\N` (raw, pre-unescape) is NULL; everything else — including the
    // empty string — is data. See ChangeLogSource.NullField.
    def str(s: String) =
      if (s == ChangeLogSource.NullField) null
      else UTF8String.fromString(ChangeLogSource.unescape(s))
    current = InternalRow(
      f(0).toLong, f(1).toLong,
      UTF8String.fromString(ChangeLogSource.unescape(f(2))),
      str(f(3)), str(f(4)),
      if (f(5).isEmpty) null else java.lang.Long.valueOf(f(5).toLong),
      str(f(6)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
