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
  *  - the stream is **single-partition** per micro-batch — a binlog is a
  *    totally ordered serial log; parallelism begins *downstream*
  *    (partition by connection/table), not at the tail (SURVEY §7.5);
  *  - `maxLinesPerTrigger` bounds a micro-batch (backpressure the
  *    reference lacks — its queues were unbounded);
  *  - offsets are monotone line counts; `commit` is a no-op because the
  *    log is immutable (a real binlog source would prune).
  *
  * Row schema = [[ChangeLogSource.schema]] (conn, seq, kind, op, pk,
  * ts_us, value) — feed it `TxPipeline.groupByTransaction` after a
  * `.as[ChangeEvent]`.
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

  /** TSV render of one change event (inverse of the reader). */
  def renderLine(conn: Long, seq: Long, kind: String, op: String,
      pk: String, tsUs: Long, value: String): String =
    s"$conn\t$seq\t$kind\t$op\t$pk\t$tsUs\t$value"
}

case class ChangeLogOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

class ChangeLogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangeLogTable(properties.get("path"),
      Option(properties.get("maxLinesPerTrigger")).map(_.toLong)
        .getOrElse(Long.MaxValue))
}

class ChangeLogTable(path: String, maxLinesPerTrigger: Long)
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
        new ChangeLogMicroBatchStream(path, maxLinesPerTrigger)
    }
}

class ChangeLogMicroBatchStream(path: String, maxLinesPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def countLines(): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return 0L
    val in = new BufferedReader(new InputStreamReader(fs.open(p),
      StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).size.toLong
    finally in.close()
  }

  // Trigger.AvailableNow snapshots the end position up front and drains
  // to it in rate-limited batches
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(countLines())

  override def getDefaultReadLimit: ReadLimit =
    if (maxLinesPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxLinesPerTrigger)

  override def initialOffset(): Offset = ChangeLogOffset(0L)

  /** Admission-controlled advance: at most `limit` lines past `start`,
    * never past the (possibly snapshotted) end of the log. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val total = availableNowTarget.getOrElse(countLines())
    val s = start.asInstanceOf[ChangeLogOffset].line
    val capped = limit match {
      case mr: ReadMaxRows => math.min(total, s + mr.maxRows())
      case _ => total
    }
    ChangeLogOffset(math.max(s, capped))
  }

  override def latestOffset(): Offset = ChangeLogOffset(countLines())

  override def reportLatestOffset(): Offset = ChangeLogOffset(countLines())

  override def deserializeOffset(json: String): Offset =
    ChangeLogOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeLogOffset].line
    val e = end.asInstanceOf[ChangeLogOffset].line
    if (e <= s) Array.empty
    else Array(ChangeLogInputPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangeLogInputPartition]
      new ChangeLogPartitionReader(p.path, p.startLine, p.endLine)
    }
}

case class ChangeLogInputPartition(path: String, startLine: Long,
    endLine: Long) extends InputPartition

/** Streams lines [startLine, endLine) of the log, parsing TSV into
  * InternalRows — the row-materialization step (S5) at the source. */
class ChangeLogPartitionReader(path: String, startLine: Long, endLine: Long)
    extends PartitionReader[InternalRow] {

  private val in: BufferedReader = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val r = new BufferedReader(new InputStreamReader(fs.open(p),
      StandardCharsets.UTF_8))
    var skipped = 0L
    while (skipped < startLine && r.readLine() != null) skipped += 1
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
    current = InternalRow(
      f(0).toLong, f(1).toLong,
      UTF8String.fromString(f(2)),
      if (f(3).isEmpty) null else UTF8String.fromString(f(3)),
      if (f(4).isEmpty) null else UTF8String.fromString(f(4)),
      if (f(5).isEmpty) null else java.lang.Long.valueOf(f(5).toLong),
      if (f(6).isEmpty) null else UTF8String.fromString(f(6)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
