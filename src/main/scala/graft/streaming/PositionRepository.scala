package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Pluggable binlog-position repositories (SURVEY.md §2.4 T5/T6).
  *
  * Structured Streaming's checkpoint is the engine's real position
  * store; this explicit repository exists for the non-streaming API
  * surface (snapshot handoff boundaries, external coordination) and
  * mirrors the reference's pluggable repo family
  * (`FileBasedBinaryLogPositionRepository.scala:12-77`,
  * `MySQLBasedBinaryLogPositionRepository.scala:13-85`): positions are
  * saved per consumer id, and a save is **elided when the position is
  * unchanged** (write-elision, reference `:53-61`).
  *
  * Two implementations behind one trait:
  *  - [[FilePositionRepository]] — one file per consumer
  *    (`$dataDir/$prefix-$consumerId.pos`), the reference's file repo;
  *  - [[TablePositionRepository]] — one shared store keyed by consumer
  *    id, the shape of the reference's MySQL-table repo (a row per
  *    consumer in one table; here a single TSV "table" file).
  *
  * Both write atomically (temp file + ATOMIC_MOVE): a crash mid-write
  * can never leave a truncated position file — losing the saved
  * position is exactly the failure a position repository exists to
  * prevent.
  */
trait PositionRepository {
  def load(consumerId: String): Option[BinlogPosition]
  def save(consumerId: String, pos: BinlogPosition): Unit
  /** Number of physical writes performed (observability for the
    * write-elision behavior). */
  def writes: Long
}

case class BinlogPosition(filename: String, position: Long) {
  def render: String = s"$filename:$position"
}

object BinlogPosition {
  // ASCII digits only, bounded length — Character.isDigit also accepts
  // Unicode digit classes toLong rejects, and 20+ digits overflow
  private val PosPattern = "^[0-9]{1,18}$".r

  def parse(s: String): Option[BinlogPosition] = s.split(":", 2) match {
    case Array(f, p) if PosPattern.matches(p) =>
      Some(BinlogPosition(f, p.toLong))
    case _ => None
  }
}

private[streaming] object AtomicWrite {
  /** Write bytes to `target` via a same-directory temp file + atomic
    * rename; readers observe either the old or the new complete file,
    * never a truncated one. */
  def write(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent,
      target.getFileName.toString, ".tmp")
    try {
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }
}

class FilePositionRepository(dataDir: String, prefix: String = "binlogpos")
    extends PositionRepository {
  private def fileFor(consumerId: String): Path =
    Paths.get(dataDir, s"$prefix-$consumerId.pos")

  @volatile private var lastSaved: Map[String, BinlogPosition] = Map.empty
  @volatile private var writeCount: Long = 0L

  override def writes: Long = writeCount

  override def load(consumerId: String): Option[BinlogPosition] = {
    val f = fileFor(consumerId)
    if (!Files.exists(f)) None
    else BinlogPosition.parse(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim)
  }

  /** Save, skipping the write when the position hasn't moved. */
  override def save(consumerId: String, pos: BinlogPosition): Unit =
    synchronized {
      if (lastSaved.get(consumerId).contains(pos)) return
      AtomicWrite.write(fileFor(consumerId), pos.render)
      lastSaved += consumerId -> pos
      writeCount += 1
    }
}

/** Shared-store repository: all consumers' positions live in one
  * key→position table (one TSV file here; a database table in the
  * reference's MySQL variant). Saves are read-modify-write under the
  * repo's lock and land atomically. */
class TablePositionRepository(tablePath: String)
    extends PositionRepository {
  private val table = Paths.get(tablePath)

  @volatile private var writeCount: Long = 0L
  override def writes: Long = writeCount

  private def readAll(): Map[String, BinlogPosition] = {
    if (!Files.exists(table)) Map.empty
    else new String(Files.readAllBytes(table), StandardCharsets.UTF_8)
      .split("\n").iterator
      .map(_.split("\t", 2))
      .collect { case Array(id, p) =>
        BinlogPosition.parse(p.trim).map(id -> _)
      }
      .flatten.toMap
  }

  override def load(consumerId: String): Option[BinlogPosition] =
    readAll().get(consumerId)

  override def save(consumerId: String, pos: BinlogPosition): Unit =
    synchronized {
      val all = readAll()
      if (all.get(consumerId).contains(pos)) return // write-elision
      val next = all + (consumerId -> pos)
      val content = next.toSeq.sortBy(_._1)
        .map { case (id, p) => s"$id\t${p.render}" }.mkString("\n")
      AtomicWrite.write(table, content)
      writeCount += 1
    }
}
