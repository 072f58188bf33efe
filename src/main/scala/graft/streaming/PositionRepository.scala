package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Pluggable binlog-position repositories (SURVEY.md §2.4 T5/T6).
  *
  * Structured Streaming's checkpoint is the engine's real position
  * store; this explicit repository exists for the non-streaming API
  * surface (snapshot handoff boundaries, external coordination) and
  * mirrors the reference's file-based repo semantics
  * (`FileBasedBinaryLogPositionRepository.scala:12-77`): positions are
  * saved per consumer id at `$dataDir/$prefix-$consumerId.pos`, and a
  * save is **elided when the position is unchanged** (write-elision,
  * reference `:53-61`).
  *
  * The reference's MySQL- and Kafka-backed variants are intentionally
  * not replicated: their role (durable shared store) is covered by the
  * checkpoint directory living on a shared filesystem.
  */
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

class FilePositionRepository(dataDir: String, prefix: String = "binlogpos") {
  private def fileFor(consumerId: String): Path =
    Paths.get(dataDir, s"$prefix-$consumerId.pos")

  @volatile private var lastSaved: Map[String, BinlogPosition] = Map.empty
  @volatile private var writeCount: Long = 0L

  /** Number of physical writes performed (observability for the
    * write-elision behavior). */
  def writes: Long = writeCount

  def load(consumerId: String): Option[BinlogPosition] = {
    val f = fileFor(consumerId)
    if (!Files.exists(f)) None
    else BinlogPosition.parse(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim)
  }

  /** Save, skipping the write when the position hasn't moved. */
  def save(consumerId: String, pos: BinlogPosition): Unit = synchronized {
    if (lastSaved.get(consumerId).contains(pos)) return
    Files.createDirectories(Paths.get(dataDir))
    Files.write(fileFor(consumerId),
      pos.render.getBytes(StandardCharsets.UTF_8))
    lastSaved += consumerId -> pos
    writeCount += 1
  }
}
