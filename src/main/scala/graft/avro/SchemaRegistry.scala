package graft.avro

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** In-memory versioned Avro schema registry mirroring the reference's
  * AVRO-1124-style repository semantics (reference `mypipe-avro/src/
  * main/scala/mypipe/avro/schema/GenericSchemaRepository.scala:10-35`):
  * `registerSchema` is idempotent per (subject, schema) and allocates a
  * global short id; lookups run against bidirectional id↔schema caches
  * (`GenericSchemaRepository.scala:62-64`).
  *
  * Subjects follow the reference's naming: `generic_<op>` or
  * `<db>_<table>_<op>` (AvroSchemaUtils.scala:60-76).
  *
  * Deployment note (100 TB): one registry instance lives on the driver
  * and is closed over into expression trees / broadcast; executors only
  * read. Registration (an ALTER, T7) happens driver-side between
  * micro-batches.
  */
class SchemaRegistry extends Serializable {
  private val nextId = new AtomicInteger(0)
  // subject → versions (schema json, global id), append-ordered
  private val subjects = TrieMap[String, Vector[(String, Int)]]()
  private val byIdCache = TrieMap[Int, String]()

  /** Register a schema under a subject; returns its global id.
    * Re-registering an identical schema returns the existing id. */
  def register(subject: String, schemaJson: String): Int = synchronized {
    val versions = subjects.getOrElse(subject, Vector.empty)
    versions.find(_._1 == schemaJson) match {
      case Some((_, id)) => id
      case None =>
        val id = nextId.incrementAndGet()
        subjects.update(subject, versions :+ (schemaJson, id))
        byIdCache.update(id, schemaJson)
        id
    }
  }

  /** getSchema(subject, id) — the versioned fetch. */
  def schemaById(id: Int): Option[String] = byIdCache.get(id)

  /** getLatestSchema(subject). */
  def latest(subject: String): Option[(Int, String)] =
    subjects.get(subject).flatMap(_.lastOption).map(_.swap)

  /** getSchemaId(subject, schema). */
  def idOf(subject: String, schemaJson: String): Option[Int] =
    subjects.get(subject).flatMap(_.find(_._1 == schemaJson)).map(_._2)

  def versionCount(subject: String): Int =
    subjects.get(subject).map(_.size).getOrElse(0)
}

object AvroSubjects {
  /** Subject naming (reference AvroSchemaUtils.scala:60-76). */
  def generic(op: String): String = s"generic_$op"
  def specific(db: String, table: String, op: String): String =
    s"${db}_${table}_$op"
}
