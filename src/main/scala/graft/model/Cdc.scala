package graft.model

import org.apache.spark.sql.types._

/** The engine's CDC data model (SURVEY.md §1, §7.1).
  *
  * The reference models a change stream as a sealed `Mutation` hierarchy
  * (insert/update/delete, each with table metadata, row images, optional
  * txid — reference `mypipe-api/src/main/scala/mypipe/api/event/
  * package.scala:47-139`). Spark-first, that's one flat, columnar
  * envelope: a `Dataset[MutationRow]` / DataFrame with an `op`
  * discriminator and nullable before/after images, à la a change data
  * feed. All engine operators are DataFrame→DataFrame over this shape so
  * batch and streaming share code.
  */
object Cdc {
  /** Mutation type names (reference event/package.scala:166-192). */
  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"

  /** Wire magic bytes (reference event/package.scala:143-164:
    * InsertByte 0x1, UpdateByte 0x2, DeleteByte 0x3). */
  val InsertByte: Byte = 0x1
  val UpdateByte: Byte = 0x2
  val DeleteByte: Byte = 0x3

  def opToByte(op: String): Byte = op match {
    case OpInsert => InsertByte
    case OpUpdate => UpdateByte
    case OpDelete => DeleteByte
  }

  def byteToOp(b: Byte): String = b match {
    case InsertByte => OpInsert
    case UpdateByte => OpUpdate
    case DeleteByte => OpDelete
  }

  /** Canonical envelope schema for the generic (schema-dynamic) path.
    * Mirrors the reference's generic Avro record: headers + typed maps
    * (reference mutations.avsc + KafkaGenericAvroSerializer.scala:70-116).
    * Payload cells ride in per-type maps so ALTERs (column add/drop)
    * never change the envelope schema — the property that lets a stream
    * keep running across schema evolution (SURVEY §7.5).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("mtype", ByteType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("tbl", StringType, nullable = false),
    StructField("table_id", IntegerType, nullable = true),
    StructField("txid", StringType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("pk", StringType, nullable = true),
    StructField("bytes", MapType(StringType, BinaryType), nullable = true),
    StructField("integers", MapType(StringType, IntegerType), nullable = true),
    StructField("strings", MapType(StringType, StringType), nullable = true),
    StructField("longs", MapType(StringType, LongType), nullable = true)))
}

/** Typed view of a change record for Dataset[MutationRow] API edges and
  * the stateful streaming operators (SURVEY §7.1). */
case class MutationRow(
    op: String,
    database: String,
    tbl: String,
    txid: Option[String],
    tsUs: Long,
    pk: String,
    strings: Map[String, String],
    longs: Map[String, Long])
