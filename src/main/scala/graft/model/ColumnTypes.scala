package graft.model

import org.apache.spark.sql.types._

/** Full binlog column-type table → Spark `DataType` (SURVEY.md §1.2).
  *
  * The reference enumerates the MySQL binlog type codes with a string
  * form matching information_schema `DATA_TYPE`, and looks types up by
  * either key (reference `mypipe-api/src/main/scala/mypipe/api/data/
  * ColumnType.scala:15-48`, lookups `:50-51`). This is the engine's
  * equivalent: the same 30 codes + UNKNOWN, each mapped onto the Spark
  * type a relation column of that MySQL type should surface as.
  *
  * Mapping rationale (SURVEY §1.2 table):
  *  - fixed-point DECIMAL/NEWDECIMAL → `DecimalType(p,s)` (precision and
  *    scale come from the table metadata, not the binlog code — hence
  *    [[ColumnTypes.sparkType]] takes them as arguments);
  *  - temporal codes keep their semantic type (`DateType`,
  *    `TimestampType`); TIME has no Spark scalar — it rides as
  *    microseconds-since-midnight `LongType` (documented narrowing, same
  *    class as the reference serializer's string fallback);
  *  - BIT(1) is a boolean, wider BIT is an opaque bitfield → binary;
  *  - the BLOB family and GEOMETRY (opaque WKB) → `BinaryType`;
  *  - ENUM/SET surface as their label strings (what a SQL client sees),
  *    matching the reference's string form.
  *
  * Note the reference's *serialized* generic surface is narrower than
  * its type table: only INT24/LONG/VARCHAR/VAR_STRING reach the four
  * typed maps, everything else is silently dropped
  * (`KafkaGenericAvroSerializer.scala:70-116`, `case _ ⇒ // unsupported`
  * at `:112`). [[ColumnTypes.genericMapSlot]] encodes that routing; the
  * engine's *specific* path ([[graft.functions.SpecificEnvelope]])
  * carries the full table through Avro instead of dropping it.
  */
object ColumnTypes {

  /** One binlog type: wire code + information_schema string form. */
  final case class ColType(code: Int, name: String) {
    override def toString: String = s"$name/$code"
  }

  // Binlog wire codes, reference ColumnType.scala:15-48. Several codes
  // share a string form (LONG and LONGLONG are both "bigint" there;
  // DATE and NEWDATE are both "date") — byName resolves to the first
  // declared, exactly like the reference's `values.find`.
  val DECIMAL      = ColType(0, "decimal")
  val TINY         = ColType(1, "tinyint")
  val SHORT        = ColType(2, "smallint")
  val LONG         = ColType(3, "bigint")
  val FLOAT        = ColType(4, "float")
  val DOUBLE       = ColType(5, "double")
  val NULL         = ColType(6, "null")
  val TIMESTAMP    = ColType(7, "timestamp")
  val LONGLONG     = ColType(8, "bigint")
  val INT24        = ColType(9, "int")
  val DATE         = ColType(10, "date")
  val TIME         = ColType(11, "time")
  val DATETIME     = ColType(12, "datetime")
  val YEAR         = ColType(13, "year")
  val NEWDATE      = ColType(14, "date")
  val VARCHAR      = ColType(15, "varchar")
  val BIT          = ColType(16, "bit")
  val TIMESTAMP_V2 = ColType(17, "timestamp")
  val DATETIME_V2  = ColType(18, "datetime")
  val TIME_V2      = ColType(19, "time")
  val NEWDECIMAL   = ColType(246, "decimal")
  val ENUM         = ColType(247, "enum")
  val SET          = ColType(248, "set")
  val TINY_BLOB    = ColType(249, "tinyblob")
  val MEDIUM_BLOB  = ColType(250, "mediumblob")
  val LONG_BLOB    = ColType(251, "longblob")
  val BLOB         = ColType(252, "blob")
  val VAR_STRING   = ColType(253, "text")
  val STRING       = ColType(254, "text")
  val GEOMETRY     = ColType(255, "geometry")
  val UNKNOWN      = ColType(-9999, "unknown")

  /** Declaration order matters for byName's first-match semantics. */
  val all: Seq[ColType] = Seq(
    DECIMAL, TINY, SHORT, LONG, FLOAT, DOUBLE, NULL, TIMESTAMP, LONGLONG,
    INT24, DATE, TIME, DATETIME, YEAR, NEWDATE, VARCHAR, BIT,
    TIMESTAMP_V2, DATETIME_V2, TIME_V2, NEWDECIMAL, ENUM, SET,
    TINY_BLOB, MEDIUM_BLOB, LONG_BLOB, BLOB, VAR_STRING, STRING,
    GEOMETRY, UNKNOWN)

  private val codeIndex: Map[Int, ColType] =
    all.map(t => t.code -> t).toMap

  /** Lookup by binlog wire code (reference ColumnType.scala:50). */
  def byCode(code: Int): Option[ColType] = codeIndex.get(code)

  /** Lookup by information_schema DATA_TYPE string (reference
    * ColumnType.scala:51 — first declared match wins for shared
    * strings). */
  def byName(name: String): Option[ColType] = all.find(_.name == name)

  /** The Spark type a column of this binlog type surfaces as.
    *
    * @param precision DECIMAL precision from table metadata (ignored
    *                  for other types)
    * @param scale     DECIMAL scale from table metadata
    * @param width     display/storage width — distinguishes BIT(1)
    *                  boolean from BIT(n>1) bitfield
    */
  def sparkType(t: ColType, precision: Int = 10, scale: Int = 0,
      width: Int = 1): DataType = t match {
    case DECIMAL | NEWDECIMAL => DecimalType(precision, scale)
    case TINY => ByteType
    case SHORT => ShortType
    case INT24 => IntegerType
    case LONG | LONGLONG => LongType // Int→Long widening, SURVEY §1.2
    case FLOAT => FloatType
    case DOUBLE => DoubleType
    case NULL => NullType
    case TIMESTAMP | TIMESTAMP_V2 | DATETIME | DATETIME_V2 => TimestampType
    case DATE | NEWDATE => DateType
    case TIME | TIME_V2 => LongType // micros since midnight (no Spark TIME)
    case YEAR => ShortType
    case VARCHAR | VAR_STRING | STRING | ENUM | SET => StringType
    case BIT => if (width <= 1) BooleanType else BinaryType
    case TINY_BLOB | MEDIUM_BLOB | LONG_BLOB | BLOB => BinaryType
    case GEOMETRY => BinaryType // opaque WKB
    // UNKNOWN and any future/unlisted code: stringified fallback, the
    // valueString rule (also satisfies the exhaustivity checker — the
    // ColType constants are vals, not a sealed hierarchy).
    case _ => StringType
  }

  /** Which generic-envelope typed map the reference serializer routes a
    * type to: Some("integers"|"strings"|"longs"|"bytes"), or None for
    * the dropped `case _ ⇒ // unsupported` types (reference
    * KafkaGenericAvroSerializer.scala:70-116). */
  def genericMapSlot(t: ColType): Option[String] = t match {
    case INT24 => Some("integers")
    case VARCHAR | VAR_STRING => Some("strings")
    case LONG | LONGLONG => Some("longs")
    case _ => None
  }
}
