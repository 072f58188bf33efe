package graft

import graft.functions.SpecificEnvelope
import graft.model.ColumnTypes
import graft.model.ColumnTypes._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full binlog type table (SURVEY §1.2; reference
  * ColumnType.scala:15-48): every code maps, both lookups resolve, and
  * decimal/date/blob cells survive the specific envelope end-to-end. */
class ColumnTypesSpec extends SparkSpec {

  test("all 30 codes + UNKNOWN map to the SURVEY §1.2 Spark types") {
    val expected: Seq[(ColType, DataType)] = Seq(
      DECIMAL -> DecimalType(12, 2), TINY -> ByteType, SHORT -> ShortType,
      LONG -> LongType, FLOAT -> FloatType, DOUBLE -> DoubleType,
      NULL -> NullType, TIMESTAMP -> TimestampType, LONGLONG -> LongType,
      INT24 -> IntegerType, DATE -> DateType, TIME -> LongType,
      DATETIME -> TimestampType, YEAR -> ShortType, NEWDATE -> DateType,
      VARCHAR -> StringType, BIT -> BooleanType,
      TIMESTAMP_V2 -> TimestampType, DATETIME_V2 -> TimestampType,
      TIME_V2 -> LongType, NEWDECIMAL -> DecimalType(12, 2),
      ENUM -> StringType, SET -> StringType, TINY_BLOB -> BinaryType,
      MEDIUM_BLOB -> BinaryType, LONG_BLOB -> BinaryType,
      BLOB -> BinaryType, VAR_STRING -> StringType, STRING -> StringType,
      GEOMETRY -> BinaryType, UNKNOWN -> StringType)
    assert(expected.map(_._1) === ColumnTypes.all, "covers the full table")
    expected.foreach { case (t, dt) =>
      assert(sparkType(t, precision = 12, scale = 2) === dt, t.toString)
    }
    // BIT width rule: BIT(1) boolean, wider BIT opaque bitfield
    assert(sparkType(BIT, width = 1) === BooleanType)
    assert(sparkType(BIT, width = 8) === BinaryType)
    // decimal carries declared (p,s)
    assert(sparkType(NEWDECIMAL, precision = 38, scale = 10) ===
      DecimalType(38, 10))
  }

  test("lookup by code and by information_schema string") {
    // byCode: exact on the wire code, total over the table
    ColumnTypes.all.foreach(t => assert(byCode(t.code) === Some(t)))
    assert(byCode(123) === None)
    // byName: first declared match wins for shared strings (reference
    // `values.find` semantics: "bigint"→LONG not LONGLONG, "date"→DATE
    // not NEWDATE, "timestamp"→TIMESTAMP not TIMESTAMP_V2)
    assert(byName("bigint") === Some(LONG))
    assert(byName("date") === Some(DATE))
    assert(byName("timestamp") === Some(TIMESTAMP))
    assert(byName("decimal") === Some(DECIMAL))
    assert(byName("text") === Some(VAR_STRING))
    assert(byName("geometry") === Some(GEOMETRY))
    assert(byName("no_such_type") === None)
    // every declared string form resolves to a type with that string
    ColumnTypes.all.foreach(t => assert(byName(t.name).exists(_.name == t.name)))
  }

  test("generic-map routing mirrors the reference serializer subset") {
    assert(genericMapSlot(INT24) === Some("integers"))
    assert(genericMapSlot(VARCHAR) === Some("strings"))
    assert(genericMapSlot(VAR_STRING) === Some("strings"))
    assert(genericMapSlot(LONG) === Some("longs"))
    assert(genericMapSlot(LONGLONG) === Some("longs"))
    // the reference's `case _ ⇒ // unsupported` drop set
    Seq(DECIMAL, NEWDECIMAL, DATE, DATETIME, BLOB, GEOMETRY, BIT, SET)
      .foreach(t => assert(genericMapSlot(t) === None, t.toString))
  }

  test("decimal/date/blob cells survive the specific envelope exactly") {
    val out = SpecificEnvelope.ctTypedEnvelope(spark, sf)
    val schema = out.schema
    // DECIMAL rides the wire but the output projects to hash-portable
    // integer cents (driver readers disagree on decimal rendering)
    assert(schema("l_quantity_cents").dataType === LongType)
    assert(schema("l_shipdate").dataType === DateType)
    val rows = out.collect()
    assert(rows.length > 0)
    // oracle-equivalent check in-process: roundtrip == plain projection
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("l_quantity_cents"),
        col("l_shipdate").cast("date").as("l_shipdate"),
        col("l_returnflag"), lit(1).as("schema_id_rt"))
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    assert(rows.toSeq === direct.toSeq)
  }

  test("timestamp/time/enum/set cells survive the specific envelope") {
    val out = SpecificEnvelope.ctTypedEnvelope2(spark, sf)
    val rows = out.collect()
    assert(rows.length > 0)
    val direct = Tables.events(spark, sf)
      .filter(col("event_id") % 5 === 0)
      .select(col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        (unix_micros(col("ts")) % lit(86400000000L)).as("time_cell"),
        col("event_type").as("enum_cell"),
        concat_ws(",",
          when(col("value") >= 50, lit("hi")),
          when(col("user_id") % 2 === 0, lit("even"))).as("set_cell"),
        lit(1).as("schema_id_rt"))
      .orderBy("event_id")
      .collect()
    assert(rows.toSeq === direct.toSeq)
    // the set cell actually exercises multi-label, single-label and
    // empty forms (otherwise the SET coverage claim is hollow)
    val sets = rows.map(_.getAs[String]("set_cell")).toSet
    assert(sets.exists(_.contains(",")) && sets.contains(""))
  }

  test("timestamp micros survive the avro wire (DATETIME_V2 path)") {
    import graft.functions.AvroCodec
    val fields = Seq(StructField("id", LongType),
      StructField("ts", TimestampType))
    val schemaJson =
      SpecificEnvelope.schemaFor("testdb", "t", "insert", fields)
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("id"),
        col("o_orderdate").cast("timestamp").as("ts"))
      .limit(100)
    val rt = df.withColumn("rec", struct(col("id"), col("ts")))
      .withColumn("bin", AvroCodec.encode(col("rec"), schemaJson))
      .withColumn("dec",
        AvroCodec.decode(col("bin"), schemaJson, StructType(fields)))
      .select(col("dec.id").as("id"), col("dec.ts").as("ts"))
    assert(rt.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }
}
