package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators — the piece of a 100 TB deployment that
  * decides how much of the corpus a query touches before a single
  * byte is read. The reference leaves layout to its Kafka/HDFS
  * consumers; a Spark-native engine owns it:
  *
  *  - [[zorderKey]]: Morton (Z-order) interleave of two 16-bit keys,
  *    built from the standard bit-spread shifts as plain column
  *    algebra — codegen'd end to end, no UDF. Sorting/range-
  *    partitioning by this key clusters rows so per-file min/max
  *    statistics prune on BOTH dimensions (the multi-dim analog of
  *    sort-by-date).
  *  - [[layZorder]] / [[layZcells]]: the key itself and per-quadtree-
  *    cell bounding boxes over orders (custkey × order day) — the
  *    measurable claim of z-ordering is that cell bounding boxes are
  *    tight; the spec additionally asserts z-range-partitioned files
  *    beat natural order on bounding-box area.
  *  - [[writeDatePartitioned]]: hive-style partitioned parquet writer
  *    whose read side partition-prunes (asserted in LayoutSpec).
  */
object Layout {

  private val mask = Seq(
    0x00FF00FFL -> 8, 0x0F0F0F0FL -> 4, 0x33333333L -> 2, 0x55555555L -> 1)

  /** Spread the low 16 bits of `c` to even bit positions (0, 2, …, 30)
    * via the classic mask-and-shift ladder. */
  def spreadBits(c: Column): Column =
    mask.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (m, s)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** DuckDB mirror of [[spreadBits]] (same ladder, textual fold). */
  def spreadBitsSql(e: String): String =
    mask.foldLeft(s"($e & 65535)") { case (x, (m, s)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  /** Morton key: bits of `a` at even positions, bits of `b` at odd. */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  def zorderKeySql(a: String, b: String): String =
    s"(${spreadBitsSql(a)} | (${spreadBitsSql(b)} << 1))"

  private def ordersWithZ(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("o_epoch_day",
        expr("unix_micros(to_utc_timestamp(o_orderdate, 'UTC')) " +
          "div 86400000000L"))
      .withColumn("zkey",
        zorderKey(col("o_custkey"), col("o_epoch_day")))

  private val ordersWithZSql: String =
    s"""SELECT *, ${zorderKeySql("o_custkey", "o_epoch_day")} AS zkey
       |  FROM (SELECT o_orderkey, o_custkey,
       |          epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
       |            AS o_epoch_day
       |        FROM orders)""".stripMargin

  // ── per-row morton key ──────────────────────────────────────────────
  def layZorder(spark: SparkSession, dir: String): DataFrame =
    ordersWithZ(spark, dir)
      .select("o_orderkey", "o_custkey", "o_epoch_day", "zkey")
      .orderBy("zkey", "o_orderkey")

  val layZorderSql: String =
    s"""SELECT o_orderkey, o_custkey, o_epoch_day, zkey
       |FROM ($ordersWithZSql)
       |ORDER BY zkey, o_orderkey""".stripMargin

  // ── quadtree-cell bounding boxes ────────────────────────────────────
  /** Top 6 z-bits of the RANGE-NORMALIZED key = the 8×8 quadtree grid
    * cell. Each dimension is first scaled to the full 16-bit range from
    * its global min/max (the range-bounds pass a real OPTIMIZE ZORDER
    * does; the bounds are a 1-row broadcast, not a shuffle) — raw keys
    * would leave the top bits constant and every row in one cell. Per
    * cell: row count and the (custkey, day) bounding box — the stats a
    * file-level reader keeps, and the quantity z-ordering minimizes. */
  def layZcells(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .withColumn("o_epoch_day",
        expr("unix_micros(to_utc_timestamp(o_orderdate, 'UTC')) " +
          "div 86400000000L"))
    val bounds = base.agg(
      min("o_custkey").as("mn_ck"), max("o_custkey").as("mx_ck"),
      min("o_epoch_day").as("mn_day"), max("o_epoch_day").as("mx_day"))
    def norm(x: Column, mn: Column, mx: Column): Column =
      ((x - mn) * lit(65535L)) / greatest(mx - mn, lit(1L)) cast "long"
    base.crossJoin(broadcast(bounds))
      .withColumn("zkey", zorderKey(
        norm(col("o_custkey"), col("mn_ck"), col("mx_ck")),
        norm(col("o_epoch_day"), col("mn_day"), col("mx_day"))))
      .groupBy(shiftrightunsigned(col("zkey"), 26).as("zcell"))
      .agg(count(lit(1)).as("n_rows"),
        min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
        min("o_epoch_day").as("min_day"), max("o_epoch_day").as("max_day"))
      .orderBy("zcell")
  }

  val layZcellsSql: String = {
    val nck = "(((o_custkey - mn_ck) * 65535) // GREATEST(mx_ck - mn_ck, 1))"
    val nday = "(((o_epoch_day - mn_day) * 65535) // GREATEST(mx_day - mn_day, 1))"
    s"""WITH based AS (
       |  SELECT o_orderkey, o_custkey,
       |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
       |      AS o_epoch_day
       |  FROM orders),
       |bounds AS (
       |  SELECT MIN(o_custkey) AS mn_ck, MAX(o_custkey) AS mx_ck,
       |    MIN(o_epoch_day) AS mn_day, MAX(o_epoch_day) AS mx_day
       |  FROM based),
       |zed AS (
       |  SELECT o_custkey, o_epoch_day,
       |    ${zorderKeySql(nck, nday)} AS zkey
       |  FROM based CROSS JOIN bounds)
       |SELECT zkey >> 26 AS zcell, COUNT(*) AS n_rows,
       |  MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
       |  MIN(o_epoch_day) AS min_day, MAX(o_epoch_day) AS max_day
       |FROM zed GROUP BY zcell ORDER BY zcell""".stripMargin
  }

  // ── partitioned writer ──────────────────────────────────────────────
  /** Hive-partitioned parquet lake: one directory per order year,
    * z-sorted within partitions so both partition pruning (year) and
    * row-group min/max pruning (custkey/day) apply on read. */
  def writeDatePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("o_year", year(col("o_orderdate")))
      .withColumn("zkey", zorderKey(col("o_custkey"),
        expr("unix_micros(to_utc_timestamp(o_orderdate, 'UTC')) " +
          "div 86400000000L")))
      .repartition(col("o_year"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode("overwrite").partitionBy("o_year").parquet(path)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lay_zorder" -> (layZorder _),
    "lay_zcells" -> (layZcells _))

  val oracles: Map[String, String] = Map(
    "lay_zorder" -> layZorderSql,
    "lay_zcells" -> layZcellsSql)
}
