package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming dedupe heals at-least-once redelivery across batches") {
    val sparkS = spark
    import sparkS.implicits._
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = StreamOps.dedupeByPosition(
      input.toDS().toDF("seq", "ts", "pk"), "ts", "1 hour", Seq("seq"))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, t("2024-01-01 10:00:00"), "a"),
        (2L, t("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
      // replay batch: same positions re-delivered + one new
      input.addData((1L, t("2024-01-01 10:00:00"), "a"),
        (2L, t("2024-01-01 10:01:00"), "b"),
        (3L, t("2024-01-01 10:02:00"), "c"))
      q.processAllAvailable()
      val seqs = spark.table("sdedup").select("seq").collect()
        .map(_.getLong(0)).sorted
      assert(seqs.toSeq === Seq(1L, 2L, 3L),
        "each position delivered exactly once")
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension") {
    val sparkS = spark
    import sparkS.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)](spark)
    val enriched = StreamOps.enrich(
      input.toDS().toDF("user_id", "value"), dim, "user_id")
    val q = enriched.writeStream.format("memory").queryName("senrich")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (2L, 20.0), (9L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("senrich").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(rows === Map(1L -> Some("gold"), 2L -> Some("basic"),
        9L -> None), "left join keeps unmatched stream rows")
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the bound") {
    val sparkS = spark
    import sparkS.implicits._
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val buys = MemoryStream[(Long, Timestamp)](spark)
    val q = StreamOps.intervalJoin(
        clicks.toDS().toDF("user_id", "click_ts"),
        buys.toDS().toDF("user_id", "buy_ts"),
        "user_id", "click_ts", "buy_ts", "1 hour", 600)
      .select(col("l.user_id"), col("click_ts"), col("buy_ts"))
      .writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      clicks.addData((7L, t("2024-01-01 10:00:00")),
        (8L, t("2024-01-01 10:00:00")))
      buys.addData(
        (7L, t("2024-01-01 10:05:00")), // within 10 min → joins
        (8L, t("2024-01-01 11:30:00"))) // outside bound → dropped
      q.processAllAvailable()
      val rows = spark.table("sjoin").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 7L)
    } finally q.stop()
  }
}
