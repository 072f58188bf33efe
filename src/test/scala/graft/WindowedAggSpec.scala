package graft

import java.sql.Timestamp

import graft.streaming.WindowedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class WindowedAggSpec extends SparkSpec {

  test("watermarked tumbling windows finalize and drop late events") {
    val sparkS = spark
    import sparkS.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val events = input.toDS().toDF("ts", "event_type")
    val q = WindowedAgg.tumblingCounts(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // two events in the 10:00 window
      input.addData((t("2024-01-01 10:05:00"), "click"),
        (t("2024-01-01 10:20:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("wagg").count() === 0,
        "window not finalized until watermark passes")
      // an event far ahead advances the watermark beyond 10:00+1h+30m
      input.addData((t("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      val fin = spark.table("wagg").collect()
      assert(fin.length === 1)
      assert(fin.head.getAs[Long]("n") === 2)
      assert(fin.head.getAs[Timestamp]("window_start") ===
        t("2024-01-01 10:00:00"))
      // a late event for the finalized 10:00 window is dropped
      input.addData((t("2024-01-01 10:40:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("wagg").count() === 1, "late event dropped")
    } finally q.stop()
  }

  test("sliding windows: every event lands in exactly length/step windows") {
    val sparkS = spark
    import sparkS.implicits._
    // streaming semantics cross-check: Spark's native sliding window
    // assigns the same 2 window-starts as the batch analog's explode
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (Timestamp.valueOf("2024-01-01 10:40:00"), "view"))
      .toDF("ts", "event_type")
    val native = events
      .select(col("event_type"),
        window(col("ts"), "1 hour", "30 minutes").as("w"))
      .select(col("event_type"), unix_micros(col("w.start")).as("ws"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val analog = events
      .withColumn("b", expr("unix_micros(ts) div 1800000000L"))
      .select(col("event_type"),
        explode(array(col("b") * 1800000000L,
          (col("b") - 1) * 1800000000L)).as("ws"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native === analog,
      "batch analog reproduces native sliding-window assignment")
    // and the declared query's totals double-count exactly
    val t13 = WindowedAgg.t13SlidingWindow(spark, sf)
    val total = t13.agg(sum("n")).collect().head.getLong(0)
    assert(total === 2 * Tables.events(spark, sf).count())
  }

  test("batch tumbling buckets cover every event exactly once") {
    val buckets = WindowedAgg.t10TumblingWindow(spark, sf)
    val total = buckets.agg(sum("n")).collect().head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    assert(buckets.filter(col("bucket_start_us") % 3600000000L =!= 0)
      .count() === 0)
  }
}
