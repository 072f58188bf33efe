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

  test("batch tumbling buckets cover every event exactly once") {
    val buckets = WindowedAgg.t10TumblingWindow(spark, sf)
    val total = buckets.agg(sum("n")).collect().head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    assert(buckets.filter(col("bucket_start_us") % 3600000000L =!= 0)
      .count() === 0)
  }
}
