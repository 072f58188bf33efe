package graft

import graft.sources.{CdcLake, ChangeFeed}
import org.apache.spark.sql.functions._

class CdcLakeSpec extends SparkSpec {

  test("topic-per-table lake layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("lake").toString
    val feed = ChangeFeed.fromEvents(spark, sf)
      .select("op", "database", "tbl", "pk", "ts_us", "event_id")
    CdcLake.write(feed, dir)
    // one directory per (database, tbl)
    val tables = new java.io.File(s"$dir/database=testdb").list().sorted
    assert(tables.toSeq === Seq("tbl=click", "tbl=error", "tbl=purchase",
      "tbl=signup", "tbl=view"))
    val one = CdcLake.readTable(spark, dir, "testdb", "purchase")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("tbl#") && plan.contains("purchase"),
      "table predicate became a partition filter:\n" + plan)
    // pruned scan touches exactly the one table's rows
    val expected = feed.filter(col("tbl") === "purchase").count()
    assert(one.count() === expected)
    // and appended batches accumulate (at-rest replication log)
    CdcLake.write(feed.filter(col("tbl") === "purchase"), dir)
    assert(CdcLake.readTable(spark, dir, "testdb", "purchase").count() ===
      expected * 2)
  }
}
