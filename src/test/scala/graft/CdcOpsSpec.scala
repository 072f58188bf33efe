package graft

import graft.model.Cdc
import graft.operators.CdcOps
import graft.sources.{ChangeFeed, Snapshot}
import org.apache.spark.sql.functions._

class CdcOpsSpec extends SparkSpec {

  test("S2: every event decodes to exactly one op, bytes match model") {
    val decoded = CdcOps.s2EventDecode(spark, sf)
    val ops = decoded.groupBy("op", "mtype").count().collect()
      .map(r => r.getString(0) -> r.getByte(1)).toMap
    assert(ops == Map("insert" -> 1, "update" -> 2, "delete" -> 3))
    assert(ops.forall { case (op, b) => Cdc.opToByte(op) == b &&
      Cdc.byteToOp(b) == op })
  }

  test("S11 splitter: even division, remainder spread, closed last bound") {
    // 10 keys into 3 splits → sizes 4,3,3 covering [0,9]
    assert(Snapshot.splitRanges(0, 9, 3) ===
      Seq((0L, 3L), (4L, 6L), (7L, 9L)))
    // splitLimit forces more splits: 100 keys, limit 10 → 10 splits
    val limited = Snapshot.splitRanges(1, 100, 3, splitLimit = 10)
    assert(limited.length === 10)
    assert(limited.forall { case (lo, hi) => hi - lo + 1 <= 10 })
    // degenerate domain: fewer keys than splits
    assert(Snapshot.splitRanges(5, 6, 5) === Seq((5L, 5L), (6L, 6L)))
    // full coverage, no overlap
    val r = Snapshot.splitRanges(7, 3000, 7)
    assert(r.head._1 === 7 && r.last._2 === 3000)
    assert(r.sliding(2).forall { case Seq(a, b) => a._2 + 1 == b._1 })
  }

  test("S11: split ids partition all rows into numSplits buckets") {
    val split = Snapshot.withSplitId(Tables.customer(spark, sf), "c_custkey", 5)
    val ids = split.select("split_id").distinct().collect().map(_.getInt(0)).sorted
    assert(ids.toSeq === Seq(0, 1, 2, 3, 4))
    assert(split.count() === Tables.customer(spark, sf).count())
  }

  test("S11: NULL keys land in the sentinel split, no row dropped") {
    val sparkS = spark
    import sparkS.implicits._
    // 3 numeric keys + 2 NULL-keyed rows (reference emits an explicit
    // `col IS NULL` split — IntegerSplitter.scala:27-28,65)
    val df = Seq(Some(1L), Some(5L), Some(9L), None, None)
      .toDF("k")
    val split = Snapshot.withSplitId(df, "k", 3)
    assert(split.count() === 5, "NULL-keyed rows are snapshotted too")
    val byId = split.groupBy("split_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byId(3) === 2, "split_id = numSplits is the NULL split")
    assert((0 to 2).map(i => byId.getOrElse(i, 0L)).sum === 3)
  }

  test("F1: include-event condition is a pushed-down SQL predicate") {
    val feed = ChangeFeed.fromEvents(spark, sf)
    val kept = ChangeFeed.includeEvents(feed, "tbl <> 'error'")
    assert(kept.filter(col("tbl") === "error").count() === 0)
    assert(kept.count() < feed.count())
  }

  test("P3/F3: first per-user change has no before-image; rest chain") {
    val images = CdcOps.p3UpdateImages(spark, sf)
    val withNull = images.filter(col("old_value").isNull).count()
    val omitted = CdcOps.f3NullOmission(spark, sf).count()
    assert(omitted === images.count() - withNull)
  }

  test("P6: fan-out multiplies rows by vector length") {
    val n = Tables.embeddings(spark, sf).count()
    assert(CdcOps.p6RowFanout(spark, sf).count() === n * 64)
  }

  test("P9: composite pk joins values with '.'") {
    val r = CdcOps.p9PkString(spark, sf).limit(1).collect().head
    assert(r.getAs[String]("pk") ===
      s"${r.getAs[Long]("l_orderkey")}.${r.getAs[Int]("l_linenumber")}")
  }

  test("S12: snapshot and live feed share one envelope") {
    val u = CdcOps.s12SnapshotUnion(spark, sf)
    assert(u.columns.toSeq ===
      Seq("op", "mtype", "database", "tbl", "pk", "ts_us"))
    // snapshot rows are ts-less inserts; live rows all carry timestamps
    assert(u.filter(col("ts_us").isNull && col("op") =!= "insert").count() === 0)
  }

  test("T15: tx size histogram accounts every mutation; spans consistent") {
    val rows = graft.operators.TxOps.t15TxSizeStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.ChangeFeed.fromEvents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_mutations")).sum === total,
      "every feed mutation belongs to exactly one transaction")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_mutations") ===
        r.getAs[Long]("sz") * r.getAs[Long]("n_txs"))
      assert(r.getAs[Double]("mean_span_us") <=
        r.getAs[Long]("max_span_us").toDouble)
      if (r.getAs[Long]("sz") === 1L)
        assert(r.getAs[Long]("max_span_us") === 0L,
          "single-mutation transactions span zero time")
    }
  }
}
