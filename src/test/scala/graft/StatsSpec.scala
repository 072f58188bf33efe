package graft

import graft.functions.LangModel
import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("st1: regression moments agree with a driver-side exact fold") {
    val rows = Stats.st1Linreg(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per flag from raw rows with exact BigInt moments
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        floor(col("l_discount") * lit(10000.0d) + lit(0.5d)).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val xs = raw(flag)
      val n = BigInt(xs.length)
      val sx = xs.map(t => BigInt(t._2)).sum
      val sy = xs.map(t => BigInt(t._3)).sum
      val sxx = xs.map(t => BigInt(t._2) * t._2).sum
      val syy = xs.map(t => BigInt(t._3) * t._3).sum
      val sxy = xs.map(t => BigInt(t._2) * t._3).sum
      val covN = (n * sxy - sx * sy).toDouble
      val varxN = (n * sxx - sx * sx).toDouble
      val varyN = (n * syy - sy * sy).toDouble
      assert(r.getAs[Long]("n") === xs.length.toLong)
      // BigInt path is exact; the engine's double formula must land
      // within relative 1e-12 of it (the formulas differ only in
      // rounding of the conversions)
      val slope = r.getAs[Double]("slope_bp_per_unit")
      assert(math.abs(slope - covN / varxN) <=
        1e-12 * math.abs(slope).max(1e-300))
      val pr = r.getAs[Double]("pearson_r")
      assert(math.abs(pr) <= 1.0 + 1e-12)
      assert(math.abs(pr - covN / (math.sqrt(varxN) * math.sqrt(varyN)))
        <= 1e-9)
    }
  }

  test("g6: mode is the argmax of the value histogram") {
    val rows = Stats.g6Mode(spark, sf).collect()
    assert(rows.nonEmpty)
    val hist = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (f, vs) =>
        f -> vs.groupBy(_._2).map { case (q, g) => (q, g.length.toLong) }
      }
    rows.foreach { r =>
      val h = hist(r.getAs[String]("l_returnflag"))
      val best = h.toSeq.sortBy { case (q, c) => (-c, q) }.head
      assert(r.getAs[Long]("mode_qty") === best._1)
      assert(r.getAs[Long]("n_mode") === best._2)
    }
  }

  test("w5: rank stats match their definitions on a total order") {
    val rows = Stats.w5RankStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byPrio.foreach { case (_, rs) =>
      val n = rs.length
      val sorted = rs.sortBy(r =>
        (-r.getAs[Long]("price_cents"), r.getAs[Long]("o_orderkey")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("rnk") === i + 1) // no ties: rank == row pos
        assert(r.getAs[Int]("drnk") === i + 1)
        val expPr = if (n == 1) 0.0 else i.toDouble / (n - 1).toDouble
        assert(r.getAs[Double]("pct_rank") === expPr)
        assert(r.getAs[Double]("cume") === (i + 1).toDouble / n.toDouble)
      }
    }
  }

  test("gr: pagerank conserves mass (up to floor slack) and ranks hubs") {
    val rows = Stats.grPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_ppm")).sum
    // every floor division only discards mass; three iterations over
    // |nodes| + |edges| terms can't lose more than a few hundred ppm
    assert(total <= 1000000L)
    assert(total >= 1000000L - 1000L * rows.length)
    assert(rows.forall(_.getAs[Long]("rank_ppm") > 0))
    // output is ordered by rank desc
    val ranks = rows.map(_.getAs[Long]("rank_ppm")).toSeq
    assert(ranks === ranks.sorted.reverse)
  }

  test("knn: graph edges are the per-source top-k within buckets") {
    val g = functions.Similarity
      .knnGraph(Tables.embeddings(spark, sf), 3).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getAs[Long]("src_id")).foreach { case (_, es) =>
      assert(es.length <= 3)
      val ranks = es.map(_.getAs[Long]("rnk")).sorted
      assert(ranks === (1L to es.length.toLong).toArray)
      // descending cosine along ranks
      val byRank = es.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lm: bigram scores are smoothed probabilities in (0, 1]") {
    val rows = LangModel.tcBigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("mean_p")
      assert(p > 0.0 && p <= 1.0)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
    // a doc made of the corpus' most common transitions should outscore
    // the average doc: check the max is well above the mean
    val ps = rows.map(_.getAs[Double]("mean_p"))
    assert(ps.max > ps.sum / ps.length)
  }

  test("w7: DAU/WAU match a driver-side rolling set union") {
    val rows = Stats.w7RollingActives(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        graft.operators.QueryUtil.floorDiv(
          expr("unix_micros(ts)"), 86400000000L).as("day"),
        col("user_id")).collect()
      .groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .view.mapValues(_.map(_.getAs[Long]("user_id")).toSet).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val days = rs.map(_.getAs[Long]("day")).sorted
      rs.foreach { r =>
        val d = r.getAs[Long]("day")
        val winDays = days.filter(x => x <= d && x > d - 7)
        // ROWS -6: the window holds the last up-to-7 OBSERVED days;
        // observed days here are contiguous, so day arithmetic agrees
        val winIdx = days.indexOf(d)
        val win = days.slice(math.max(0, winIdx - 6), winIdx + 1)
        assert(win.toSet === winDays.toSet, s"days are contiguous at $t")
        val wau = win.flatMap(x => daily((t, x))).toSet.size
        assert(r.getAs[Int]("dau") === daily((t, d)).size)
        assert(r.getAs[Int]("wau") === wau, s"type $t day $d")
      }
    }
  }

  test("w7b: sketch gate matches the exact twin with green error flags") {
    val exact = Stats.w7RollingActives(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Int]("dau"), r.getAs[Int]("wau"))).toMap
    val est = Stats.w7bRollingActivesSketch(spark, sf).collect()
    assert(est.length === exact.size, "sketch twin must cover every row")
    // lgK=14 → rel. std. error 1.04/√2^14 ≈ 0.8%; the 5σ ≈ 4% flag
    // bound never trips in practice, and a systematic bug (wrong
    // window, wrong grouping) misses by far more than that
    est.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val (dau, wau) = exact(key)
      assert(r.getAs[Int]("dau") === dau, s"$key exact dau")
      assert(r.getAs[Int]("wau") === wau, s"$key exact wau")
      assert(r.getAs[Boolean]("dau_ok"), s"$key dau estimate out of bound")
      assert(r.getAs[Boolean]("wau_ok"), s"$key wau estimate out of bound")
    }
  }

  test("st2: moments match a driver-side exact-sum recompute") {
    val rows = Stats.st2Moments(spark, sf).collect()
    assert(rows.nonEmpty)
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    rows.foreach { r =>
      val xs = qty(r.getAs[String]("l_returnflag"))
      val n = xs.length.toDouble
      val mu = xs.sum.toDouble / n
      val e2 = xs.map(x => x * x).sum.toDouble / n
      val e3 = xs.map(x => x * x * x).sum.toDouble / n
      val e4 = xs.map(x => x * x * x * x).sum.toDouble / n
      val m2 = e2 - mu * mu
      val m3 = e3 - 3.0 * mu * e2 + 2.0 * mu * mu * mu
      val m4 = e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2 -
        3.0 * mu * mu * mu * mu
      assert(r.getAs[Double]("skewness") === m3 / (math.sqrt(m2) * m2))
      assert(r.getAs[Double]("excess_kurtosis") === m4 / (m2 * m2) - 3.0)
      // uniform-ish quantities: near-zero skew, platykurtic
      assert(math.abs(r.getAs[Double]("skewness")) < 0.5)
      assert(r.getAs[Double]("excess_kurtosis") < 0.0)
    }
  }

  test("w8: top-80% customer counts match a driver-side recompute") {
    val rows = Stats.w8Pareto(spark, sf).collect()
    assert(rows.nonEmpty)
    val perCust = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(graft.operators.QueryUtil.cents(col("o_totalprice")))
        .cast("long").as("rev"))
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "o_custkey", "rev").collect()
      .groupBy(_.getAs[String]("n_name"))
    rows.foreach { r =>
      val n = r.getAs[String]("n_name")
      val revs = perCust(n)
        .map(x => (x.getAs[Long]("rev"), x.getAs[Long]("o_custkey")))
        .sortBy { case (rev, ck) => (-rev, ck) }.map(_._1)
      assert(r.getAs[Long]("n_customers") === revs.length.toLong)
      val total = revs.sum
      assert(r.getAs[Long]("total_cents") === total)
      var cumPrev = 0L
      val nTop = revs.takeWhile { rev =>
        val keep = cumPrev * 5 < total * 4; cumPrev += rev; keep
      }.length
      assert(r.getAs[Long]("n_top80") === nTop.toLong, s"nation $n")
    }
  }

  test("w6: rolling median matches a driver-side sorted-window recompute") {
    val rows = Stats.w6RollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val byDay = rs.sortBy(_.getAs[Long]("day"))
      val ns = byDay.map(_.getAs[Long]("n"))
      byDay.zipWithIndex.foreach { case (r, i) =>
        val win = ns.slice(math.max(0, i - 6), i + 1).sorted
        val m = win.length
        val med = (win((m + 1) / 2 - 1) + win(m / 2)).toDouble / 2.0
        assert(r.getAs[Double]("med7") === med,
          s"type $t day ${r.getAs[Long]("day")}")
      }
    }
  }

  test("gr_cc: components equal a union-find reference; singletons kept") {
    val out = Stats.grCc(spark, sf).collect()
    assert(out.nonEmpty)
    // rebuild the same graph driver-side and run textbook union-find
    val fl = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_quantity") >= 48)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = fl.map(_._2).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    fl.groupBy(_._1).values.foreach { items =>
      val ps = items.map(_._2).distinct
      ps.tail.foreach { p =>
        val (a, b) = (find(ps.head), find(p))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
    }
    // canonical label = min id per component (find compresses to it
    // because unions always point the larger root at the smaller)
    val expected = nodes.map(n => n -> find(n)).toMap
    val sizes = expected.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(out.length === nodes.length)
    out.foreach { r =>
      val p = r.getAs[Long]("part_id")
      assert(r.getAs[Long]("comp_id") === expected(p), s"part $p label")
      assert(r.getAs[Long]("comp_size") === sizes(expected(p)).toLong,
        s"part $p size")
    }
    // the graph is non-trivial: some multi-node components AND singletons
    assert(sizes.values.exists(_ > 1) && sizes.values.exists(_ == 1))
  }

  test("st3: robust stats equal a driver-side median/MAD reference") {
    val out = Stats.st3Robust(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out.length === byLang.size)
    // exact doubled median: integral for both parities
    def median2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    var sawOutlier = false
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val xs = byLang(lang)
      val med2 = median2(xs)
      val d2 = xs.map(x => math.abs(2 * x - med2))
      val mad4 = median2(d2)
      val nOut = d2.count(d => d * 10000 > mad4 * 22239).toLong
      assert(r.getAs[Long]("n") === xs.length.toLong, s"$lang n")
      assert(r.getAs[Long]("med2") === med2, s"$lang med2")
      assert(r.getAs[Long]("mad4") === mad4, s"$lang mad4")
      assert(r.getAs[Long]("n_outliers") === nOut, s"$lang outliers")
      if (nOut > 0) sawOutlier = true
      // Hampel count is a strict subset of the group
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n"))
    }
    assert(out.map(_.getAs[Long]("mad4")).forall(_ >= 0))
  }
}
