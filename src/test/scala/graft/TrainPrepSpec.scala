package graft

import graft.functions.TrainPrep
import org.apache.spark.sql.functions._

class TrainPrepSpec extends SparkSpec {

  test("chunking: windows cover the doc with the configured overlap") {
    val sparkS = spark
    import sparkS.implicits._
    val doc = (1 to 100).map(i => s"w$i").mkString(" ")
    Seq((1L, doc)).toDF("doc_id", "text")
      .createOrReplaceTempView("chunk_fixture")
    val chunks = TrainPrep.tcChunking(spark, sf, size = 32, stride = 24)
    // real-table smoke: every chunk is ≤ size tokens and non-empty
    val sizes = chunks.select(size(split(col("chunk"), " ")).as("n"))
    assert(sizes.filter(col("n") > 32 || col("n") < 1).count() === 0)
    // short docs yield exactly one chunk
    val short = Tables.documents(spark, sf)
      .withColumn("n", size(split(col("text"), "\\s+")))
      .filter(col("n") <= 32).count()
    val oneChunkDocs = chunks.groupBy("doc_id").count()
      .filter(col("count") === 1).count()
    assert(oneChunkDocs >= short)
  }

  test("chunk multiset reconstructs consecutive windows") {
    val sparkS = spark
    import sparkS.implicits._
    val toks = (1 to 10).map(i => s"t$i")
    val df = Seq((9L, toks.mkString(" "))).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_fixture")
    // size 4, stride 3 over 10 tokens → chunks at 0,3,6 → 3 chunks...
    // nchunks = ceil((10-4)/3)+1 = 3
    val got = df.withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__nchunks", when(col("__n") <= 4, 1).otherwise(
        expr("CAST((__n - 4 + 3 - 1) div 3 AS INT) + 1")))
      .select(explode(expr(
        "transform(sequence(0, __nchunks - 1), " +
          "i -> array_join(slice(__toks, i * 3 + 1, 4), ' '))")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
  }

  test("decontamination flags exactly the docs sharing an n-gram with eval") {
    val sparkS = spark
    import sparkS.implicits._
    // eval doc 0 (id % 97 == 0) + one train doc copying a 5-gram from
    // it + clean train docs: only the contaminated doc is flagged
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "totally unrelated words here without overlap"),
      (2L, "prefix beta gamma delta epsilon zeta suffix"), // contaminated
      (3L, "more clean content that shares nothing at all"))
      .toDF("doc_id", "text")
    val grams = docs.select(col("doc_id"),
      explode(TrainPrep.ngramHashes(col("text"), 5)).as("g"))
    val evalG = grams.filter(col("doc_id") % 97 === 0)
      .select("g").distinct()
    val flagged = grams.filter(col("doc_id") % 97 =!= 0)
      .join(evalG, "g").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(2L))
    // docs shorter than n produce an empty gram set, not a crash
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(TrainPrep.ngramHashes(col("text"), 5).as("g"))
      .collect().head.getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("hash split: deterministic, complete, roughly 80/10/10") {
    val split1 = TrainPrep.tsHashSplit(spark, sf).collect()
    val split2 = TrainPrep.tsHashSplit(spark, sf).collect()
    assert(split1.map(_.toSeq).toSeq === split2.map(_.toSeq).toSeq,
      "identical on re-run")
    val bySplit = split1.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total === Tables.documents(spark, sf).count())
    assert(bySplit("train").toDouble / total > 0.6, s"$bySplit")
    assert(bySplit.keySet === Set("train", "val", "test"))
  }

  test("mixture: per-source keeps respect the rate schedule and re-run identically") {
    val m1 = TrainPrep.tsMixture(spark, sf).collect()
    val m2 = TrainPrep.tsMixture(spark, sf).collect()
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.nonEmpty)
    m1.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= total)
      assert(r.getAs[Long]("kept_tok") >= kept) // every doc has ≥1 token
    }
    // src0 has rate 100: nothing dropped
    val src0 = m1.find(_.getAs[String]("source") == "src0").get
    assert(src0.getAs[Long]("n_kept") === src0.getAs[Long]("n_total"))
  }

  test("shuffle shards: a complete deterministic permutation, sharded by hash") {
    val s1 = TrainPrep.tsShuffleShards(spark, sf).collect()
    val s2 = TrainPrep.tsShuffleShards(spark, sf).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
    val nDocs = Tables.documents(spark, sf).count()
    assert(s1.length.toLong === nDocs)
    assert(s1.map(_.getAs[Long]("doc_id")).distinct.length.toLong === nDocs,
      "every doc appears exactly once")
    s1.foreach { r =>
      assert(r.getAs[Long]("shard") ===
        ((r.getAs[Long]("ordkey") % 32) + 32) % 32)
    }
    // presentation order is (shard, ordkey, doc_id)
    val keys = s1.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("ordkey"),
      r.getAs[Long]("doc_id"))).toSeq
    assert(keys === keys.sorted)
    // the permutation actually shuffles: doc_id order within a shard is
    // not the identity order
    val shard0 = s1.filter(_.getAs[Long]("shard") == 0L)
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(shard0.length > 2)
    assert(shard0 !== shard0.sorted)
  }

  test("corpus stats reconcile with whole-corpus totals") {
    val stats = TrainPrep.tpCorpusStats(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(stats.map(_.getAs[Long]("n_docs")).sum === nDocs)
    stats.foreach { r =>
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tok"))
      assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
      assert(r.getAs[Long]("n_tok") >= r.getAs[Long]("n_docs"))
    }
  }

  test("reservoir top-k: exactly min(k, stratum) rows, stable reruns") {
    val k = 7
    val got = TrainPrep.tsReservoirTopk(spark, sf, k).collect()
    val strata = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val byLang = got.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet === strata.keySet.filter(strata(_) > 0))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === math.min(k.toLong, strata(lang)).toInt)
      // ranks are 1..n and hashes ascend with rank (smallest-k sample)
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ===
        (1L to rows.length.toLong))
      val hs = sorted.map(_.getAs[Long]("h")).toSeq
      assert(hs === hs.sorted)
    }
    // deterministic: a second run selects the identical sample
    val again = TrainPrep.tsReservoirTopk(spark, sf, k).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again === got.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("bpe: learned merges match a hand-computed example") {
    val sparkS = spark
    import sparkS.implicits._
    // corpus "aaab aab": chars [a,a,a,b] [a,a,b]
    // round 1: (a,a) count 3 (left-greedy overlap counts 2+1) → merge
    //   → [aa,a,b] [aa,b]
    // round 2: (aa,a) 1, (a,b) 1, (aa,b) 1 — tie, lexicographic first
    //   is (a,b) → [aa,ab] [aa,b]
    // round 3: (aa,ab) 1, (aa,b) 1 — "ab" < "b" → (aa,ab) → [aaab] [aa,b]
    val docs = Seq("aaab aab").toDF("text")
    val (learned, seqs) = TrainPrep.bpeLearn(docs, 3)
    assert(learned === Seq(("a", "a", 3L), ("a", "b", 1L),
      ("aa", "ab", 1L)))
    val finalSeqs = seqs.collect().map(_.getSeq[String](0).toList).toSet
    assert(finalSeqs === Set(List("aaab"), List("aa", "b")))
  }

  test("bpe merge table on the corpus: sane counts and real compression") {
    val rows = TrainPrep.tcBpeMerges(spark, sf, merges = 3).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    val before = rows.head.getAs[Long]("symbols_before")
    val after = rows.head.getAs[Long]("symbols_after")
    assert(after < before, "merges must compress the corpus")
    // each applied merge removes exactly one symbol; applications are
    // bounded by the learn-time pair count (overlaps apply fewer)
    assert(before - after <= rows.map(_.getAs[Long]("pair_count")).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_count") > 0)
      assert(r.getAs[String]("left").nonEmpty)
      assert(r.getAs[String]("right").nonEmpty)
    }
  }

  test("bpe encode: per-doc totals match a driver-side re-encode") {
    val rows = TrainPrep.tcBpeEncode(spark, sf, merges = 3).collect()
    assert(rows.nonEmpty)
    val (merges, _) = TrainPrep.bpeLearn(Tables.documents(spark, sf), 3)
    def encode(tok: String): Int = {
      var syms = tok.split("").toList
      merges.foreach { case (a, b, _) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.length - 1) = a + b
          else out += x
        }
        syms = out.toList
      }
      syms.length
    }
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.take(20).foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split("\\s+")
        .filter(_.nonEmpty)
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_chars") === toks.map(_.length).sum.toLong)
      assert(r.getAs[Long]("n_bpe_tokens") ===
        toks.map(encode).sum.toLong, s"doc ${r.getAs[Long]("doc_id")}")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_tokens"))
    }
  }

  test("bpe gate: exact first merge from an independent fold, green flags") {
    val row = TrainPrep.tcBpeGate(spark, sf).collect() match {
      case Array(r) => r
      case other => fail(s"gate must emit one row, got ${other.length}")
    }
    // independent driver fold: argmax adjacent char pair over the
    // token frequency table (tie-break: count desc, left, right)
    val freq = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    freq.foreach { case (tok, f) =>
      tok.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0).toString, p(1).toString)
        counts(k) = counts.getOrElse(k, 0L) + f
      }
    }
    val ((ea, eb), ec) = counts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head
    assert(row.getAs[String]("first_left") === ea)
    assert(row.getAs[String]("first_right") === eb)
    assert(row.getAs[Long]("first_count") === ec)
    assert(row.getAs[Long]("n_docs") > 0)
    assert(row.getAs[Boolean]("encode_bounds_ok"))
    assert(row.getAs[Boolean]("compressed_ok"))
    assert(row.getAs[Boolean]("decode_roundtrip_ok"))
    assert(row.getAs[Boolean]("merges_ok"))
  }

  test("quality calibration: deciles cover every doc; dup counts reconcile") {
    val rows = TrainPrep.tpQualityCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // total duplicate docs = docs whose text occurs more than once
    val dupDocs = docs.groupBy("text").count()
      .filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_dups")).sum === dupDocs)
    rows.foreach { r =>
      val d = r.getAs[Int]("decile")
      assert(d >= 0 && d <= 9)
      val frac = r.getAs[Double]("dup_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Double]("mean_tokens") > 0.0)
    }
  }

  test("padding sweep: width-32 row reconciles with the bucket report") {
    val sweep = TrainPrep.tcPaddingSweep(spark, sf).collect()
      .map(r => r.getAs[Int]("w") ->
        (r.getAs[Long]("total_tok"), r.getAs[Long]("padded_tok"))).toMap
    val buckets = TrainPrep.tcLengthBuckets(spark, sf, 32).collect()
    assert(sweep(32)._1 === buckets.map(_.getAs[Long]("total_tok")).sum)
    assert(sweep(32)._2 === buckets.map(_.getAs[Long]("padded_tok")).sum)
    // waste grows with bin width; token totals are width-independent
    val byW = sweep.toSeq.sortBy(_._1)
    assert(byW.map(_._2._1).distinct.length === 1)
    assert(byW.map(_._2._2).zip(byW.tail.map(_._2._2))
      .forall { case (a, b) => a <= b })
  }

  test("length buckets: every doc accounted, caps respected, waste sane") {
    val width = 32
    val rows = TrainPrep.tcLengthBuckets(spark, sf, width).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val total = r.getAs[Long]("total_tok")
      val padded = r.getAs[Long]("padded_tok")
      val n = r.getAs[Long]("n_docs")
      // every doc in bucket b has length in (b*W, (b+1)*W]
      assert(total > b * width * n && total <= (b + 1) * width * n)
      assert(padded === (b + 1) * width * n - total)
      val waste = r.getAs[Double]("waste_frac")
      assert(waste >= 0.0 && waste < 1.0)
    }
  }

  test("temperature mixture: sqrt weights flatten the source skew") {
    val rows = TrainPrep.tsTemperature(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Double]("weight") === math.sqrt(n.toDouble))
      assert(r.getAs[Long]("target_docs") >= 0L)
    }
    // α=0.5 compresses ratios: for any two sources, the share ratio is
    // the sqrt of the count ratio — big sources downweighted
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    val (lo, hi) = (byN.head, byN.last)
    if (lo.getAs[Long]("n_docs") < hi.getAs[Long]("n_docs")) {
      val countRatio =
        hi.getAs[Long]("n_docs").toDouble / lo.getAs[Long]("n_docs")
      val shareRatio =
        hi.getAs[Double]("share") / lo.getAs[Double]("share")
      assert(shareRatio < countRatio)
      assert(math.abs(shareRatio - math.sqrt(countRatio)) < 1e-9)
    }
  }

  test("dc2: best eval match per train doc equals a brute-force reference") {
    val got = TrainPrep.dc2FuzzyDecontamination(spark, sf).collect()
      .map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Long]("eval_id"), r.getAs[Long]("n_common"))).toMap
    val sets = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map { r =>
        val toks = r.getAs[String]("text").split("\\s+", -1)
        r.getAs[Long]("doc_id") ->
          toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val (evalS, trainS) = sets.partition(_._1 % 5 == 0)
    val expected = trainS.flatMap { case (t, st) =>
      val best = evalS.toSeq.flatMap { case (e, se) =>
        val i = (st & se).size
        val j = i.toDouble / (st.size + se.size - i)
        if (i > 0 && j >= 0.5) Some((e, i, j)) else None
      }.sortBy { case (e, _, j) => (-j, e) }.headOption
      best.map { case (e, i, _) => t -> (e, i.toLong) }
    }
    assert(got === expected,
      "cross-set prefix filtering must find every contaminated doc")
    assert(got.nonEmpty, "decontamination must not be vacuous")
  }

  test("greedy packing equals a driver fold and ignores partition layout") {
    val cap = 128
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split("\\s+", -1).length.toLong))
      .sortBy(_._1)
    // driver reference: the same greedy fold per shard
    val ref = docs.groupBy(_._1 % 16).toSeq.flatMap { case (sh, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_._1).zipWithIndex.map { case ((_, tok), i) =>
        if (i == 0) fill = tok
        else if (fill + tok <= cap) fill += tok
        else { bin += 1; fill = tok }
        (sh, bin)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def run(): Map[(Long, Long), Long] =
      TrainPrep.tpPackGreedy(spark, sf).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
          r.getAs[Long]("n_docs")).toMap
    val got = run()
    assert(got === ref, "bin assignment must equal the sequential fold")
    // every doc packed exactly once; no multi-doc bin over capacity
    assert(got.values.sum === docs.length.toLong)
    TrainPrep.tpPackGreedy(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("fits_ok"), r.toString)
    }
    // layout independence: the fold's state is keyed on shard, so the
    // shuffle partition count must not change a single bin
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      assert(run() === got, "packing must not depend on parallelism")
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }

  test("curriculum: slots are unique, strided, and shortest-first") {
    val rows = TrainPrep.tsCurriculum(spark, sf).collect()
    val slots = rows.map(_.getAs[Long]("schedule_slot"))
    assert(slots.toSet.size === rows.length, "slots must be unique")
    val nSrc = rows.map(_.getAs[String]("source")).distinct.length.toLong
    // within a source: ascending token count along the schedule
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("schedule_slot"))
      val toks = ordered.map(_.getAs[Long]("n_tok"))
      assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
      // stride structure: consecutive ranks are exactly n_src apart
      val ss = ordered.map(_.getAs[Long]("schedule_slot"))
      assert(ss.zip(ss.tail).forall { case (a, b) => b - a === nSrc })
    }
    // the first n_src slots are the per-source shortest docs
    assert(rows.filter(_.getAs[Long]("schedule_slot") < nSrc)
      .map(_.getAs[Long]("rank_in_source")).forall(_ == 1L))
  }
  test("epoch plan: demand, cap, and deficit invariants") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    val out = TrainPrep.tpEpochPlan(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val avail = r.getAs[Long]("avail_tokens")
      val desired = r.getAs[Long]("desired_tokens")
      val eff = r.getAs[Long]("eff_tokens")
      val deficit = r.getAs[Long]("deficit")
      assert(eff <= desired && eff <= 2 * avail)
      assert(deficit === desired - eff && deficit >= 0)
      assert(r.getAs[Long]("epochs_x100") === (100 * eff) / avail)
      assert(r.getAs[Boolean]("repeated") === (eff > avail))
    }
    // total demand equals the budget up to per-source floor rounding
    val docs = Tables.documents(spark, sf)
    val W = docs.select(sum(size(split(col("text"), "\\s+"))
      .cast("long"))).head.getLong(0)
    val desiredSum = out.map(_.getAs[Long]("desired_tokens")).sum
    assert(desiredSum <= 2 * W && desiredSum > 2 * W - out.length)
    // crafted fixture: tiny source is cap-bound, big one is not
    val fix = (Seq.fill(9)((1L, "w " * 99 + "w", "s_big")) :+
      (2L, "w w w w w w w w w w", "s_small"))
      .toDF("doc_id", "text", "source")
    val plan = TrainPrep.epochPlan(fix, budgetNum = 2,
      maxEpochs = 2).collect().map(r =>
        r.getAs[String]("source") -> r).toMap
    assert(plan("s_small").getAs[Long]("deficit") > 0,
      "10-token source demanded 2x corpus share must hit the 2-epoch cap")
    assert(plan("s_big").getAs[Long]("deficit") === 0)
  }

  test("fertility: per-lang sums reconcile with the raw token counts") {
    import org.apache.spark.sql.functions._
    val f = graft.functions.TextAnalysis.tcFertility(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(f.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val wsTotal = docs.select(sum(
      size(graft.functions.TextAnalysis.wsTokens(col("text"))).cast("long")))
      .head.getLong(0)
    assert(f.map(_.getAs[Long]("ws_tokens")).sum === wsTotal)
    f.foreach { r =>
      assert(r.getAs[Double]("fertility") >=
        r.getAs[Long]("bpe_tokens").toDouble /
          r.getAs[Long]("ws_tokens").toDouble - 1e-12)
      assert(r.getAs[Double]("bytes_per_token") > 0)
    }
  }


  test("dc4: Bloom-pruned decontamination is bit-identical to the exact join") {
    import graft.functions.TrainPrep
    val exact = TrainPrep.dcDecontamination(spark, sf).collect()
    val pruned = TrainPrep.dc4BloomDecontamination(spark, sf).collect()
    assert(pruned.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      exact.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // the prune must actually prune: grams surviving the Bloom are a
    // small fraction of all train grams (FP rate ~0.4% + true matches)
    val docs = Tables.documents(spark, sf)
    val grams = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.explode(
        TrainPrep.ngramHashes(
          org.apache.spark.sql.functions.col("text"), 3)).as("g"))
    val evalG = grams
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
      .select("g").distinct()
    val bloom = graft.operators.RuntimeFilter.buildBloomCached(evalG, "g")
    assert(bloom.isDefined)
    val train = grams
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0)
    val total = train.count()
    val passed = graft.operators.RuntimeFilter
      .bloomFiltered(train, org.apache.spark.sql.functions.col("g"), bloom)
      .count()
    assert(passed < total / 2,
      s"Bloom passed $passed of $total train grams - not pruning")
  }

  test("dc5: bands partition the train set and reconcile with dc") {
    val out = TrainPrep.dc5OverlapFraction(spark, sf).collect()
    val trainDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0).count()
    // LEFT join: every train doc surfaces exactly once, clean included
    assert(out.length.toLong === trainDocs)
    val dc = TrainPrep.dcDecontamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val total = r.getAs[Long]("n_total")
      val shared = r.getAs[Long]("n_shared")
      val band = r.getAs[String]("band")
      assert(shared >= 0 && shared <= total, s"doc $id counts")
      val expect =
        if (shared == 0) "clean"
        else if (shared * 5 < total) "light"
        else if (shared * 2 < total) "medium"
        else "heavy"
      assert(band === expect, s"doc $id band")
      // the binary dc query is the n_shared > 0 slice of this one
      assert(dc.getOrElse(id, 0L) === shared, s"doc $id vs dc")
    }
    assert(out.exists(_.getAs[String]("band") == "clean") &&
      out.exists(_.getAs[String]("band") != "clean"),
      "bands must be non-degenerate on the synthetic corpus")
  }

  test("span ladder: cascade flags equal direct per-rung recomputation") {
    import graft.functions.TrainPrep
    val docs = Tables.documents(spark, sf)
    val out = TrainPrep.dc6SpanLadder(spark, sf).collect()
    val nonEval = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(out.length.toLong === nonEval, "one row per train doc")
    assert(out.forall(r => Set(0, 3, 6, 12, 24)(r.getAs[Int]("max_rung"))))
    // direct (cascade-free) per-rung membership must agree — checks the
    // monotone-prune optimization never drops a legitimately flagged doc
    for (n <- Seq(3, 24)) {
      val grams = docs.select(col("doc_id"),
        explode(TrainPrep.ngramHashes(col("text"), n)).as("g"))
      val evalG = grams.filter(col("doc_id") % 97 === 0)
        .select("g").distinct()
      val direct = grams.filter(col("doc_id") % 97 =!= 0)
        .join(evalG, "g").select("doc_id").distinct().collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val ladder = out.filter(_.getAs[Int]("max_rung") >= n)
        .map(_.getAs[Long]("doc_id")).toSet
      assert(ladder === direct, s"rung $n membership")
    }
  }

  test("source quota: native heap selection equals the window twin") {
    import org.apache.spark.sql.expressions.Window
    val cap = 10
    val scored = Tables.documents(spark, sf).select(
      col("doc_id"), col("source"), col("n_chars"),
      graft.functions.TextAnalysis.qualityScoreCol(col("text"))
        .as("score"))
    val twin = scored.withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= cap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").as("chars_kept"),
        min("score").as("admit_score"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"),
          r.getAs[Double]("admit_score")))).toMap
    val got = TrainPrep.tpSourceQuota(spark, sf, cap).collect()
    assert(got.length === twin.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (nk, ck, as_) = twin(src)
      assert(r.getAs[Long]("n_kept") === nk, s"$src n_kept")
      assert(r.getAs[Long]("chars_kept") === ck, s"$src chars_kept")
      assert(r.getAs[Double]("admit_score") === as_, s"$src admit_score")
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped"), src)
      assert(r.getAs[Long]("n_kept") <= cap.toLong, src)
    }
  }

  test("filter funnel: stages chain, counts reconcile, gates discriminate") {
    val rows = TrainPrep.tpFilterFunnel(spark, sf).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("gopher", "repetition", "decontaminate", "quality"))
    val total = Tables.documents(spark, sf).count()
    assert(rows.head.getAs[Long]("n_in") === total, "stage 1 sees the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") ===
        r.getAs[Long]("n_dropped") + r.getAs[Long]("n_out"),
        s"${r.getAs[String]("stage")} counts reconcile")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"),
        s"${b.getAs[String]("stage")} n_in continues ${a.getAs[String]("stage")} n_out")
    }
    // the funnel must neither pass everything nor kill everything
    assert(rows.last.getAs[Long]("n_out") > 0, "survivors exist")
    assert(rows.head.getAs[Long]("n_dropped") > 0, "gopher gate is live")
    // survivor checksum sanity: min ≤ max, sum within [min·n, max·n]
    val last = rows.last
    val (n, s, mn, mx) = (last.getAs[Long]("n_out"),
      last.getAs[Long]("surv_id_sum"), last.getAs[Long]("surv_id_min"),
      last.getAs[Long]("surv_id_max"))
    assert(mn <= mx && s >= mn * n && s <= mx * n)
  }

  test("bpe sampling: fraction 1.0 reproduces full-corpus training; " +
    "a sub-1.0 sample still yields a valid merge table") {
    val docs = Tables.documents(spark, sf)
    val full = TrainPrep.bpeLearn(docs, merges = 4)._1
    assert(TrainPrep.bpeLearn(docs, merges = 4, sampleFraction = 1.0)._1
      === full, "fraction 1.0 must be the unsampled fold")
    val sampled =
      TrainPrep.bpeLearn(docs, merges = 4, sampleFraction = 0.5)._1
    assert(sampled.size === 4, "the sample still learns every merge")
    assert(sampled.forall(_._3 > 0), "sampled pair counts positive")
    // validity of the SAMPLED table when encoding the FULL corpus —
    // the production shape (train on a sample, apply everywhere):
    // decode roundtrip (no symbol lost/duplicated), per-doc count
    // bounds, corpus-level compression
    val vocab = TrainPrep.bpeEncodeVocab(docs, sampled)
    val broken = vocab
      .filter(concat_ws("", col("syms")) =!= col("tok")).count()
    assert(broken === 0L, "sampled-table decode round-trips")
    val enc = TrainPrep.bpeEncodeWith(docs, sampled)
    val badBounds = enc.filter(col("n_tokens") > col("n_bpe_tokens") ||
      col("n_bpe_tokens") > col("n_chars")).count()
    assert(badBounds === 0L, "encode bounds hold under the sampled table")
    val Array(bpe, chars) = enc
      .agg(sum("n_bpe_tokens"), sum("n_chars")).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    assert(bpe < chars, "sampled merges still compress the full corpus")
    // determinism: the hash sample is reproducible run-to-run
    assert(TrainPrep.bpeLearn(docs, merges = 4, sampleFraction = 0.5)._1
      === sampled)
  }

  test("filter funnel: all 4 stage rows materialize even when a gate " +
    "kills the whole corpus (oracle's fixed shape)") {
    val sparkS = spark
    import sparkS.implicits._
    // Two tiny docs that fail the gopher battery (too short), so every
    // downstream stage's entering set is empty. A filter-first plan
    // would return 1 row here; the gated-sum plan returns all 4.
    val degenerate = Seq((1L, "zz zz"), (2L, "qq")).toDF("doc_id", "text")
    val rows = TrainPrep.tpFilterFunnelFrom(degenerate).collect()
    assert(rows.length === 4, "fixed 4-row report shape")
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("gopher", "repetition", "decontaminate", "quality"))
    assert(rows.head.getAs[Long]("n_in") === 2L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") === 0L, r.getAs[String]("stage"))
      assert(r.getAs[Long]("n_in") ===
        r.getAs[Long]("n_dropped") + r.getAs[Long]("n_out"))
      assert(r.isNullAt(r.fieldIndex("surv_id_min")), "no survivors")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"))
    }
  }

  test("split-decon: kept train shares no n-gram STRING with test " +
    "(independent of the hash path)") {
    val sparkS = spark
    import sparkS.implicits._
    val res = TrainPrep.tsSplitDecontaminated(spark, sf, n = 5)
    val docs = Tables.documents(spark, sf)
      .withColumn("split", TrainPrep.splitCol("doc_id"))
    // every val/test doc is kept with n_shared 0
    assert(res.filter(col("split") =!= "train" &&
      (!col("kept") || col("n_shared") =!= 0L)).count() === 0)
    // train: kept ⟺ n_shared = 0
    assert(res.filter(col("split") === "train" &&
      col("kept") =!= (col("n_shared") === 0L)).count() === 0)
    // independent STRING-gram recomputation: no kept train doc may
    // share a literal 5-gram with any test doc (catches both a hash
    // bug and a split divergence)
    def gramStrings(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", split(col("text"), "\\s+"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("split"),
        explode(expr("transform(sequence(0, size(toks) - 5), " +
          "i -> array_join(slice(toks, i + 1, 5), ' '))")).as("g"))
    val grams = gramStrings(docs)
    val testG = grams.filter(col("split") === "test").select("g").distinct()
    val keptTrain = res.filter(col("split") === "train" && col("kept"))
      .select("doc_id")
    val leaks = grams.filter(col("split") === "train")
      .join(keptTrain, "doc_id").join(testG, "g").count()
    assert(leaks === 0L, "kept train docs share no literal 5-gram with test")
    // and the guard is non-vacuous: something was dropped
    assert(res.filter(col("split") === "train" && !col("kept")).count() > 0)
  }
}
