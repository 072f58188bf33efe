package graft

import graft.functions.{FuzzyFunctions, FuzzyMatch, FuzzyRuntime}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Damerau-Levenshtein / Jaro-Winkler kernels + the fj2/fj3 blocked
  * fuzzy joins.
  */
class FuzzyMatchSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    FuzzyRuntime.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  private def jw(a: String, b: String): Double =
    FuzzyRuntime.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  /** Plain Levenshtein, independent DP — an upper bound for DL. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("damerau kernel: textbook pins, incl. the unrestricted variant") {
    assert(dl("", "") === 0)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("abc", "abc") === 0)
    // adjacent transposition is ONE edit (Levenshtein says two)
    assert(dl("ab", "ba") === 1)
    assert(lev("ab", "ba") === 2)
    assert(dl("small ring", "small rign") === 1)
    // unrestricted (Lowrance-Wagner), NOT the OSA restriction:
    // CA → AC → ABC edits the transposed pair again. OSA would say 3.
    // This is the variant DuckDB's damerau_levenshtein implements.
    assert(dl("CA", "ABC") === 2)
    assert(dl("a cat", "an act") === 2)
    assert(dl("kitten", "sitting") === 3)
    // the O(n*m) DP matrix is guarded: document-length inputs must
    // fail fast with the remedy, not allocate gigabytes per row-pair
    val big = "x" * (graft.functions.FuzzyRuntime.MaxEditDistanceLen + 1)
    val ex = intercept[IllegalArgumentException] { dl(big, "abc") }
    assert(ex.getMessage.contains("MinHash"),
      "guard message should point at the scale-appropriate alternative")
    assert(dl("y" * graft.functions.FuzzyRuntime.MaxEditDistanceLen
      take 64, "abc") > 0) // at/under the bound still computes
  }

  test("damerau bound is session-configurable and exact at the boundary") {
    def dl(a: String, b: String): Int = graft.functions.FuzzyRuntime
      .damerau(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val prev = spark.conf.getOption("graft.fuzzy.maxEditDistanceLen")
    spark.conf.set("graft.fuzzy.maxEditDistanceLen", "128")
    try {
      // exactly AT the configured bound computes ...
      assert(dl("x" * 128, "x" * 127 + "y") === 1)
      // ... one past it fails fast, naming the conf to raise
      val ex = intercept[IllegalArgumentException] { dl("x" * 129, "ab") }
      assert(ex.getMessage.contains("graft.fuzzy.maxEditDistanceLen"))
      assert(ex.getMessage.contains("128"))
      // raising the conf buys the same input back in
      spark.conf.set("graft.fuzzy.maxEditDistanceLen", "200")
      assert(dl("x" * 129, "x" * 129) === 0)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.fuzzy.maxEditDistanceLen", v)
      case None => spark.conf.unset("graft.fuzzy.maxEditDistanceLen")
    }
  }

  test("damerau kernel: metric + bound invariants under seeded fuzz") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    for (_ <- 1 to 2000) {
      val (a, b, c) = (word(), word(), word())
      val ab = dl(a, b)
      assert(ab === dl(b, a), s"symmetry: '$a' '$b'")
      assert(ab >= math.abs(a.length - b.length), s"lower bound: '$a' '$b'")
      assert(ab <= lev(a, b), s"levenshtein upper bound: '$a' '$b'")
      assert(ab <= dl(a, c) + dl(c, b), s"triangle: '$a' '$b' via '$c'")
      assert((ab == 0) === (a == b), s"identity: '$a' '$b'")
    }
  }

  test("jaro-winkler kernel: pins to DuckDB reference values") {
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-9
    // values from duckdb jaro_winkler_similarity on the same pairs
    assert(close(jw("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(jw("DWAYNE", "DUANE"), 0.84))
    assert(close(jw("TRATE", "TRACE"), 0.9066666666666667))
    assert(jw("abcdef", "abcdef") === 1.0)
    // DuckDB convention: either side empty (incl. both) → 0.0
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("zzz", "qqq") === 0.0)
    // boost applies only above jaro 0.7: this pair shares prefix "ab"
    // but sits at jaro 0.5 — winkler must leave it untouched
    assert(close(jw("abxxxxxx", "abyyyyyy"), 0.5))
    // prefix boost caps at 4 shared characters
    val j = jw("abcdexxxx", "abcdeyyyy")
    val base = (2.0 * 5.0 / 9.0 + 1.0) / 3.0
    assert(close(j, base + 4 * 0.1 * (1.0 - base)))
  }

  test("jaro-winkler kernel: symmetry, range, identity under fuzz") {
    val rnd = new scala.util.Random(7)
    def word(): String =
      (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (word(), word())
      val s = jw(a, b)
      assert(s === jw(b, a), s"symmetry: '$a' '$b'")
      assert(s >= 0.0 && s <= 1.0, s"range: '$a' '$b' -> $s")
      if (a.nonEmpty) assert(jw(a, a) === 1.0, s"identity: '$a'")
    }
  }

  test("expressions: null-safe, fused into whole-stage codegen") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(("ab", "ba"), (null, "x"), ("small ring", "small rign"))
      .toDF("a", "b")
      .select(FuzzyFunctions.damerau_levenshtein(col("a"), col("b"))
        .as("d"),
        FuzzyFunctions.jaro_winkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 1)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getInt(0) === 1 && rows(2).getDouble(1) > 0.9)
    val scan = Tables.part(spark, sf)
      .select(FuzzyFunctions.damerau_levenshtein(col("p_name"),
        col("p_brand")).as("d"),
        FuzzyFunctions.jaro_winkler(col("p_name"), col("p_brand")).as("s"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [damerau_levenshtein"),
      s"expected damerau_levenshtein fused into codegen:\n$plan")
    assert(plan.contains("jaro_winkler"), s"expected jaro_winkler:\n$plan")
  }

  test("SQL catalog exposes both functions") {
    GraftCatalog.install(spark, sf)
    val r = spark.sql(
      "SELECT damerau_levenshtein('ab', 'ba') AS d, " +
        "jaro_winkler('MARTHA', 'MARHTA') AS s").head()
    assert(r.getInt(0) === 1)
    assert(math.abs(r.getDouble(1) - 0.9611111111111111) < 1e-9)
  }

  test("fj2: every probe recovers its source part at distance ≤ 1") {
    val out = FuzzyMatch.fj2DamerauJoin(spark, sf).collect()
    assert(out.nonEmpty)
    val probes = Tables.part(spark, sf)
      .filter(col("p_partkey") % 400 === 0).count()
    val selfPairs = out.filter(r => r.getLong(0) == r.getLong(1))
    assert(selfPairs.length === probes,
      "each planted typo must match its own part")
    assert(selfPairs.forall(_.getInt(2) <= 1))
  }

  test("fj3: self-match scores highest and clears the 0.9 gate") {
    val rows = FuzzyMatch.fj3JaroWinklerJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (probe, ms) =>
      val self = ms.find(_.getLong(1) == probe)
      assert(self.isDefined, s"probe $probe lost its own part")
      assert(ms.forall(_.getLong(2) <= self.get.getLong(2)),
        s"probe $probe: a foreign part outscored the source")
    }
  }

  test("fj2/fj3 plans: blocked hash joins, no cartesian fallback") {
    for (q <- Seq(FuzzyMatch.fj2DamerauJoin _, FuzzyMatch.fj3JaroWinklerJoin _)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"fuzzy join must stay blocked:\n$plan")
    }
  }

  // ── blocking auto-selection (FuzzyBlocking) ───────────────────────────

  /** High-entropy corpus: 32-char hex ids. All names share one length,
    * so the band lever degenerates to one giant block, while a chunk
    * key (~10 hex chars) is near-unique — the corpus shape where the
    * round-11-rejected pigeonhole lever genuinely wins. */
  private def hexCorpus() = {
    val targets = spark.range(500)
      .select(col("id").as("match_key"),
        md5(col("id").cast("string")).as("name"))
    val probes = targets.filter(col("match_key") % 5 === 0)
      .select(col("match_key").as("probe_id"),
        expr("substring(name, 1, length(name) - 1)").as("q"))
    (probes, targets)
  }

  test("blocking: both levers are LOSSLESS on a high-entropy corpus " +
    "(match driver-side brute force), chunk generates strictly fewer " +
    "candidates, and the selectivity probe picks it") {
    import graft.functions.FuzzyBlocking
    val (probes, targets) = hexCorpus()
    val t = targets.collect().map(r => (r.getLong(0), r.getString(1)))
    val p = probes.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (pid, q) <- p; (mid, name) <- t
      d = lev(q, name) if d <= 2
    } yield (pid, mid, d)).sorted.toSeq
    def run(b: FuzzyBlocking.Blocker) =
      FuzzyBlocking.fuzzyJoin(probes, targets, 2, Some(b)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    assert(run(FuzzyBlocking.Band) === brute, "band lever lost matches")
    assert(run(FuzzyBlocking.Chunk) === brute, "chunk lever lost matches")
    val bandCand =
      FuzzyBlocking.bandCandidates(probes, targets, 2).count()
    val chunkCand =
      FuzzyBlocking.chunkCandidates(probes, targets, 2).count()
    assert(chunkCand < bandCand,
      s"chunk must beat banding here: $chunkCand vs $bandCand")
    FuzzyBlocking.invalidate()
    assert(FuzzyBlocking.choose(targets, 2, withBlk = false) ===
      FuzzyBlocking.Chunk, "probe must engage the chunk path")
  }

  test("blocking: on the low-entropy part-name corpus the probe picks " +
    "band (the measured-best round-11 lever) and the levers agree") {
    import graft.functions.FuzzyBlocking
    val parts = Tables.part(spark, sf)
    val probes = parts.filter(col("p_partkey") % 400 === 0)
      .select(col("p_partkey").as("probe_id"),
        expr("substring(p_name, 1, length(p_name) - 1)").as("q"))
      .withColumn("blk", split_part(col("q"), lit(" "), lit(1)))
    val targets = parts
      .select(col("p_partkey").as("match_key"),
        col("p_name").as("name"),
        split_part(col("p_name"), lit(" "), lit(1)).as("blk"))
    FuzzyBlocking.invalidate()
    assert(FuzzyBlocking.choose(targets, 2, withBlk = true) ===
      FuzzyBlocking.Band)
    def run(b: FuzzyBlocking.Blocker) =
      FuzzyBlocking.fuzzyJoin(probes, targets, 2, Some(b)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    val band = run(FuzzyBlocking.Band)
    assert(band === run(FuzzyBlocking.Chunk),
      "levers must agree — both are lossless")
    // and the auto-routed fj1 equals its fixed-lever result
    val fj1 = operators.RelationalFifth.fj1FuzzyJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(fj1 === band)
  }

  // ── DL routing (fj2) ──────────────────────────────────────────────────

  test("damerau routing: the probe derives band on part names (fj2's " +
    "measured-best plan), both levers agree, and fj2 equals either") {
    import graft.functions.FuzzyBlocking
    val parts = Tables.part(spark, sf)
    val ln = length(col("p_name"))
    val probes = parts.filter(col("p_partkey") % 400 === 0)
      .select(col("p_partkey").as("probe_id"),
        concat(substring(col("p_name"), lit(1), ln - 2),
          substring(col("p_name"), ln, lit(1)),
          substring(col("p_name"), ln - 1, lit(1))).as("q"),
        split_part(col("p_name"), lit(" "), lit(1)).as("blk"))
    val targets = parts
      .select(col("p_partkey").as("match_key"),
        col("p_name").as("name"),
        split_part(col("p_name"), lit(" "), lit(1)).as("blk"))
    FuzzyBlocking.invalidate()
    // DL ≤ 1 probes with bandK=1, chunkK=2 (transposition straddle)
    assert(FuzzyBlocking.chooseEdit(targets, 1, 2, withBlk = true) ===
      FuzzyBlocking.Band, "part names must derive the band lever")
    def run(b: FuzzyBlocking.Blocker) =
      FuzzyBlocking.damerauJoin(probes, targets, 1, Some(b)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    val band = run(FuzzyBlocking.Band)
    assert(band === run(FuzzyBlocking.Chunk),
      "DL levers must agree — both are lossless")
    val fj2 = FuzzyMatch.fj2DamerauJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(fj2 === band, "auto-routed fj2 must equal the fixed lever")
  }

  test("damerau chunk lever MUST generate against lev ≤ 2k: a " +
    "transposition straddling the chunk boundary escapes k-chunking") {
    import graft.functions.FuzzyBlocking
    val sparkS = spark
    import sparkS.implicits._
    // target "abcdefgh" chunks at k=1 into "abcd"|"efgh"; swapping the
    // boundary pair (d,e) -> "abcedfgh" edits BOTH chunks with ONE DL
    // edit, so no chunk survives verbatim (shift ≤ 1) in the probe
    val targets = Seq((1L, "abcdefgh")).toDF("match_key", "name")
    val probes = Seq((1L, "abcedfgh")).toDF("probe_id", "q")
    assert(FuzzyRuntime.damerau(UTF8String.fromString("abcedfgh"),
      UTF8String.fromString("abcdefgh")) === 1)
    // naive k=1 chunk candidates: the pair escapes (the would-be bug)
    assert(FuzzyBlocking.chunkCandidates(probes, targets, 1).count() === 0)
    // damerauJoin's chunk path (generates against lev ≤ 2k) finds it
    val viaChunk = FuzzyBlocking.damerauJoin(probes, targets, 1,
      Some(FuzzyBlocking.Chunk)).collect()
    assert(viaChunk.length === 1 && viaChunk(0).getInt(2) === 1)
    // ... as does the band (a transposition is length-preserving)
    assert(FuzzyBlocking.damerauJoin(probes, targets, 1,
      Some(FuzzyBlocking.Band)).count() === 1)
  }

  // ── JW routing (fj3) ──────────────────────────────────────────────────

  test("jw length-ratio bound: jw ≥ tau forces min/max ≥ " +
    "jwLenRatio(tau) on the real kernel (the MultBand losslessness " +
    "proof), fuzzed") {
    import graft.functions.FuzzyBlocking
    val rho = FuzzyBlocking.jwLenRatio(0.9)
    assert(math.abs(rho - 0.5) < 1e-12)
    val rnd = new scala.util.Random(13)
    def word(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    var hits = 0
    for (_ <- 1 to 4000) {
      val a = word(1 + rnd.nextInt(24))
      // bias toward shared prefixes so high-jw pairs actually occur
      val b = a.take(rnd.nextInt(a.length + 1)) + word(rnd.nextInt(20))
      if (b.nonEmpty && jw(a, b) >= 0.9) {
        hits += 1
        val ratio = math.min(a.length, b.length).toDouble /
          math.max(a.length, b.length)
        assert(ratio >= rho - 1e-12,
          s"'$a' vs '$b': jw=${jw(a, b)} but ratio=$ratio < $rho")
      }
    }
    assert(hits > 50, s"fuzz generated only $hits high-jw pairs")
  }

  test("jw routing: block-only derived on part names (fj3's plan), " +
    "mult-band derived on a wide-length-spread corpus, and the levers " +
    "agree on both") {
    import graft.functions.FuzzyBlocking
    val parts = Tables.part(spark, sf)
    val probes = parts.filter(col("p_partkey") % 400 === 0)
      .select(col("p_partkey").as("probe_id"),
        expr("substring(p_name, 1, length(p_name) - 1)").as("q"),
        split_part(col("p_name"), lit(" "), lit(1)).as("blk"))
    val targets = parts
      .select(col("p_partkey").as("match_key"),
        col("p_name").as("name"),
        split_part(col("p_name"), lit(" "), lit(1)).as("blk"))
    FuzzyBlocking.invalidate()
    // part names: lengths spread < 2x, the ratio window covers whole
    // blocks — the explode is pure cost, block-only must win
    assert(FuzzyBlocking.chooseJw(targets, 0.9, withBlk = true) ===
      FuzzyBlocking.BlockOnly)
    def run(b: FuzzyBlocking.JwBlocker, p: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame) =
      FuzzyBlocking.jwCandidates(p, t, 0.9, Some(b))
        .withColumn("jw", FuzzyFunctions.jaro_winkler(col("q"), col("name")))
        .filter(col("jw") >= 0.9)
        .select("probe_id", "match_key").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(FuzzyBlocking.BlockOnly, probes, targets) ===
      run(FuzzyBlocking.MultBand, probes, targets),
      "JW levers must agree — the mult band is lossless at tau > 0.8")
    val fj3 = FuzzyMatch.fj3JaroWinklerJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fj3 === run(FuzzyBlocking.BlockOnly, probes, targets)
      .map(p => (p._1, p._2)))
    // wide-length-spread corpus in ONE block: ~8-char and ~97-char
    // names; the ratio window excises the cross-length half of every
    // block, so the band pays
    val wide = spark.range(400).select(
      col("id").as("match_key"), lit("b").as("blk"),
      when(col("id") % 2 === 0,
        concat(lit("sh"), col("id").cast("string")))
        .otherwise(concat(lit("x"),
          repeat(md5(col("id").cast("string")), 3))).as("name"))
    val wideProbes = wide.filter(col("match_key") % 5 === 0)
      .select(col("match_key").as("probe_id"),
        expr("substring(name, 1, length(name) - 1)").as("q"),
        col("blk"))
    FuzzyBlocking.invalidate()
    assert(FuzzyBlocking.chooseJw(wide, 0.9, withBlk = true) ===
      FuzzyBlocking.MultBand,
      "wide length spread must derive the mult band")
    assert(run(FuzzyBlocking.BlockOnly, wideProbes, wide) ===
      run(FuzzyBlocking.MultBand, wideProbes, wide))
    // and the band generates strictly fewer candidates here
    val bandCand = FuzzyBlocking
      .jwBandCandidates(wideProbes, wide, 0.9).count()
    val blockCand = wideProbes.join(wide, "blk").count()
    assert(bandCand < blockCand,
      s"mult band must prune: $bandCand vs $blockCand")
  }

  test("verify-distinct-then-expand is exact under heavy duplication: " +
    "duplicated names across ids, duplicated probe strings, and the " +
    "same string under DIFFERENT blks — every join shape matches " +
    "driver-side brute force, per id pair") {
    import graft.functions.FuzzyBlocking
    val sparkS = spark
    import sparkS.implicits._
    // the duplication shapes the expansion must not double- or
    // under-count: "ring" twice under blk r; "rung" under blk r AND
    // under blk x (same string, different block — only same-blk pairs
    // may match); two probes sharing one q; an id-unique name
    val targets = Seq(
      (1L, "ring", "r"), (2L, "ring", "r"), (3L, "rung", "r"),
      (4L, "rung", "x"), (5L, "rope", "r"), (6L, "xylo", "x"))
      .toDF("match_key", "name", "blk")
    val probes = Seq(
      (10L, "rng", "r"), (11L, "rng", "r"), (12L, "rnug", "r"),
      (13L, "xylo", "x"))
      .toDF("probe_id", "q", "blk")
    val t = targets.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    val p = probes.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    def brute(dist: (String, String) => Int, k: Int) = (for {
      (pid, q, pb) <- p; (mid, name, tb) <- t
      if pb == tb; d = dist(q, name) if d <= k
    } yield (pid, mid, d)).sorted.toSeq
    for (b <- Seq(FuzzyBlocking.Band, FuzzyBlocking.Chunk)) {
      val got = FuzzyBlocking.fuzzyJoin(probes, targets, 2, Some(b))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      assert(got === brute(lev, 2), s"fuzzyJoin/$b under duplication")
      val gotDl = FuzzyBlocking.damerauJoin(probes, targets, 1, Some(b))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      assert(gotDl === brute(dl, 1), s"damerauJoin/$b under duplication")
    }
    val bruteJw = (for {
      (pid, q, pb) <- p; (mid, name, tb) <- t
      if pb == tb && jw(q, name) >= 0.9
    } yield (pid, mid)).sorted.toSeq
    for (b <- Seq(FuzzyBlocking.BlockOnly, FuzzyBlocking.MultBand)) {
      val got = FuzzyBlocking.jwJoin(probes, targets, 0.9, Some(b))
        .select("probe_id", "match_key").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === bruteJw, s"jwJoin/$b under duplication")
    }
    // auto-routed too (exercises the probe on a duplicated corpus)
    FuzzyBlocking.invalidate()
    val auto = FuzzyBlocking.fuzzyJoin(probes, targets, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    assert(auto === brute(lev, 2))
  }

  test("frame contract is enforced at the door (ADVICE r13): stray " +
    "caller columns — even ones named name/dist/jw — are harmless, " +
    "and a missing contract column fails with an attributed error") {
    import graft.functions.FuzzyBlocking
    val sparkS = spark
    import sparkS.implicits._
    val targets = Seq((1L, "ring"), (2L, "rung"), (3L, "rope"))
      .toDF("match_key", "name")
    val probes = Seq((10L, "rng"), (11L, "ropa"))
      .toDF("probe_id", "q")
    val clean = FuzzyBlocking.fuzzyJoin(probes, targets, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    // the expansion joins used to keep every caller column through two
    // hash joins, so these exact names produced ambiguous-column
    // errors mid-pipeline; now they project away up front
    val dirtyProbes = probes
      .withColumn("name", lit("stray")).withColumn("dist", lit(-1))
    val dirtyTargets = targets
      .withColumn("q", lit("stray")).withColumn("jw", lit(0.0))
    for (join <- Seq(
        FuzzyBlocking.fuzzyJoin(dirtyProbes, dirtyTargets, 1),
        FuzzyBlocking.damerauJoin(dirtyProbes, dirtyTargets, 1))) {
      val got = join.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      assert(got === clean, "stray columns must not change results")
    }
    val jwClean = FuzzyBlocking.jwJoin(probes, targets, 0.9)
      .select("probe_id", "match_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val jwDirty = FuzzyBlocking.jwJoin(dirtyProbes, dirtyTargets, 0.9)
      .select("probe_id", "match_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(jwDirty === jwClean)
    val err = intercept[IllegalArgumentException] {
      FuzzyBlocking.fuzzyJoin(probes.drop("probe_id"), targets, 1)
    }
    assert(err.getMessage.contains("probe_id"),
      s"missing-column error must name the column: ${err.getMessage}")
  }
}
