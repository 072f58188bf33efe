package graft.functions

import graft.util.Caches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-adaptive candidate blocking for edit-distance (lev ≤ k) joins.
  *
  * Two LOSSLESS candidate-generation levers exist for `lev(q, name) ≤
  * k`, and round 11 measured that neither dominates — the winner is a
  * property of the CORPUS, not the operator:
  *
  *  - BAND — (optional caller block column ×) length band: `lev ≤ k`
  *    forces `|len(q) − len(name)| ≤ k`, so each probe explodes to the
  *    2k+1 admissible lengths and length joins as an exact hash key.
  *    Wins on low-entropy vocabularies (TPC-H part names draw from 92
  *    words: chunk keys collide by the thousands, fj1 10.9 s at sf1 on
  *    the chunk lever vs 3.8 s banded).
  *  - CHUNK — pigeonhole / PartEnum: split the target into k+1
  *    contiguous chunks; k edits can touch at most k of them, so one
  *    chunk survives VERBATIM in the probe, start-shifted ≤ k. Probes
  *    enumerate (2k+1 lengths × k+1 chunks × ≤2k+1 positions) short
  *    substrings and join them as exact keys. Wins on high-entropy
  *    strings (ids, emails, hashes) where a single length-band block
  *    holds most of the corpus but a chunk key is near-unique.
  *
  * [[choose]] therefore probes block selectivity on a deterministic
  * hash sample of the targets and picks the lever with the smaller
  * estimated candidate volume (Σ block² — the self-join mass — scaled
  * by each lever's probe fan-out). The decision is memoized per
  * (target plan, k) via [[Caches.PlanMemo]], and a wrong estimate can
  * only cost time, never results: both levers are lossless, which
  * FuzzyMatchSpec pins on both corpus shapes.
  *
  * Frame contract (ENFORCED — the join entry points project to these
  * columns and reject frames missing them): probes carry
  * (probe_id, q[, blk]); targets carry (match_key, name[, blk]).
  * Extra caller columns are dropped at the door, never ambiguous
  * downstream. When both sides carry `blk` it joins as
  * an additional exact key in EITHER lever (the caller asserts the
  * perturbation never touches it — e.g. fj1's dropped last char
  * leaves the first name token intact).
  *
  * At 100 TB both levers stay shuffle-shaped hash joins on short keys
  * (no similarity crossproduct, no driver state); the chunk lever's
  * probe fan-out is a constant ≤ (2k+1)²(k+1) row multiplier on the
  * PROBE side only, which is the small side of every fuzzy-match
  * pipeline here. */
object FuzzyBlocking {

  sealed trait Blocker
  case object Band extends Blocker
  case object Chunk extends Blocker

  /** Targets shorter than this route through the band lever even
    * under [[Chunk]]: the pigeonhole argument needs k+1 NON-EMPTY
    * chunks (len ≥ k+1), and chunks of length 1 are join-key noise —
    * 2(k+1) keeps every chunk ≥ 2 chars. */
  def minChunkableLen(k: Int): Int = 2 * (k + 1)

  private val decisionMemo =
    new Caches.PlanMemo[String, Blocker](maxEntries = 64)

  private def hasBlk(probes: DataFrame, targets: DataFrame): Boolean =
    probes.columns.contains("blk") && targets.columns.contains("blk")

  /** Ascending int sequence that yields an EMPTY array (not Spark's
    * descending sequence) when start > stop, so explode drops the row. */
  private def seqAsc(start: Column, stop: Column): Column =
    when(start <= stop, sequence(start, stop))
      .otherwise(array().cast("array<int>"))

  // ── band lever ──────────────────────────────────────────────────────
  /** Candidate pairs under (blk ×) length-band blocking:
    * (probe_id, q, match_key, name). */
  private[graft] def bandCandidates(probes: DataFrame, targets: DataFrame,
      k: Int): DataFrame = {
    val withBlk = hasBlk(probes, targets)
    val p = probes.withColumn("t_len",
      explode(sequence(length(col("q")) - k, length(col("q")) + k)))
    val t = targets.withColumn("t_len", length(col("name")))
    val keys = if (withBlk) Seq("blk", "t_len") else Seq("t_len")
    p.join(t, keys).select("probe_id", "q", "match_key", "name")
  }

  // ── chunk (pigeonhole / PartEnum) lever ─────────────────────────────
  /** Target-side chunk keys: one row per (name, chunk index) with the
    * exact chunk string and the boundaries a length-`t_len` split
    * implies — start = ⌊i·L/(k+1)⌋ (ints ⇒ cast truncation = floor). */
  private def targetChunks(targets: DataFrame, k: Int): DataFrame = {
    val kp1 = k + 1
    targets
      .withColumn("t_len", length(col("name")))
      .withColumn("ci", explode(sequence(lit(0), lit(k))))
      .withColumn("cs", (col("ci") * col("t_len") / lit(kp1)).cast("int"))
      .withColumn("clen",
        ((col("ci") + 1) * col("t_len") / lit(kp1)).cast("int") - col("cs"))
      // substring with COLUMN pos/len needs the SQL form (the Column
      // API overload takes Int literals only)
      .withColumn("ckey", expr("substring(name, cs + 1, clen)"))
  }

  /** Candidate pairs under pigeonhole chunking for targets long enough
    * to chunk, UNION band for the short tail — lossless overall. */
  private[graft] def chunkCandidates(probes: DataFrame, targets: DataFrame,
      k: Int): DataFrame = {
    val withBlk = hasBlk(probes, targets)
    val kp1 = k + 1
    val minLen = minChunkableLen(k)
    val t = targetChunks(targets.filter(length(col("name")) >= minLen), k)
      .select((Seq("match_key", "name", "t_len", "ci", "ckey") ++
        (if (withBlk) Seq("blk") else Nil)).map(col): _*)
    // probe side: admissible target lengths × chunk indices × the ≤ k
    // start shift — every enumerated substring is an exact join key
    val p = probes
      .withColumn("t_len", explode(seqAsc(
        greatest(length(col("q")) - k, lit(minLen)),
        length(col("q")) + k)))
      .withColumn("ci", explode(sequence(lit(0), lit(k))))
      .withColumn("cs", (col("ci") * col("t_len") / lit(kp1)).cast("int"))
      .withColumn("clen",
        ((col("ci") + 1) * col("t_len") / lit(kp1)).cast("int") - col("cs"))
      .withColumn("p0", explode(seqAsc(
        greatest(col("cs") + 1 - k, lit(1)),
        least(col("cs") + 1 + k, length(col("q")) - col("clen") + 1))))
      .withColumn("ckey", expr("substring(q, p0, clen)"))
    val keys = (if (withBlk) Seq("blk") else Nil) ++
      Seq("t_len", "ci", "ckey")
    val long = p.join(t, keys)
      .select("probe_id", "q", "match_key", "name")
      .distinct() // several chunks of one target may match one probe
    val short = bandCandidates(probes,
      targets.filter(length(col("name")) < minLen), k)
    long.union(short)
  }

  // ── selectivity probe + auto-selection ──────────────────────────────
  /** Estimated candidate volume per lever, from a deterministic hash
    * sample of the targets: Σ block-size² (the self-join mass — the
    * expected number of same-key targets a probe derived from a
    * sampled target meets) scaled by the lever's probe fan-out
    * (band: 2·bandK+1 admissible lengths; chunk: ×(2·chunkK+1) start
    * shifts on top). `bandK`/`chunkK` are the metric's candidate
    * bounds — equal for plain Levenshtein, chunkK = 2·bandK for
    * Damerau (see [[damerauJoin]]). Relative ORDER is the contract,
    * not the absolute value — FuzzyMatchSpec checks the order against
    * realized candidate counts on both corpus shapes. Returns
    * (bandScore, chunkScore). */
  private[graft] def estimate(targets: DataFrame, bandK: Int, chunkK: Int,
      withBlk: Boolean, sampleCap: Long = 2000L): (Double, Double) = {
    // The join's DP volume is measured over the DISTINCT frames
    // ([[verifyDistinctThenExpand]]), so the probe weighs block masses
    // per DISTINCT (blk, name) — and it projects to that distinct
    // frame FIRST (ADVICE r13): the distinct's map-side partial
    // aggregation bounds the probe's shuffle by the distinct count,
    // where the former row-level hash-sample filter let a heavily
    // duplicated corpus push a large row fraction (~34% of 2M rows for
    // 5.8k distinct names at sf10) into the sampling shuffle. The
    // distinct frame is persisted across the probe's two jobs — an
    // exact count (replacing approx_count_distinct) sizes the hash
    // bucket to ~sampleCap names, then the sampled aggregations score
    // the levers — and released before returning. Memoized per
    // (target plan, bounds) by [[chooseEdit]], so the corpus pays this
    // once.
    val keep = (if (withBlk) Seq(col("blk")) else Nil) :+ col("name")
    val dAll = Caches.persistOnce(targets.select(keep: _*).distinct())
    try {
      val dn = dAll.count()
      val bucket = math.max(1L,
        math.min(1000000L, 1000000L * sampleCap / math.max(dn, 1L)))
      val s = dAll
        .filter(pmod(xxhash64(col("name")), lit(1000000L)) < lit(bucket))
      def sumSq(df: DataFrame, keys: Seq[Column]): (Long, Long) = {
        val r = df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
          .agg(sum("c"), sum(col("c") * col("c"))).collect()(0)
        (if (r.isNullAt(0)) 0L else r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val blkKey = if (withBlk) Seq(col("blk")) else Nil
      val (bn, bandMass) = sumSq(s, blkKey :+ length(col("name")).as("len"))
      val minLen = minChunkableLen(chunkK)
      val (_, chunkMass) = sumSq(targetChunks(
        s.filter(length(col("name")) >= minLen), chunkK),
        blkKey ++ Seq(col("t_len"), col("ci"), col("ckey")))
      val (_, shortMass) = sumSq(s.filter(length(col("name")) < minLen),
        blkKey :+ length(col("name")).as("len"))
      val denom = math.max(bn, 1L).toDouble
      val bandFan = (2 * bandK + 1).toDouble
      val chunkFan = (2 * chunkK + 1).toDouble
      (bandFan * bandMass / denom,
        (chunkFan * chunkFan * chunkMass + chunkFan * shortMass) / denom)
    } finally { dAll.unpersist(blocking = false); () }
  }

  /** Pick the lever for this target corpus — sampled probe, memoized
    * per (target plan, metric bounds). */
  def choose(targets: DataFrame, k: Int, withBlk: Boolean): Blocker =
    chooseEdit(targets, k, k, withBlk)

  private[graft] def chooseEdit(targets: DataFrame, bandK: Int,
      chunkK: Int, withBlk: Boolean): Blocker =
    decisionMemo.get(targets, s"blocker_b${bandK}_c${chunkK}_blk$withBlk") {
      val (band, chunk) = estimate(targets, bandK, chunkK, withBlk)
      val pick = if (chunk < band) Chunk else Band
      // diagnostic only under the audit flag — committed bench
      // artifacts carry structured output only (VERDICT r15 item 8)
      if (graft.util.Audit.enabled(targets.sparkSession))
        System.err.println(f"[fuzzy] blocker=$pick band=$band%.1f " +
          f"chunk=$chunk%.1f (b$bandK c$chunkK blk=$withBlk)")
      pick
    }

  def invalidate(): Unit = {
    decisionMemo.invalidate(); jwDecisionMemo.invalidate()
  }

  /** Run the blocked candidate-generate → DP-verify pipeline ONCE PER
    * DISTINCT STRING PAIR, then expand back to ids — the lever that
    * keeps edit-distance joins alive on low-entropy corpora. The DP
    * volume of a blocked fuzzy join is Σ |probe block|·|target block|,
    * which grows ~n² whenever the key space is fixed while the corpus
    * grows (catalogs, logs, templated text: the sf10 sweep measured
    * the part table at 2M rows but 5,824 DISTINCT names — and fj1 at
    * 771 s because every one of the ~10⁸ id-pair candidates re-ran a
    * DP that only ~10⁵ distinct string pairs exist for). Distances
    * depend on the STRINGS alone, so: dedup both sides to distinct
    * (string[, blk]), generate + verify on those (candidates on
    * distinct frames are a subset of candidates on raw frames — never
    * more DP work, usually decades less), then two hash joins expand
    * verified string pairs back to (probe_id, match_key). The
    * expansion is output-sized — that cost IS the answer. On a
    * high-entropy corpus the distincts collapse nothing and cost two
    * linear shuffles; on a duplicated one this is the difference
    * between n² and d². A verified (q, name) pair is blk-independent
    * (the DP never sees blk), so the expansion re-applies the blk
    * equality: probes ⋈ verified ON q, then ⋈ targets ON (name, blk)
    * — exactly the pairs whose own blk columns agree, each with its
    * once-computed distance. */
  /** Enforce the frame contract (ADVICE r13): the expansion joins keep
    * every probe/target column through two joins, so a caller frame
    * carrying stray columns named `name`/`dist`/`jw` would hit
    * ambiguous-column errors deep inside the pipeline. Projecting to
    * exactly the contract columns up front makes extra columns
    * harmless and turns a MISSING column into an immediate, clearly
    * attributed error. */
  private def contractProject(df: DataFrame, id: String, str: String,
      withBlk: Boolean): DataFrame = {
    val cols = Seq(id, str) ++ (if (withBlk) Seq("blk") else Nil)
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"fuzzy-join frame must carry (${cols.mkString(", ")}); " +
        s"missing: ${missing.mkString(", ")}")
    df.select(cols.map(col): _*)
  }

  private def verifyDistinctThenExpand(probes0: DataFrame,
      targets0: DataFrame, withBlk: Boolean,
      gen: (DataFrame, DataFrame) => DataFrame,
      dist: (Column, Column) => Column, k: Int): DataFrame = {
    val probes = contractProject(probes0, "probe_id", "q", withBlk)
    val targets = contractProject(targets0, "match_key", "name", withBlk)
    val pKeep = if (withBlk) Seq("q", "blk") else Seq("q")
    val tKeep = if (withBlk) Seq("name", "blk") else Seq("name")
    // surrogate ids = the strings themselves: the generators pass
    // probe_id/match_key through untouched, so the strings ride along
    // and the verified frame needs no extra join to recover them
    val dProbes = probes.select(pKeep.map(col): _*).distinct()
      .withColumn("probe_id", col("q"))
    val dTargets = targets.select(tKeep.map(col): _*).distinct()
      .withColumn("match_key", col("name"))
    val verified = gen(dProbes, dTargets)
      .withColumn("dist", dist(col("q"), col("name")))
      .filter(col("dist") <= k)
      .select("q", "name", "dist").distinct()
    probes.join(verified, Seq("q"))
      .join(targets, tKeep)
      .select("probe_id", "match_key", "dist")
  }

  /** Blocked lev ≤ k join with auto-selected (or forced) blocking:
    * (probe_id, match_key, dist). */
  def fuzzyJoin(probes: DataFrame, targets: DataFrame, k: Int,
      blocker: Option[Blocker] = None): DataFrame = {
    val withBlk = hasBlk(probes, targets)
    val b = blocker.getOrElse(choose(targets, k, withBlk))
    val gen: (DataFrame, DataFrame) => DataFrame = b match {
      case Band  => bandCandidates(_, _, k)
      case Chunk => chunkCandidates(_, _, k)
    }
    verifyDistinctThenExpand(probes, targets, withBlk, gen,
      levenshtein(_, _), k)
  }

  /** Blocked unrestricted Damerau-Levenshtein ≤ k join with
    * auto-selected blocking: (probe_id, match_key, dist). Candidate
    * generation stays lossless for the DL metric with metric-specific
    * bounds: the BAND stays ±k (a transposition is length-preserving,
    * so |Δlen| is bounded by DL's ≤ k indels alone), but the CHUNK
    * lever must generate against lev ≤ 2k — an adjacent transposition
    * can straddle a chunk boundary and edit TWO chunks for one DL
    * edit, breaking the k-edits-touch-k-chunks pigeonhole; rewriting
    * each transposition as two substitutions (lev ≤ 2·DL always)
    * restores it. The selectivity probe weighs the levers under those
    * asymmetric bounds, so chunking must be a ~(2·2k+1)²/(2k+1)×
    * bigger win to get picked for DL than for plain lev. */
  def damerauJoin(probes: DataFrame, targets: DataFrame, k: Int,
      blocker: Option[Blocker] = None): DataFrame = {
    val withBlk = hasBlk(probes, targets)
    val b = blocker.getOrElse(chooseEdit(targets, k, 2 * k, withBlk))
    val gen: (DataFrame, DataFrame) => DataFrame = b match {
      case Band  => bandCandidates(_, _, k)
      case Chunk => chunkCandidates(_, _, 2 * k)
    }
    verifyDistinctThenExpand(probes, targets, withBlk, gen,
      FuzzyFunctions.damerau_levenshtein(_, _), k)
  }

  // ── Jaro-Winkler (similarity-threshold) lever set ───────────────────
  sealed trait JwBlocker
  /** Join on the caller's exact block column only — JW's default: the
    * metric is not edit-bounded, so no additive length band exists. */
  case object BlockOnly extends JwBlocker
  /** (blk ×) MULTIPLICATIVE length band — the only lossless length
    * refinement JW admits, and only for tau > 0.8. */
  case object MultBand extends JwBlocker

  private val jwDecisionMemo =
    new Caches.PlanMemo[String, JwBlocker](maxEntries = 64)

  /** Minimum length ratio min(|a|,|b|)/max(|a|,|b|) a jw ≥ tau pair
    * can have, from the kernel's own bounds: the Winkler boost caps at
    * l = 4, p = 0.1 ⇒ jw ≤ 0.6·jaro + 0.4, and jaro ≤ (2 + min/max)/3
    * (each of its three terms ≤ 1, and the match count ≤ min). So
    * jw ≥ tau ⇒ min/max ≥ 3·(tau − 0.4)/0.6 − 2. Positive only for
    * tau > 0.8 — below that JW admits unbounded length skew and NO
    * length refinement is lossless. FuzzyMatchSpec fuzzes the bound
    * against the real kernel. */
  def jwLenRatio(tau: Double): Double = 3.0 * (tau - 0.4) / 0.6 - 2.0

  /** Candidate pairs under (blk ×) the multiplicative length band:
    * each probe of length L admits target lengths in
    * [⌈ρL⌉, ⌊L/ρ⌋], ρ = [[jwLenRatio]](tau). */
  private[graft] def jwBandCandidates(probes: DataFrame,
      targets: DataFrame, tau: Double): DataFrame = {
    val rho = jwLenRatio(tau)
    require(rho > 0,
      s"jw >= $tau implies no length bound (tau <= 0.8); " +
        "MultBand would lose matches")
    val withBlk = hasBlk(probes, targets)
    val p = probes.withColumn("t_len", explode(seqAsc(
      greatest(ceil(length(col("q")) * rho), lit(1L)).cast("int"),
      floor(length(col("q")) / rho).cast("int"))))
    val t = targets.withColumn("t_len", length(col("name")))
    val keys = if (withBlk) Seq("blk", "t_len") else Seq("t_len")
    p.join(t, keys).select("probe_id", "q", "match_key", "name")
  }

  /** JW lever scores from a sampled target length histogram collected
    * to the driver (≤ ~sampleCap rows — bounded model state, the same
    * class as the k-means centroid collects): blockOnly is the exact
    * per-probe candidate mass Σ_blk cnt²/n; multBand is the exact
    * window mass Σ_target (same-blk targets within the length-ratio
    * window)/n. Returns (blockOnlyScore, multBandScore). */
  private[graft] def estimateJw(targets: DataFrame, tau: Double,
      withBlk: Boolean, sampleCap: Long = 2000L): (Double, Double) = {
    val rho = jwLenRatio(tau)
    val n = targets.count()
    val bucket = math.max(1L,
      math.min(1000000L, 1000000L * sampleCap / math.max(n, 1L)))
    val blkCol =
      if (withBlk) col("blk").cast("string") else lit("")
    val hist = targets
      .filter(pmod(xxhash64(col("match_key")), lit(1000000L)) < lit(bucket))
      .groupBy(blkCol.as("b"), length(col("name")).as("len"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val total = math.max(hist.map(_._3).sum, 1L).toDouble
    val byBlk = hist.groupBy(_._1)
    val blockMass = byBlk.values.map { g =>
      val m = g.map(_._3).sum; m.toDouble * m
    }.sum
    val multMass =
      if (rho <= 0) Double.PositiveInfinity
      else hist.map { case (b, len, c) =>
        val lo = math.ceil(len * rho)
        val hi = math.floor(len / rho)
        c.toDouble * byBlk(b)
          .filter(e => e._2 >= lo && e._2 <= hi).map(_._3).sum
      }.sum
    (blockMass / total, multMass / total)
  }

  /** Pick the JW lever — sampled probe, memoized per (target plan,
    * tau). MultBand must beat BlockOnly by > 25% estimated candidate
    * volume to pay for its probe-side explode and wider join key
    * (window ⊆ block, so its mass is never larger; a near-tie means
    * the window covers the whole block and the explode is pure cost —
    * the part-name regime, where lengths spread < 2×). */
  def chooseJw(targets: DataFrame, tau: Double, withBlk: Boolean)
      : JwBlocker =
    jwDecisionMemo.get(targets, s"jw_${tau}_blk$withBlk") {
      val (block, mult) = estimateJw(targets, tau, withBlk)
      if (mult * 1.25 < block) MultBand else BlockOnly
    }

  /** Candidate pairs for a jw ≥ tau match with auto-selected (or
    * forced) blocking: (probe_id, q, match_key, name). The caller
    * applies the verify kernel — JW scores, thresholds and output
    * rounding are query-owned. Without a block column the
    * multiplicative band is the only lever (BlockOnly would be the
    * all-pairs crossproduct), which requires tau > 0.8. */
  def jwCandidates(probes: DataFrame, targets: DataFrame, tau: Double,
      blocker: Option[JwBlocker] = None): DataFrame = {
    val withBlk = hasBlk(probes, targets)
    val b = blocker.getOrElse(
      if (!withBlk) MultBand
      else chooseJw(targets, tau, withBlk))
    b match {
      case MultBand => jwBandCandidates(probes, targets, tau)
      case BlockOnly =>
        require(withBlk, "BlockOnly needs a blk column on both sides")
        probes.join(targets, Seq("blk"))
          .select("probe_id", "q", "match_key", "name")
    }
  }

  /** Blocked jw ≥ tau join with the verify kernel applied ONCE PER
    * DISTINCT STRING PAIR ([[verifyDistinctThenExpand]]'s rationale —
    * JW is a pure string function too, and on a duplicated corpus the
    * per-id-pair scoring is the same n²-of-d² waste the edit-distance
    * joins had: fj3 at the sf10 low-entropy part table measured 147 s
    * scoring ~10⁸ id-pair candidates that hold ~10⁵ distinct string
    * pairs — 1.4 s verified-distinct). Returns (probe_id, match_key,
    * jw) with the RAW double score; thresholding at tau is applied
    * here (it gates the candidate volume), rounding stays
    * query-owned. */
  def jwJoin(probes0: DataFrame, targets0: DataFrame, tau: Double,
      blocker: Option[JwBlocker] = None): DataFrame = {
    val withBlk = hasBlk(probes0, targets0)
    val probes = contractProject(probes0, "probe_id", "q", withBlk)
    val targets = contractProject(targets0, "match_key", "name", withBlk)
    val pKeep = if (withBlk) Seq("q", "blk") else Seq("q")
    val tKeep = if (withBlk) Seq("name", "blk") else Seq("name")
    val dProbes = probes.select(pKeep.map(col): _*).distinct()
      .withColumn("probe_id", col("q"))
    val dTargets = targets.select(tKeep.map(col): _*).distinct()
      .withColumn("match_key", col("name"))
    val verified = jwCandidates(dProbes, dTargets, tau, blocker)
      .withColumn("jw", FuzzyFunctions.jaro_winkler(col("q"), col("name")))
      .filter(col("jw") >= tau)
      .select("q", "name", "jw").distinct()
    probes.join(verified, Seq("q"))
      .join(targets, tKeep)
      .select("probe_id", "match_key", "jw")
  }
}
