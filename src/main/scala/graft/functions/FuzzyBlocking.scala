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
  * Frame contract: probes carry (probe_id, q[, blk]); targets carry
  * (match_key, name[, blk]). When both sides carry `blk` it joins as
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
    * (band: 2k+1 admissible lengths; chunk: ×(2k+1) start shifts on
    * top). Relative ORDER is the contract, not the absolute value —
    * FuzzyMatchSpec checks the order against realized candidate
    * counts on both corpus shapes. Returns (bandScore, chunkScore). */
  private[graft] def estimate(targets: DataFrame, k: Int,
      withBlk: Boolean, sampleCap: Long = 2000L): (Double, Double) = {
    val n = targets.count()
    val bucket = math.max(1L,
      math.min(1000000L, 1000000L * sampleCap / math.max(n, 1L)))
    val s = targets
      .filter(pmod(xxhash64(col("match_key")), lit(1000000L)) < lit(bucket))
    def sumSq(df: DataFrame, keys: Seq[Column]): (Long, Long) = {
      val r = df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
        .agg(sum("c"), sum(col("c") * col("c"))).collect()(0)
      (if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val blkKey = if (withBlk) Seq(col("blk")) else Nil
    val (bn, bandMass) = sumSq(s, blkKey :+ length(col("name")).as("len"))
    val minLen = minChunkableLen(k)
    val (_, chunkMass) = sumSq(targetChunks(
      s.filter(length(col("name")) >= minLen), k),
      blkKey ++ Seq(col("t_len"), col("ci"), col("ckey")))
    val (_, shortMass) = sumSq(s.filter(length(col("name")) < minLen),
      blkKey :+ length(col("name")).as("len"))
    val denom = math.max(bn, 1L).toDouble
    val fan = (2 * k + 1).toDouble
    (fan * bandMass / denom,
      (fan * fan * chunkMass + fan * shortMass) / denom)
  }

  /** Pick the lever for this target corpus — sampled probe, memoized
    * per (target plan, k). */
  def choose(targets: DataFrame, k: Int, withBlk: Boolean): Blocker =
    decisionMemo.get(targets, s"blocker_k${k}_blk$withBlk") {
      val (band, chunk) = estimate(targets, k, withBlk)
      if (chunk < band) Chunk else Band
    }

  def invalidate(): Unit = decisionMemo.invalidate()

  /** Blocked lev ≤ k join with auto-selected (or forced) blocking:
    * (probe_id, match_key, dist). */
  def fuzzyJoin(probes: DataFrame, targets: DataFrame, k: Int,
      blocker: Option[Blocker] = None): DataFrame = {
    val b = blocker.getOrElse(
      choose(targets, k, hasBlk(probes, targets)))
    val cand = b match {
      case Band  => bandCandidates(probes, targets, k)
      case Chunk => chunkCandidates(probes, targets, k)
    }
    cand.withColumn("dist", levenshtein(col("q"), col("name")))
      .filter(col("dist") <= k)
      .select("probe_id", "match_key", "dist")
  }
}
