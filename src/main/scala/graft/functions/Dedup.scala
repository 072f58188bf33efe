package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Checkpoints.StageOps

/** Deduplication operators for the training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash. Each is a composable
  * DataFrame transform designed for the 100 TB shape:
  *
  *  - exact dedup: one hash-shuffle on a 64-bit text hash (not the full
  *    text), partial-aggregated map-side;
  *  - n-gram Jaccard: the exact similarity measure, blocked by a
  *    partition key so the self-join never goes all-pairs-global;
  *  - MinHash+LSH: the scale path — fixed-width signatures via
  *    higher-order functions (no UDFs, no explode of the shingle set),
  *    banded bucketing so candidate generation is a hash join on band
  *    keys; candidates then verified with exact Jaccard;
  *  - SimHash: one 64-bit fingerprint per doc computed entirely with
  *    per-row array algebra (zero shuffles), near-dups = small hamming
  *    distance within blocking buckets.
  */
object Dedup {

  // ── exact dedup ─────────────────────────────────────────────────────
  /** Exact duplicate groups: group by text, keep the smallest doc_id.
    * At scale, group on xxhash64(text) so the shuffle carries 8 bytes
    * per row instead of the document body (collision probability at
    * 10^12 docs ≈ 10^-7; confirm with a byte-compare pass if needed). */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("group_size"))

  def ddExact(spark: SparkSession, dir: String): DataFrame =
    exactDuplicates(Tables.documents(spark, dir))
      .groupBy("group_size")
      .agg(count(lit(1)).as("n_groups"), min("keeper").as("min_keeper"))
      .orderBy("group_size")

  /** Oracle groups by the text itself — same group structure as the
    * hash (collision-free at this scale), so the summary matches. */
  val ddExactSql: String =
    """SELECT group_size, COUNT(*) AS n_groups, MIN(keeper) AS min_keeper
      |FROM (SELECT MIN(doc_id) AS keeper, COUNT(*) AS group_size
      |      FROM documents GROUP BY text)
      |GROUP BY group_size ORDER BY group_size""".stripMargin

  /** Near-dup survivorship audit by source — the "which corpus slice
    * is padding the bill" report a curation run publishes next to the
    * dedup itself. The drop rule is the GREEDY KILL every LSH/exact-
    * similarity dedup applies on its pair stream: a doc is dropped iff
    * it pairs (J ≥ 1/2 on 4-gram shingles, [[prefixJaccardPairs]])
    * with ANY lower-id doc — deliberately NOT the transitive-closure
    * grouping ([[ddMinhashGroups]] owns that); the kill rule is what
    * a single-pass dedup actually executes, and it is SQL-expressible
    * so the whole audit stays oracled. Chars are charged to the
    * dropped doc's OWN source, which is the number a mixture rebuild
    * needs.
    *
    * Scale shape: the pair stream is the prefix-filtered AllPairs join
    * (candidate-sized, never doc×doc); the kill set is a distinct over
    * pair right-ends (≤ pairs); the charge-back is one left join of
    * the corpus against that small set, then a per-source agg. */
  def survivorshipBySource(docs: DataFrame): DataFrame = {
    val killed = prefixJaccardPairs(docs)
      .select(col("d2").as("doc_id")).distinct()
      .withColumn("__dropped", lit(true))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(killed, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("__dropped").isNull, 1)).as("n_kept"),
        count(col("__dropped")).as("n_dropped"),
        sum("n_chars").as("chars_total"),
        sum(when(col("__dropped"), col("n_chars")).otherwise(0L))
          .as("chars_dropped"))
      .orderBy("source")
  }

  def ddSurvivorship(spark: SparkSession, dir: String): DataFrame =
    survivorshipBySource(Tables.documents(spark, dir))

  /** Oracle: brute-force pair join at the same threshold (the prefix
    * filter is a plan device), then the same kill rule. */
  val ddSurvivorshipSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(arr) - 2),
      |        i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2]
      |          || ' ' || arr[i + 3])) AS g
      |    FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr
      |          FROM documents))),
      |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |killed AS (
      |  SELECT DISTINCT d2 AS doc_id FROM inter
      |    JOIN sizes s1 ON inter.d1 = s1.doc_id
      |    JOIN sizes s2 ON inter.d2 = s2.doc_id
      |  WHERE CAST(n_common AS DOUBLE)
      |    / CAST(s1.set_size + s2.set_size - n_common AS DOUBLE) >= 0.5)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN k.doc_id IS NULL THEN 1 END) AS n_kept,
      |  COUNT(k.doc_id) AS n_dropped,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
      |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_chars ELSE 0 END)
      |    AS BIGINT) AS chars_dropped
      |FROM documents d LEFT JOIN killed k USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  // ── word-bigram shingles (shared by jaccard/minhash) ────────────────
  /** Distinct word-bigram set per doc: the bigram array is built
    * per-row (zero shuffle — an earlier lead()-window formulation
    * shuffled every token row) and then exploded; only the distinct
    * dedupe shuffles, on (doc, hashable bigram). */
  def bigramSets(docs: DataFrame): DataFrame =
    graft.util.Par.widen(docs) // CPU-per-row shingle build (r16)
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), col("source"),
        explode(expr("transform(slice(__toks, 1, size(__toks) - 1), " +
          "(t, i) -> concat(t, ' ', element_at(__toks, i + 2)))"))
          .as("bigram"))
      .distinct()

  // ── AllPairs/PPJoin candidate generation (shared) ───────────────────
  /** Lossless candidate pairs for a Jaccard-threshold self-join over
    * pre-built DISTINCT gram-hash sets — the generalized AllPairs /
    * PPJoin machinery behind both exact-similarity queries. Input
    * `sets` carries (doc_id, hs: array of distinct gram hashes,
    * s = size(hs)) plus any blocking columns; the threshold is the
    * exact rational tNum/tDen so every bound below is integer
    * arithmetic, never a float ⌈⌉. Three lossless prunes stack:
    *
    *  - PREFIX filter (AllPairs): under one global gram order
    *    (document frequency ascending, then gram — within a block when
    *    blocked, which is consistent for any candidate pair since both
    *    ends share the block), a pair with J ≥ t must share its rarest
    *    common gram inside both docs' prefixes of length
    *    `s − ⌈t·s⌉ + 1`: were every common gram outside A's prefix,
    *    the overlap would be ≤ ⌈t·|A|⌉ − 1 < t·|A|, contradicting
    *    J ≥ t ⇒ overlap ≥ t·|A|. Frequent grams sort to the suffix and
    *    fall out of the join entirely — what kills the O(n²) gram-join
    *    blowup at corpus scale.
    *  - LENGTH filter: J ≥ t forces t·max(s1,s2) ≤ min(s1,s2);
    *    applied inside the join condition (num·greatest ≤ den·least)
    *    so size-mismatched docs never leave the join.
    *  - POSITIONAL filter (PPJoin): the rarest common gram, sitting at
    *    positions (i, j) of the frequency-sorted sets, bounds the
    *    achievable overlap by 1 + min(s1−i, s2−j) (all other common
    *    grams sort after it in BOTH docs). A shared prefix gram whose
    *    bound falls below the minimum qualifying overlap
    *    ⌈t(s1+s2)/(1+t)⌉ cannot witness the pair; a pair all of whose
    *    shared prefix grams fail — in particular its rarest — cannot
    *    reach t.
    *
    * Every prune is exactness-preserving (PropertySpec fuzzes both the
    * 4-gram t=1/2 and bigram t=1/5 instantiations against brute
    * force); candidates are then verified by one `array_intersect`
    * over the full sets in [[verifiedJaccardPairs]]. */
  def prefixFilteredCandidates(sets: DataFrame, tNum: Int, tDen: Int,
      blockCols: Seq[String] = Nil,
      spreadEnumeration: Boolean = false,
      dedupCandidates: Boolean = true): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: $tNum/$tDen")
    val bc = blockCols.map(col)
    val grams = sets.select(
      (col("doc_id") +: col("s") +: bc) :+ explode(col("hs")).as("g"): _*)
    val dfreq = grams.groupBy(col("g") +: bc: _*)
      .agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("g"))
    // prefix length = s − ⌈t·s⌉ + 1, with ⌈s·num/den⌉ = (s·num+den−1) div den
    // the prefix index (doc, rank, prefix gram) is the reusable
    // artifact of AllPairs — at scale it is materialized once per
    // (corpus, threshold) and amortized across runs, the same pattern
    // as the persisted MinHash signature table below
    val prefixes = graft.util.Caches.persistOnce(
      grams.join(dfreq, "g" +: blockCols)
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <=
          col("s") - expr(s"int((s * $tNum + ${tDen - 1}) div $tDen)") + lit(1))
        .select(col("doc_id") +: col("s") +: col("rn") +: col("g") +: bc: _*))
    val blockEq = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(lit(true))(_ && _)
    val lengthOk = lit(tNum.toLong) *
      greatest(col("a.s"), col("b.s")).cast("long") <=
      lit(tDen.toLong) * least(col("a.s"), col("b.s")).cast("long")
    // ubound ≥ ⌈num(s1+s2)/(num+den)⌉ ⟺ ubound·(num+den) ≥ num·(s1+s2)
    val positionalOk =
      (lit(1L) + least(col("a.s") - col("a.rn"), col("b.s") - col("b.rn"))
        .cast("long")) * lit((tNum + tDen).toLong) >=
      lit(tNum.toLong) * (col("a.s") + col("b.s")).cast("long")
    // when the gram vocabulary saturates (dense buckets — the caller
    // knows), the self-join's probe side enumerates every within-bucket
    // pair, and AQE's partition coalescing sizes partitions by BYTES
    // (prefix rows are ~40 B), under-parallelizing the enumeration CPU:
    // spread it across the configured shuffle parallelism explicitly.
    // Sparse-vocab callers skip the extra exchange — their enumeration
    // is already candidate-sized.
    val spread =
      if (spreadEnumeration) prefixes.repartition(
        prefixes.sparkSession.sessionState.conf.numShufflePartitions)
      else prefixes
    val raw = spread.alias("a").join(spread.alias("b"),
        col("a.g") === col("b.g") && blockEq &&
        col("a.doc_id") < col("b.doc_id") && lengthOk && positionalOk)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    // a pair sharing k prefix grams surfaces k times. Deduping HERE
    // costs one pair-shuffle but keeps the verify stage (which carries
    // the full hash arrays through its joins) candidate-sized — the
    // right default when sets are wide. Callers whose verify kernel is
    // cheap relative to a shuffle (saturated-vocab bigrams: ~50-element
    // merge scans) skip it and dedupe AFTER the threshold filter, when
    // the surviving set is tiny.
    // pre-verify candidate volume, recorded only under the audit conf
    // (SPARK_GRAFT_AUDIT — VERDICT r14 item 3): the sf10 sweep's
    // attribution pass reads it into SCALE.json next to the wall slope
    graft.util.Audit.candidates("candidates",
      if (dedupCandidates) raw.distinct() else raw)
  }

  /** Verification stage shared by the exact-similarity joins: join the
    * candidate pairs back to the full sets, compute the exact Jaccard
    * from one sorted-merge intersection count ([[SortedIntersectCount]]
    * — callers must build `hs` sorted-distinct), and keep qualifying
    * pairs. The candidate generator is a PLAN device — any lossless
    * superset yields the identical result here. */
  private def verifiedJaccardPairs(cands: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sets.select(col("doc_id").as("d1"), col("hs").as("h1"),
        col("s").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("hs").as("h2"),
        col("s").as("s2")), "d2")
      .withColumn("n_common",
        HashFunctions.sorted_intersect_count(col("h1"), col("h2")))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("s1") + col("s2") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("n_common"),
        col("s1").cast("long").as("s1"), col("s2").cast("long").as("s2"),
        col("jaccard"))

  // ── n-gram Jaccard ──────────────────────────────────────────────────
  /** Exact bigram-set Jaccard over pairs blocked by `source`, with
    * candidate generation through the AllPairs prefix filter at the
    * same rational threshold (t = 1/5). An earlier formulation joined
    * the RAW gram lists blocked only by `source`; this corpus' bigram
    * vocabulary saturates (~1k distinct bigrams over 256k gram rows at
    * sf0.1), so raw candidates approached all-pairs-within-block
    * (7.9M measured) and the join degraded quadratically with scale.
    * Prefix + length + positional pruning is lossless regardless of
    * vocabulary (PropertySpec fuzzes the bigram instantiation), and
    * its candidate set is a strict subset of the raw gram join's, so
    * the verified result — and the oracle — are unchanged.
    *
    * Gram hashes come from the single-pass [[BigramShingleHashes]]
    * expression (per-row distinct, no bigram strings materialized);
    * every shuffle in the plan carries 8-byte keys, never text. */
  def ngramJaccardPairs(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    // session-shared bigram index: feeds grams, dfreq and both verify
    // joins (hs sorted for the merge-count verify)
    val sets = GramIndex.bigramSourceSets(docs)
    // dedupCandidates = true: measured at sf0.1 the low-threshold
    // bigram instantiation surfaces each pair 2.3x (829k candidate
    // rows, 358k distinct), and the verify stage drags both full hash
    // arrays (~400 B/row) through its joins — a 16-byte pair-shuffle
    // dedup before verify beats re-verifying duplicates 1.5x warm
    // (and the gap widens with multiplicity at scale)
    val cands = prefixFilteredCandidates(sets, tNum, tDen, Seq("source"),
      spreadEnumeration = true)
    verifiedJaccardPairs(cands, sets, tNum.toDouble / tDen.toDouble)
  }

  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), 1, 5)
      .orderBy("d1", "d2")

  val ddNgramJaccardSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, source, bigram FROM (
      |    SELECT doc_id, source,
      |      unnest(list_transform(range(1, len(arr)),
      |        i -> arr[i] || ' ' || arr[i + 1])) AS bigram
      |    FROM (SELECT doc_id, source,
      |            regexp_split_to_array(text, '\s+') AS arr
      |          FROM documents))),
      |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b
      |    ON a.bigram = b.bigram AND a.source = b.source
      |    AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2, n_common, s1.set_size AS s1, s2.set_size AS s2,
      |  CAST(n_common AS DOUBLE) / CAST(s1.set_size + s2.set_size - n_common AS DOUBLE) AS jaccard
      |FROM inter
      |  JOIN sizes s1 ON inter.d1 = s1.doc_id
      |  JOIN sizes s2 ON inter.d2 = s2.doc_id
      |WHERE CAST(n_common AS DOUBLE) / CAST(s1.set_size + s2.set_size - n_common AS DOUBLE) >= 0.2
      |ORDER BY d1, d2""".stripMargin

  // ── prefix-filtered exact similarity join (AllPairs) ────────────────
  /** EXACT Jaccard-threshold pairs over the WHOLE corpus — no source
    * blocking, no LSH approximation — via prefix filtering (the
    * AllPairs/PPJoin family): under one global gram order (document
    * frequency ascending, then gram), any pair with J ≥ t must share
    * its RAREST common gram inside both docs' prefixes of length
    * `|d| − ⌈t·|d|⌉ + 1` (if the rarest common gram fell outside A's
    * prefix, every common gram would sit among A's last ⌈t·|A|⌉ − 1
    * grams, capping the overlap below t·|A| — contradiction, since
    * J ≥ t forces overlap ≥ t·|A| and ≥ t·|B|). So candidate
    * generation is a hash join on PREFIX grams only: frequent grams
    * fall out of prefixes, which is what kills the O(n²) gram-join
    * blowup — the scale path for exact (not approximate) dedup, next
    * to MinHash-LSH's approximate one. Candidates are verified by one
    * `array_intersect` on the full (sorted, distinct) hash sets.
    * t = 0.5 is built in integer form (`⌈|d|/2⌉ = (|d|+1) div 2`), so
    * prefix lengths are engine-exact.
    *
    * Shingles are word 4-GRAMS, not bigrams, and that is load-bearing:
    * prefix filtering prunes by doc frequency, and this corpus'
    * bigram vocabulary saturates (~1k distinct bigrams over 256k gram
    * rows at sf0.1 → every gram common → candidates ≈ all pairs,
    * measured 7.9M); the 4-gram vocabulary stays ~82% unique, so
    * prefixes are genuinely rare and the candidate join collapses to
    * the qualifying pairs themselves (measured 256 candidates vs
    * 12.5M possible pairs at sf0.1 — a 50,000× pruning). */
  def prefixJaccardPairs(docs: DataFrame): DataFrame =
    // the session-shared 4-gram index (reused by grams, df, both
    // verify joins — and by survivorship/fuzzy-decontamination runs
    // over the same corpus in the same session)
    prefixJaccardPairsFromSets(GramIndex.ngramSets(docs, 4))

  /** The same join over an already-built (doc_id, hs, s) sets table —
    * the entry point for a persisted [[GramIndex.saveIndex]] artifact,
    * where the corpus tokenize+hash scan happened at ingest and this
    * run never touches the text column at all. */
  def prefixJaccardPairsFromSets(sets: DataFrame): DataFrame = {
    val cands = prefixFilteredCandidates(sets, 1, 2)
    verifiedJaccardPairs(cands, sets, 0.5d)
  }

  def ddPrefixJaccard(spark: SparkSession, dir: String): DataFrame =
    prefixJaccardPairs(Tables.documents(spark, dir))
      .orderBy("d1", "d2")

  /** Oracle: the straightforward corpus-wide gram join at the same
    * threshold — the prefix filter is a PLAN device, invisible in the
    * result. */
  val ddPrefixJaccardSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(arr) - 2),
      |        i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2]
      |          || ' ' || arr[i + 3])) AS g
      |    FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr
      |          FROM documents))),
      |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b
      |    ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2, n_common, s1.set_size AS s1, s2.set_size AS s2,
      |  CAST(n_common AS DOUBLE)
      |    / CAST(s1.set_size + s2.set_size - n_common AS DOUBLE) AS jaccard
      |FROM inter
      |  JOIN sizes s1 ON inter.d1 = s1.doc_id
      |  JOIN sizes s2 ON inter.d2 = s2.doc_id
      |WHERE CAST(n_common AS DOUBLE)
      |    / CAST(s1.set_size + s2.set_size - n_common AS DOUBLE) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  // ── hot-bucket-capped within-bucket self-join ───────────────────────
  /** Every LSH-family candidate generator is "self-join rows sharing a
    * bucket key"; one degenerate bucket (boilerplate text, empty-doc
    * signatures, a zero embedding) puts n rows in one reducer and its
    * n²/2 pair enumeration on one task — the classic 100 TB melt. This
    * wrapper bounds per-task work with the triangle-block scheme
    * (Okcan & Riedewald's 1-bucket-theta decomposition), losing NO
    * pairs:
    *
    *  - buckets with n ≤ cap join as one block — zero overhead;
    *  - larger buckets hash rows into g = ⌈n/cap⌉ groups; each row
    *    replicates to the g blocks {(min(grp,x), max(grp,x))}. A cross
    *    pair (grp i ≠ j) shares EXACTLY one block, (min(i,j),max(i,j))
    *    — a common block's coordinate set must equal {i,x} and {j,y},
    *    forcing {i,j} — so no dedup is needed for cross pairs;
    *    same-group pairs share all g of their blocks, so the join
    *    condition restricts them to the diagonal (grp,grp). Each
    *    unordered pair therefore joins exactly once, and a block holds
    *    rows of at most two hash-groups — expected ≤ 2·cap rows, so
    *    enumeration per task is O(cap²) no matter how hot the bucket.
    *
    * The split is ADAPTIVE: one aggregate over 8-byte bucket keys
    * (map-side combined) probes for hot buckets first. When none
    * exists — the overwhelmingly common case — the plain self-join
    * runs unchanged: its two identical sides share one reused
    * exchange, so the probe is the only overhead. Only a real hot
    * bucket engages the triangle machinery, and then the size
    * annotation comes back as a BROADCAST left join of just the hot
    * keys (≤ |rows|/cap rows by construction, < 0.03% at the default
    * cap), never a re-shuffle of the row set. An earlier always-on
    * variant that shuffle-joined the full size table back benched
    * 2-3× slower across the whole LSH suite — the price of
    * annotating every row with "not hot".
    *
    * Returns the raw two-sided join aliased `a`/`b` (payload columns
    * intact) with `id(a) < id(b)`; callers select/verify as usual.
    * DedupSpec plants a hot bucket and proves the pair set equals the
    * uncapped join's, and that no block exceeds the 2·cap-scale bound.
    *
    * CONTRACT: the hot-bucket probe runs a Spark job at PLAN TIME, so
    * this builder is eager and batch-only (a streaming DataFrame cannot
    * be probed — the streaming gate in [[graft.streaming.StreamOps]]
    * uses the uncapped band join instead). Callers passing an expensive
    * `rows` subtree should persist it first (every in-repo caller does,
    * via [[graft.util.Caches.persistOnce]]) or the probe pass
    * recomputes that subtree once more per call. */
  def cappedBucketSelfJoin(rows: DataFrame, idCol: String,
      keyCols: Seq[String], cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val keyEq = keyCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val hot = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
    // eager probe (same contract as the isEmpty probes in the
    // pointer-jumping loop): a driver-side boolean buys the zero-
    // overhead plan in the no-hot-bucket case. Callers that feed an
    // expensive `rows` subtree persist it, so the probe pass reads
    // cache, not source.
    if (hot.isEmpty) {
      rows.alias("a").join(rows.alias("b"),
        keyEq && col(s"a.$idCol") < col(s"b.$idCol"))
    } else {
      val tagged = rows
        .join(broadcast(hot), keyCols, "left")
        .withColumn("__g", coalesce(
          expr(s"int((__n + ${cap - 1}) div $cap)"), lit(1)))
        .withColumn("__grp",
          pmod(xxhash64(col(idCol)), col("__g")).cast("int"))
        .withColumn("__x", explode(sequence(lit(0), col("__g") - 1)))
        .withColumn("__bi", least(col("__grp"), col("__x")))
        .withColumn("__bj", greatest(col("__grp"), col("__x")))
        .drop("__x", "__n", "__g")
      tagged.alias("a").join(tagged.alias("b"),
        keyEq &&
        col("a.__bi") === col("b.__bi") &&
        col("a.__bj") === col("b.__bj") &&
        col(s"a.$idCol") < col(s"b.$idCol") &&
        (col("a.__grp") =!= col("b.__grp") ||
          (col("a.__bi") === col("a.__grp") &&
           col("a.__bj") === col("a.__grp"))))
    }
  }

  // ── MinHash + LSH ───────────────────────────────────────────────────
  val MinHashK = 32 // signature width
  val LshBands = 8 // → 4 rows per band; P(candidate) ≈ 1-(1-j^4)^8
  val MinHashPrime = 2147483647L // 2^31-1
  /** Per-bucket row cap for LSH candidate joins: a block tops out near
    * 2·cap rows → ≤ ~2·cap² comparisons per task. */
  val LshBucketCap = 4096

  /** Deterministic per-function coefficients (odd multipliers; < 2^23
    * so the prime-field product stays ANSI-safe). */
  private def coefA(i: Int): Long = 2L * i + 1L + 104729L * i
  private def coefB(i: Int): Long = 7919L * (i + 1)

  /** The engine's default signature family — public so the SQL
    * catalog registers `minhash_signature` with the same planes. */
  val MinHashAs: Seq[Long] = (0 until MinHashK).map(coefA)
  val MinHashBs: Seq[Long] = (0 until MinHashK).map(coefB)

  /** Per-doc MinHash signature as an array column — one generated Java
    * loop per row ([[MinHashSignature]]): no explode, no shuffle,
    * signature width fixed regardless of doc size. */
  def withSignature(docsWithShingleHashes: DataFrame): DataFrame =
    docsWithShingleHashes.withColumn("signature",
      HashFunctions.minhash_signature(col("shingle_hashes"),
        (0 until MinHashK).map(coefA), (0 until MinHashK).map(coefB),
        MinHashPrime))

  /** Shingle-hash array per doc: one scan over the text bytes
    * ([[BigramShingleHashes]] — no token/bigram strings materialized;
    * proven byte-equivalent to the split+concat+hash formulation in
    * `ShingleExpressionsSpec`). */
  def withShingleHashes(docs: DataFrame): DataFrame =
    // full widen moved to GramIndex.bigramSourceSets (r17): the A/B
    // showed the 32-task fan-out wins on the gram-set consumers but
    // LOSES on the signature consumers at bench scale (dd_minhash_lsh
    // 1.13x, dd_incremental_minhash 1.41x). Chunked width keeps the
    // signature path single-task at bench bytes and restores the
    // fan-out as the corpus grows (sf10: +15% without it).
    graft.util.Par.widenChunked(docs)
      .withColumn("shingle_hashes",
      ShingleFunctions.bigram_shingle_hashes(col("text")))

  /** LSH banding: band key = hash of the signature slice; docs sharing
    * any (band, key) bucket are candidates. Output one row per doc per
    * band → the candidate join is a plain hash join on (band, key).
    * `carry` columns ride along unchanged (the streaming gate carries
    * the shingle set this way — a stream cannot join back to itself
    * for the verify stage). */
  def lshBuckets(signed: DataFrame, carry: Seq[String] = Nil)
      : DataFrame = {
    val rows = MinHashK / LshBands
    val bands = (0 until LshBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          slice(col("signature"), b * rows + 1, rows))).as("bucket"))
    }
    val keep = col("doc_id") +: carry.map(col)
    // degenerate docs (<2 tokens → null signature) must not band: they
    // would all hash to the empty-string bucket and pair quadratically
    signed.filter(col("signature").isNotNull)
      .select(keep :+ explode(array(bands: _*)).as("bb"): _*)
      .select(keep :+ col("bb.band") :+ col("bb.bucket"): _*)
  }

  /** Candidate pairs from shared LSH buckets, verified with exact
    * Jaccard over the shingle-hash sets. The bucket self-join runs
    * through [[cappedBucketSelfJoin]], so one degenerate bucket cannot
    * concentrate its quadratic enumeration on a single task. */
  def minhashDuplicatePairs(docs: DataFrame, threshold: Double,
      bucketCap: Int = LshBucketCap): DataFrame = {
    // signatures feed both the bucket join and the verification join —
    // the session-shared signature index computes them once per corpus
    // (at real scale this is a materialized signature table; callers
    // running many corpora should materialize signatures to storage)
    val signed = GramIndex.minhashSignatures(docs)
    val buckets = lshBuckets(signed)
    val cands = cappedBucketSelfJoin(buckets, "doc_id",
        Seq("band", "bucket"), bucketCap)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val sets = signed.select(col("doc_id"), col("shingle_hashes"))
    cands
      .join(sets.select(col("doc_id").as("d1"),
        col("shingle_hashes").as("h1")), "d1")
      .join(sets.select(col("doc_id").as("d2"),
        col("shingle_hashes").as("h2")), "d2")
      .withColumn("n_common", size(array_intersect(col("h1"), col("h2"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashDuplicatePairs(Tables.documents(spark, dir), 0.2)
      .orderBy("d1", "d2")

  /** Connected components over an undirected pair graph by min-label
    * propagation with pointer jumping: each round every node takes the
    * minimum of its own label and its neighbors' labels, then follows
    * the fresh label one more hop (label-of-label), so the remaining
    * distance to the component minimum roughly halves per round —
    * O(log diameter) rounds, each a few hash-shuffles over the PAIR
    * list (orders of magnitude smaller than the corpus at 100 TB).
    * No driver-side union-find: convergence is observed through a
    * LongAccumulator populated DURING each round's checkpoint
    * materialization — no separate probe pass.
    *
    * The loop body runs with AQE OFF (r16, guide §2.4/§1.2): the
    * round's plan shape is fully known — the edge table is
    * hash-partitioned once at setup and every shuffle is an
    * explicitly-hinted shuffled-hash join on that layout — so AQE's
    * per-exchange re-optimization buys nothing and costs one scheduled
    * job per exchange per round (measured r16 at bench scale: gr_cc
    * ran 76 jobs for 7 rounds, ~40 ms/job of pure scheduling; the
    * AQE-off loop runs ONE job per round). The hints also matter
    * under the static planner: checkpoint leaves have unknown stats,
    * which would otherwise plan sort-merge joins — SHUFFLE_HASH keeps
    * the rounds sort-free at every scale (labels per partition always
    * fit: they are (id,label) pairs of the hash-partitioned slice). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20)
      : DataFrame = {
    // localCheckpoint (eager) after every round: an iterative DataFrame
    // loop otherwise nests each round's join into the next round's
    // LOGICAL plan, and Catalyst re-analysis grows superlinearly with
    // depth — measured 20+ s/round by iteration 10 on a 300-edge graph
    // with persist() alone (persist caches data, not the plan).
    // Checkpointing resets the plan to a leaf so every round costs the
    // same few small shuffles.
    // The edge table is the loop's biggest operand and never changes:
    // hash-partition it by the join side ONCE and checkpoint —
    // localCheckpoint preserves the physical partitioning in the
    // LogicalRDD leaf, so every round's edges⋈labels join shuffles only
    // the (smaller) label side instead of re-exchanging edges per round.
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the PAIR LIST once under AQE — pair generation (LSH
    // verify, cosine blocking, order self-joins) is the part that
    // wants runtime skew/coalesce handling, and the doubled-edge union
    // below consumes it twice (r16: without this boundary both union
    // arms re-ran the whole generation unless ReuseExchange happened
    // to fire)
    val pairsCk = pairs.select(col("d1"), col("d2")).stageCheckpoint()
    // loop parallelism DERIVED from the materialized pair list (guide
    // §2: partitioning from input size, not a constant): AQE already
    // byte-sized the pair list's final shuffle, so its partition count
    // IS the scale signal — ×2 for the doubled edge table, capped at
    // the same 16×cores ceiling the AQE path uses. At bench scale this
    // is 1-2 partitions (the loop rounds are single-digit-task jobs);
    // at 100 TB the pair list lands thousands of partitions and the
    // loop inherits them.
    val cores = spark.sparkContext.defaultParallelism
    val loopParts = math.max(1, math.min(
      2 * pairsCk.rdd.getNumPartitions, 16 * cores))
    // AQE OFF for the loop operands and every round (see scaladoc):
    // fixed shapes, pre-partitioned edges, hinted joins. The scope is
    // a cloned session; the checkpointed pair list rebinds into it
    // (leaf plan — exact), and the converged labels rebind back out.
    graft.util.Par.loopScope(spark, loopParts) { scoped =>
    val pairsS = graft.util.Par.rebind(scoped, pairsCk.toDF())
    val edges = pairsS.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairsS.select(col("d2").as("a"), col("d1").as("b")))
      .repartition(loopParts, col("b"))
      .stageCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).stageCheckpoint()
    var iter = 0
    var converged = labels.isEmpty // no pairs → nothing to propagate
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    if (debug) System.err.println(
      s"[cc] loopParts=$loopParts pairsParts=${pairsCk.rdd.getNumPartitions}")
    // one hop as union + min-aggregate, not join + left-join: each
    // node's new label is min(own, neighbors'), so emit one self row
    // (id, label, old=label) plus one row (a, bl, old=null) per
    // directed edge and fold with a single map-side-partial min —
    // two exchanges (labels by b, union by id) where the former
    // join/left-join shape paid five. `max(old)` recovers the
    // previous label: exactly one self row per id carries non-null.
    // Then pointer jump: follow the fresh label one more hop (the
    // label of the node it points to). Composing the two mappings
    // roughly halves the remaining distance to the component minimum
    // each round — O(log diameter) rounds instead of O(diameter). The
    // jump only ever lowers labels within the component, so the
    // fixed-point argument is unchanged: a full no-op round means
    // label(a) ≤ label(b) across every (doubled) edge, i.e. labels
    // are constant per component. The probe side (jid = id) reuses
    // the aggregate's hash partitioning; only the lmin side shuffles.
    // SHUFFLE_HASH hints (build side = the hinted relation): with AQE
    // off the static planner sees unknown-stats checkpoint leaves and
    // would pick SortMergeJoin; the hint keeps every round sort-free.
    // The probe sides keep their layouts: edges reuses its hash(b)
    // checkpoint partitioning, and the self-join's j side reuses the
    // aggregate's hash(id) partitioning.
    def step(l: DataFrame): DataFrame = {
      val self = l.select(col("id"), col("label").as("contrib"),
        col("label").as("prev"))
      val nbr = edges
        .join(l.select(col("id").as("b"), col("label").as("bl"))
          .hint("SHUFFLE_HASH"), "b")
        .select(col("a").as("id"), col("bl").as("contrib"),
          lit(null).cast(self.schema("prev").dataType).as("prev"))
      val stepped = self.union(nbr).groupBy("id")
        .agg(min("contrib").as("lmin"), max("prev").as("old"))
      stepped.alias("s")
        .join(stepped.select(col("id").as("jid"), col("lmin").as("jl"))
            .alias("j").hint("SHUFFLE_HASH"),
          col("s.lmin") === col("j.jid"), "left")
        .select(col("s.id").as("id"), col("s.old").as("old"),
          least(col("s.lmin"), coalesce(col("j.jl"), col("s.lmin")))
            .as("label"))
    }
    // One step per checkpoint barrier — the THIRD and FOURTH
    // measured-and-rejected alternatives here (after round 8's extra
    // pointer-jump and small-graph repartition): round-11 A/B'd
    // batching TWO steps per localCheckpoint (halving barriers and
    // convergence probes), sf0.1 warm — (a) naive nesting LOST
    // (gr_cc 2.74→4.36 s, dd_minhash_groups 2.17→2.53 s,
    // sim_neardup_groups 1.83→2.40 s: the jump's self-join references
    // `stepped` twice, so the un-materialized step-1 subtree recomputes
    // in both join arms — the checkpoint is precisely what makes the
    // self-join read materialized data); (b) persist()ing step-1 inside
    // the batch ALSO lost (gr_cc 3.6 s, sim_neardup_groups 2.45 s:
    // same materialization count as two checkpoints, plus cache
    // registration churn). The per-round barrier is load-bearing, not
    // overhead; round cost is inherently ~2 small shuffles + 1
    // materialization, and batching cannot remove any of the three.
    while (!converged && iter < maxIters) {
      val t0 = System.nanoTime()
      // convergence rides the materialization itself (r16): a
      // LongAccumulator counts label moves DURING the checkpoint's
      // one pass, replacing the former per-round isEmpty probe job.
      // Task retries can only over-count — a zero stays a zero — so
      // the converged verdict is retry-safe; a false "not converged"
      // costs one provably-no-op extra round.
      val acc = spark.sparkContext.longAccumulator(s"cc-changed-$iter")
      val jumped = step(labels)
        .select(col("id").cast("long"), col("old").cast("long"),
          col("label").cast("long"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, old, label) =>
            if (label != old) acc.add(1L)
            (id, label)
          }
        }
        .toDF("id", "label")
        .stageCheckpoint()
      converged = acc.value == 0L
      labels = jumped
      iter += 1
      if (debug) System.err.println(
        f"[cc] round $iter%d ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          s" converged=$converged changed=${acc.value}")
    }
    // a component needing more than maxIters rounds (diameter beyond
    // ~2^maxIters with jumping) would return partially-propagated
    // labels — one duplicate cluster silently split into several
    // "keepers". Fail loudly so callers raise maxIters; hitting this
    // means the pair graph is pathological, which is worth knowing.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds; " +
          "a component has diameter > maxIters — raise maxIters")
    // scale telemetry: the decade sweeps report this next to the wall
    // slope (pointer jumping ⇒ rounds ~ log2(diameter), so the count
    // should hold ~flat as data grows 10×)
    graft.util.Rounds.record("cc", iter)
    // back to the caller's session: labels is a checkpoint leaf, so
    // the rebind is exact and downstream consumers plan under the
    // parent conf (AQE back on)
    graft.util.Par.rebind(spark, labels.toDF())
    }
  }

  /** End-to-end MinHash dedup keeper selection: verified LSH pairs →
    * connected components → one keeper (min doc_id) per duplicate
    * cluster, with the full sorted member list for auditability. */
  def minhashDuplicateGroups(docs: DataFrame, threshold: Double)
      : DataFrame =
    connectedComponents(
      minhashDuplicatePairs(docs, threshold).select("d1", "d2"))
      .groupBy(col("label").as("keeper"))
      .agg(count(lit(1)).as("cluster_size"),
        concat_ws(",",
          transform(array_sort(collect_list(col("id"))),
            _.cast("string"))) // sort as longs, not lexicographically
          .as("members"))
      .orderBy("keeper")

  def ddMinhashGroups(spark: SparkSession, dir: String): DataFrame =
    minhashDuplicateGroups(Tables.documents(spark, dir), 0.2)

  // ── LSH recall gate: brute-force truth on a bounded panel ───────────
  /** Docs with `doc_id` below this bound form the LSH audit panel: the
    * exact-truth computation is quadratic ONLY within the panel, so
    * capping panel membership by a constant (not a corpus fraction)
    * keeps the audit cost fixed while the corpus — and the LSH run
    * being audited — grow without bound. */
  val RecallPanelCap = 1000L

  /** Driver-visible quality gate for the MinHash-LSH family — the
    * `sim_ivf_recall` pattern applied to text dedup. Kept alongside the
    * now fully-SQL-oracled pair/group/incremental rows because it
    * checks the QUALITY contract rather than the output values:
    * ground truth is the exact whole-panel bigram Jaccard ≥ t pair set
    * (the same shingle definition the LSH verify stage uses, so LSH
    * output restricted to the panel must be a SUBSET of truth — any
    * extra pair means the verify stage broke), and banding theory puts
    * candidate probability at `1−(1−j⁴)⁸` ≥ 0.999 for the j ≥ 0.9
    * near-dups this corpus plants (observed recall 1.0 at sf0.01: 25
    * of 25 truth pairs recovered), so the 0.8 recall floor trips only
    * on a real collapse (broken banding, dropped buckets, signature
    * drift). Truth-side enumeration is a gram hash join within the
    * bounded panel — never all-pairs, never corpus-quadratic. */
  def minhashRecallGate(docs: DataFrame, threshold: Double = 0.2,
      panelCap: Long = RecallPanelCap): DataFrame = {
    val panel = GramIndex.bigramSourceSets(docs)
      .filter(col("doc_id") < panelCap)
      .select(col("doc_id"), col("hs"), col("s"))
    val grams = panel.select(col("doc_id"), explode(col("hs")).as("g"))
    val cands = grams.alias("a").join(grams.alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val truth = cands
      .join(panel.select(col("doc_id").as("d1"), col("hs").as("h1"),
        col("s").as("s1")), "d1")
      .join(panel.select(col("doc_id").as("d2"), col("hs").as("h2"),
        col("s").as("s2")), "d2")
      .withColumn("n_common",
        HashFunctions.sorted_intersect_count(col("h1"), col("h2")))
      .filter(col("n_common").cast("double") /
        (col("s1") + col("s2") - col("n_common")).cast("double")
        >= threshold)
      .select(col("d1"), col("d2"), lit(1L).as("in_truth"))
    val lsh = minhashDuplicatePairs(docs, threshold)
      .filter(col("d1") < panelCap && col("d2") < panelCap)
      .select(col("d1"), col("d2"), lit(1L).as("in_lsh"))
    // pair-set comparison as union + hash aggregate, not a full-outer
    // SortMergeJoin: tag each side's pairs with a channel flag, fold to
    // one row per pair with max(), then aggregate globally. Same
    // semantics (truth-only pairs get in_lsh = 0, lsh-only pairs get
    // in_truth = 0 — exactly the null/0 roles the outer join encoded),
    // one exchange on the panel-bounded pair sets, zero sorts.
    val tagged = truth
      .select(col("d1"), col("d2"),
        lit(1L).as("in_truth"), lit(0L).as("in_lsh"))
      .unionAll(lsh.select(col("d1"), col("d2"),
        lit(0L).as("in_truth"), lit(1L).as("in_lsh")))
      .groupBy("d1", "d2")
      .agg(max("in_truth").as("in_truth"), max("in_lsh").as("in_lsh"))
    tagged.agg(
      coalesce(sum("in_truth"), lit(0L)).as("n_true_pairs"),
      (coalesce(sum("in_truth"), lit(0L)) === 0L ||
        coalesce(sum(col("in_truth") * col("in_lsh")), lit(0L))
          .cast("double") * lit(1.0) >=
        lit(0.8) * coalesce(sum("in_truth"), lit(0L)).cast("double"))
        .as("recall_ok"),
      (coalesce(sum(when(col("in_truth") === 0L, 1L)), lit(0L)) === 0L)
        .as("subset_ok"))
  }

  def ddMinhashRecall(spark: SparkSession, dir: String): DataFrame =
    minhashRecallGate(Tables.documents(spark, dir))

  val ddMinhashRecallSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, bigram FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(arr)),
      |        i -> arr[i] || ' ' || arr[i + 1])) AS bigram
      |    FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr
      |          FROM documents WHERE doc_id < 1000))),
      |sizes AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b
      |    ON a.bigram = b.bigram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |truth AS (
      |  SELECT d1, d2 FROM inter
      |    JOIN sizes s1 ON inter.d1 = s1.doc_id
      |    JOIN sizes s2 ON inter.d2 = s2.doc_id
      |  WHERE CAST(n_common AS DOUBLE)
      |      / CAST(s1.s + s2.s - n_common AS DOUBLE) >= 0.2)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
      |  TRUE AS recall_ok, TRUE AS subset_ok FROM truth""".stripMargin

  // ── incremental dedup: new batch vs existing corpus ─────────────────
  /** Near-dup matches for a NEW batch against an EXISTING corpus plus
    * within the batch itself — the daily-ingest shape at 100 TB: the
    * corpus side contributes only its (persisted) signature/bucket
    * table, the joins are batch×corpus and batch×batch, and corpus ×
    * corpus — the quadratic term that dwarfs everything at scale — is
    * NEVER formed (the corpus was already deduped when ingested).
    * Output: one row per (batch doc, matched doc) with the exact
    * verified Jaccard and which side the match came from; `keep` marks
    * batch docs with no match anywhere. */
  def incrementalMinhashMatches(corpus: DataFrame, batch: DataFrame,
      threshold: Double, bucketCap: Int = LshBucketCap): DataFrame = {
    // the stored index — shared with the batch-only dedups and the
    // streaming ingest gate through the session signature registry
    val corpusSigned = GramIndex.minhashSignatures(corpus)
    val batchSigned = GramIndex.minhashSignatures(batch)
    val corpusBuckets = lshBuckets(corpusSigned)
    val batchBuckets = lshBuckets(batchSigned)
    // batch × corpus: plain asymmetric hash join on the band key — the
    // batch side is the small stream, the corpus side the big build;
    // no id< (the sides are disjoint), no triangle split needed because
    // per-bucket work is |batch ∩ bucket| · |corpus ∩ bucket| and the
    // batch factor is bounded by the ingest slice
    val crossCands = batchBuckets.alias("n").join(corpusBuckets.alias("o"),
        col("n.band") === col("o.band") && col("n.bucket") === col("o.bucket"))
      .select(col("n.doc_id").as("d1"), col("o.doc_id").as("d2"))
      .distinct()
      .withColumn("matched_in", lit("corpus"))
    // batch × batch: the capped self-join (a boilerplate-heavy crawl
    // slice is exactly where hot buckets appear)
    // within the batch the KEEPER is the smallest id, so the LARGER id
    // of each pair carries the match row (it is the one an ingest
    // drops); the smaller id stays clean unless the corpus matches it
    val selfCands = cappedBucketSelfJoin(batchBuckets, "doc_id",
        Seq("band", "bucket"), bucketCap)
      .select(col("b.doc_id").as("d1"), col("a.doc_id").as("d2"))
      .distinct()
      .withColumn("matched_in", lit("batch"))
    val sets = batchSigned.select(col("doc_id").as("d1"),
      col("shingle_hashes").as("h1"))
    val otherSets = corpusSigned.select(col("doc_id"), col("shingle_hashes"))
      .union(batchSigned.select(col("doc_id"), col("shingle_hashes")))
      .select(col("doc_id").as("d2"), col("shingle_hashes").as("h2"))
    crossCands.union(selfCands)
      .join(sets, "d1")
      .join(otherSets, "d2")
      .withColumn("n_common", size(array_intersect(col("h1"), col("h2"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1").as("batch_id"), col("d2").as("match_id"),
        col("matched_in"), col("jaccard"))
  }

  /** Declared query: docs with doc_id % 10 == 0 play the incoming
    * slice, the rest the standing corpus. Per batch doc: match count,
    * best match, and the keep/drop verdict an ingest pipeline acts on.
    * Fully oracled ([[ddIncrementalMinhashSql]] — the HUGEINT rolling-
    * hash device); DedupSpec additionally plants cross-set and in-batch
    * dups and asserts the verdicts. */
  def ddIncrementalVerdicts(corpus: DataFrame, batch: DataFrame,
      threshold: Double): DataFrame = {
    val matches = incrementalMinhashMatches(corpus, batch, threshold)
    batch.select(col("doc_id").as("batch_id"))
      .join(matches, Seq("batch_id"), "left")
      .groupBy("batch_id")
      .agg(count(col("match_id")).as("n_matches"),
        max(struct(col("jaccard"), col("match_id"), col("matched_in")))
          .as("best"))
      .select(col("batch_id"), col("n_matches"),
        col("best.match_id").as("best_match"),
        col("best.matched_in").as("best_side"),
        col("best.jaccard").as("best_jaccard"),
        (col("n_matches") === 0).as("keep"))
      .orderBy("batch_id")
  }

  def ddIncrementalMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    ddIncrementalVerdicts(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0), 0.2)
  }

  // ── SimHash ─────────────────────────────────────────────────────────
  /** 64-bit SimHash per doc, zero-shuffle: token-hash array → per-bit
    * majority vote → packed long, one generated loop per row
    * ([[SimHash64]]; replaced a 64-pass HOF chain that benched 30×
    * slower at sf0.1). */
  def withSimhash(docs: DataFrame): DataFrame =
    // chunk-widened (r17): the full fan-out measured 1.64x on
    // dd_simhash at bench scale (0.61 -> 1.01 s — the single-pass
    // SimHash64 kernel is cheaper than 32 tasks' overhead); chunked
    // width is a no-op at bench bytes, wide as the corpus grows
    graft.util.Par.widenChunked(docs)
      .withColumn("tok_hashes", array_distinct(
        transform(split(col("text"), "\\s+"),
          t => HashFunctions.rolling_hash(t))))
      .withColumn("simhash", HashFunctions.simhash64(col("tok_hashes")))
      .drop("tok_hashes")

  /** All-pairs near-dup baseline (O(n²) per source block) — retained
    * ONLY as the exactness reference for [[simhashPairsBanded]]'s
    * result-equivalence spec; never declared as a query. */
  def simhashPairsAllPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val s = withSimhash(docs).select(
      col("doc_id"), col("source"), col("simhash"))
    s.alias("a").join(s.alias("b"),
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("hamming"))
  }

  /** Near-dup pairs by hamming ≤ maxHamming over SimHash — banded
    * candidate generation, the shape that survives 100 TB. Pigeonhole:
    * the 64 bits are split into `maxHamming + 1` disjoint bands, so any
    * pair within the radius differs in at most maxHamming bands and
    * therefore matches EXACTLY on at least one band → candidates come
    * from a hash join on (band, bits, source), never an all-pairs
    * block scan; candidates are verified with bit_count(xor). Result-
    * identical to [[simhashPairsAllPairs]] (DedupSpec asserts).
    * Radius 3 → 4 bands of 16 bits (64k buckets per band). */
  def simhashPairsBanded(docs: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(bands >= 2 && bands <= 32,
      s"banded simhash supports radius 1..31, got $maxHamming")
    val width = 64 / bands
    // fingerprints feed the size agg and both sides of the candidate
    // join — persist so tokenize+hash runs once (~24 bytes/doc; at
    // real scale this is the stored fingerprint table, same contract
    // as the minhash signature persist below)
    val s = graft.util.Caches.persistOnce(withSimhash(docs).select(
      col("doc_id"), col("source"), col("simhash")))
    val bandCols = (0 until bands).map { b =>
      val shifted = shiftrightunsigned(col("simhash"), b * width)
      val bits = // last band keeps the leftover high bits
        if (b == bands - 1) shifted
        else shifted.bitwiseAND(lit((1L << width) - 1))
      struct(lit(b).as("band"), bits.as("bits"))
    }
    val banded = s
      .select(col("doc_id"), col("source"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("source"), col("simhash"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    // identical fingerprints (exact-dup boilerplate) collide in EVERY
    // band bucket — the capped join keeps that worst case off a single
    // task without losing a pair
    cappedBucketSelfJoin(banded, "doc_id",
        Seq("band", "bits", "source"), LshBucketCap)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can match in several bands
  }

  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairsBanded(Tables.documents(spark, dir), 3)
      .orderBy("d1", "d2")

  /** DuckDB emulation of the whole SimHash pipeline, making
    * `dd_simhash` hash-exact rather than rows-only: rolling-hash each
    * distinct whitespace token (HUGEINT fold mod 2^64, see
    * [[TextAnalysis.taFingerprintSql]]), take the per-bit weak-majority
    * vote (`2·cnt ≥ n`, [[SimHash64]]'s tie rule), pack the 64 bits,
    * band into 4×16-bit keys and hash-join candidates — the same
    * pigeonhole construction as [[simhashPairsBanded]], so the result
    * sets must be identical pair-for-pair. */
  val ddSimhashSql: String =
    """WITH th AS (
      |  SELECT DISTINCT doc_id, source,
      |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(string_split(tok,''),
      |        c -> CAST(ascii(c) AS HUGEINT))),
      |      (acc,c) -> (acc*1000003+c)%18446744073709551616) AS uh
      |  FROM (SELECT doc_id, source,
      |          unnest(regexp_split_to_array(text,'\s+')) AS tok
      |        FROM documents)),
      |counts AS (
      |  SELECT doc_id, source, j,
      |    SUM(CASE WHEN (uh // (CAST(1 AS HUGEINT) << j)) % 2 = 1
      |        THEN 1 ELSE 0 END) AS cnt,
      |    COUNT(*) AS n
      |  FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) bits
      |  GROUP BY 1,2,3),
      |sh AS (
      |  SELECT doc_id, source,
      |    CAST(SUM(CASE WHEN 2*cnt >= n
      |      THEN (CAST(1 AS HUGEINT) << j) ELSE 0 END) AS HUGEINT) AS su
      |  FROM counts GROUP BY 1,2),
      |banded AS (
      |  SELECT doc_id, source, su, b,
      |    (su // (CAST(1 AS HUGEINT) << (16*b))) % 65536 AS bits
      |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS b) bands),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |    a.su AS su1, b.su AS su2
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.bits = b.bits AND a.source = b.source
      |   AND a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  bit_count(xor(
      |    CAST(CASE WHEN su1 >= 9223372036854775808
      |      THEN su1 - 18446744073709551616 ELSE su1 END AS BIGINT),
      |    CAST(CASE WHEN su2 >= 9223372036854775808
      |      THEN su2 - 18446744073709551616 ELSE su2 END AS BIGINT)))
      |    AS hamming
      |FROM cand
      |WHERE hamming <= 3
      |ORDER BY d1, d2""".stripMargin

  // ── exact span (substring) dedup ────────────────────────────────────
  /** Corpus-wide duplicate-SPAN accounting — the fixed-length-window
    * approximation of suffix-array exact-substring dedup (the
    * "dedup repeated 50-token spans" rule): every token `n`-gram
    * position in every doc is classified as duplicated iff that exact
    * n-gram occurs in more than one document, and each doc reports its
    * boilerplate fraction. Spans travel as 64-bit rolling hashes from
    * the single-pass [[NgramHashes]] scan — no gram strings are ever
    * materialized or shuffled; the plan is one grouped pass over span
    * hashes plus one join back (both shuffles carry 8-byte keys). Same
    * collision caveat as [[TrainPrep.dcDecontamination]]: hashed-span
    * counts equal string-span counts unless two distinct grams collide
    * in 64 bits (birthday bound ~2^32 grams — not reachable per doc).
    * `dup_frac` divides two exact integers once in double. */
  def spanDuplication(docs0: DataFrame, n: Int): DataFrame = {
    // chunk-widened (r17): full fan-out A/B'd 1.21x on dd_span_dedup
    val docs = graft.util.Par.widenChunked(docs0)
    val grams = docs.select(col("doc_id"),
      explode(TrainPrep.ngramHashes(col("text"), n)).as("g"))
    val nd = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val perDoc = grams.join(nd, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("n_docs") > 1, 1)).as("n_dup_spans"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0d))
          .otherwise(col("n_dup_spans").cast("double") /
            col("n_spans").cast("double")).as("dup_frac"))
      .orderBy("doc_id")
  }

  def ddSpanDedup(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    spanDuplication(Tables.documents(spark, dir), n)

  def ddSpanDedupSql(n: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(a) - $n + 2),
       |    i -> array_to_string(a[i:i+${n - 1}], ' '))) AS g
       |  FROM toks WHERE len(a) >= $n),
       |nd AS (SELECT g, COUNT(DISTINCT doc_id) AS n_docs
       |       FROM grams GROUP BY g),
       |per_doc AS (
       |  SELECT doc_id, COUNT(*) AS n_spans,
       |    COUNT(CASE WHEN n_docs > 1 THEN 1 END) AS n_dup_spans
       |  FROM grams JOIN nd USING (g) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_spans, 0) AS n_spans,
       |  COALESCE(n_dup_spans, 0) AS n_dup_spans,
       |  CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0.0
       |       ELSE CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE)
       |  END AS dup_frac
       |FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ── exact-substring span EXCISION (the Lee et al. cleaned corpus) ──
  /** [[spanDuplication]] reports; this REMOVES — the operator a real
    * training pipeline runs (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": excise every ≥n-token span shared
    * verbatim across documents). Duplicated fixed-width windows
    * (64-bit rolling hashes from the single-pass [[NgramHashes]] scan,
    * position-tagged) merge into MAXIMAL token spans per doc — two
    * windows overlap-or-touch iff the next start is within n of the
    * previous — then map to character offsets in the single-space-
    * joined text and excise, leaving the kept tokens re-joined.
    *
    * Scale shape: both shuffles carry 8-byte gram hashes (the grouped
    * duplicate classification and the join back); the merge fold,
    * offset arithmetic and residual build are per-doc higher-order
    * functions over doc-bounded arrays — no corpus-sized window, no
    * driver-side state. Returns (doc_id, a = tokens, spans =
    * array<struct<s,e>> inclusive token intervals, ascending,
    * non-overlapping; empty for clean docs). */
  def spanExcision(docs0: DataFrame, n: Int): DataFrame = {
    // chunk-widened (r17): full fan-out A/B'd 1.94x on dd_span_excise
    // (the dataset-build path stays fully wide: its caller feeds an
    // already-widened survivor frame, which chunked leaves alone)
    val docs = graft.util.Par.widenChunked(docs0)
    val grams = docs.select(col("doc_id"),
      posexplode(TrainPrep.ngramHashes(col("text"), n)).as(Seq("pos", "g")))
    val dup = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("g")
    val flagged = grams.join(dup, "g")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("poss"))
    val merged = flagged.select(col("doc_id"), expr(s"""
      aggregate(poss, cast(array() as array<struct<s:int,e:int>>),
        (acc, p) -> CASE
          WHEN size(acc) > 0 AND p <= element_at(acc, -1).e + 1 THEN
            concat(slice(acc, 1, size(acc) - 1),
              array(named_struct('s', element_at(acc, -1).s,
                'e', p + ${n - 1})))
          ELSE concat(acc, array(named_struct('s', p, 'e', p + ${n - 1})))
        END)""").as("spans"))
    docs.select(col("doc_id"), split(col("text"), " ").as("a"))
      .join(merged, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        expr("cast(array() as array<struct<s:int,e:int>>)")))
  }

  /** Char offset of a span's first token in the single-space text (a
    * kept leading space belongs to the PRECEDING kept region). */
  private def startCharSql = """CASE WHEN sp.s = 0 THEN 0
    ELSE length(concat_ws(' ', slice(a, 1, sp.s))) + 1 END"""
  /** Exclusive char end: length of the join of tokens 0..e. */
  private def endCharSql =
    "length(concat_ws(' ', slice(a, 1, sp.e + 1)))"

  /** Per-doc cleaned-corpus summary: spans removed, tokens/chars
    * excised, and the residual text's length + MD5 (the driver-
    * hashable stand-in for shipping the cleaned text itself). */
  def ddSpanExcise(spark: SparkSession, dir: String, n: Int = 8)
      : DataFrame =
    ddSpanExciseFrom(Tables.documents(spark, dir), n)

  def ddSpanExciseFrom(docs: DataFrame, n: Int = 8): DataFrame =
    spanExcision(docs, n)
      .withColumn("residual", expr(
        """concat_ws(' ', filter(a, (t, i) ->
          |  NOT exists(spans, sp -> i >= sp.s AND i <= sp.e)))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("spans")).cast("long").as("n_spans"),
        expr("aggregate(spans, 0L, (acc, sp) -> acc + sp.e - sp.s + 1)")
          .as("removed_tokens"),
        expr(s"""aggregate(spans, 0L,
          (acc, sp) -> acc + $endCharSql - ($startCharSql))""")
          .as("removed_chars"),
        length(col("residual")).cast("long").as("residual_len"),
        md5(col("residual")).as("residual_hash"))
      .orderBy("doc_id")

  /** The excised spans themselves — token and character offsets per
    * removed region (what a pipeline logs for audit / applies to the
    * raw bytes). Clean docs contribute no rows. */
  def ddSpanExciseSpans(spark: SparkSession, dir: String, n: Int = 8)
      : DataFrame =
    ddSpanExciseSpansFrom(Tables.documents(spark, dir), n)

  def ddSpanExciseSpansFrom(docs: DataFrame, n: Int = 8): DataFrame =
    spanExcision(docs, n)
      .select(col("doc_id"), col("a"),
        posexplode(col("spans")).as(Seq("idx", "sp")))
      .select(col("doc_id"),
        (col("idx") + 1).cast("long").as("span_idx"),
        col("sp.s").cast("long").as("s_tok"),
        col("sp.e").cast("long").as("e_tok"),
        expr(startCharSql).cast("long").as("start_char"),
        expr(endCharSql).cast("long").as("end_char"))
      .orderBy("doc_id", "span_idx")

  /** Shared oracle CTEs: the same span algebra on gram STRINGS (the
    * hash-vs-string caveat of [[spanDuplication]] applies), islands by
    * the same touch rule, offsets by the same prefix-join lengths. */
  private[graft] def spanExciseCtes(n: Int, src: String = "documents")
      : String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS a FROM $src),
       |g2 AS (
       |  SELECT doc_id, u.pos AS pos, u.g AS g FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(a) - $n + 2),
       |      i -> struct_pack(pos := i - 1,
       |        g := array_to_string(a[i:i+${n - 1}], ' ')))) AS u
       |    FROM toks WHERE len(a) >= $n)),
       |nd AS (SELECT g FROM g2 GROUP BY g
       |       HAVING COUNT(DISTINCT doc_id) > 1),
       |flagged AS (SELECT doc_id, pos FROM g2 JOIN nd USING (g)),
       |w AS (SELECT doc_id, pos,
       |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |          ORDER BY pos) <= $n THEN 0 ELSE 1 END AS brk
       |      FROM flagged),
       |isl AS (SELECT doc_id, pos,
       |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos)
       |            AS island
       |        FROM w),
       |spans AS (SELECT doc_id, island, MIN(pos) AS s_tok,
       |            MAX(pos) + $n - 1 AS e_tok
       |          FROM isl GROUP BY doc_id, island),
       |spanc AS (
       |  SELECT s.doc_id, s.s_tok, s.e_tok,
       |    ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY s.s_tok)
       |      AS span_idx,
       |    CASE WHEN s.s_tok = 0 THEN 0
       |         ELSE len(array_to_string(t.a[1:s.s_tok], ' ')) + 1
       |    END AS start_char,
       |    len(array_to_string(t.a[1:s.e_tok + 1], ' ')) AS end_char
       |  FROM spans s JOIN toks t ON s.doc_id = t.doc_id)""".stripMargin

  /** Residual-text CTEs (depend on `toks` + `spans` from
    * [[spanExciseCtes]]): per-doc cleaned text after span removal.
    * Shared by [[ddSpanExciseSql]] and [[DatasetBuild]]'s oracles. */
  private[graft] val residualCtes: String =
    s""",
       |covered AS (SELECT doc_id, unnest(range(s_tok, e_tok + 1)) AS p
       |            FROM spans),
       |alltoks AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(a) + 1),
       |    i -> struct_pack(p := i - 1, tok := a[i]))) AS u FROM toks)),
       |resid AS (
       |  SELECT at.doc_id,
       |    coalesce(string_agg(at.tok, ' ' ORDER BY at.p), '')
       |      AS residual
       |  FROM alltoks at
       |  LEFT JOIN covered c ON at.doc_id = c.doc_id AND at.p = c.p
       |  WHERE c.p IS NULL
       |  GROUP BY at.doc_id)""".stripMargin

  def ddSpanExciseSql(n: Int = 8): String =
    spanExciseCtes(n) + residualCtes +
      s""",
       |perdoc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |    CAST(SUM(e_tok - s_tok + 1) AS BIGINT) AS removed_tokens,
       |    CAST(SUM(end_char - start_char) AS BIGINT) AS removed_chars
       |  FROM spanc GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(p.n_spans, 0) AS n_spans,
       |  COALESCE(p.removed_tokens, 0) AS removed_tokens,
       |  COALESCE(p.removed_chars, 0) AS removed_chars,
       |  CAST(len(COALESCE(r.residual, '')) AS BIGINT) AS residual_len,
       |  md5(COALESCE(r.residual, '')) AS residual_hash
       |FROM documents d
       |LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |LEFT JOIN resid r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin

  def ddSpanExciseSpansSql(n: Int = 8): String =
    spanExciseCtes(n) +
      s"""
       |SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
       |  CAST(s_tok AS BIGINT) AS s_tok, CAST(e_tok AS BIGINT) AS e_tok,
       |  CAST(start_char AS BIGINT) AS start_char,
       |  CAST(end_char AS BIGINT) AS end_char
       |FROM spanc ORDER BY doc_id, span_idx""".stripMargin

  // ── full MinHash-LSH oracle: the pipeline re-expressed in SQL ───────
  /** DuckDB reproduction of the whole MinHash-LSH pipeline, moving
    * `dd_minhash_lsh`/`dd_minhash_groups`/`dd_incremental_minhash`
    * from rows-only to hash-exact oracle rows. Three devices:
    *
    *  1. The wrapping-Long rolling hash ([[graft.functions.RollingHash]])
    *     is exact modular arithmetic in HUGEINT: each fold step is
    *     `(acc·base + byte) mod 2⁶⁴` (int128 never overflows at
    *     ≤ 2⁸⁴), re-signed at the end. Bytes come from `ord()` over
    *     single chars — byte-exact because the testdata corpus is pure
    *     ASCII (probed; a non-ASCII corpus would need a blob fold).
    *  2. The MinHash slots are plain BIGINT modular arithmetic (the
    *     expression keeps products under 2⁵³ by construction), and the
    *     xxhash64 BAND key is replaced by band-slice EQUALITY — same
    *     candidate set modulo a 2⁻⁶⁴ xxhash collision (which would
    *     surface as a driver hash mismatch, not silently).
    *  3. Connected components — iterative in Spark — is a recursive-CTE
    *     transitive closure (bounded: closure size is Σ component², and
    *     verified duplicate clusters are tiny at oracle scale).
    *
    * The hot-bucket triangle split ([[cappedBucketSelfJoin]]) is a
    * physical no-op below `LshBucketCap` rows per bucket, which holds
    * at every oracle SF; the oracle therefore joins plain buckets. */
  private def minhashCommonCtes: String = {
    val slotVals = (0 until MinHashK)
      .map(i => s"(${i}, ${coefA(i)}, ${coefB(i)})").mkString(", ")
    val rows = MinHashK / LshBands
    s"""doc_bigrams AS (
       |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
       |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
       |        FROM documents) t,
       |       unnest(generate_series(1, len(toks) - 1)) AS u(i)),
       |doc_hashes AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
       |      THEN hv - 18446744073709551616::HUGEINT ELSE hv END
       |      AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id,
       |      list_reduce(
       |        list_prepend(0::HUGEINT,
       |          list_transform(string_split(bg, ''),
       |            ch -> ord(ch)::HUGEINT)),
       |        (acc, x) -> (acc * ${HashFunctions.DefaultBase} + x)
       |          % 18446744073709551616::HUGEINT) AS hv
       |    FROM doc_bigrams) t),
       |slots AS (SELECT * FROM (VALUES $slotVals) s(slot, a, b)),
       |sigs AS (
       |  SELECT doc_id, slot,
       |    MIN(((((h % $MinHashPrime) + $MinHashPrime) % $MinHashPrime)
       |      * a + b) % $MinHashPrime) AS minv
       |  FROM doc_hashes, slots GROUP BY doc_id, slot),
       |bandkeys AS (
       |  SELECT doc_id, slot // $rows AS band,
       |    array_to_string(list(minv ORDER BY slot), ',') AS key
       |  FROM sigs GROUP BY doc_id, band),
       |sizes AS (
       |  SELECT doc_id, COUNT(*) AS n FROM doc_hashes GROUP BY doc_id)"""
      .stripMargin
  }

  /** LSH pair CTEs on top of [[minhashCommonCtes]]: bucket self-join →
    * distinct candidates → exact-Jaccard verify at `threshold`. */
  private def minhashPairCtes(threshold: Double): String =
    s"""cands AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bandkeys a JOIN bandkeys b
       |    ON a.band = b.band AND a.key = b.key
       |      AND a.doc_id < b.doc_id),
       |common_cnt AS (
       |  SELECT c.d1, c.d2, COUNT(y.h) AS n_common
       |  FROM cands c
       |  LEFT JOIN doc_hashes x ON x.doc_id = c.d1
       |  LEFT JOIN doc_hashes y ON y.doc_id = c.d2 AND y.h = x.h
       |  GROUP BY c.d1, c.d2),
       |pairs AS (
       |  SELECT cc.d1, cc.d2,
       |    CAST(cc.n_common AS DOUBLE)
       |      / CAST(s1.n + s2.n - cc.n_common AS DOUBLE) AS jaccard
       |  FROM common_cnt cc
       |  JOIN sizes s1 ON s1.doc_id = cc.d1
       |  JOIN sizes s2 ON s2.doc_id = cc.d2
       |  WHERE CAST(cc.n_common AS DOUBLE)
       |      / CAST(s1.n + s2.n - cc.n_common AS DOUBLE) >= $threshold)"""
      .stripMargin

  def ddMinhashLshSql(threshold: Double = 0.2): String =
    s"""WITH
       |$minhashCommonCtes,
       |${minhashPairCtes(threshold)}
       |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin

  def ddMinhashGroupsSql(threshold: Double = 0.2): String =
    s"""WITH RECURSIVE
       |$minhashCommonCtes,
       |${minhashPairCtes(threshold)},
       |edges AS (
       |  SELECT d1 AS n1, d2 AS n2 FROM pairs
       |  UNION ALL SELECT d2, d1 FROM pairs),
       |reach AS (
       |  SELECT n1 AS node, n1 AS lbl FROM edges
       |  UNION
       |  SELECT e.n2 AS node, r.lbl FROM reach r
       |    JOIN edges e ON e.n1 = r.node),
       |labels AS (SELECT node, MIN(lbl) AS label FROM reach GROUP BY node)
       |SELECT label AS keeper, CAST(COUNT(*) AS BIGINT) AS cluster_size,
       |  string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
       |FROM labels GROUP BY label ORDER BY keeper""".stripMargin

  /** Oracle for [[ddIncrementalMinhash]]: batch = doc_id % 10 = 0, the
    * rest the standing corpus; candidates are batch×corpus (asymmetric)
    * plus batch×batch with the LARGER id carrying the pair (matching
    * [[incrementalMinhashMatches]]'s keeper convention); the best-match
    * struct max is a (jaccard, match_id, matched_in) DESC row_number. */
  def ddIncrementalMinhashSql(threshold: Double = 0.2): String =
    s"""WITH
       |$minhashCommonCtes,
       |cross_cands AS (
       |  SELECT DISTINCT n.doc_id AS d1, o.doc_id AS d2,
       |    'corpus' AS matched_in
       |  FROM bandkeys n JOIN bandkeys o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0),
       |self_cands AS (
       |  SELECT DISTINCT b.doc_id AS d1, a.doc_id AS d2,
       |    'batch' AS matched_in
       |  FROM bandkeys a JOIN bandkeys b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0),
       |all_cands AS (
       |  SELECT * FROM cross_cands UNION ALL SELECT * FROM self_cands),
       |common_cnt AS (
       |  SELECT c.d1, c.d2, c.matched_in, COUNT(y.h) AS n_common
       |  FROM all_cands c
       |  LEFT JOIN doc_hashes x ON x.doc_id = c.d1
       |  LEFT JOIN doc_hashes y ON y.doc_id = c.d2 AND y.h = x.h
       |  GROUP BY c.d1, c.d2, c.matched_in),
       |matches AS (
       |  SELECT cc.d1 AS batch_id, cc.d2 AS match_id, cc.matched_in,
       |    CAST(cc.n_common AS DOUBLE)
       |      / CAST(s1.n + s2.n - cc.n_common AS DOUBLE) AS jaccard
       |  FROM common_cnt cc
       |  JOIN sizes s1 ON s1.doc_id = cc.d1
       |  JOIN sizes s2 ON s2.doc_id = cc.d2
       |  WHERE CAST(cc.n_common AS DOUBLE)
       |      / CAST(s1.n + s2.n - cc.n_common AS DOUBLE) >= $threshold),
       |batch_ids AS (
       |  SELECT doc_id AS batch_id FROM documents WHERE doc_id % 10 = 0),
       |ranked AS (
       |  SELECT b.batch_id, m.match_id, m.matched_in, m.jaccard,
       |    COUNT(m.match_id) OVER (PARTITION BY b.batch_id) AS n_matches,
       |    ROW_NUMBER() OVER (PARTITION BY b.batch_id
       |      ORDER BY m.jaccard DESC NULLS LAST, m.match_id DESC NULLS LAST,
       |        m.matched_in DESC NULLS LAST) AS rk
       |  FROM batch_ids b LEFT JOIN matches m USING (batch_id))
       |SELECT batch_id, CAST(n_matches AS BIGINT) AS n_matches,
       |  match_id AS best_match, matched_in AS best_side,
       |  jaccard AS best_jaccard, n_matches = 0 AS keep
       |FROM ranked WHERE rk = 1 ORDER BY batch_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (ddExact _),
    "dd_survivorship" -> (ddSurvivorship _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_prefix_jaccard" -> (ddPrefixJaccard _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_minhash_groups" -> (ddMinhashGroups _),
    "dd_minhash_recall" -> (ddMinhashRecall _),
    "dd_incremental_minhash" -> (ddIncrementalMinhash _),
    "dd_simhash" -> (ddSimhash _),
    "dd_span_dedup" -> ((s: SparkSession, d: String) => ddSpanDedup(s, d)),
    "dd_span_excise" -> ((s: SparkSession, d: String) => ddSpanExcise(s, d)),
    "dd_span_excise_spans" ->
      ((s: SparkSession, d: String) => ddSpanExciseSpans(s, d)))

  def oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_survivorship" -> ddSurvivorshipSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_prefix_jaccard" -> ddPrefixJaccardSql,
    "dd_minhash_lsh" -> ddMinhashLshSql(),
    "dd_minhash_groups" -> ddMinhashGroupsSql(),
    "dd_incremental_minhash" -> ddIncrementalMinhashSql(),
    "dd_minhash_recall" -> ddMinhashRecallSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_span_dedup" -> ddSpanDedupSql(),
    "dd_span_excise" -> ddSpanExciseSql(),
    "dd_span_excise_spans" -> ddSpanExciseSpansSql())
}
