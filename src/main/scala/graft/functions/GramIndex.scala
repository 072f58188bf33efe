package graft.functions

import graft.util.Caches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-shared shingle/signature index tables for the dedup and
  * decontamination family — the `ix_postings` pattern applied to the
  * similarity-join inputs.
  *
  * Every exact-similarity and LSH operator starts from the same
  * derived table: the per-doc set of gram hashes (4-gram, bigram) or
  * the MinHash signature over it. Round 5 measured each of
  * `dd_prefix_jaccard`, `dd_survivorship`, `dc2_fuzzy_decontamination`
  * rebuilding the 4-gram set table from the raw text per query. At
  * 100 TB the gram index is materialized ONCE per (corpus, shape) and
  * amortized across every dedup/decontamination/audit run over that
  * corpus — this registry is the in-session form of that contract:
  * the first caller builds and persists; later callers (same session,
  * same source plan) reuse the cached blocks.
  *
  * Keying and bounds live in [[Caches.PlanMemo]] (shared with the
  * Bloom model-state cache): (session, canonicalized source plan,
  * shape), wholesale clear at the bound with unpersist-on-evict so a
  * dropped entry's blocks free immediately. The registry stores PLANS
  * (persisted DataFrames), not data: entries re-persist lazily after
  * a [[Caches.releaseAll]] sweep (persist keeps lineage, so a swept
  * entry silently rebuilds — which is why these use persist and NOT
  * localCheckpoint, whose truncated lineage cannot recompute).
  */
object GramIndex {

  private val registry = new Caches.PlanMemo[String, DataFrame](
    maxEntries = 64, onEvict = _.unpersist(blocking = false))

  def invalidate(): Unit = registry.invalidate()

  /** Build-once lookup: `build` runs on first use per (session, source
    * plan, shape); every access routes through
    * [[Caches.persistOnce]] so swept entries re-persist. */
  private def cached(source: DataFrame, shape: String)
      (build: => DataFrame): DataFrame =
    Caches.persistOnce(registry.get(source, shape)(build))

  /** Per-(doc, word-bigram) term-frequency table — the shared map
    * phase of the whole search-index family (postings build, boolean
    * AND, BM25, positional phrase, hybrid retrieval): five queries
    * each rebuilt this word-count-shaped aggregate from raw text per
    * run. Terms stay STRINGS here because the DuckDB oracles compare
    * them (at 100 TB the term rides as a 64-bit hash + dictionary
    * side-table, as [[CorpusOps.surprisalScores]] does). */
  def occurrenceCounts(docs: DataFrame): DataFrame =
    cached(docs, "occ_bigram_tf") {
      docs
        .withColumn("__toks", split(col("text"), " "))
        .select(col("doc_id"),
          explode(expr("transform(slice(__toks, 1, size(__toks) - 1), " +
            "(t, i) -> concat(t, ' ', element_at(__toks, i + 2)))"))
            .as("t"))
        .groupBy("doc_id", "t")
        .agg(count(lit(1)).as("tf"))
    }

  /** Sorted-distinct word n-gram hash sets: (doc_id, hs, s), empty
    * sets dropped. The shared input of [[Dedup.prefixJaccardPairs]],
    * [[Dedup.survivorshipBySource]] and
    * [[TrainPrep.dc2FuzzyDecontamination]] (all 4-gram, t=1/2).
    * Hashes come from the single-pass [[NgramHashes]] scan — no gram
    * strings materialized; `hs` is sorted for the merge-count verify
    * kernel ([[SortedIntersectCount]]). */
  def ngramSets(docs: DataFrame, n: Int): DataFrame =
    cached(docs, s"ngram_sets_$n") {
      docs
        .select(col("doc_id"), array_sort(array_distinct(
          ShingleFunctions.ngram_hashes(col("text"), n))).as("hs"))
        .withColumn("s", size(col("hs")))
        .filter(col("s") > 0)
    }

  /** Sorted-distinct word-bigram hash sets with the `source` blocking
    * column: (doc_id, source, hs, s) — [[Dedup.ngramJaccardPairs]]'s
    * input shape. */
  def bigramSourceSets(docs: DataFrame): DataFrame =
    cached(docs, "bigram_source_sets") {
      Dedup.withShingleHashes(docs)
        .select(col("doc_id"), col("source"),
          array_sort(col("shingle_hashes")).as("hs"))
        .withColumn("s", size(col("hs")))
        .filter(col("s") > 0)
    }

  /** MinHash signature table: (doc_id, shingle_hashes, signature) —
    * the stored index of the LSH dedup family
    * ([[Dedup.minhashDuplicatePairs]], the incremental ingest gate). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    cached(docs, "minhash_signatures") {
      Dedup.withSignature(Dedup.withShingleHashes(docs))
        .select("doc_id", "shingle_hashes", "signature")
    }

  // ── persisted index artifacts ───────────────────────────────────────
  /** Persist the family's index tables as deployment artifacts (the
    * [[Ivf.saveIndex]] device for the text-similarity family). At
    * 100 TB "materialize once per (corpus, shape), amortize across
    * runs" means a TABLE, not session cache: the tokenize+hash scan of
    * the whole corpus — the expensive part every dedup /
    * decontamination / audit run shares — happens once at ingest, and
    * each later run is a parquet read of (doc_id, hs, s) with the text
    * column pruned away entirely. (Session cache can't play this role
    * even single-node: a reused InMemoryRelation carries its
    * materialized stats and partitioning into every consumer's plan,
    * which re-routes joins that a fresh columnar read of the same
    * table plans well — measured 3-6× on the jaccard family when these
    * entries were pinned across the bench's independent jobs.) */
  def saveIndex(docs: DataFrame, n: Int, dir: String): Unit = {
    ngramSets(docs, n).write.mode("overwrite")
      .parquet(s"$dir/ngram_sets_$n")
    minhashSignatures(docs).write.mode("overwrite")
      .parquet(s"$dir/minhash_signatures")
  }

  /** Read a persisted gram index: same (doc_id, hs, s) shape
    * [[ngramSets]] builds, so every consumer
    * ([[Dedup.prefixJaccardPairs]], [[TrainPrep]]'s dc2 gate) accepts
    * it in place of the in-session build. */
  def loadNgramSets(spark: org.apache.spark.sql.SparkSession, n: Int,
      dir: String): DataFrame =
    spark.read.parquet(s"$dir/ngram_sets_$n")

  def loadMinhashSignatures(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(s"$dir/minhash_signatures")
}
