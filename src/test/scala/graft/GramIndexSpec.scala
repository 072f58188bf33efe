package graft

import graft.functions.{Dedup, GramIndex}
import org.apache.spark.sql.functions._

/** The artifact contract: a persisted gram index transparently serves
  * a COLD session (fingerprint match → load, skip the tokenize+hash
  * corpus scan) and invalidates itself when the corpus drifts. */
class GramIndexSpec extends SparkSpec {

  private def withIndexDir[T](dir: String)(body: => T): T = {
    spark.conf.set(GramIndex.IndexDirConf, dir)
    GramIndex.invalidate() // simulate a cold session: empty memo
    try body
    finally {
      spark.conf.unset(GramIndex.IndexDirConf)
      GramIndex.invalidate()
    }
  }

  test("cold session with a fresh artifact: loads, hash-matches the " +
    "in-session build, and never rescans text") {
    val docs = Tables.documents(spark, sf)
    val inSession = Dedup.ddPrefixJaccard(spark, sf).collect().toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("gram_auto").toString
    GramIndex.saveIndex(docs, n = 4, dir)
    withIndexDir(dir) {
      val df = Dedup.ddPrefixJaccard(spark, sf)
      assert(df.collect().toSeq === inSession,
        "artifact-served result diverged from the in-session build")
      // the gram-set input must come from the artifact (its parquet
      // path in the scan), not a rebuild over documents.text
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("gram_auto"),
        "scan does not read the artifact:\n" + plan.take(2000))
    }
  }

  test("fingerprint drift: a corpus edit invalidates the artifact and " +
    "the query silently rebuilds (no stale index served)") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("gram_stale").toString
    GramIndex.saveIndex(docs, n = 4, dir)
    // the 'current' corpus drops one doc -> membership fingerprint flips
    val edited = docs.filter(col("doc_id") =!= docs
      .agg(min("doc_id")).collect()(0).getLong(0))
    assert(GramIndex.loadIfFresh(edited, "ngram_sets_4", dir).isEmpty,
      "stale artifact must not load")
    // unchanged corpus still validates
    assert(GramIndex.loadIfFresh(docs, "ngram_sets_4", dir).nonEmpty,
      "fresh artifact must load")
    // missing artifact directory -> rebuild path, no crash
    assert(GramIndex.loadIfFresh(docs, "ngram_sets_4",
      dir + "/nonexistent").isEmpty)
    withIndexDir(dir) {
      // served via the edited corpus: memo-keyed build runs on the
      // edited plan and must reflect the edit, not the artifact
      val got = GramIndex.ngramSets(edited, 4)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      val want = spark.read.parquet(s"$dir/ngram_sets_4")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet -
        docs.agg(min("doc_id")).collect()(0).getLong(0)
      assert(got === want, "rebuild must cover exactly the edited corpus")
    }
  }
}
