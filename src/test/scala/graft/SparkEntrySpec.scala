package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants of the driver contract — these keep the
  * round-10 "complete oracle surface" property true by construction. */
class SparkEntrySpec extends AnyFunSuite {

  /** Round-10 end state: EVERY declared query carries a DuckDB oracle
    * — including the brief-mandated media-decode stub, whose
    * deterministic fake fold turned out to be exactly reproducible
    * IEEE float32 arithmetic (Multimodal.mmDecodeFeaturesSql). An
    * empty rows-only set is the milestone; anything appearing here is
    * a regression of it. */
  test("every declared query carries an oracle (zero rows-only)") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"rows-only set drifted: $missing")
  }

  test("no orphaned oracles: every oracle names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL is single-statement (no stray semicolons the " +
    "driver's comparator would reject)") {
    val bad = SparkEntry.oracleSql.filter(_._2.contains(";"))
    assert(bad.isEmpty, s"semicolon in oracle SQL: ${bad.keySet}")
  }
}
