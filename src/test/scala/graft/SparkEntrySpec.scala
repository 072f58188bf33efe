package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants of the driver contract — these keep the
  * round-10 "complete oracle surface" property true by construction. */
class SparkEntrySpec extends AnyFunSuite {

  /** The brief-mandated media-decode stub is the ONLY declared query
    * allowed to lack a DuckDB oracle (no codecs in this container —
    * the decode output is a documented deterministic fake, so an
    * oracle would be theater). Anything else slipping into rows-only
    * is a regression of the complete-oracle milestone. */
  private val RowsOnlyAllowed = Set("mm_decode_features")

  test("every declared query except the decode stub carries an oracle") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === RowsOnlyAllowed,
      s"rows-only set drifted: $missing (allowed: $RowsOnlyAllowed)")
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
