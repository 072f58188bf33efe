package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers shared by the query layer.
  *
  * == Oracle determinism contract ==
  * The driver hash-compares our parquet output against DuckDB running the
  * SQL in `SparkEntry.oracleSql`. Floating-point SUM/AVG are
  * order-dependent, and Spark (32-way partial aggregation) and DuckDB
  * (single-node, its own order) will not sum doubles in the same order.
  * So every money-typed aggregate goes through an exact integer path:
  *
  *   cents(x) = floor(x * 100 + 0.5) : BIGINT
  *
  * Per-row double arithmetic (`*`, `-`, `+`, `floor`) is IEEE-754 and
  * bit-identical across engines when written identically; the integer sum
  * is then exact and associative, so partial aggregation order cannot
  * change the result. Final division by 100.0 (and by counts) happens on
  * exact integers, so it is deterministic too.
  */
object QueryUtil {
  /** Deterministic money quantization: double → integer cents (BIGINT).
    * DuckDB mirror: `CAST(FLOOR(x * 100 + 0.5) AS BIGINT)`. */
  def cents(c: Column): Column = floor(c * lit(100.0d) + lit(0.5d))

  /** Exact integer-cent sum rendered back as dollars (double).
    * DuckDB mirror: `CAST(SUM(CAST(FLOOR(x*100+0.5) AS BIGINT)) AS DOUBLE) / 100.0`. */
  def moneySum(c: Column): Column =
    (sum(cents(c)).cast("double") / lit(100.0d))

  /** Deterministic mean of a money column: exact cent sum / count.
    * DuckDB mirror: `CAST(SUM(...cents...) AS DOUBLE) / 100.0 / COUNT(*)`. */
  def moneyAvg(c: Column): Column =
    sum(cents(c)).cast("double") / lit(100.0d) / count(lit(1)).cast("double")

  /** Sum of an integral-valued double column as exact BIGINT.
    * DuckDB mirror: `CAST(SUM(CAST(x AS BIGINT)) AS BIGINT)`. */
  def intSum(c: Column): Column = sum(c.cast("long"))

  /** Floor division on a BIGINT column — matches DuckDB's `//` for
    * negative operands where Spark's `div` truncates toward zero.
    * `c - pmod(c, d)` is an exact multiple of `d` (pmod is nonnegative),
    * so the double division is correctly-rounded to the EXACT integer
    * quotient as long as |c| < 2^53 — true for any microsecond epoch
    * timestamp until the year 2255. */
  def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d.toDouble)).cast("long")

  /** Column-divisor variant (same exactness bound on the dividend;
    * the divisor must be positive). */
  def floorDiv(c: Column, d: Column): Column =
    ((c - pmod(c, d)) / d.cast("double")).cast("long")
}
