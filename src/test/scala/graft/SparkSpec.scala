package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local SparkSession per suite. */
trait SparkSpec extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable
  // identifier. Each suite instance re-reads SparkTestSession.spark,
  // so a context death poisons at most the suite it happened in.
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf: String = "/root/testdata/sf0.001"
}

/** One session for the whole test JVM (suites run in it serially).
  * Self-healing: if the shared context dies mid-suite (fatal error on
  * a task thread, host-noise casualty), later tests get a fresh
  * session instead of cascading "SparkContext has been shutdown". */
object SparkTestSession {
  @volatile private var current: SparkSession = _

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = GraftSession.builder("8")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      GraftCatalog.installOptimizations(s)
      current = s
    }
    current
  }
}
