package graft.util

import scala.collection.concurrent.TrieMap
import scala.tools.reflect.ToolBox

/** Runtime compilation of configuration-supplied Scala — the analog of
  * the reference's `Eval` helper
  * (`mypipe-api/src/main/scala/mypipe/util/Eval.scala:6-13`), which
  * compiles `include-event-condition` strings from the config into
  * closures at pipe-assembly time.
  *
  * Spark-first caveats, by design:
  *  - SQL expression strings (`filter.condition`) remain the PRIMARY
  *    filter path: Catalyst sees them, pushes them down, and codegens
  *    them. A compiled Scala closure is opaque to the optimizer — this
  *    hook exists for the Turing-complete conditions the reference
  *    supports that SQL cannot express (SURVEY §7.5's documented
  *    delta, now closed rather than documented away).
  *  - Cluster safety: a ToolBox-compiled closure's class bytes live in
  *    the driver's in-memory classloader and can NOT be serialized to
  *    executors. So nothing here ships closures — callers ship the
  *    SOURCE STRING (a plain serializable value) and each JVM compiles
  *    it once through [[compiled]]'s per-JVM cache. The scala-compiler
  *    jar rides the standard Spark classpath, so executors can always
  *    do this; the one-time ~second of compile per executor is the
  *    price of arbitrary code, paid once per process, not per row.
  */
object Eval {

  @transient private lazy val toolBox =
    scala.reflect.runtime.currentMirror.mkToolBox()

  /** Compile and evaluate `code`, returning its value typed as `T` —
    * the reference's `Eval[T](code)` contract. ToolBox is not
    * thread-safe; compilation serializes on this object. */
  def apply[T](code: String): T = synchronized {
    toolBox.eval(toolBox.parse(code)).asInstanceOf[T]
  }

  private val cache = TrieMap.empty[String, Any]

  /** Per-JVM memoized compile: the executor-safe entry point. Closures
    * built from the same source string are compiled once per process
    * and shared; the string itself is what crosses the wire. */
  def compiled[T](code: String): T =
    cache.getOrElseUpdate(code, apply[Any](code)).asInstanceOf[T]
}
