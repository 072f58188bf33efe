package graft.util

/** Driver-side telemetry for the iterative kernels: how many rounds a
  * fixed-point loop (CC label propagation, k-means, BPE merges) took on
  * its last execution. A wall-clock slope across a data decade is only
  * interpretable next to this — pointer-jumping CC is O(log diameter)
  * ROUNDS, so the scale story must show the round count holding flat
  * (or log-growing) as data grows 10×, not just the wall (VERDICT r13
  * item 1: "CC round-count reported next to the slope").
  *
  * Kernels `record` under a stable kernel name; Bench `drain`s after
  * each query and attributes whatever was recorded to that query, so
  * the per-query round counts ride BENCH_LAST.json → the sf10 sweep →
  * SCALE.json. Thread-safe (the concurrent bench leg shares it);
  * `record` keeps the MAX per kernel between drains (a query running
  * two CC closures reports the deeper one).
  */
object Rounds {
  private val log =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def record(kernel: String, rounds: Int): Unit =
    log.merge(kernel, Int.box(rounds),
      (a, b) => Int.box(math.max(a.intValue(), b.intValue())))

  /** Snapshot and clear — returns kernel → rounds recorded since the
    * last drain. */
  def drain(): Map[String, Int] = {
    val out = scala.collection.mutable.Map.empty[String, Int]
    val it = log.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out(e.getKey) = e.getValue.intValue()
      it.remove()
    }
    out.toMap
  }
}
