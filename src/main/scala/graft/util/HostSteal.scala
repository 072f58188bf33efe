package graft.util

/** Hypervisor CPU-steal reader (`/proc/stat` all-CPU steal jiffies,
  * USER_HZ = 100 → seconds). Shared by [[graft.Bench]]'s per-query
  * attribution and the stream-replay telemetry: on a shared host a
  * steal spike is indistinguishable from a regression unless the
  * measurement window carries its own steal delta (VERDICT r9 item 2,
  * r12 item 1). */
object HostSteal {
  def jiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().find(_.startsWith("cpu "))
          .getOrElse("").trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } finally src.close()
    } catch { case _: Throwable => 0L }

  /** Seconds of steal since `j0` (a prior [[jiffies]] reading). */
  def secondsSince(j0: Long): Double = (jiffies() - j0) / 100.0
}
