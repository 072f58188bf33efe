package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.streaming.PipeAssembly
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** The deployable pipe runner — the reference's actual executable
  * (`mypipe-runner/.../PipeRunner.scala:17-56`: load ONE config, wire
  * every configured pipe, run them concurrently, stop them all on
  * shutdown). The Spark shape: one flat `key = value` config file →
  * [[PipeAssembly.startAll]] → N independent [[StreamingQuery]]s in one
  * session, each with its own checkpoint/position/sink.
  *
  * Usage:
  * {{{
  *   runMain graft.PipeMain pipes.conf                 # run until stopped
  *   runMain graft.PipeMain pipes.conf --available-now # drain backlog, exit
  * }}}
  *
  * Config file: `#`/`!` comments, blank lines ignored, `key = value`
  * split at the FIRST `=` (values may contain `=`), both sides trimmed.
  * Keys are [[PipeAssembly]]'s surface: `pipes.<name>.<key>` per pipe,
  * unprefixed keys shared by every pipe (a pipe's own key wins) —
  * the reference's `mypipe.pipes` block flattened.
  *
  * Lifecycle parity with the reference runner:
  *  - a pipe whose ASSEMBLY fails (bad config) is reported and the
  *    remaining pipes still run (quit-on-error=false default;
  *    `Pipe.scala:97-109` isolates a failing pipe from its siblings);
  *  - a shutdown hook stops every active query (PipeRunner.shutdown's
  *    `pipes.foreach(_.disconnect())`), so positions commit and a
  *    restart resumes from each pipe's own checkpoint;
  *  - exit code 0 only if every configured pipe assembled and (in
  *    `--available-now` mode) drained without a streaming exception.
  */
object PipeMain {

  /** Parse the flat config: comments (`#`/`!`), blanks, first-`=`
    * split, trimmed. A non-blank line without `=` is a config error —
    * fail fast rather than silently dropping a misspelled key. */
  def parseConfig(lines: Seq[String]): Map[String, String] =
    lines.iterator.zipWithIndex
      .map { case (l, i) => (l.trim, i + 1) }
      .filter { case (l, _) =>
        l.nonEmpty && !l.startsWith("#") && !l.startsWith("!")
      }
      .map { case (l, ln) =>
        val eq = l.indexOf('=')
        require(eq > 0, s"config line $ln is not `key = value`: $l")
        l.substring(0, eq).trim -> l.substring(eq + 1).trim
      }
      .toMap

  def loadConfig(path: String): Map[String, String] =
    parseConfig(
      Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
        .asScala.toSeq)

  /** Start every configured pipe and wait. Returns the process exit
    * code (0 = every pipe assembled and terminated clean). Separated
    * from [[main]] so specs can drive it in-session. */
  def run(spark: SparkSession, flat: Map[String, String],
      availableNow: Boolean,
      report: String => Unit = System.err.println): Int = {
    val started = PipeAssembly.startAll(spark, flat, availableNow)
    if (started.isEmpty) { report("[pipes] no pipes configured"); return 1 }
    val failedAssembly = started.collect { case (n, Left(e)) => (n, e) }
    failedAssembly.foreach { case (n, e) =>
      report(s"[pipes] pipe $n failed to assemble: ${e.getMessage}")
    }
    val live: Map[String, StreamingQuery] =
      started.collect { case (n, Right(q)) => (n, q) }
    live.keys.toSeq.sorted.foreach(n => report(s"[pipes] pipe $n started"))

    var failedRun = 0
    if (availableNow) {
      // bounded drain: every pipe runs to AvailableNow termination;
      // one pipe's streaming exception doesn't cut the others short
      live.toSeq.sortBy(_._1).foreach { case (n, q) =>
        try { q.awaitTermination(); report(s"[pipes] pipe $n drained") }
        catch { case e: Exception =>
          failedRun += 1
          report(s"[pipes] pipe $n failed: ${e.getMessage}")
        }
        finally q.stop()
      }
    } else {
      // daemon: run until externally stopped (shutdown hook / Ctrl-C).
      // Timed waits, not the unbounded awaitAnyTermination(): every
      // sibling could terminate between the active-check and the wait,
      // after which an unbounded wait would sleep forever. A crashed
      // pipe must not stall the survivors — report it, reset the
      // manager's terminated set, keep waiting on the rest.
      while (live.values.exists(_.isActive)) {
        try spark.streams.awaitAnyTermination(1000)
        catch { case e: Exception =>
          spark.streams.resetTerminated()
          report(s"[pipes] a pipe terminated with: ${e.getMessage}")
        }
      }
      live.toSeq.sortBy(_._1).foreach { case (n, q) =>
        if (q.exception.isDefined) {
          failedRun += 1
          report(s"[pipes] pipe $n failed: ${q.exception.get.getMessage}")
        }
      }
    }
    if (failedAssembly.isEmpty && failedRun == 0) 0 else 1
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    require(positional.length == 1,
      "usage: graft.PipeMain <config-file> [--available-now]")
    val unknown = flags.filterNot(_ == "--available-now")
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(", ")}")
    val spark = GraftSession.get()
    // PipeRunner.shutdown analog: stop every active query so positions
    // commit and the next start resumes from each pipe's checkpoint
    sys.addShutdownHook {
      spark.streams.active.foreach { q =>
        try q.stop() catch { case _: Exception => }
      }
    }
    val code = run(spark, loadConfig(positional.head),
      availableNow = flags.contains("--available-now"))
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
