package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `transformWithState` adapter shared by every keyed stateful
  * operator in the engine ([[TxPipeline]], [[StreamOps]]): a per-key
  * single-`ValueState` fold with optional idle timeout.
  *
  * Spark 4's arbitrary-state API replaces `flatMapGroupsWithState`
  * (SURVEY §7.2's named forward path): typed state handles with
  * per-state TTL, explicit timers, composite state, and the RocksDB
  * state store it requires — the provider a 100 TB deployment runs
  * anyway (state spills to disk + changelog checkpoints instead of
  * full HDFS snapshots of an in-memory map). [[graft.GraftSession]]
  * sets the provider session-wide.
  *
  * Semantics preserved from the old operator, pinned by the streaming
  * specs + the mid-batch-crash chaos spec:
  *  - the fold sees `(key, batch rows, Option[prior state])` and
  *    returns `(Option[next state], output)` — `None` clears state
  *    (the old `GroupState.remove()`);
  *  - idle timeout: the old `ProcessingTimeTimeout` +
  *    `setTimeoutDuration` reset the clock on every batch that
  *    delivered rows to the key. Timers here are one-shot and
  *    explicit, so the kernel keeps the pending expiry in a second
  *    `ValueState` and re-arms on every input batch: delete the old
  *    timer, register `now + timeoutMs` — the same
  *    reset-on-activity contract. On expiry `onTimeout` observes the
  *    state (for discard accounting) and the key's state clears.
  *
  * Batch queries run the identical processor (one fold per key over
  * the whole group) — the t17 leaderboard oracle depends on that. */
object StateKernel {

  /** The per-key fold: (key, rows, prior) → (next, emitted). */
  type Fold[K, I, S, O] =
    (K, Iterator[I], Option[S]) => (Option[S], Iterator[O])

  class FoldProcessor[K, I, S, O](
      senc: Encoder[S],
      timeoutMs: Long,
      onInput: Fold[K, I, S, O],
      onTimeout: (K, S) => Unit)
      extends StatefulProcessor[K, I, O] {

    @transient private var state: ValueState[S] = _
    @transient private var pendingTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[S]("s", senc, TTLConfig.NONE)
      if (timeoutMs > 0L)
        pendingTimer = getHandle.getValueState[Long]("t",
          Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[I],
        tv: TimerValues): Iterator[O] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = onInput(key, rows, prev)
      next match {
        case Some(s) => state.update(s)
        case None => state.clear()
      }
      if (timeoutMs > 0L) {
        if (pendingTimer.exists()) {
          getHandle.deleteTimer(pendingTimer.get())
          pendingTimer.clear()
        }
        if (next.isDefined) {
          val at = tv.getCurrentProcessingTimeInMs() + timeoutMs
          getHandle.registerTimer(at)
          pendingTimer.update(at)
        }
      }
      out
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[O] = {
      if (state.exists()) onTimeout(key, state.get())
      state.clear()
      if (pendingTimer != null) pendingTimer.clear()
      Iterator.empty
    }
  }

  /** Wire a keyed fold into a Dataset. `timeoutMs > 0` arms the
    * idle-discard timer (ProcessingTime mode); otherwise the query
    * runs in TimeMode.None. */
  def fold[K: Encoder, I, S, O: Encoder](
      ds: Dataset[I], key: I => K, senc: Encoder[S],
      timeoutMs: Long = 0L,
      onTimeout: (K, S) => Unit = (_: K, _: S) => ())(
      onInput: Fold[K, I, S, O]): Dataset[O] = {
    val mode = if (timeoutMs > 0L) TimeMode.ProcessingTime()
      else TimeMode.None()
    // batch mode loads its ephemeral state store through the driver's
    // StateStoreCoordinator endpoint, which only streaming startup
    // registers — ensure it exists (idempotent create-or-lookup)
    if (!ds.isStreaming)
      org.apache.spark.sql.graft.StateStoreBridge
        .ensureCoordinator(ds.sparkSession)
    ds.groupByKey(key)
      .transformWithState(
        new FoldProcessor[K, I, S, O](senc, timeoutMs, onInput, onTimeout),
        mode, OutputMode.Append)
  }
}
