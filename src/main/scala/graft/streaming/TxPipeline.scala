package graft.streaming

import org.apache.spark.SparkContext
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.util.LongAccumulator

/** Structured-Streaming transaction grouping — the semantic heart of the
  * reference (SURVEY.md §2.4 T1–T5): between BEGIN and COMMIT the
  * consumer buffers mutations per connection and assigns a txid; COMMIT
  * flushes the buffer with every mutation's timestamp rewritten to the
  * commit timestamp; ROLLBACK discards it (reference `mypipe-api/src/
  * main/scala/mypipe/api/consumer/AbstractBinaryLogConsumer.scala:15-21,
  * 74-82,124-177`).
  *
  * Spark-first shape: `Dataset[ChangeEvent].groupByKey(connection)
  * .transformWithState` (Spark 4's arbitrary-state API, via
  * [[StateKernel]]) — the buffer lives in Spark's state store,
  * so a transaction spanning micro-batches survives (checkpointed,
  * SURVEY §7.5 "hard parts"), and the reference's "don't advance the
  * binlog position mid-tx" rule falls out of checkpointed state +
  * replayable sources: a crash replays the open tx's events.
  *
  * Differences from the reference, by design:
  *  - txid is deterministic (`tx-<conn>-<begin event id>`) rather than
  *    UUIDv1, for replay-stable output (SURVEY §7.5);
  *  - abandoned transactions: the reference waits forever; we take a
  *    ProcessingTimeTimeout and discard stale open buffers (counted in
  *    [[TxStats]]) — at 100 TB an unbounded state store is a leak.
  *
  * Scale: state is partitioned by connection id; throughput scales with
  * connection cardinality and state size is bounded by open-tx size ×
  * open connections, independent of history length.
  */
object TxPipeline {

  /** Raw change-stream event: `kind` ∈ begin|commit|rollback|mutation
    * (the reference's BeginEvent/CommitEvent/RollbackEvent/Mutation ADT,
    * event/package.scala:7-41,47-139). `seq` is the total per-connection
    * order (binlog position analog). */
  case class ChangeEvent(
      conn: Long, seq: Long, kind: String, op: String,
      pk: String, tsUs: Long, payload: Map[String, String])

  /** A committed, tx-stamped mutation (the pipeline's output). */
  case class TxMutation(
      conn: Long, seq: Long, txid: String, op: String,
      pk: String, commitTsUs: Long, payload: Map[String, String])

  /** A whole committed transaction flushed as one unit — the
    * reference's optional `group-mutations-by-tx` emission mode
    * (`AbstractBinaryLogConsumer.scala:155`, `reference.conf:21`):
    * consumers that need tx-atomic delivery get the full mutation list
    * in commit order, one record per transaction. */
  case class TxBatch(
      conn: Long, txid: String, commitTsUs: Long,
      mutations: Seq[TxMutation])

  /** Discard observability (Spark accumulators, safe to increment from
    * state-function closures): `rollbacks` counts explicit ROLLBACKs,
    * `resetDiscards` counts buffers dropped by a BEGIN arriving while a
    * transaction was open, `abandonedDiscards` counts open buffers
    * discarded by the state timeout. */
  class TxStats(sc: SparkContext) extends Serializable {
    val rollbacks: LongAccumulator =
      sc.longAccumulator("graft.tx.rollbacks")
    val resetDiscards: LongAccumulator =
      sc.longAccumulator("graft.tx.resetDiscards")
    val abandonedDiscards: LongAccumulator =
      sc.longAccumulator("graft.tx.abandonedDiscards")
  }

  /** Open-transaction buffer persisted in the state store. */
  case class TxState(
      open: Boolean, beginSeq: Long, buffer: List[ChangeEvent])

  val emptyState: TxState = TxState(open = false, beginSeq = -1L, Nil)

  implicit val eventEnc: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]
  implicit val mutationEnc: Encoder[TxMutation] = Encoders.product[TxMutation]
  implicit val stateEnc: Encoder[TxState] = Encoders.product[TxState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  def txid(conn: Long, beginSeq: Long): String = s"tx-$conn-$beginSeq"

  /** Core state transition: fold this micro-batch's events (in `seq`
    * order) into the open-tx buffer, emitting committed mutations.
    * Pure function → unit-testable without a stream; `stats` counters
    * are optional observability. */
  def advance(conn: Long, events: Seq[ChangeEvent], state: TxState,
      stats: Option[TxStats] = None): (TxState, Seq[TxMutation]) = {
    val out = Seq.newBuilder[TxMutation]
    var st = state
    events.sortBy(_.seq).foreach { e =>
      e.kind match {
        case "begin" =>
          // a BEGIN while a tx is open DROPS the buffered mutations —
          // an open tx can't commit once its connection starts a new
          // one (binlog never interleaves txs per conn). No implicit
          // commit, mirroring the reference; the drop is counted in
          // TxStats.resetDiscards.
          if (st.open && st.buffer.nonEmpty)
            stats.foreach(_.resetDiscards.add(st.buffer.length))
          st = TxState(open = true, beginSeq = e.seq, Nil)
        case "mutation" =>
          if (st.open) st = st.copy(buffer = e :: st.buffer)
          else
            // non-tx mutation passes straight through, txid = own seq
            out += TxMutation(conn, e.seq, txid(conn, e.seq), e.op, e.pk,
              e.tsUs, e.payload)
        case "commit" =>
          if (st.open) {
            val id = txid(conn, st.beginSeq)
            // commit-timestamp rewrite (T2): all buffered mutations take
            // the commit event's timestamp
            st.buffer.reverse.foreach { m =>
              out += TxMutation(conn, m.seq, id, m.op, m.pk, e.tsUs,
                m.payload)
            }
          } // empty commit (T4): nothing buffered → no rows, no error
          st = emptyState
        case "rollback" =>
          if (st.open && st.buffer.nonEmpty)
            stats.foreach(_.rollbacks.add(st.buffer.length))
          st = emptyState // discard buffer (T1 rollback)
        case _ => // unknown event kinds are skipped (reference UnknownEvent)
      }
    }
    (st, out.result())
  }

  /** Batched state transition: same fold as [[advance]], but committed
    * transactions surface as one [[TxBatch]] each, in commit order.
    * Non-tx mutations flush as singleton batches (their own txid).
    * Mutations within a tx share one commitTsUs, so grouping the flat
    * output by consecutive txid runs is lossless. */
  def advanceBatched(conn: Long, events: Seq[ChangeEvent], state: TxState,
      stats: Option[TxStats] = None): (TxState, Seq[TxBatch]) = {
    val (st, flat) = advance(conn, events, state, stats)
    val batches = Seq.newBuilder[TxBatch]
    var run = List.empty[TxMutation] // reversed current-txid run
    def flush(): Unit = run match {
      case Nil =>
      case last :: _ =>
        val ms = run.reverse
        batches += TxBatch(conn, last.txid, last.commitTsUs, ms)
        run = Nil
    }
    flat.foreach { m =>
      if (run.nonEmpty && run.head.txid != m.txid) flush()
      run = m :: run
    }
    flush()
    (st, batches.result())
  }

  /** Wire the state transition into a streaming Dataset. Timeout: open
    * transactions idle past `abandonedTxTimeoutMs` are discarded
    * (counted in TxStats.abandonedDiscards). */
  def groupByTransaction(
      events: Dataset[ChangeEvent],
      abandonedTxTimeoutMs: Long = 0L,
      stats: Option[TxStats] = None): Dataset[TxMutation] =
    stateful[TxMutation](events, abandonedTxTimeoutMs, stats,
      (conn, it, st, s) => advance(conn, it, st, s))

  /** [[groupByTransaction]] in `group-mutations-by-tx` mode: one output
    * record per committed transaction. */
  def groupByTransactionBatched(
      events: Dataset[ChangeEvent],
      abandonedTxTimeoutMs: Long = 0L,
      stats: Option[TxStats] = None): Dataset[TxBatch] =
    stateful[TxBatch](events, abandonedTxTimeoutMs, stats,
      (conn, it, st, s) => advanceBatched(conn, it, st, s))

  implicit val batchEnc: Encoder[TxBatch] = Encoders.product[TxBatch]

  private def stateful[O: Encoder](
      events: Dataset[ChangeEvent],
      abandonedTxTimeoutMs: Long,
      stats: Option[TxStats],
      step: (Long, Seq[ChangeEvent], TxState, Option[TxStats])
        => (TxState, Seq[O])): Dataset[O] =
    StateKernel.fold[Long, ChangeEvent, TxState, O](
      events, _.conn, stateEnc,
      timeoutMs = abandonedTxTimeoutMs,
      // abandoned open tx → discard buffer, counted
      onTimeout = (_, s) =>
        if (s.open) stats.foreach(_.abandonedDiscards.add(s.buffer.length))
    ) { (conn, it, prior) =>
      val (next, out) = step(conn, it.toSeq,
        prior.getOrElse(emptyState), stats)
      // closed state clears the store entry (and disarms the timer)
      (if (next.open) Some(next) else None, out.iterator)
    }
}
