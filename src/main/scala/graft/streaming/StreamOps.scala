package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Streaming operators beyond the reference's surface that a CDC
  * consumer needs in practice:
  *
  *  - [[dedupeByPosition]]: at-least-once sources (reference semantics:
  *    position saved every 10 s, reference Pipe.scala:56-72, so replays
  *    re-deliver) are healed to exactly-once by keyed deduplication
  *    with a watermark bounding state;
  *  - [[enrich]]: stream⋈static dimension join — the static side is
  *    broadcast, the stream never shuffles;
  *  - [[intervalJoin]]: stream⋈stream inner join with event-time
  *    bounds — both sides watermarked so join state is evicted;
  *  - [[latestImageStream]]: a continuously-maintained latest-image
  *    view (the streaming twin of the batch
  *    [[graft.operators.CdcAnalytics.mergeApply]] /
  *    [[graft.operators.TxOps.t9LatestImage]]): per-PK state holds the
  *    freshest image and an update is emitted only when the image
  *    actually advances.
  */
object StreamOps {

  /** One change of a keyed entity: `(tsUs, seq)` is the total history
    * order (commit time, then log position). The pk is the CDC
    * primary-key string ([[graft.operators.CdcOps]] P9 pk-as-string),
    * so the view keys exactly what the reference keys its topics by. */
  case class ImageChange(pk: String, tsUs: Long, seq: Long, op: String,
      value: Double)

  /** Emitted whenever a key's current image advances. */
  case class ImageUpdate(pk: String, op: String, value: Double, tsUs: Long,
      seq: Long, isDeleted: Boolean)

  /** Stored per-PK state: the freshest image (fixed size). Public so
    * the encoder's generated code can construct it. */
  case class ImageState(tsUs: Long, seq: Long, op: String,
      value: Double)

  implicit private val updEnc: Encoder[ImageUpdate] =
    Encoders.product[ImageUpdate]
  implicit private val stEnc: Encoder[ImageState] =
    Encoders.product[ImageState]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  /** Streaming materialized view of the latest image per PK.
    *
    * State is one fixed-size record per live key — the minimum any
    * upsert view needs; there is no per-event buffering, so state size
    * is O(live keys), not O(stream). Out-of-order and re-delivered
    * changes (at-least-once sources) fold away: an event older than
    * the stored `(tsUs, seq)` changes nothing and emits nothing, so
    * the output stream is also exactly-once per image advance.
    * Deletes stay in state as tombstones (emitted with
    * `isDeleted = true`) so a late pre-delete update cannot resurrect
    * the row; downstream compaction may age them out. */
  def latestImageStream(changes: Dataset[ImageChange]): Dataset[ImageUpdate] =
    StateKernel.fold[String, ImageChange, ImageState, ImageUpdate](
      changes, _.pk, stEnc) { (pk, it, prev) =>
      var cur = prev
      it.foreach { c =>
        val newer = cur.forall(s =>
          c.tsUs > s.tsUs || (c.tsUs == s.tsUs && c.seq > s.seq))
        if (newer) cur = Some(ImageState(c.tsUs, c.seq, c.op, c.value))
      }
      cur match {
        case Some(s) if !prev.contains(s) =>
          (cur, Iterator.single(ImageUpdate(pk, s.op, s.value, s.tsUs,
            s.seq, s.op == "delete")))
        case _ => (prev, Iterator.empty) // no advance → no emission
      }
    }

  /** Adapter: the tx-grouped mutation stream as image changes — pk is
    * the CDC key string, history order is (commit ts, log seq), the
    * numeric image is the payload's `value` (0 when absent, as in the
    * generic envelope's null-omission). */
  def latestImagesOf(ms: Dataset[TxPipeline.TxMutation])
      : Dataset[ImageUpdate] = {
    implicit val chEnc: Encoder[ImageChange] = Encoders.product[ImageChange]
    latestImageStream(ms.map(m => ImageChange(m.pk, m.commitTsUs, m.seq,
      m.op, m.payload.get("value").flatMap(_.toDoubleOption).getOrElse(0.0))))
  }

  /** One day of volume for one series (the streaming input is the
    * day-grain rollup, never raw events — same contract as the batch
    * [[graft.operators.RelationalFourth.ev6Ewma]]). */
  case class DailyVolume(key: String, day: Long, n: Long)

  /** One smoothed point: the EWMA after folding `day`. */
  case class EwmaPoint(key: String, day: Long, n: Long, ewma: Double)

  /** Stored per-series state: last folded day and its EWMA. */
  case class EwmaState(day: Long, ewma: Double)

  implicit private val ewmaPtEnc: Encoder[EwmaPoint] =
    Encoders.product[EwmaPoint]
  implicit private val ewmaStEnc: Encoder[EwmaState] =
    Encoders.product[EwmaState]

  /** Streaming EWMA — the streaming twin of the batch
    * [[graft.operators.RelationalFourth.ev6Ewma]], proving the batch
    * and streaming paths share semantics: the recurrence
    * `s ← s·(1−α) + n·α` folds in day order with the SAME IEEE
    * operation sequence, so a replayed stream reproduces the batch
    * output bit for bit (StreamOpsSpec asserts exact equality).
    *
    * State is one `(day, ewma)` pair per series — O(series), not
    * O(stream). A micro-batch may carry several days (folded in day
    * order); a day at or before the folded frontier is a re-delivery
    * and folds away, making the output exactly-once per (key, day)
    * under at-least-once sources. */
  def ewmaStream(daily: Dataset[DailyVolume], alpha: Double)
      : Dataset[EwmaPoint] =
    StateKernel.fold[String, DailyVolume, EwmaState, EwmaPoint](
      daily, _.key, ewmaStEnc) { (key, it, prev) =>
      var st = prev
      val out = Vector.newBuilder[EwmaPoint]
      it.toVector.sortBy(_.day).foreach { d =>
        if (st.forall(_.day < d.day)) {
          val e = st match {
            case None => d.n.toDouble
            case Some(s) => s.ewma * (1.0 - alpha) + d.n.toDouble * alpha
          }
          st = Some(EwmaState(d.day, e))
          out += EwmaPoint(key, d.day, d.n, e)
        }
      }
      (st, out.result().iterator)
    }

  /** One scored CUSUM point (emitted once the baseline is known). */
  case class CusumPoint(key: String, day: Long, n: Long, cusum: Double,
      isShift: Boolean)

  /** Per-series CUSUM state: the ≤7-day warm-up buffer (days and
    * volumes, dropped once the baseline finalizes), the frozen
    * baseline, and the running statistic. */
  case class CusumState(bufDays: Seq[Long], bufNs: Seq[Long],
      lastDay: Long, mu: Double, k: Double, g: Double, ready: Boolean)

  implicit private val cusumPtEnc: Encoder[CusumPoint] =
    Encoders.product[CusumPoint]
  implicit private val cusumStEnc: Encoder[CusumState] =
    Encoders.product[CusumState]

  /** Streaming CUSUM — the streaming twin of the batch
    * [[graft.operators.RelationalFourth.ev7Cusum]]. The batch baseline
    * (mean of the first 7 observed days) is inherently retrospective,
    * so the stream BUFFERS the warm-up: the first 6 days emit nothing;
    * when day 7 arrives the baseline freezes and all seven points
    * flush in day order; every later day scores incrementally with the
    * identical IEEE fold, so a replayed stream reproduces the batch
    * output bit for bit (for series with ≥ 7 days — shorter series
    * never finalize, the same way the batch op's baseline would still
    * be provisional). State is O(1) per series after warm-up; days at
    * or before the folded frontier are re-deliveries and fold away. */
  def cusumStream(daily: Dataset[DailyVolume]): Dataset[CusumPoint] =
    StateKernel.fold[String, DailyVolume, CusumState, CusumPoint](
      daily, _.key, cusumStEnc) { (key, it, prev) =>
      var st = prev.getOrElse(
        CusumState(Nil, Nil, Long.MinValue, 0.0, 0.0, 0.0, false))
      val out = Vector.newBuilder[CusumPoint]
      def score(day: Long, n: Long): Unit = {
        val g = math.max(0.0,
          st.g + (n.toDouble - st.mu - st.k))
        st = st.copy(lastDay = day, g = g)
        out += CusumPoint(key, day, n, g, g > st.k * 5.0)
      }
      it.toVector.sortBy(_.day).foreach { d =>
        if (d.day > st.lastDay) {
          if (st.ready) score(d.day, d.n)
          else {
            st = st.copy(bufDays = st.bufDays :+ d.day,
              bufNs = st.bufNs :+ d.n, lastDay = d.day)
            if (st.bufDays.length == 7) {
              val mu = st.bufNs.sum.toDouble / 7.0
              st = st.copy(mu = mu, k = mu / 10.0, ready = true)
              val (days, ns) = (st.bufDays, st.bufNs)
              st = st.copy(bufDays = Nil, bufNs = Nil)
              days.zip(ns).foreach { case (dy, n) => score(dy, n) }
            }
          }
        }
      }
      (Some(st), out.result().iterator)
    }

  /** Exactly-once healing: drop re-delivered changes by their unique
    * position, keeping state only `watermark` past the event time. */
  def dedupeByPosition(changes: DataFrame, tsCol: String,
      watermark: String, keyCols: Seq[String]): DataFrame =
    changes
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Stream enriched with a static dimension (broadcast hash join —
    * zero stream-side shuffle). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming ingest dedup gate — the streaming twin of
    * [[graft.functions.Dedup.incrementalMinhashMatches]]' corpus side:
    * each incoming doc is signed per-row (codegen MinHash — scalar
    * expressions run unchanged on a stream), banded, and joined
    * against the STANDING corpus' bucket and signature tables;
    * candidates verify by exact Jaccard over the shingle-hash sets.
    *
    * Streaming contract, deliberately chosen for zero stream state:
    *  - the corpus tables are static broadcast sides, the stream holds
    *    NO state — append-mode-safe, no watermark, restarts free;
    *  - emission is AT-LEAST-ONCE per (batch_id, match_id): a pair
    *    colliding in several bands surfaces once per band, and a
    *    redelivered doc re-emits its matches — exactly the contract
    *    every consumer of an ingest gate must tolerate anyway
    *    (StreamOpsSpec asserts set-equality with the batch path after
    *    a distinct, and idempotence under redelivery). At 100 TB the
    *    corpus bucket table is a broadcast only per-band-shard or a
    *    bucketed storage join; the join SHAPE is what carries over. */
  def streamingNearDupMatches(batch: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.Dedup
    val corpusSigned = Dedup
      .withSignature(Dedup.withShingleHashes(corpus))
      .select("doc_id", "shingle_hashes", "signature")
    val corpusBuckets = Dedup.lshBuckets(corpusSigned)
      .select(col("doc_id").as("match_id"), col("band"), col("bucket"))
    val corpusSets = corpusSigned
      .select(col("doc_id").as("match_id"),
        col("shingle_hashes").as("h2"))
    // stream side: one banded row per (doc, band) CARRYING the shingle
    // set (a stream cannot join back to itself for the verify stage;
    // the per-band duplication of one array column costs nothing in
    // state) — banding delegates to the SAME lshBuckets the batch path
    // uses, so the bucket keys can never drift apart
    val batchBuckets = Dedup.lshBuckets(
      Dedup.withSignature(Dedup.withShingleHashes(batch)),
      carry = Seq("shingle_hashes"))
      .select(col("doc_id").as("batch_id"),
        col("shingle_hashes").as("h1"), col("band"), col("bucket"))
    batchBuckets
      .join(broadcast(corpusBuckets), Seq("band", "bucket"))
      .join(broadcast(corpusSets), Seq("match_id"))
      .withColumn("n_common", size(array_intersect(col("h1"), col("h2"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("n_common"))
          .cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "match_id", "jaccard")
  }

  /** Stream-stream inner join: right events within [0, `boundSeconds`]
    * after the left event, per key. Watermarks on both sides bound the
    * buffered state. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, watermark: String,
      boundSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <=
          col(s"l.$leftTs") + expr(s"INTERVAL $boundSeconds SECONDS"))
  }

  // ── continuous per-key leaderboard ──────────────────────────────────

  /** One scored item for the leaderboard (score in exact integer
    * units — cents — per the repo's hash-stability rule). */
  case class Scored(key: String, id: Long, score: Long)

  /** One row of a leaderboard snapshot. */
  case class BoardRow(key: String, id: Long, score: Long, rank: Int)

  /** Bounded per-key state: the current top-k as parallel lists in
    * (score desc, id asc) order — O(k) per live key, never O(stream),
    * the streaming twin of [[graft.plans.TopKPerKey]]'s bounded heap. */
  case class BoardState(scores: List[Long], ids: List[Long])

  implicit private val boardRowEnc: Encoder[BoardRow] =
    Encoders.product[BoardRow]
  implicit private val boardStEnc: Encoder[BoardState] =
    Encoders.product[BoardState]

  /** Continuously-maintained top-k per key (the live leaderboard /
    * "current worst offenders" view a CDC consumer keeps): each
    * micro-batch folds its events into the per-key board and emits
    * the FULL new board only when it changed — no-op batches emit
    * nothing, so downstream sees exactly one snapshot per advance
    * (the [[latestImageStream]] emission discipline applied to a
    * ranked set). Entries are keyed by `id`: a re-delivered item folds
    * away (at-least-once safe) and a score UPDATE for an id already on
    * the board upserts it (one slot per id, best score wins — an id's
    * board score is monotone non-decreasing; an id evicted from the
    * top-k is forgotten, the O(k)-state price every bounded leaderboard
    * pays). Ties break by id, so the board is deterministic under any
    * arrival order.
    */
  def topKStream(events: Dataset[Scored], k: Int): Dataset[BoardRow] =
    StateKernel.fold[String, Scored, BoardState, BoardRow](
      events, _.key, boardStEnc) { (key, it, prev) =>
      val before = prev.map(s => s.scores.zip(s.ids)).getOrElse(Nil)
      var board = before
      it.foreach { e =>
        val held = board.collectFirst {
          case (s, i) if i == e.id => s
        }
        if (!held.exists(_ >= e.score)) {
          val merged = ((e.score, e.id) ::
              board.filterNot(_._2 == e.id))
            .sortBy { case (s, i) => (-s, i) }.take(k)
          if (merged != board) board = merged
        }
      }
      if (board != before)
        (Some(BoardState(board.map(_._1), board.map(_._2))),
          board.zipWithIndex.iterator.map { case ((s, i), r) =>
            BoardRow(key, i, s, r + 1)
          })
      else (prev, Iterator.empty)
    }
}
