package graft.streaming

import org.apache.spark.sql.DataFrame
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
  *    bounds — both sides watermarked so join state is evicted.
  */
object StreamOps {

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
}
