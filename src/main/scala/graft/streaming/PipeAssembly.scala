package graft.streaming

import graft.sources.ChangeLogSourceProvider
import graft.streaming.TxPipeline.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Config-driven pipe assembly (SURVEY.md §2.6 E2, §3.1): the
  * reference's `PipeRunner` wires consumer → filter → tx-grouping →
  * producer from Typesafe config via reflection
  * (`PipeRunner.scala:17-56,62-187`). The Spark shape is a declarative
  * builder over a plain key→value map — no reflection (a documented
  * delta: class-name plugin loading trades static safety for dynamism
  * the Spark engine doesn't need; custom stages are function values).
  *
  * Recognized keys:
  *   source.path               change-log file (ChangeLogSource TSV)
  *   source.maxLinesPerTrigger admission cap per micro-batch
  *   filter.condition          SQL predicate on the event columns (F1)
  *   tx.timeoutMs              abandoned-transaction discard timeout
  *   sink.path                 parquet sink directory
  *   sink.checkpoint           checkpoint dir (position repo, T5)
  *   sink.triggerSeconds       processing-time trigger (flush interval,
  *                             T8; reference default 10 s)
  */
object PipeAssembly {

  val Defaults: Map[String, String] = Map(
    "source.maxLinesPerTrigger" -> Long.MaxValue.toString,
    "filter.condition" -> "true",
    "tx.timeoutMs" -> "0",
    "sink.triggerSeconds" -> "10")

  def events(spark: SparkSession, config: Map[String, String])
      : Dataset[ChangeEvent] = {
    val conf = Defaults ++ config
    import TxPipeline.eventEnc
    spark.readStream
      .format(classOf[ChangeLogSourceProvider].getName)
      .option("path", conf("source.path"))
      .option("maxLinesPerTrigger", conf("source.maxLinesPerTrigger"))
      .load()
      .filter(expr(conf("filter.condition")))
      .select(col("conn"), col("seq"), col("kind"),
        coalesce(col("op"), lit("")).as("op"),
        coalesce(col("pk"), lit("")).as("pk"),
        coalesce(col("ts_us"), lit(0L)).as("tsUs"),
        when(col("value").isNotNull, map(lit("value"), col("value")))
          .otherwise(map().cast("map<string,string>")).as("payload"))
      .as[ChangeEvent]
  }

  /** Assemble and start the full pipe: source → skip-filter → tx-group
    * → checkpointed parquet sink. */
  def start(spark: SparkSession, config: Map[String, String],
      availableNow: Boolean = false): StreamingQuery = {
    val conf = Defaults ++ config
    val mutations = TxPipeline.groupByTransaction(
      events(spark, config), conf("tx.timeoutMs").toLong)
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(s"${conf("sink.triggerSeconds")} seconds")
    CdcStream.toParquetSink(mutations, conf("sink.path"),
      conf("sink.checkpoint"), trigger)
  }
}
