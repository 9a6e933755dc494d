package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer. The reference's "streaming" is a 1 s
  * micro-batch scheduler poll (SURVEY.md §2.9) — parity for that lives in
  * graft.sched. This module is the north-star extension (BASELINE.json):
  * event-stream analytics with watermarks, windows, and custom state, built
  * so the same transforms run on a 100 TB/day stream (partition by key,
  * bounded state via watermark eviction).
  */
object Streams {

  /** Windowed event aggregation with late-data handling: counts + value sums
    * per (window, event_type), watermarked so state is evicted once the
    * watermark passes window end. */
  def windowedEventCounts(events: DataFrame,
                          windowLen: String = "5 minutes",
                          slide: String = "5 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"), col("sum_value"))

  final case class EventIn(user_id: Long, event_type: String, tsMillis: Long)
  final case class FailState(consecutiveFailures: Int)
  final case class FailAlert(userId: Long, consecutiveFailures: Int)

  /** Custom state: consecutive-'error' counting per user — the streaming
    * analogue of the scheduler's consecutive-failure retry window (A3).
    * Emits an alert row whenever a user's error streak reaches `threshold`;
    * any non-error event resets the streak. State is one Int per active key,
    * bounded by processing-time timeout. */
  def consecutiveErrorAlerts(events: Dataset[EventIn], threshold: Int,
                             evictAfter: Option[String] = None): Dataset[FailAlert] = {
    import events.sparkSession.implicits._
    // production sets evictAfter (bounded state); with a processing-time
    // timeout the engine triggers no-data batches to evict, so the
    // synchronous processAllAvailable test path uses NoTimeout
    val timeout = if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, evs: Iterator[EventIn], state: GroupState[FailState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var streak = state.getOption.map(_.consecutiveFailures).getOrElse(0)
            val alerts = scala.collection.mutable.ArrayBuffer.empty[FailAlert]
            evs.toSeq.sortBy(_.tsMillis).foreach { e =>
              if (e.event_type == "error") {
                streak += 1
                if (streak == threshold) alerts += FailAlert(userId, streak)
              } else streak = 0
            }
            state.update(FailState(streak))
            evictAfter.foreach(state.setTimeoutDuration)
            alerts.iterator
          }
        })
  }

  /** File-stream reader for the events schema (streaming ingest of a
    * directory that keeps receiving parquet/json drops). */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType,
                      format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** End-to-end streaming windowed aggregation over the events parquet,
    * driven synchronously to completion (complete mode so every window —
    * including the last, which a watermark would still hold — is emitted;
    * batch-equivalent and oracle-checkable). */
  def streamWindowedFromParquet(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = new StructType()
      .add("event_id", "long").add("ts", "long").add("user_id", "long")
      .add("event_type", "string").add("value", "double").add("props", "string")
    // watermarks require TIMESTAMP (an instant) — window on that, cast the
    // window bounds to ntz at the output edge (session TZ UTC → identity)
    // file streams need a directory: stream the sf dir, globbed to events
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = windowedEventCounts(raw)
      .withColumn("sum_value", round(col("sum_value"), 2))
      .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
      .withColumn("window_end", col("window_end").cast("timestamp_ntz"))
    runToMemory(agg, "graft_stream_events", outputMode = "complete")
  }

  /** Drive a streaming DataFrame synchronously into an in-memory table and
    * return the result — used by tests and the local smoke path (the guide's
    * `processAllAvailable` pattern). */
  def runToMemory(df: DataFrame, queryName: String,
                  outputMode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(queryName)
  }
}
