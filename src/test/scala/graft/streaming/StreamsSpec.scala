package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

class StreamsSpec extends SparkSuite {

  test("windowed counts over the events file stream match batch totals") {
    val out = Streams.streamWindowedFromParquet(spark, sfDir)
    val batchTotal = graft.core.Tables.events(spark, sfDir).count()
    assert(out.agg(sum("n_events")).collect().head.getLong(0) == batchTotal)
    // 5-minute windows: every start is aligned and end = start + 5 min
    val misaligned = out.filter(
      expr("minute(window_start) % 5 != 0 OR second(window_start) != 0 OR " +
           "window_end != window_start + INTERVAL 5 MINUTES")).count()
    assert(misaligned == 0)
  }

  test("append-mode file-sink path matches batch for closed windows") {
    val work = tmpDir("stream-append")
    val emitted = Streams.streamWindowedAppendFromParquet(spark, sfDir, work)
      .persist()
    // batch equivalent, same rounding
    val batch = Streams.windowedEventCounts(
        graft.core.Tables.events(spark, sfDir))
      .withColumn("sum_value", round(col("sum_value"), 2))
      .persist()
    val keys = Seq("window_start", "window_end", "event_type")
    // 1) something was emitted (watermark advanced across chunks)
    assert(emitted.count() > 0)
    // 2) no spurious rows: every emitted row appears in the batch result
    //    with identical aggregate values (join on keys + values)
    val spurious = emitted.join(batch,
      keys ++ Seq("n_events", "sum_value"), "left_anti").count()
    assert(spurious == 0)
    // 3) no duplicate windows in the sink (exactly-once append)
    assert(emitted.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).count() == 0)
    // 4) the earliest window is definitely closed → must be present
    val first = batch.orderBy("window_start", "event_type").limit(1)
    assert(emitted.join(first, keys, "left_semi").count() == 1)
    emitted.unpersist(); batch.unpersist()
  }

  test("streamDedupFromParquet: a full replay pass dedups to exactly the batch counts") {
    val work = tmpDir("sdedup")
    val out = Streams.streamDedupFromParquet(spark, sfDir, work)
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.core.Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"streaming dedup diverged: $got vs $want")
    // the staged source really delivered every event twice — the dedup had
    // real work to do (without it, every count above would be doubled)
    val staged = spark.read.parquet(s"$work/stage").count()
    assert(staged == 2 * graft.core.Tables.events(spark, sfDir).count())
  }

  test("consecutiveErrorAlerts fires at threshold and resets on success") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.EventIn]
    val alerts = Streams.consecutiveErrorAlerts(input.toDS(), threshold = 3)
    val q = alerts.writeStream.format("memory").queryName("err_alerts")
      .outputMode("append").start()
    try {
      // user 1: three consecutive errors → one alert; user 2: reset in between
      input.addData(
        Streams.EventIn(1, "error", 1), Streams.EventIn(1, "error", 2),
        Streams.EventIn(2, "error", 1), Streams.EventIn(2, "view", 2))
      q.processAllAvailable()
      input.addData(
        Streams.EventIn(1, "error", 3), // streak hits 3 → alert
        Streams.EventIn(2, "error", 3)) // streak restarted at 1 → no alert
      q.processAllAvailable()
      val got = spark.table("err_alerts").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(got.toSeq == Seq((1L, 3)))
    } finally q.stop()
  }
}
