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
