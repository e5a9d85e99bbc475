package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time dead-man monitoring: a series that stops beating while
  * the watermark advances fires exactly one alert per missed gap,
  * re-alerts on continued silence, and emits a recovery carrying the
  * cancelled count when beats resume — all watermark-driven, so the
  * timeline is deterministic (no wall-clock sleeps here).
  */
class StreamingHeartbeatSpec extends SparkSpec {

  private val M = 60L * 1000000L // one minute in µs
  private val base = 1717200000000000L

  test("silent series alerts per gap of watermark progress, then recovers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF().toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    // gap = 10 min, zero-tolerance watermark
    val out = StreamingHeartbeat.alerts(stream, "k", "ts",
      gapMs = 10 * 60 * 1000L, watermarkDelay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("hb_out")
      .outputMode("append").start()
    def rows = spark.table("hb_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toList

    try {
      // t0: both series beat
      mem.addData(("a", base), ("b", base))
      q.processAllAvailable()
      assert(rows.isEmpty)
      // b keeps beating to t0+20m; watermark (end of batch) -> t0+20m,
      // past a's deadline t0+10m — the alert fires on the NEXT batch
      mem.addData(("b", base + 20 * M))
      q.processAllAvailable()
      mem.addData(("b", base + 21 * M))
      q.processAllAvailable()
      assert(rows.count(_ == ("a", "alert", 1)) == 1,
        s"one first alert for a: $rows")
      assert(!rows.exists(_._1 == "b"), s"b never alerts: $rows")
      // continued silence: wm advances another gap -> re-alert missed=2
      mem.addData(("b", base + 32 * M))
      q.processAllAvailable()
      mem.addData(("b", base + 33 * M))
      q.processAllAvailable()
      assert(rows.count(t => t._1 == "a" && t._2 == "alert") >= 2,
        s"re-alert on continued silence: $rows")
      val missedSoFar = rows.filter(t => t._1 == "a" && t._2 == "alert")
        .map(_._3).max
      // a resumes: recovery cancels the outstanding alerts
      mem.addData(("a", base + 34 * M))
      q.processAllAvailable()
      val rec = rows.filter(t => t._1 == "a" && t._2 == "recovery")
      assert(rec == List(("a", "recovery", missedSoFar)), s"$rows")
      // after recovery, no further alerts until another gap passes
      mem.addData(("b", base + 35 * M))
      q.processAllAvailable()
      assert(rows.filter(t => t._1 == "a" && t._2 == "alert")
        .map(_._3).max == missedSoFar, s"$rows")
    } finally q.stop()
  }
}
