package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel: stage advances match q93's strict-order batch
  * semantics across batch boundaries; out-of-order same-stage events
  * within a batch resolve by event time; completed funnels clear
  * state; wrong-order events never advance.
  */
class StreamingFunnelSpec extends SparkSpec {

  private val M = 60L * 1000000L
  private val base = 1717200000000000L

  test("stage advances track the strict-order fold across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("u", "us", "et")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("et"))
    val out = StreamingFunnel.advances(stream, "u", "ts", "et",
      Seq("view", "click", "purchase"), watermarkDelay = "0 seconds",
      idleTtlMs = 24L * 3600L * 1000L)
    val q = out.toDF().writeStream.format("memory").queryName("fun_out")
      .outputMode("append").start()
    def rows = spark.table("fun_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList

    try {
      // user 1: view in batch 1; click BEFORE the view is ignored;
      // user 2: click with no view never advances
      mem.addData((1L, base + 2 * M, "view"), (1L, base + M, "click"),
        (2L, base, "click"))
      q.processAllAvailable()
      assert(rows.toSet == Set((1L, 1, base + 2 * M)), s"$rows")
      // batch 2: user 1 clicks after the view (state carried), then
      // purchases; funnel completes and state clears
      mem.addData((1L, base + 3 * M, "click"), (1L, base + 4 * M, "purchase"))
      q.processAllAvailable()
      assert(rows.toSet == Set((1L, 1, base + 2 * M), (1L, 2, base + 3 * M),
        (1L, 3, base + 4 * M)), s"$rows")
      // after completion a new view starts NOTHING (state removed, and
      // a fresh view would re-enter stage 1 — verify re-entry is clean)
      mem.addData((1L, base + 5 * M, "view"))
      q.processAllAvailable()
      assert(rows.count(t => t._1 == 1L && t._2 == 1) == 2,
        s"completed funnel restarts at stage 1: $rows")
      // duplicate stage events never re-emit
      mem.addData((1L, base + 6 * M, "view"))
      q.processAllAvailable()
      assert(rows.count(t => t._1 == 1L && t._2 == 1) == 2, s"$rows")
    } finally q.stop()
  }
}
