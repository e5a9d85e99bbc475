package graft.streaming

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CQ: event-time windows finalize on watermark passage only
  * (append mode), late-but-within-watermark rows count, output carries
  * the window-start time stamp (batch-CQ idempotency convention), and
  * the streaming dedup drops cross-batch duplicates within the horizon.
  */
class StreamingCqSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z

  test("windowed agg emits only finalized windows, stamped at window start") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = new GraftCatalog(spark, tmpDir("scq_cat"))
    val ckpt = tmpDir("scq_ckpt")
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))

    val q = StreamingCq.start(cat, "default", "cq_out", stream,
      windowSpec = "1 hour", watermarkDelay = "10 minutes",
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_v")),
      groupCols = Seq("host"), checkpointDir = ckpt,
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      // hour-0 data, plus one late row still inside the 10 min watermark
      mem.addData((base + 10L, "a", 1.0), (base + 20L, "a", 2.0),
        (base + 30L, "b", 5.0))
      q.processAllAvailable()
      mem.addData((base + H + 5L * 60L * 1000000L, "a", 7.0)) // 01:05
      q.processAllAvailable()
      mem.addData((base + 40L, "a", 4.0)) // late hour-0 row, within watermark
      q.processAllAvailable()
      // nothing finalized yet: watermark = 01:05 - 10min < 01:00
      assert(!cat.spark.catalog.tableExists("cq_out") ||
        cat.table("default", "cq_out").isEmpty)
      // advance event time past 01:10 -> hour-0 window finalizes
      mem.addData((base + H + 20L * 60L * 1000000L, "b", 9.0)) // 01:20
      q.processAllAvailable()
    } finally q.stop()

    val out = cat.table("default", "cq_out")
      .select(col("time"), col("host"), col("n"), col("sum_v"))
      .collect().map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000L,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // hour-0 only (hour-1 not finalized), stamped at window start,
    // late row (v=4.0) included
    assert(out == Set(
      (base, "a", 3L, 7.0),
      (base, "b", 1L, 5.0)), out)

    // exactly-once contract: foreachBatch is at-least-once, so the
    // destination meta MUST be armed for compaction's (tags, time)
    // dedup — without it a replayed micro-batch's duplicates survive
    // forever (the batch CQ writes the same meta)
    val meta = cat.readMeta("default", "cq_out")
    assert(meta.dedupTime && meta.tagColumns == Seq("host"),
      s"StreamingCq must arm the dedup meta, got $meta")
  }

  test("streaming dedup drops cross-batch duplicate (key, time) rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
    val deduped = StreamingCq.dedup(stream, Seq("host"), "10 minutes")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((base, "a", 1.0), (base, "a", 1.0)) // in-batch dup
      q.processAllAvailable()
      mem.addData((base, "a", 1.0), (base + 1L, "a", 2.0)) // cross-batch dup
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("dedup_out").collect()
    assert(rows.length == 2, rows.mkString(","))
  }
}
