package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming counter-rate: cross-batch continuation, reset handling,
  * in-batch disorder tolerance, late-sample flagging, and parity of the
  * summed increments with batch q120's window rule. */
class StreamingCounterRateSpec extends SparkSpec {

  private val M = 60L * 1000000L
  private val base = 1717200000000000L

  test("increments continue across batches, resets restart, late flags") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "id", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("id"), col("v"))
    val out = StreamingCounterRate.increments(stream, "k", "ts", "id", "v")
    val q = out.toDF().writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      // batch 1, series a: 10 -> 13 -> 12 (reset) ; arrives out of order
      mem.addData(("a", base + 2 * M, 2L, 13.0), ("a", base + 1 * M, 1L, 10.0),
        ("a", base + 3 * M, 3L, 12.0))
      q.processAllAvailable()
      // batch 2: continuation 12 -> 15 (+3), a LATE sample (ts before
      // the high-water mark), and a new series b
      mem.addData(("a", base + 4 * M, 4L, 15.0), ("a", base + 0 * M, 0L, 99.0),
        ("b", base + 1 * M, 5L, 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("rate_out")
      .select("series", "id", "inc", "late")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .toSet
    assert(rows == Set(
      ("a", 1L, Some(0.0), false),  // first sample
      ("a", 2L, Some(3.0), false),  // 10 -> 13
      ("a", 3L, Some(12.0), false), // reset: counter fell, inc = new value
      ("a", 4L, Some(3.0), false),  // cross-batch 12 -> 15
      ("a", 0L, None, true),        // late, flagged not guessed
      ("b", 5L, Some(0.0), false)), rows)
    // non-late increments sum to what batch q120's rule gives: 0+3+12+3
    val sum = rows.toSeq.filter(t => !t._4 && t._1 == "a").flatMap(_._3).sum
    assert(sum == 18.0)
  }
}
