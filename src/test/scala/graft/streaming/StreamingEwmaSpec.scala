package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming EMA: integer shift-recursion reproduces the reference fold
  * exactly across batch boundaries, series are independent, and idle
  * state is dropped by the event-time TTL.
  */
class StreamingEwmaSpec extends SparkSpec {

  private val M = 60L * 1000000L
  private val base = 1717200000000000L

  /** reference fold: same integer recursion, k=2 (α=1/4). */
  private def fold(xs: Seq[Long], k: Int): Seq[Long] =
    xs.tail.scanLeft(xs.head)((e, x) => e + ((x - e + (1L << (k - 1))) >> k))

  test("per-series shift-EMA matches the reference fold across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val out = StreamingEwma.smoothed(stream, "k", "ts", "v",
      k = 2, watermarkDelay = "0 seconds", idleTtlMs = 3600L * 1000L)
    val q = out.toDF().writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()
    def rows = spark.table("ema_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toList

    try {
      // batch 1: two series interleaved, out of order within the batch
      mem.addData(("a", base + 2 * M, 10.5), ("b", base, 100.0),
        ("a", base, 8.0), ("a", base + M, 9.25))
      q.processAllAvailable()
      // batch 2: continuation — state must carry the EMA across batches
      // (both events sit above batch 1's closing watermark of base+2M)
      mem.addData(("a", base + 3 * M, 20.0), ("b", base + 4 * M, 104.0))
      q.processAllAvailable()

      val aVals = Seq(8.0, 9.25, 10.5, 20.0).map(v => (v * 1e6).toLong)
      val aExp = fold(aVals, 2)
      val aGot = rows.filter(_._1 == "a").sortBy(_._2).map(_._3)
      assert(aGot == aExp, s"a: got $aGot want $aExp")
      val bExp = fold(Seq(100000000L, 104000000L), 2)
      val bGot = rows.filter(_._1 == "b").sortBy(_._2).map(_._3)
      assert(bGot == bExp, s"b: got $bGot want $bExp")
    } finally q.stop()
  }

  test("idle series state is dropped, and a fresh beat restarts from raw") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    // TTL = 10 min of event time
    val out = StreamingEwma.smoothed(stream, "k", "ts", "v",
      k = 1, watermarkDelay = "0 seconds", idleTtlMs = 10L * 60L * 1000L)
    val q = out.toDF().writeStream.format("memory").queryName("ema_ttl")
      .outputMode("append").start()
    def rows = spark.table("ema_ttl")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toList

    try {
      mem.addData(("a", base, 8.0), ("b", base, 1.0))
      q.processAllAvailable()
      // b keeps beating; watermark sails past a's TTL → a's state drops
      mem.addData(("b", base + 20 * M, 1.0))
      q.processAllAvailable()
      mem.addData(("b", base + 21 * M, 1.0))
      q.processAllAvailable()
      // a returns: EMA restarts at the raw value, NOT blended with 8.0
      mem.addData(("a", base + 22 * M, 40.0))
      q.processAllAvailable()
      val aLast = rows.filter(_._1 == "a").maxBy(_._2)
      assert(aLast._3 == 40000000L,
        s"state must have been TTL-dropped; got $aLast (blend of stale state?)")
    } finally q.stop()
  }
}
