package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming rolling distinct: hours emit exactly once when the
  * watermark closes them, counts are exact over the trailing window,
  * quiet hours report their decay, and per-series streams are
  * independent. Window = 3 h here so decay is observable in a short
  * fixture.
  */
class StreamingSlidingDistinctSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = (1717200000000000L / H) * H // hour-aligned

  test("trailing-3h distinct counts emit per closed hour, then decay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF().toDF("k", "us", "u")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("u"))
    val out = StreamingSlidingDistinct.counts(stream, "k", "u", "ts",
      windowHours = 3, watermarkDelay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("roll_out")
      .outputMode("append").start()
    def rows = spark.table("roll_out")
      .collect().map(r => (r.getString(0),
        (r.getLong(1) - base) / H, r.getLong(2))).toList

    try {
      // hour 0: users 1,2 on a; user 9 on b. hour 1: user 3 on a.
      mem.addData(("a", base + 60L * 1000000L, 1L),
        ("a", base + 90L * 1000000L, 2L), ("b", base, 9L),
        ("a", base + H + 1000000L, 3L))
      q.processAllAvailable()
      // nothing final yet (wm = max event time, hour 1 still open)
      // advance the watermark to close hours 0..4: a quiet tail shows
      // the trailing window decaying to zero
      mem.addData(("a", base + 6 * H, 1L))
      q.processAllAvailable()
      mem.addData(("a", base + 7 * H, 1L)) // one more batch: wm catches up
      q.processAllAvailable()
      val a = rows.filter(_._1 == "a").sortBy(_._2)
      // h0: {1,2}; h1: {1,2,3}; h2: {1,2,3}; h3: {3} (h0 aged out);
      // h4: {} ; h5: {}
      assert(a.take(6) == List(("a", 0L, 2L), ("a", 1L, 3L), ("a", 2L, 3L),
        ("a", 3L, 1L), ("a", 4L, 0L), ("a", 5L, 0L)), s"a: $a")
      // every hour emitted exactly once
      assert(a.map(_._2) == a.map(_._2).distinct, s"duplicate hours: $a")
      // b saw only hour 0: its grid decays 1,1,1 then closes with ONE
      // zero row at h3 and the state is removed — no rows ever after,
      // however far the watermark advances on a's beats
      val b = rows.filter(_._1 == "b").sortBy(_._2)
      assert(b == List(("b", 0L, 1L), ("b", 1L, 1L), ("b", 2L, 1L),
        ("b", 3L, 0L)), s"b decays to one closing zero then ends: $b")
    } finally q.stop()
  }
}
