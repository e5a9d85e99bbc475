package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming M4 parity: finalized streaming buckets must equal the
  * batch q118 aggregate on the same events, including out-of-order
  * arrivals inside the watermark.
  */
class StreamingM4Spec extends SparkSpec {

  private val M = 60L * 1000000L
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z

  // (series, minute-offset, value); bucket = 15 min.
  // Series "a": bucket 0 holds min/max/first/last all distinct, with an
  // OUT-OF-ORDER arrival (minute 2 after minute 9); bucket 1 is a
  // singleton (all four stats = the same point). Series "b": duplicate
  // timestamp at minute 3 — the event_id tie-break decides first_v.
  private val batch1 = Seq(
    ("a", 9L, 50.0), ("a", 2L, 7.0), ("a", 11L, 3.0),
    ("b", 3L, 10.0))
  private val batch2 = Seq(
    ("a", 6L, 99.0), // late but inside watermark, folds into bucket 0
    ("a", 20L, 42.0),
    ("b", 3L, 20.0)) // same ts as b's first event, larger event_id
  private var nextId = 0L
  private def ev(s: String, m: Long, v: Double): (String, Long, Long, Double) = {
    nextId += 1; (s, base + m * M, nextId, v)
  }

  test("finalized streaming buckets equal the batch M4 aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    nextId = 0
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Double)]
    val mem = MemoryStream[(String, Long, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "event_id", "value")
      .select(col("k"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
    val m4 = StreamingM4.downsample(stream, Seq("k"), "ts", "event_id",
      "value", "15 minutes", "30 minutes")
    val q = m4.writeStream.format("memory").queryName("m4_out")
      .outputMode("append").start()
    try {
      val b1 = batch1.map { case (s, m, v) => ev(s, m, v) }; events ++= b1
      mem.addData(b1: _*)
      q.processAllAvailable()
      val b2 = batch2.map { case (s, m, v) => ev(s, m, v) }; events ++= b2
      mem.addData(b2: _*)
      q.processAllAvailable()
      // sentinel far in the future finalizes every real bucket
      mem.addData(ev("zz", 14L * 24 * 60, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("m4_out").where(col("k") =!= "zz")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

    val batchDf = events.toSeq.toDF("k", "us", "event_id", "value")
      .select(col("k"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
      .groupBy(col("k"), window(col("ts"), "15 minutes"))
      .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("first_v"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_v"),
        count(lit(1)).as("n"))
      .select(col("k"), col("window.start"), col("min_v"), col("max_v"),
        col("first_v"), col("last_v"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got == batchDf, s"streaming=$got batch=$batchDf")
    // shape sanity: a has buckets 0 (4 events incl. the late fold-in)
    // and 1; b has one bucket with the ts-tie decided by event_id
    val aB0 = got.find(t => t._1 == "a" && t._7 == 4L).get
    assert(aB0._3 == 3.0 && aB0._4 == 99.0 && aB0._5 == 7.0 && aB0._6 == 3.0)
    val bB0 = got.find(_._1 == "b").get
    assert(bB0._5 == 10.0 && bB0._6 == 20.0, s"event_id tie-break broken: $bB0")
  }
}
