package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming sessionization parity: finalized streaming sessions must
  * equal the batch q26 window form on the same events (fixture kept off
  * the exact-gap boundary where the two forms legitimately differ —
  * see StreamingSessionize scaladoc).
  */
class StreamingSessionizeSpec extends SparkSpec {

  private val M = 60L * 1000000L // one minute in micros
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z
  private val GapUs = 30L * M

  // (user, minutes-offset): three users, multi-event sessions, a
  // session break (40 min > gap), a barely-chaining gap (29 min), and
  // a within-batch out-of-order arrival (user 2's 36 before 5)
  private val batch1 = Seq((1L, 0L), (1L, 10L), (1L, 20L), (2L, 36L),
    (2L, 5L), (3L, 7L))
  private val batch2 = Seq((1L, 60L), (2L, 65L))
  private def evUs(u: Long, m: Long): (Long, Long, Long) =
    (u, base + m * M, u * 1000 + m) // (user_id, us, event_id)

  /** Batch q26's exact window form over the same events. */
  private def batchSessions(events: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = events.toDF("user_id", "us", "event_id")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_id"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("new_s", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > GapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        r.getTimestamp(2).toInstant, r.getLong(3))).toSet
  }

  test("finalized streaming sessions equal the batch q26 form") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val stream = mem.toDF().toDF("user_id", "us", "event_id")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_id"))
    val sess = StreamingSessionize.sessions(
      stream, Seq("user_id"), "ts", "30 minutes", "0 seconds")
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1.map { case (u, m) => evUs(u, m) }: _*)
      q.processAllAvailable()
      mem.addData(batch2.map { case (u, m) => evUs(u, m) }: _*)
      q.processAllAvailable()
      // sentinel user far in the future pushes the watermark past every
      // real session's end + gap; its own (unfinalized) session is
      // excluded from the comparison
      mem.addData(evUs(99L, 14L * 24 * 60))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_out")
      .where(col("user_id") =!= 99L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        r.getTimestamp(2).toInstant, r.getLong(3))).toSet
    val want = batchSessions((batch1 ++ batch2).map { case (u, m) => evUs(u, m) })
    assert(got == want, s"streaming=$got batch=$want")
    // shape sanity: user 1 splits at the 40-min silence (2 sessions),
    // user 2's 31-min gap splits but its 29-min gap chains (2), user 3
    // is a singleton — 5 real sessions total
    assert(got.size == 5, got)
  }
}
