package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CUSUM: the integer alarm-and-reset recursion matches the
  * reference fold exactly, excursions carry ACROSS batch boundaries,
  * and unconfigured series stay stateless.
  */
class StreamingCusumSpec extends SparkSpec {

  private val M = 60L * 1000000L
  private val base = 1717200000000000L

  private def fold(xs: Seq[Long], target: Long, h: Long): Seq[(String, Long)] = {
    var sp = 0L; var sm = 0L
    val out = Seq.newBuilder[(String, Long)]
    xs.foreach { x =>
      val spn = math.max(0L, sp + (x - target))
      val smn = math.max(0L, sm + (target - x))
      sp = if (spn > h) { out += (("hi", spn)); 0L } else spn
      sm = if (smn > h) { out += (("lo", smn)); 0L } else smn
    }
    out.result()
  }

  test("alarms match the reference fold, excursion state crosses batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    // a: target 10.00, h 5.00; unconfigured series c must emit nothing
    val out = StreamingCusum.alarms(stream, "k", "ts", "v",
      Map("a" -> StreamingCusum.Limits(1000L, 500L)),
      watermarkDelay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    def rows = spark.table("cusum_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toList

    try {
      // values in dollars; +2.00 drift per beat crosses h=5.00 at beat 3
      val vals = Seq(12.0, 12.0, 12.0, 12.0, 6.0, 6.0, 6.0, 6.0)
      // batch boundary after beat 2 (S+ = 4.00): beat 3's hi alarm
      // fires ONLY if the excursion carried across the boundary
      mem.addData(vals.take(2).zipWithIndex.map { case (v, i) =>
        ("a", base + i * M, v) } :+ (("c", base, 99.0)): _*)
      q.processAllAvailable()
      mem.addData(vals.drop(2).zipWithIndex.map { case (v, i) =>
        ("a", base + (2 + i) * M, v) }: _*)
      q.processAllAvailable()
      val exp = fold(vals.map(v => (v * 100).toLong), 1000L, 500L)
      val got = rows.filter(_._1 == "a").sortBy(_._2).map(t => (t._3, t._4))
      assert(got == exp, s"got $got want $exp")
      assert(!rows.exists(_._1 == "c"),
        s"unconfigured series alarmed: $rows")
    } finally q.stop()
  }
}
