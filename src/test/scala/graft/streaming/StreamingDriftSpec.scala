package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift: hours emit exactly once on watermark close, the TV
  * value matches a batch recomputation through the ENGINE's own decimal
  * cast + the q149 integer formula, cross-batch and out-of-order events
  * fold into their open hour, and novel series report maximal drift. */
class StreamingDriftSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = (1717200000000000L / H) * H // hour-aligned

  /** Reference histogram via the same SQL expressions q149 uses, so the
    * kernel's Scala quantization is pinned against the engine's cast. */
  private def histOf(vals: Seq[(String, Double)]): Map[String, Map[Long, Long]] = {
    import spark.implicits._
    vals.toDF("k", "v")
      .select(col("k"),
        expr("cast(cast(v as decimal(18,2)) * 100 as bigint) div 5000").as("b"))
      .groupBy("k", "b").count()
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
  }

  /** Batch TV through the same integer formula (independent fold). */
  private def batchTv(vals: Seq[Double], ref: Map[Long, Long]): Double = {
    val hour = vals.groupBy(StreamingDrift.binOf).view.mapValues(_.size.toLong).toMap
    StreamingDrift.tvOf(hour, ref)
  }

  test("closed hours emit once with batch-exact TV; novel series max out") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference for series a: values centered in bins 0 and 1
    val ref = histOf(Seq(("a", 10.0), ("a", 20.0), ("a", 60.0), ("a", 70.0)))
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    // 2 h delay: hour h closes only once events reach h + 3 h, so the
    // cross-batch and out-of-order arrivals below stay IN-watermark
    val out = StreamingDrift.monitor(stream, "k", "v", "ts", ref, "2 hours")
    val q = out.toDF().writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    def rows = spark.table("drift_out").collect()
      .map(r => (r.getString(0), (r.getLong(1) - base) / H,
        r.getLong(2), r.getDouble(3))).toList

    try {
      // hour 0 on a: same shape as reference (2 low, 2 high) -> TV 0;
      // hour 1 arrives split across two micro-batches and out of order
      mem.addData(("a", base + 1000000L, 12.0), ("a", base + 2000000L, 18.0),
        ("a", base + 3000000L, 65.0), ("a", base + 4000000L, 72.0),
        ("a", base + H + 60000000L, 95.0))
      q.processAllAvailable()
      assert(rows.isEmpty, "watermark still before hour 0's close")
      // late-but-in-watermark: an hour-1 event EARLIER than the last one
      mem.addData(("a", base + H + 30000000L, 85.0),
        ("b", base + H + 45000000L, 10.0))
      q.processAllAvailable()
      assert(rows.isEmpty, "still nothing final")
      // wm -> base+1h: hour 0 closes
      mem.addData(("a", base + 3 * H, 10.0))
      q.processAllAvailable()
      assert(rows.map(r => (r._1, r._2)) == List(("a", 0L)),
        s"only hour 0 final so far: $rows")
      // wm -> base+2h: hour 1 closes for BOTH series (b by timeout —
      // it gets no more data of its own)
      mem.addData(("a", base + 4 * H, 10.0))
      q.processAllAvailable()

      val a = rows.filter(_._1 == "a").sortBy(_._2)
      assert(a.map(_._2) == a.map(_._2).distinct, s"duplicate hours: $a")
      val refA = ref("a")
      assert(a.head == (("a", 0L, 4L,
        batchTv(Seq(12.0, 18.0, 65.0, 72.0), refA))), s"hour 0: $a")
      assert(a.head._4 == 0.0, "same shape as reference: zero drift")
      assert(a(1) == (("a", 1L, 2L, batchTv(Seq(95.0, 85.0), refA))),
        s"hour 1 must fold both micro-batches: $a")
      assert(a(1)._4 > 0.0, "shifted shape drifts")
      // b has no reference entry: maximal drift
      val b = rows.filter(_._1 == "b")
      assert(b == List(("b", 1L, 1L, 1.0)), s"novel series: $b")
      // quiet hour 2 emitted nothing
      assert(!rows.exists(r => r._1 == "a" && r._2 == 2L))
    } finally q.stop()
  }

  test("tvOf stays exact past the int64 numerator bound (r8 advice)") {
    // n·nRef ≈ 9e12: the old num*2000000 wrapped int64 and silently
    // corrupted tv; BigInt keeps the rational exact
    val n = 3000000L
    val nRef = 3000000L
    val hour = Map(0L -> n)
    val ref = Map(0L -> (nRef / 3), 1L -> (2 * nRef / 3))
    val tv = StreamingDrift.tvOf(hour, ref)
    // exact TV = (|n·nRef − (nRef/3)·n| + |0 − (2nRef/3)·n|) / (2·n·nRef) = 2/3
    assert(math.abs(tv - 0.666667) < 1e-9, s"tv=$tv")
  }

  test("kernel quantization matches the engine's decimal cast on ties") {
    import spark.implicits._
    // .xx5 ties are where HALF_UP vs half-even would diverge
    val vals = Seq(0.005, 0.015, 49.995, 50.005, -0.005, 124.995)
    val engine = vals.toDF("v")
      .select(expr("cast(cast(v as decimal(18,2)) * 100 as bigint) div 5000"))
      .collect().map(_.getLong(0)).toSeq
    assert(vals.map(StreamingDrift.binOf) == engine)
  }

  test("pathological values bin like the engine's try_cast NULL, never throw") {
    import spark.implicits._
    // NaN / ±Inf / decimal(18,2)-overflow: under ANSI (Spark 4 default)
    // the batch CAST throws per-row, which a batch query surfaces as a
    // query error — but a throwing binOf inside flatMapGroupsWithState
    // is a poison pill: the checkpointed batch replays and kills the
    // query forever. The streaming kernel therefore takes try_cast's
    // NULL semantics for the pathological tail (a dedicated NullBin),
    // staying bit-identical to the batch cast everywhere it succeeds.
    val vals = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e17, -1e17, 9.9e15, 42.125)
    val engine = vals.toDF("v")
      .select(expr(
        "cast(try_cast(v as decimal(18,2)) * 100 as bigint) div 5000"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val stream = vals.map(StreamingDrift.binOf)
      .map(b => if (b == StreamingDrift.NullBin) None else Some(b))
    assert(stream == engine, s"stream=$stream engine=$engine")
  }
}
