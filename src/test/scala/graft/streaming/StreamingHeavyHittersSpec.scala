package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** StreamingHeavyHitters contract: a token above the design threshold is
  * present in the LIVE candidate set at every batch boundary after it
  * clears the threshold (MG no-false-negative, per shard), its counter
  * is a valid lower bound within the documented error, and state stays
  * bounded at k per shard no matter the vocabulary. */
class StreamingHeavyHittersSpec extends SparkSpec {

  /** Run batches through the tracker, returning the LAST emission per
    * (shard, token) — the live view after the final batch. */
  private def run(batches: Seq[Seq[String]], k: Int, nShards: Int)
      : Map[(Int, String), (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val name = s"hh_out_${System.nanoTime()}"
    val q = StreamingHeavyHitters.track(mem.toDF().toDF("token"),
        "token", k = k, nShards = nShards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // memory sink accumulates every update; the LIVE set per shard is
    // the emission at the shard's latest (maximal, monotone) total —
    // older rows may name since-evicted tokens
    val rows = spark.table(name)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val latest = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    rows.filter(t => t._4 == latest(t._1))
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
  }

  test("cross-batch heavy token survives with a valid lower bound") {
    // "viral" is ~25% of the stream but split across every batch;
    // 600 noise tokens churn the summaries
    val rnd = new Random(11)
    val batches = (0 until 4).map { b =>
      rnd.shuffle(Seq.fill(50)("viral") ++
        (0 until 150).map(i => s"noise_${b}_$i"))
    }
    val k = 9 // threshold 10% -> k > 1/0.1 - 1
    val live = run(batches, k = k, nShards = 4)
    val hit = live.collectFirst { case ((_, "viral"), v) => v }
    assert(hit.nonEmpty, s"viral token evicted: ${live.keys}")
    val (lower, shardTotal) = hit.get
    assert(lower <= 200L, "counter must lower-bound the true count")
    assert(lower >= 200L - shardTotal / (k + 1),
      s"error bound violated: lower=$lower shardTotal=$shardTotal")
  }

  test("live candidates cover the exact heavy hitters; state bounded by k") {
    val rnd = new Random(23)
    val stream = (0 until 3000).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.15) "hh_a" else if (r < 0.25) "hh_b"
      else s"tail_${rnd.nextInt(800)}"
    }
    val batches = stream.grouped(750).toSeq
    val k = 12
    val live = run(batches, k = k, nShards = 3)
    // every token with >= 10% global frequency must be live
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    exact.filter(_._2 >= stream.size / 10).keys.foreach { t =>
      assert(live.keys.exists(_._2 == t), s"missing heavy hitter $t")
    }
    // state bound: at most k live candidates per shard
    live.keys.groupBy(_._1).foreach { case (shard, ks) =>
      assert(ks.size <= k, s"shard $shard holds ${ks.size} > k=$k")
    }
  }

  test("single-shard determinism across replays") {
    val batches = Seq(Seq.fill(30)("a") ++ Seq.fill(20)("b") ++
      (0 until 40).map(i => s"x$i"), Seq.fill(25)("b") ++ Seq.fill(10)("c"))
    val r1 = run(batches, k = 5, nShards = 1)
    val r2 = run(batches, k = 5, nShards = 1)
    assert(r1 === r2)
  }
}
