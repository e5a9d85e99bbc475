package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SequencePack invariants, pinned against a driver-side reference fold
  * on randomized weights (the brute-force "walk the concatenated token
  * stream and cut every L tokens" definition). */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16L

  private def segs(ws: Seq[(Long, Long)]) =
    SequencePack.segments(
      ws.toDF("k", "w"), col("k"), col("w"), seqLen = L)
      .select("seq_id", "key", "seq_off", "doc_off", "n_toks")
      .as[(Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  /** Reference: walk docs in key order, emitting (seq, key, seqOff,
    * docOff, n) greedily token-run by token-run. */
  private def reference(ws: Seq[(Long, Long)]) = {
    var g = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    for ((k, w) <- ws.sortBy(_._1); if w > 0) {
      var done = 0L
      while (done < w) {
        val seq = (g / L); val seqOff = g % L
        val n = math.min(w - done, L - seqOff)
        out += ((seq, k, seqOff, done, n))
        g += n; done += n
      }
    }
    out.result()
  }

  test("matches the reference fold on randomized weights") {
    val rnd = new scala.util.Random(7)
    val ws = (1L to 200L).map(k =>
      k -> (rnd.nextInt(40).toLong match {
        case 0 => 0L // zero-weight docs must vanish
        case n => n
      }))
    assert(segs(ws) == reference(ws))
  }

  test("every token is mapped exactly once, sequences fill to L") {
    val ws = (1L to 100L).map(k => k -> (k % 37 + 1))
    val out = segs(ws)
    // per-doc coverage: segment lengths sum to the doc weight and the
    // doc offsets tile [0, w) without gaps
    out.groupBy(_._2).foreach { case (k, rows) =>
      val w = ws.find(_._1 == k).get._2
      assert(rows.map(_._5).sum == w, s"doc $k coverage")
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 == b._4, s"doc $k gap")
        case _ =>
      }
    }
    // per-sequence fill: every sequence except the last holds exactly L
    val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val last = bySeq.keys.max
    bySeq.foreach { case (s, n) =>
      if (s < last) assert(n == L, s"seq $s fill") else assert(n <= L)
    }
    // segments within one sequence tile [0, fill) in key order
    out.groupBy(_._1).foreach { case (s, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 == b._3, s"seq $s tiling")
        case _ =>
      }
    }
  }

  test("an oversized doc spans consecutive full sequences") {
    val out = segs(Seq(1L -> 3L, 2L -> 50L, 3L -> 2L))
    val doc2 = out.filter(_._2 == 2L).sortBy(_._4)
    assert(doc2.map(_._5).sum == 50L)
    assert(doc2.head._3 == 3L) // starts right after doc 1's 3 tokens
    assert(doc2.tail.forall(_._3 == 0L)) // later spans start at seq head
    assert(doc2.map(_._1) == (doc2.head._1 to doc2.last._1))
  }
}
