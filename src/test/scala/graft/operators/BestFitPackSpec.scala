package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Best-fit-decreasing packing pinned against an independent driver
  * fold, plus the structural invariants any valid doc-aligned packing
  * must satisfy. */
class BestFitPackSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16L

  private def run(ws: Seq[(Long, Long)], shards: Int = 1) =
    BestFitPack.pack(
      ws.toDF("k", "w").withColumn("g", lit("s")),
      col("g"), col("k"), col("w"), seqLen = L, shards = shards)
      .select("key", "chunk_id", "n_toks", "bin_id", "bin_off")
      .as[(Long, Long, Long, Long, Long)]
      .collect().toSeq

  /** Independent greedy: chunk, sort (sz desc, k, c), best-fit with
    * linear scan over open bins. */
  private def reference(ws: Seq[(Long, Long)]) = {
    val chunks = for {
      (k, w) <- ws; if w > 0
      c <- 0L until ((w - 1) / L + 1)
    } yield (k, c, math.min(L, w - c * L))
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long] // remaining
    chunks.sortBy { case (k, c, sz) => (-sz, k, c) }.map { case (k, c, sz) =>
      val fits = bins.zipWithIndex.filter(_._1 >= sz)
      val bin = if (fits.isEmpty) { bins += L; bins.length - 1 }
        else fits.minBy { case (rem, id) => (rem, id) }._2
      val off = L - bins(bin)
      bins(bin) -= sz
      (k, c, sz, bin.toLong, off)
    }
  }

  test("matches the independent greedy on randomized weights") {
    val rnd = new scala.util.Random(5)
    val ws = (1L to 300L).map(k => k -> rnd.nextInt(45).toLong) // incl. 0 and > L
    val got = run(ws).sortBy(r => (r._1, r._2))
    val want = reference(ws).map(r => (r._1, r._2, r._3, r._4, r._5))
      .sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("invariants: chunks tile docs, bins never overflow, offsets stack") {
    val rnd = new scala.util.Random(9)
    val ws = (1L to 200L).map(k => k -> (rnd.nextInt(60).toLong + 1))
    val out = run(ws)
    // every doc's chunks tile [0, w)
    out.groupBy(_._1).foreach { case (k, rows) =>
      val w = ws.find(_._1 == k).get._2
      assert(rows.map(_._3).sum == w, s"doc $k token coverage")
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until sorted.length.toLong))
      sorted.dropRight(1).foreach(r => assert(r._3 == L,
        s"doc $k: only the last chunk may run short"))
    }
    // bins: capacity respected, offsets are the running fill
    out.groupBy(_._4).foreach { case (bin, rows) =>
      assert(rows.map(_._3).sum <= L, s"bin $bin overflows")
      val byOff = rows.sortBy(_._5)
      assert(byOff.head._5 == 0L, s"bin $bin starts at 0")
      byOff.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 + a._3 == b._5, s"bin $bin gap")
        case _ =>
      }
    }
    // bin ids are dense from 0
    val ids = out.map(_._4).distinct.sorted
    assert(ids == (0L until ids.length.toLong))
  }

  test("sharded packing keeps ids disjoint and invariants intact") {
    val rnd = new scala.util.Random(13)
    val ws = (1L to 200L).map(k => k -> (rnd.nextInt(30).toLong + 1))
    val shards = 4
    val out = run(ws, shards = shards)
    assert(out.map(r => (r._1, r._2)).distinct.size == out.size)
    assert(out.map(_._3).sum == ws.map(_._2).sum, "all tokens placed")
    out.groupBy(_._4).foreach { case (bin, rows) =>
      assert(rows.map(_._3).sum <= L, s"bin $bin overflows")
    }
    // every doc's chunks land in one shard's id space (bin % shards)
    out.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.map(_._4 % shards).distinct.size == 1,
        s"doc $k split across shards")
    }
  }

  test("slack report: bins_used >= the split lower bound") {
    val ws = (1L to 100L).map(k => k -> (k % 23 + 1))
    val packed = BestFitPack.pack(
      ws.toDF("k", "w").withColumn("g", lit("s")),
      col("g"), col("k"), col("w"), seqLen = L)
    val r = BestFitPack.report(packed, L).collect().head
    val bins = r.getAs[Long]("bins_used")
    val minBins = r.getAs[Long]("min_bins_if_split")
    val slack = r.getAs[Long]("slack_tokens")
    assert(bins >= minBins)
    assert(slack == bins * L - ws.map(_._2).sum)
  }
}
