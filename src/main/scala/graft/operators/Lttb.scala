package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson, "Downsampling
  * Time Series for Visual Representation", U. Iceland MSc thesis 2013 —
  * the standard dashboard downsampler; complements q118's M4, which is
  * error-bounded for min/max envelopes while LTTB preserves visual shape).
  *
  * Per series: first and last points are always kept; the n-2 interior
  * points are split into `buckets`-2 equal index ranges, and each bucket
  * keeps the point forming the largest triangle with the PREVIOUSLY
  * selected point and the average of the NEXT bucket. That chain makes the
  * choice inherently sequential per series — no SQL-expressible twin
  * (rows-only query; LttbSpec pins the invariants and a planted spike).
  *
  * Distributed shape (the 100 TB path): one shuffle to co-locate each
  * series (`repartition(keyCol)`), an in-partition sort, and a streaming
  * pass that buffers only the current and next bucket — O(n/B) memory per
  * series, never the whole series. Series lengths arrive via a
  * series-count frame joined in before the shuffle (series-id cardinality,
  * metadata-sized next to the points). Selection runs at full parallelism
  * across series; a single series is single-threaded by definition of the
  * algorithm (reference implementations are too).
  */
object Lttb {

  /** Downsample `df` to ≤ `buckets` points per `keyCol` series.
    * Output columns: keyCol, tsCol, idCol, valCol (selected rows only).
    * Ordering inside a series is (tsCol, idCol) — idCol must be a unique
    * tie-break so the result is deterministic. `buckets` ≥ 3.
    */
  def downsample(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, buckets: Int): DataFrame = {
    require(buckets >= 3, s"LTTB needs >= 3 buckets, got $buckets")
    val spark = df.sparkSession
    val sorted = sortedInput(df, keyCol, tsCol, idCol, valCol)
    val outSchema = StructType(Seq(
      StructField("_k", StringType), StructField("_x", LongType),
      StructField("_id", LongType), StructField("_y", DoubleType)))
    val selected = spark.createDataFrame(
      sorted.queryExecution.toRdd.mapPartitions { it =>
        // Spark's BufferedRowIterator contract: next() is only legal
        // after hasNext() (which fills the codegen buffer) — a plain
        // it.map{...}.buffered chain calls next() cold and throws
        val rows = new Iterator[(String, Long, Long, Long, Double)] {
          override def hasNext: Boolean = it.hasNext
          override def next(): (String, Long, Long, Long, Double) = {
            if (!it.hasNext) throw new NoSuchElementException("series input exhausted")
            val ir = it.next()
            (ir.getString(0), ir.getLong(1), ir.getLong(2), ir.getLong(4), ir.getDouble(3))
          }
        }
        new RunIterator(rows, buckets)
      }.map { p => Row(p.k, p.x, p.id, p.y) },
      outSchema)
    selected.select(col("_k").as(keyCol), timestamp_micros(col("_x")).as(tsCol),
      col("_id").as(idCol), col("_y").as(valCol))
  }

  /** Pre-kernel distributed shape (exposed for the plan pin): series
    * counts broadcast-joined, one hash repartition on the series key,
    * in-partition (key, ts, id) sort. The kernel consumes this via
    * toRdd, so the OUTER query's explain cannot see it. */
  private[graft] def sortedInput(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val pts = df.select(col(keyCol).cast("string").as("_k"),
      unix_micros(col(tsCol)).as("_x"),
      col(idCol).cast("long").as("_id"),
      col(valCol).cast("double").as("_y"))
    val counts = pts.groupBy(col("_k")).agg(count(lit(1)).as("_n"))
    pts.join(broadcast(counts), "_k")
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_x"), col("_id"))
  }

  private[operators] final case class Pt(k: String, x: Long, id: Long, n: Long, y: Double)

  /** Streams (key, x, id, n, y) tuples sorted by (key, x, id), emitting the
    * LTTB selection per key run. Buffers at most two buckets of one series. */
  private final class RunIterator(
      in: Iterator[(String, Long, Long, Long, Double)], buckets: Int)
    extends Iterator[Pt] {

    private val src = in.buffered
    private val out = ArrayBuffer.empty[Pt]
    private var outPos = 0

    override def hasNext: Boolean = {
      while (outPos >= out.length && src.hasNext) { out.clear(); outPos = 0; nextRun() }
      outPos < out.length
    }
    override def next(): Pt = { if (!hasNext) throw new NoSuchElementException; val p = out(outPos); outPos += 1; p }

    /** Consume one full series run and append its selection to `out`. */
    private def nextRun(): Unit = {
      val key = src.head._1
      val n = src.head._4
      if (n <= buckets) { // short series: keep everything
        while (src.hasNext && src.head._1 == key) out += toPt(src.next())
        return
      }
      val first = toPt(src.next())
      out += first
      var prev = first
      val interior = n - 2 // points 0..interior-1 stream next; last point after
      val nb = buckets - 2
      // selectable bucket of interior index i: i * nb / interior
      var cur = ArrayBuffer.empty[Pt] // bucket b (awaiting selection)
      var nxt = ArrayBuffer.empty[Pt] // bucket b+1 (provides the average)
      var b = 0L // bucket index of `cur`
      var i = 0L
      while (i < interior) {
        val p = toPt(src.next())
        val pb = i * nb / interior
        if (pb == b) cur += p
        else if (pb == b + 1) nxt += p
        else { // finished reading bucket b+1: select from `cur` vs avg(nxt)
          out += select(prev, cur, avgOf(nxt)); prev = out.last
          cur = nxt; nxt = ArrayBuffer(p); b += 1
        }
        i += 1
      }
      val last = toPt(src.next()) // final point of the series
      if (cur.nonEmpty && nxt.nonEmpty) { // flush: select b (avg of b+1), then b+1 (last point)
        out += select(prev, cur, avgOf(nxt)); prev = out.last
        out += select(prev, nxt, (last.x.toDouble, last.y))
      } else if (cur.nonEmpty) {
        out += select(prev, cur, (last.x.toDouble, last.y))
      }
      out += last
      // guard: a malformed n (drift between count and rows) would leave
      // stray same-key rows — drain them loudly rather than corrupt the
      // next run
      while (src.hasNext && src.head._1 == key)
        throw new IllegalStateException(s"LTTB: series '$key' longer than its count $n")
    }

    private def toPt(t: (String, Long, Long, Long, Double)): Pt =
      Pt(t._1, t._2, t._3, t._4, t._5)

    /** Bucket centroid with an ORDER-FREE, integer-exact x average:
      * summing raw epoch-micros as doubles loses bits past 2^53 (any
      * post-2255 timestamp, or big bucket sums of today's ~1.7e18 µs),
      * and the rounding would depend on arrival order. Offsets from the
      * bucket's first x sum exactly in a Long (span × bucket size ≪
      * 2^63), so cx = x0 + Σoff/len reproduces bit-identically on any
      * engine evaluating the same formula — which is what lets the
      * q119b oracle twin match by hash. y stays a plain double sum
      * (exact whenever y is integral, e.g. the twin's cents frame). */
    private def avgOf(ps: ArrayBuffer[Pt]): (Double, Double) = {
      val x0 = ps.head.x
      var sx = 0L; var sy = 0.0
      ps.foreach { p => sx += p.x - x0; sy += p.y }
      (x0.toDouble + sx.toDouble / ps.length, sy / ps.length)
    }

    /** Max-area point of `ps` vs the fixed previous vertex and next-bucket
      * centroid; ties keep the earliest point (deterministic). */
    private def select(prev: Pt, ps: ArrayBuffer[Pt], c: (Double, Double)): Pt = {
      var best = ps.head; var bestA = -1.0
      ps.foreach { p =>
        val a = math.abs((prev.x.toDouble - c._1) * (p.y - prev.y) -
          (prev.x.toDouble - p.x.toDouble) * (c._2 - prev.y))
        if (a > bestA) { bestA = a; best = p }
      }
      best
    }
  }
}
