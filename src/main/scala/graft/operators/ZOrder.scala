package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimension file skipping.
  *
  * A single-key sort clusters one dimension: row-group min/max stats
  * prune scans filtering on the sort key, and nothing else. Interleaving
  * the bits of several quantized dimensions orders rows along a
  * space-filling curve, so EVERY z-key's values are locally clustered —
  * each row group covers a small hyper-rectangle, and min/max stats
  * prune range predicates on any participating dimension (standard
  * technique from the public literature: Morton 1966; used by every
  * major lakehouse engine's OPTIMIZE ZORDER BY).
  *
  * At 100 TB this is a daily-compaction-time lever: the hourly tier
  * keeps the cheap time-ordered sort (files are small and short-lived);
  * the daily rewrite — the files that live for years and absorb most
  * scans — pays one interleave expression per row, entirely inside
  * codegen, no extra shuffle (it replaces the ORDER BY key).
  *
  * Dimensions are quantized to `bits` each by min/max range scaling —
  * ranges come from the input files' parquet footer statistics (zero
  * data passes). Numeric/timestamp/date dimensions only: range
  * predicates are what z-order accelerates; string tags use equality,
  * which the tag bloom filters already serve.
  */
object ZOrder {

  /** Bits per dimension for `dims.length` dimensions (≤ 63 total). */
  def bitsFor(nDims: Int): Int = math.min(16, 63 / math.max(nDims, 1))

  /** Morton interleave of the given (column, min, max) dimensions into
    * one LONG: bit k of dim i lands at position k*d + i. Null values
    * quantize to 0 (sort first, like NULLS FIRST). */
  def zvalue(dims: Seq[(Column, Double, Double)]): Column = {
    require(dims.nonEmpty, "zvalue needs at least one dimension")
    val d = dims.length
    val bits = bitsFor(d)
    val maxQ = (1L << bits) - 1
    val quantized = dims.map { case (c, mn, mx) =>
      val span = mx - mn
      if (span <= 0 || span.isNaN || span.isInfinite) lit(0L)
      else {
        val scaled = (c.cast("double") - lit(mn)) / lit(span) * lit(maxQ.toDouble)
        coalesce(least(greatest(floor(scaled).cast("long"), lit(0L)), lit(maxQ)),
          lit(0L))
      }
    }
    // sum of ((q_i >> k) & 1) << (k*d + i) — pure long arithmetic, stays
    // in whole-stage codegen
    var z: Column = lit(0L)
    var i = 0
    while (i < d) {
      var k = 0
      while (k < bits) {
        z = z + shiftleft(shiftright(quantized(i), k).bitwiseAND(lit(1L)),
          k * d + i).cast("long")
        k += 1
      }
      i += 1
    }
    z
  }
}
