package graft.ingest

/** Timestamp-unit auto-detection and normalization to the engine's
  * canonical int64 **microseconds** (UTC).
  *
  * Mirrors the reference's semantics (Basekick-Labs/arc,
  * internal/ingest/msgpack.go:342-397): the unit of an incoming int64
  * timestamp is inferred from its magnitude — epoch seconds, millis,
  * micros and nanos occupy disjoint magnitude bands for any plausible
  * date (1970..2200+):
  *   seconds < 1e11  <  millis < 1e14  <  micros < 1e17  <  nanos
  * Negative (pre-epoch) values are valid and detected on |v|.
  */
object TimestampUnits {

  sealed trait Unit { def toMicros(v: Long): Long }
  case object Seconds extends Unit { def toMicros(v: Long): Long = v * 1000000L }
  case object Millis extends Unit { def toMicros(v: Long): Long = v * 1000L }
  case object Micros extends Unit { def toMicros(v: Long): Long = v }
  case object Nanos extends Unit { def toMicros(v: Long): Long = Math.floorDiv(v, 1000L) }

  private final val SecondsMax = 100000000000L        // 1e11 ~ year 5138 in s
  private final val MillisMax = 100000000000000L      // 1e14 ~ year 5138 in ms
  private final val MicrosMax = 100000000000000000L   // 1e17 ~ year 5138 in µs

  def detect(v: Long): Unit = {
    val a = Math.abs(v)
    if (a < SecondsMax) Seconds
    else if (a < MillisMax) Millis
    else if (a < MicrosMax) Micros
    else Nanos
  }

  /** Normalize one value, auto-detecting its unit. */
  def toMicros(v: Long): Long = detect(v).toMicros(v)

  /** ns → µs as a Column, INTEGER floor division (the vectorized twin of
    * [[Nanos]].toMicros): `floor(x / 1000)` divides in double, whose
    * 512 ns ULP at modern ns epochs (~1.7e18) puts the result up to
    * ±1 µs off — every vectorized ns path must use this instead. */
  def nanosToMicrosCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit, pmod}
    call_function("div", c - pmod(c, lit(1000L)), lit(1000L))
  }

  /** Magnitude-based unit detection as a Column expression — the
    * vectorized [[detect]]+[[toMicros]] (shared by the compaction
    * REPLACE coercion and the bulk-import time normalizer). */
  def toMicrosCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{abs, when}
    val a = abs(v)
    when(a < SecondsMax, v * 1000000L)
      .when(a < MillisMax, v * 1000L)
      .when(a < MicrosMax, v)
      .otherwise(nanosToMicrosCol(v))
  }

  /** Normalize a column in place using the unit detected from the first
    * value (one batch = one unit, as in the reference's columnar path). */
  def normalizeColumn(vs: Array[Long]): Array[Long] = {
    if (vs.isEmpty) vs
    else {
      val u = detect(vs(0))
      var i = 0
      while (i < vs.length) { vs(i) = u.toMicros(vs(i)); i += 1 }
      vs
    }
  }

  def parseUnit(precision: String): Unit = precision match {
    case "s" => Seconds
    case "ms" => Millis
    case "u" | "us" => Micros
    case "n" | "ns" | "" => Nanos
    case other => throw new IllegalArgumentException(s"unknown precision: $other")
  }
}
