package graft.ingest

import scala.collection.{immutable, mutable}

/** InfluxDB Line Protocol parser.
  *
  * Grammar (reference: Basekick-Labs/arc internal/ingest/lineprotocol.go):
  *   measurement[,tag=v[,tag2=v2...]] field=value[,f2=v2...] [timestamp]
  *  - backslash escapes in measurement/tags/field keys: `\ `, `\,`, `\=`
  *  - string field values in double quotes with `\"` and `\\` escapes
  *  - `i`-suffixed integers (`42i`), bare floats, `t/T/true/f/F/false` bools
  *  - optional trailing timestamp in the given precision (default ns),
  *    normalized to µs; missing timestamp ⇒ caller stamps now
  *  - `#` comment lines and blank lines skipped
  *  - negative (pre-epoch) timestamps are valid
  */
object LineProtocol {

  sealed trait FieldValue
  final case class FLong(v: Long) extends FieldValue
  final case class FDouble(v: Double) extends FieldValue
  final case class FString(v: String) extends FieldValue
  final case class FBool(v: Boolean) extends FieldValue

  final case class Point(
      measurement: String,
      tags: Map[String, String],
      fields: Map[String, FieldValue],
      timeMicros: Option[Long])

  final case class ParseError(line: Int, message: String)

  /** Parse a full payload; returns points and per-line errors (the
    * reference continues past bad lines and reports them).
    * Large payloads parse line-parallel across cores (each line is
    * independent); order of points follows input order.
    *
    * Hot path: lines are (start, end) ranges into the payload — no
    * per-line String materialization (a `linesIterator.toArray` over a
    * 100+ MB payload was the parser's dominant cost, not parseLine). */
  def parse(payload: String, precision: String = "ns",
      nowMicros: () => Long = () => System.currentTimeMillis() * 1000L)
      : (Seq[Point], Seq[ParseError]) = {
    val unit = TimestampUnits.parseUnit(precision)
    val len = payload.length
    // pass 1: count lines (indexOf is SIMD-intrinsified)
    var nLines = if (len == 0) 0 else 1
    var at = payload.indexOf('\n')
    while (at >= 0) {
      if (at + 1 < len) nLines += 1
      at = payload.indexOf('\n', at + 1)
    }
    // pass 2: line start offsets (end = next start - 1)
    val starts = new Array[Int](nLines + 1)
    var li = 1
    at = payload.indexOf('\n')
    while (at >= 0) {
      if (at + 1 < len) { starts(li) = at + 1; li += 1 }
      at = payload.indexOf('\n', at + 1)
    }
    starts(nLines) = len + 1
    val results = new Array[AnyRef](nLines) // Point | ParseError | null
    val stream =
      if (nLines >= 4096)
        java.util.stream.IntStream.range(0, nLines).parallel()
      else java.util.stream.IntStream.range(0, nLines)
    stream.forEach { i =>
      // trim the range (linesIterator also split on \r\n — strip \r)
      var from = starts(i)
      var to = starts(i + 1) - 1
      while (from < to && payload.charAt(from) <= ' ') from += 1
      while (to > from && payload.charAt(to - 1) <= ' ') to -= 1
      if (from < to && payload.charAt(from) != '#') {
        results(i) =
          try parseRange(payload, from, to, unit)
          catch {
            case e: IllegalArgumentException => ParseError(i + 1, e.getMessage)
          }
      }
    }
    val points = new Array[Point](nLines)
    var nPoints = 0
    var errors: mutable.ArrayBuffer[ParseError] = null
    var i = 0
    while (i < nLines) {
      results(i) match {
        case p: Point => points(nPoints) = p; nPoints += 1
        case e: ParseError =>
          if (errors == null) errors = mutable.ArrayBuffer.empty[ParseError]
          errors += e
        case _ =>
      }
      i += 1
    }
    val pointSeq = scala.collection.immutable.ArraySeq.unsafeWrapArray(
      if (nPoints == nLines) points else java.util.Arrays.copyOf(points, nPoints))
    (pointSeq, if (errors == null) Nil else errors.toSeq)
  }

  def parseLine(line: String, unit: TimestampUnits.Unit): Point =
    parseRange(line, 0, line.length, unit)

  /** Small-map builder: points carry 0–4 tags/fields in the common case,
    * where the specialized immutable MapN nodes beat a LinkedHashMap +
    * toMap by a wide margin (two fewer allocations per entry, no hashing
    * on build). Duplicate keys keep the LAST value, like map.put. */
  private final class SmallMapBuilder {
    private var ks = new Array[String](4)
    private var vs = new Array[AnyRef](4)
    private var n = 0
    def add(k: String, v: AnyRef): Unit = {
      var i = 0
      while (i < n) {
        if (ks(i) == k) { vs(i) = v; return }
        i += 1
      }
      if (n == ks.length) {
        ks = java.util.Arrays.copyOf(ks, n << 1)
        vs = java.util.Arrays.copyOf(vs, n << 1)
      }
      ks(n) = k; vs(n) = v; n += 1
    }
    def size: Int = n
    def isEmpty: Boolean = n == 0
    def result[V](): Map[String, V] = n match {
      case 0 => Map.empty
      case 1 => new immutable.Map.Map1(ks(0), vs(0).asInstanceOf[V])
      case 2 => new immutable.Map.Map2(ks(0), vs(0).asInstanceOf[V],
        ks(1), vs(1).asInstanceOf[V])
      case 3 => new immutable.Map.Map3(ks(0), vs(0).asInstanceOf[V],
        ks(1), vs(1).asInstanceOf[V], ks(2), vs(2).asInstanceOf[V])
      case 4 => new immutable.Map.Map4(ks(0), vs(0).asInstanceOf[V],
        ks(1), vs(1).asInstanceOf[V], ks(2), vs(2).asInstanceOf[V],
        ks(3), vs(3).asInstanceOf[V])
      case _ =>
        val b = Map.newBuilder[String, V]
        var i = 0
        while (i < n) { b += (ks(i) -> vs(i).asInstanceOf[V]); i += 1 }
        b.result()
    }
  }

  /** Direct-mapped per-thread string cache: measurements, tag/field keys
    * and tag values repeat on virtually every line of a real payload, so
    * interning the char region kills the dominant allocation (substring
    * per identifier). Collisions simply overwrite — worst case we're
    * back to one substring per occurrence. */
  private final class InternTable {
    private val slots = new Array[String](1024)
    def get(s: String, from: Int, to: Int, hash: Int): String = {
      val idx = (hash ^ (hash >>> 10)) & 1023
      val cand = slots(idx)
      val len = to - from
      if (cand != null && cand.length == len && s.regionMatches(from, cand, 0, len))
        cand
      else {
        val fresh = s.substring(from, to)
        slots(idx) = fresh
        fresh
      }
    }
  }
  private val interns = ThreadLocal.withInitial[InternTable](() => new InternTable)

  /** Parse a decimal long from a region without the substring. */
  private def parseLongRange(s: String, from: Int, to: Int): Long = {
    if (from >= to) throw new NumberFormatException("empty")
    var i = from
    var neg = false
    s.charAt(i) match {
      case '-' => neg = true; i += 1
      case '+' => i += 1
      case _ =>
    }
    if (i >= to) throw new NumberFormatException("sign only")
    var v = 0L
    while (i < to) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') throw new NumberFormatException(s"bad digit '$c'")
      val next = v * 10 + (c - '0')
      if (next < v) throw new NumberFormatException("overflow")
      v = next
      i += 1
    }
    if (neg) -v else v
  }

  private def parseRange(line: String, from: Int, to: Int,
      unit: TimestampUnits.Unit): Point = {
    var i = from
    val n = to
    val intern = interns.get()

    // --- measurement + tags (escaped identifiers, terminated by ' ')
    val tags = new SmallMapBuilder
    // explicit stop chars (a Set per call + hash lookup per char was the
    // parser's dominant cost) with a no-escape substring fast path
    def readIdent(s1: Char, s2: Char, s3: Char): String = {
      val start = i
      var sawEscape = false
      var done = false
      var h = 0
      while (!done && i < n) {
        val c = line.charAt(i)
        if (c == s1 || c == s2 || c == s3) done = true
        else if (c == '\\' && i + 1 < n) { sawEscape = true; i += 2 }
        else { h = h * 31 + c; i += 1 }
      }
      if (!sawEscape) intern.get(line, start, i, h)
      else {
        val sb = new StringBuilder(i - start)
        var j = start
        while (j < i) {
          val c = line.charAt(j)
          if (c == '\\' && j + 1 < n) { sb.append(line.charAt(j + 1)); j += 2 }
          else { sb.append(c); j += 1 }
        }
        sb.toString
      }
    }
    val m = readIdent(',', ' ', ' ')
    if (m.isEmpty) throw new IllegalArgumentException("empty measurement")
    while (i < n && line.charAt(i) == ',') {
      i += 1
      val k = readIdent('=', ' ', ',')
      if (i >= n || line.charAt(i) != '=')
        throw new IllegalArgumentException(s"tag '$k' missing '='")
      i += 1
      val v = readIdent(',', ' ', ' ')
      if (k.isEmpty || v.isEmpty)
        throw new IllegalArgumentException("empty tag key or value")
      tags.add(k, v)
    }
    if (i >= n || line.charAt(i) != ' ')
      throw new IllegalArgumentException("missing fields section")
    while (i < n && line.charAt(i) == ' ') i += 1

    // --- fields
    val fields = new SmallMapBuilder
    var done = false
    while (!done) {
      val k = readIdent('=', ' ', ',')
      if (i >= n || line.charAt(i) != '=')
        throw new IllegalArgumentException(s"field '$k' missing '='")
      i += 1
      val v: FieldValue =
        if (i < n && line.charAt(i) == '"') {
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val c = line.charAt(i)
            if (c == '\\' && i + 1 < n) { sb.append(line.charAt(i + 1)); i += 2 }
            else if (c == '"') { closed = true; i += 1 }
            else { sb.append(c); i += 1 }
          }
          if (!closed) throw new IllegalArgumentException("unterminated string")
          FString(sb.toString)
        } else {
          val start = i
          while (i < n && line.charAt(i) != ',' && line.charAt(i) != ' ') i += 1
          parseScalarRange(line, start, i)
        }
      if (k.isEmpty) throw new IllegalArgumentException("empty field key")
      fields.add(k, v)
      if (i < n && line.charAt(i) == ',') i += 1
      else done = true
    }
    if (fields.isEmpty) throw new IllegalArgumentException("no fields")

    // --- optional timestamp
    while (i < n && line.charAt(i) == ' ') i += 1
    val ts: Option[Long] =
      if (i >= n) None
      else {
        var end = n
        while (end > i && line.charAt(end - 1) <= ' ') end -= 1
        val v =
          try parseLongRange(line, i, end)
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"bad timestamp '${line.substring(i, end)}'")
          }
        Some(unit.toMicros(v))
      }
    Point(m, tags.result[String](), fields.result[FieldValue](), ts)
  }

  /** Region-based scalar fast paths: `i`-suffixed integers and
    * pure-integer floats (counters — the most common field shape) parse
    * without a substring; everything else delegates. */
  private def parseScalarRange(s: String, from: Int, to: Int): FieldValue = {
    if (from >= to) throw new IllegalArgumentException("empty field value")
    if (s.charAt(to - 1) == 'i')
      try return FLong(parseLongRange(s, from, to - 1))
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"bad integer '${s.substring(from, to)}'")
      }
    var i = from
    if (s.charAt(i) == '-') i += 1
    var allDigits = i < to && to - i <= 15
    var v = 0L
    while (allDigits && i < to) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') allDigits = false
      else { v = v * 10 + (c - '0'); i += 1 }
    }
    if (allDigits) FDouble(if (s.charAt(from) == '-') -v.toDouble else v.toDouble)
    else parseScalar(s.substring(from, to))
  }

  private def parseScalar(tok: String): FieldValue = tok match {
    case "" => throw new IllegalArgumentException("empty field value")
    case "t" | "T" | "true" | "True" | "TRUE" => FBool(true)
    case "f" | "F" | "false" | "False" | "FALSE" => FBool(false)
    case s if s.endsWith("i") =>
      try FLong(s.dropRight(1).toLong)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bad integer '$s'") }
    case s =>
      try FDouble(s.toDouble)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bad value '$s'") }
  }
}
