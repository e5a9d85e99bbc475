package graft.ingest

import scala.collection.mutable

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
    * independent); order of points follows input order. */
  def parse(payload: String, precision: String = "ns",
      nowMicros: () => Long = () => System.currentTimeMillis() * 1000L)
      : (Seq[Point], Seq[ParseError]) = {
    val unit = TimestampUnits.parseUnit(precision)
    val lines = payload.linesIterator.toArray
    val results = new Array[AnyRef](lines.length) // Point | ParseError | null
    val stream =
      if (lines.length >= 4096)
        java.util.stream.IntStream.range(0, lines.length).parallel()
      else java.util.stream.IntStream.range(0, lines.length)
    stream.forEach { i =>
      val line = lines(i).trim
      if (line.nonEmpty && !line.startsWith("#")) {
        results(i) =
          try parseLine(line, unit)
          catch {
            case e: IllegalArgumentException => ParseError(i + 1, e.getMessage)
          }
      }
    }
    val points = new mutable.ArrayBuffer[Point](lines.length)
    val errors = mutable.ArrayBuffer.empty[ParseError]
    var i = 0
    while (i < results.length) {
      results(i) match {
        case p: Point => points += p
        case e: ParseError => errors += e
        case _ =>
      }
      i += 1
    }
    (points.toSeq, errors.toSeq)
  }

  def parseLine(line: String, unit: TimestampUnits.Unit): Point = {
    var i = 0
    val n = line.length

    // --- measurement + tags (escaped identifiers, terminated by ' ')
    val tags = mutable.LinkedHashMap.empty[String, String]
    // explicit stop chars (a Set per call + hash lookup per char was the
    // parser's dominant cost) with a no-escape substring fast path
    def readIdent(s1: Char, s2: Char, s3: Char): String = {
      val start = i
      var sawEscape = false
      var done = false
      while (!done && i < n) {
        val c = line.charAt(i)
        if (c == s1 || c == s2 || c == s3) done = true
        else if (c == '\\' && i + 1 < n) { sawEscape = true; i += 2 }
        else i += 1
      }
      if (!sawEscape) line.substring(start, i)
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
      tags(k) = v
    }
    if (i >= n || line.charAt(i) != ' ')
      throw new IllegalArgumentException("missing fields section")
    while (i < n && line.charAt(i) == ' ') i += 1

    // --- fields
    val fields = mutable.LinkedHashMap.empty[String, FieldValue]
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
          val tok = line.substring(start, i)
          parseScalar(tok)
        }
      if (k.isEmpty) throw new IllegalArgumentException("empty field key")
      fields(k) = v
      if (i < n && line.charAt(i) == ',') i += 1
      else done = true
    }
    if (fields.isEmpty) throw new IllegalArgumentException("no fields")

    // --- optional timestamp
    while (i < n && line.charAt(i) == ' ') i += 1
    val ts: Option[Long] =
      if (i >= n) None
      else {
        val tok = line.substring(i).trim
        val v =
          try tok.toLong
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad timestamp '$tok'")
          }
        Some(unit.toMicros(v))
      }
    Point(m, tags.toMap, fields.toMap, ts)
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
