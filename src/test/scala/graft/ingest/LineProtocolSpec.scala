package graft.ingest

import graft.ingest.LineProtocol._
import org.scalatest.funsuite.AnyFunSuite

class LineProtocolSpec extends AnyFunSuite {

  private def one(line: String, precision: String = "ns"): Point = {
    val (ps, errs) = LineProtocol.parse(line, precision)
    assert(errs.isEmpty, errs.mkString(";"))
    assert(ps.length == 1)
    ps.head
  }

  test("basic point with tags, fields, ns timestamp") {
    val p = one("cpu,host=server01,region=us-west usage_idle=90.5,usage_system=2.1 1609459200000000000")
    assert(p.measurement == "cpu")
    assert(p.tags == Map("host" -> "server01", "region" -> "us-west"))
    assert(p.fields("usage_idle") == FDouble(90.5))
    assert(p.timeMicros.contains(1609459200000000L))
  }

  test("i-suffixed integers") {
    val p = one("http_requests,method=GET,status=200 count=1i")
    assert(p.fields("count") == FLong(1L))
  }

  test("missing timestamp -> None (caller stamps now)") {
    val p = one("temperature,sensor=bedroom temp=22.5")
    assert(p.timeMicros.isEmpty)
  }

  test("escaped spaces, commas and equals in identifiers") {
    val p = one("""my\ meas,ta\,g=va\ lue f\=1=3.5""")
    assert(p.measurement == "my meas")
    assert(p.tags == Map("ta,g" -> "va lue"))
    assert(p.fields("f=1") == FDouble(3.5))
  }

  test("quoted string fields with escapes") {
    val p = one("""m s="hello \"world\", ok\\" 1000000""")
    assert(p.fields("s") == FString("""hello "world", ok\"""))
    assert(p.timeMicros.contains(1000L)) // 1e6 ns = 1000 µs
  }

  test("booleans") {
    val p = one("m a=t,b=F,c=true")
    assert(p.fields == Map("a" -> FBool(true), "b" -> FBool(false), "c" -> FBool(true)))
  }

  test("precision parameter scales to micros") {
    assert(one("m v=1 1609459200", "s").timeMicros.contains(1609459200000000L))
    assert(one("m v=1 1609459200000", "ms").timeMicros.contains(1609459200000000L))
    assert(one("m v=1 1609459200000000", "us").timeMicros.contains(1609459200000000L))
  }

  test("negative (pre-epoch) timestamps are valid") {
    assert(one("m v=1 -1000000", "us").timeMicros.contains(-1000000L))
  }

  test("comment and blank lines skipped; bad lines reported not fatal") {
    val payload =
      """# a comment
        |
        |cpu,host=a v=1.0 1000000000
        |not_a_valid_line
        |cpu,host=b v=2.0 2000000000""".stripMargin
    val (ps, errs) = LineProtocol.parse(payload)
    assert(ps.length == 2)
    assert(errs.length == 1 && errs.head.line == 4)
  }

  test("multiple fields and types on one line") {
    val p = one("""m,t=x i=5i,d=2.25,s="str",b=false 1""")
    assert(p.fields == Map("i" -> FLong(5), "d" -> FDouble(2.25),
      "s" -> FString("str"), "b" -> FBool(false)))
  }
}

class TimestampUnitsSpec extends AnyFunSuite {
  import TimestampUnits._

  test("unit detection by magnitude") {
    assert(detect(1609459200L) == Seconds)
    assert(detect(1609459200000L) == Millis)
    assert(detect(1609459200000000L) == Micros)
    assert(detect(1609459200000000000L) == Nanos)
    assert(detect(-1609459200L) == Seconds)
  }

  test("normalization to micros") {
    val expected = 1609459200000000L
    assert(toMicros(1609459200L) == expected)
    assert(toMicros(1609459200000L) == expected)
    assert(toMicros(1609459200000000L) == expected)
    assert(toMicros(1609459200000000000L) == expected)
  }

  test("column normalization uses first value's unit") {
    val vs: Array[Long] = Array(1609459200000L, 1609459260000L)
    assert(normalizeColumn(vs).toSeq == Seq(1609459200000000L, 1609459260000000L))
  }
}

class Utf8Spec extends AnyFunSuite {
  test("valid strings pass through unchanged (same instance)") {
    val s = "héllo 世界 🎉"
    assert(Utf8.sanitize(s) eq s)
  }
  test("unpaired surrogates replaced") {
    val bad = "ok" + '\uD800' + "end"
    assert(Utf8.sanitize(bad) == "ok�end")
  }
}
