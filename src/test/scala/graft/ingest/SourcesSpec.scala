package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MsgPackSpec extends AnyFunSuite {

  // hand-rolled encoder for test payloads (mirror of the decoder subset)
  private def enc(v: Any): Array[Byte] = v match {
    case null => Array(0xc0.toByte)
    case b: Boolean => Array(if (b) 0xc3.toByte else 0xc2.toByte)
    case l: Long =>
      val b = java.nio.ByteBuffer.allocate(9)
      b.put(0xd3.toByte).putLong(l); b.array()
    case i: Int => enc(i.toLong)
    case d: Double =>
      val b = java.nio.ByteBuffer.allocate(9)
      b.put(0xcb.toByte).putDouble(d); b.array()
    case s: String =>
      val bytes = s.getBytes("UTF-8")
      Array(0xd9.toByte, bytes.length.toByte) ++ bytes
    case xs: Seq[_] =>
      val b = java.nio.ByteBuffer.allocate(3)
      b.put(0xdc.toByte).putShort(xs.length.toShort)
      b.array() ++ xs.flatMap(enc)
    case m: Map[_, _] =>
      val b = java.nio.ByteBuffer.allocate(3)
      b.put(0xde.toByte).putShort(m.size.toShort)
      b.array() ++ m.toSeq.flatMap { case (k, v) => (enc(k.toString) ++ enc(v)).toSeq }
  }

  test("columnar payload decodes to a batch with µs-normalized time") {
    val payload = enc(Map(
      "m" -> "cpu",
      "columns" -> Map(
        "time" -> Seq(1609459200L, 1609459260L), // epoch seconds
        "host" -> Seq("a", "b"),
        "value" -> Seq(1.5, 2.5))))
    val batches = MsgPack.decodePayload(payload)
    assert(batches.length == 1)
    val b = batches.head
    assert(b.measurement == "cpu" && b.rowCount == 2)
    assert(b.columns("time").toSeq == Seq(1609459200000000L, 1609459260000000L))
    assert(b.columns("value").toSeq == Seq(1.5, 2.5))
  }

  test("an entirely-null column survives the batch with a concrete type") {
    // reference semantic (2026.09.1 #337): a batch where some column is
    // all null must keep that column, not silently drop it
    val payload = enc(Map(
      "m" -> "cpu",
      "columns" -> Map(
        "time" -> Seq(1609459200L, 1609459260L),
        "gap" -> Seq(null, null),
        "value" -> Seq(1.5, 2.5))))
    val b = MsgPack.decodePayload(payload).head
    assert(b.columns.contains("gap"))
    val df = b.toDataFrame(graft.TestSpark.spark)
    assert(df.schema.fieldNames.contains("gap"))
    assert(df.select("gap").collect().forall(_.isNullAt(0)))
  }

  test("row + batch payloads pivot per measurement") {
    val payload = enc(Map("batch" -> Seq(
      Map("m" -> "cpu", "t" -> 1609459200000L,
        "fields" -> Map("v" -> 1.0), "tags" -> Map("host" -> "a")),
      Map("m" -> "mem", "t" -> 1609459200000L,
        "fields" -> Map("used" -> 42L), "tags" -> Map("host" -> "a")),
      Map("m" -> "cpu", "t" -> 1609459201000L,
        "fields" -> Map("v" -> 2.0), "tags" -> Map("host" -> "b")))))
    val batches = MsgPack.decodePayload(payload)
    assert(batches.map(_.measurement).sorted == Seq("cpu", "mem"))
    assert(batches.find(_.measurement == "cpu").get.rowCount == 2)
  }

  test("mismatched column lengths rejected") {
    val payload = enc(Map("m" -> "cpu", "columns" -> Map(
      "time" -> Seq(1L, 2L), "v" -> Seq(1.0))))
    intercept[IllegalArgumentException] { MsgPack.decodePayload(payload) }
  }

  test("missing time generated as now-µs") {
    val payload = enc(Map("m" -> "cpu", "columns" -> Map("v" -> Seq(1.0, 2.0))))
    val b = MsgPack.decodePayload(payload, nowMicros = () => 42000000L).head
    assert(b.columns("time").toSeq == Seq(42000000L, 42000000L))
  }
}

class TleSpec extends AnyFunSuite {
  private val iss =
    """ISS (ZARYA)
      |1 25544U 98067A   26048.50000000  .00016717  00000-0  10270-3 0  9006
      |2 25544  51.6416 247.4627 0006703 130.5360 325.0288 15.72125391563537""".stripMargin

  test("parses the ISS example with derived orbit quantities") {
    val (els, errs) = Tle.parse(iss)
    assert(errs.isEmpty && els.length == 1)
    val e = els.head
    assert(e.objectName == "ISS (ZARYA)")
    assert(e.noradId == 25544)
    assert(e.inclinationDeg == 51.6416)
    assert(e.eccentricity == 0.0006703)
    assert(math.abs(e.periodMin - 91.59) < 0.1)
    assert(e.semiMajorAxisKm > 6700 && e.semiMajorAxisKm < 6800)
    // epoch: 2026 day 48.5
    assert(e.epochMicros == java.time.LocalDate.of(2026, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L +
      (47.5 * 86400 * 1e6).toLong)
  }

  test("unpaired lines reported, parsing continues") {
    val (els, errs) = Tle.parse(iss + "\n1 99999U stray")
    assert(els.length == 1 && errs.length == 1)
  }
}

/** Property tests (ScalaCheck generators sampled deterministically). */
class LineProtocolPropsSpec extends AnyFunSuite {

  private val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tsGen = Gen.choose(-4102444800L, 4102444800L) // ±year 2100 in s

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("printed points re-parse to the same point (round-trip)") {
    val cases = samples(for {
      m <- ident; tagK <- ident; fieldK <- ident
      v <- Gen.choose(-1e6, 1e6); ts <- tsGen
    } yield (m, tagK, fieldK, v, ts), 300)
    assert(cases.nonEmpty)
    cases.foreach { case (m, tagK, fieldK, v, ts) =>
      val tsUs = ts * 1000000L
      val line = s"$m,${tagK}_t=x ${fieldK}_f=$v $tsUs"
      val (ps, errs) = LineProtocol.parse(line, "us")
      assert(errs.isEmpty && ps.length == 1, s"line: $line -> $errs")
      val p = ps.head
      assert(p.measurement == m)
      assert(p.tags == Map(s"${tagK}_t" -> "x"))
      p.fields(s"${fieldK}_f") match {
        case LineProtocol.FDouble(d) =>
          assert(math.abs(d - v) < 1e-9 * math.max(1, math.abs(v)))
        case other => fail(s"expected double, got $other")
      }
      assert(p.timeMicros.contains(tsUs))
    }
  }

  test("timestamp unit detection is idempotent on µs (within the µs band)") {
    // the magnitude heuristic (like the reference's) assigns the µs band
    // to [1e14, 1e17), so only timestamps >= ~1973 in µs form (|s|>=1e8
    // seconds) are recognized as µs — closer to epoch is indistinguishable
    // from seconds/millis
    samples(tsGen, 500).filter(s => math.abs(s) >= 100000000L).foreach { s =>
      val us = s * 1000000L
      assert(TimestampUnits.toMicros(us) == us, s"µs value $us must be stable")
      assert(TimestampUnits.toMicros(s) == us, s"seconds $s must scale to $us")
    }
  }

  test("vectorized ns->µs normalization is integer-exact (matches floorDiv)") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    // ns epochs ~1.7e18 carry a 512 ns double ULP: a double-division
    // normalize lands ±1 µs off exactly where the residue straddles the
    // rounding direction — these values are chosen to catch that
    // ns-band discriminators plus one value from each other band, so the
    // shared TimestampUnits.toMicrosCol (compaction REPLACE coercion +
    // both import paths) is pinned to the scalar toMicros everywhere
    val ns = Seq(1717200000000001999L, 1717200000000000123L,
      1717200000000999501L, 9223372036854775000L,
      1717200000L /*s*/, 1717200000123L /*ms*/, 1717200000123456L /*µs*/)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ns.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType))))
    val got = CsvImport.normalizeTimeColumn(df, "t")
      .select(unix_micros(col("time"))).collect().map(_.getLong(0)).sorted
    val expect = ns.map(TimestampUnits.toMicros).sorted
    assert(got.toSeq === expect)
  }
}
