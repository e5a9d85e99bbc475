package graft.ingest

import scala.collection.mutable

/** NORAD Two-Line Element (TLE) source — satellite orbital elements
  * (reference: internal/ingest/tle.go). Parses the standard 3-line
  * format (name + line 1 + line 2) into typed records with derived
  * orbital quantities (semi-major axis, period, apogee/perigee).
  */
object Tle {

  final case class Element(
      objectName: String,
      noradId: Int,
      intlDesignator: String,
      epochMicros: Long,
      meanMotionRevDay: Double,
      eccentricity: Double,
      inclinationDeg: Double,
      raanDeg: Double,
      argPerigeeDeg: Double,
      meanAnomalyDeg: Double,
      revNumber: Int,
      // derived
      semiMajorAxisKm: Double,
      periodMin: Double,
      apogeeKm: Double,
      perigeeKm: Double)

  private val MuEarth = 398600.4418 // km^3/s^2
  private val EarthRadiusKm = 6378.137

  def parse(text: String): (Seq[Element], Seq[String]) = {
    val lines = text.linesIterator.map(_.stripTrailing()).filter(_.nonEmpty).toVector
    val out = mutable.ArrayBuffer.empty[Element]
    val errs = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < lines.length) {
      val name =
        if (!lines(i).startsWith("1 ") && i + 2 < lines.length + 1 &&
          i + 1 < lines.length && lines(i + 1).startsWith("1 ")) {
          val n = lines(i).trim; i += 1; n
        } else ""
      if (i + 1 < lines.length && lines(i).startsWith("1 ") && lines(i + 1).startsWith("2 ")) {
        try out += parseElement(name, lines(i), lines(i + 1))
        catch { case e: Exception => errs += s"${e.getMessage} @ line ${i + 1}" }
        i += 2
      } else {
        errs += s"unpaired TLE line: ${lines(i).take(30)}"
        i += 1
      }
    }
    (out.toSeq, errs.toSeq)
  }

  private def parseElement(name: String, l1: String, l2: String): Element = {
    val noradId = l1.substring(2, 7).trim.toInt
    val intl = l1.substring(9, 17).trim
    // epoch: YYDDD.DDDDDDDD
    val yy = l1.substring(18, 20).trim.toInt
    val year = if (yy < 57) 2000 + yy else 1900 + yy
    val doy = l1.substring(20, 32).trim.toDouble
    val daySecs = ((doy - 1.0) * 86400.0)
    val epochUs = java.time.LocalDate.of(year, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L +
      math.round(daySecs * 1e6)
    val incl = l2.substring(8, 16).trim.toDouble
    val raan = l2.substring(17, 25).trim.toDouble
    val ecc = ("0." + l2.substring(26, 33).trim).toDouble
    val argp = l2.substring(34, 42).trim.toDouble
    val ma = l2.substring(43, 51).trim.toDouble
    val mm = l2.substring(52, 63).trim.toDouble
    val rev = l2.substring(63, 68).trim.toIntOption.getOrElse(0)
    // derived: a = (mu / n^2)^(1/3), n in rad/s
    val nRadS = mm * 2.0 * math.Pi / 86400.0
    val a = math.cbrt(MuEarth / (nRadS * nRadS))
    val period = 1440.0 / mm
    Element(name, noradId, intl, epochUs, mm, ecc, incl, raan, argp, ma, rev,
      a, period, a * (1 + ecc) - EarthRadiusKm, a * (1 - ecc) - EarthRadiusKm)
  }

  /** TLE text → DataFrame (typed via product encoder). */
  def toDataFrame(spark: org.apache.spark.sql.SparkSession, text: String)
      : org.apache.spark.sql.DataFrame =
    toDataFrame(spark, parse(text)._1)

  /** Already-parsed elements → DataFrame — callers that ran [[parse]]
    * for validation avoid a second full parse of the payload. */
  def toDataFrame(spark: org.apache.spark.sql.SparkSession,
      elements: Seq[Element]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    elements.toDF()
  }
}
