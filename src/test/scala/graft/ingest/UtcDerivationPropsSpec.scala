package graft.ingest

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, ZoneOffset}

/** Property pin for the epoch-arithmetic UTC partition derivation:
  * utcDate/utcHour must agree with java.time's UTC calendar on random
  * µs epochs across the full domain the writer can see — negative
  * (pre-1970), second/hour/day boundaries, and far-future values past
  * the 2^53 double-exactness line (year 2255+) where a double division
  * would silently mis-bin. */
class UtcDerivationPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  private val us: Gen[Long] = Gen.oneOf(
    Gen.choose(-4L * 366 * 86400 * 1000000, 60L * 366 * 86400 * 1000000),
    // exact boundaries ± 1µs
    Gen.choose(-5000L, 5000L).map(k => k * 3600L * 1000000 + (k % 2)),
    // far future: year ~2255+, past double exactness (keeps µs < the
    // 16-digit flushFileName horizon, year 2286)
    Gen.choose(9000000000000000L, 9900000000000000L))

  test("utcDate/utcHour match java.time UTC on random epochs") {
    val epochs = sample(us, 400).distinct
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(epochs.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("us",
          org.apache.spark.sql.types.LongType))))
      .select(col("us"), timestamp_micros(col("us")).as("time"))
    // DateType renders to its ISO string TZ-free (epoch-day internally);
    // java.sql.Date.toLocalDate would re-interpret through the JVM zone
    val got = df.select(col("us"),
      HourPartitionedWriter.utcDate(col("time")).cast("string").as("d"),
      HourPartitionedWriter.utcHour(col("time")).as("h"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2)))).toMap
    epochs.foreach { u =>
      val dt = Instant.ofEpochSecond(Math.floorDiv(u, 1000000L))
        .atZone(ZoneOffset.UTC)
      assert(got(u) === ((dt.toLocalDate.toString, dt.getHour)), s"us=$u")
    }
  }
}
