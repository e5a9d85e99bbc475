package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** HeavyHitters.exact is EXACT (the MG pass only proposes candidates;
  * the recount disposes) — so the strongest check is full parity with
  * the naive groupBy spelling on arbitrary data, across partition
  * layouts that stress the per-partition sketches. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(items: Seq[String], ppm: Long): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000000L >= ppm * n }.toMap
  }

  private def run(items: Seq[String], ppm: Long, parts: Int): Map[String, Long] =
    HeavyHitters.exact(
        items.toDF("item").repartition(parts), "item", ppm)
      .select("item", "cnt").as[(String, Long)].collect().toMap

  test("parity with naive counting on zipf-ish data, several layouts") {
    val rnd = new Random(7)
    // skewed: token i appears ~ 1/(i+1) as often
    val items = (0 until 5000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min((1.0 / (r + 0.02)).toInt, 49)
      s"tok$i"
    }
    for (ppm <- Seq(5000L, 20000L, 100000L); parts <- Seq(1, 3, 16)) {
      assert(run(items, ppm, parts) === naive(items, ppm),
        s"ppm=$ppm parts=$parts")
    }
  }

  test("adversarial layout: a hitter's occurrences split thin across partitions") {
    // "hh" is 10% globally but never more than a sliver per partition when
    // interleaved with partition-local noise; MG must still surface it
    // in at least one partition (averaging argument in the scaladoc).
    val hh = Seq.fill(400)("hh")
    val noise = (0 until 3600).map(i => s"n${i % 900}") // 900 distinct, 4 each
    val items = new Random(13).shuffle(hh ++ noise)
    for (parts <- Seq(2, 8, 32)) {
      val got = run(items, 100000L, parts) // threshold 10%
      assert(got === Map("hh" -> 400L), s"parts=$parts got=$got")
    }
  }

  test("a frequent null item is reported, matching the naive groupBy") {
    import spark.implicits._
    val items = Seq.fill(40)(null: String) ++ Seq.fill(55)("a") ++
      (0 until 5).map(i => "rare" + i)
    val got = HeavyHitters.exact(
        items.toDF("item").repartition(3), "item", minFreqPpm = 200000L)
      .select("item", "cnt").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // null (40%) and "a" (55%) both clear 20%; rare items do not
    assert(got == Map(Option.empty[String] -> 40L, Some("a") -> 55L), got)
  }

  test("exact threshold boundary is inclusive") {
    // 4000 items; "edge" has exactly 40 = 1% = 10000 ppm
    val items = Seq.fill(40)("edge") ++ (0 until 3960).map(i => s"u$i")
    val got = run(items, 10000L, 4)
    assert(got.contains("edge") && got("edge") == 40L)
    assert(!got.keys.exists(_.startsWith("u")))
  }

  test("empty input yields empty output") {
    val empty = spark.emptyDataset[String].toDF("item")
    assert(HeavyHitters.exact(empty, "item", 1000L).count() === 0L)
  }

  test("threshold validation") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException](HeavyHitters.exact(df, "item", 0L))
    intercept[IllegalArgumentException](HeavyHitters.exact(df, "item", 1000001L))
  }
}
