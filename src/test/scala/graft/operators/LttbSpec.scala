package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LttbSpec extends SparkSpec {
  import spark.implicits._

  private def mkSeries(key: String, n: Int, value: Int => Double) =
    (0 until n).map(i => (key, 1704067200000000L + i * 60000000L, i.toLong, value(i)))

  private def toDf(rows: Seq[(String, Long, Long, Double)]) =
    rows.toDF("k", "us", "id", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("id"), col("v"))

  test("keeps exactly `buckets` points per long series, endpoints included") {
    val df = toDf(mkSeries("a", 500, i => math.sin(i / 10.0)) ++
      mkSeries("b", 300, i => i.toDouble))
    val out = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 20)
      .select(col("k"), col("id")).as[(String, Long)].collect()
    val byKey = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byKey("a").length == 20 && byKey("b").length == 20)
    assert(byKey("a").head == 0L && byKey("a").last == 499L)
    assert(byKey("b").head == 0L && byKey("b").last == 299L)
  }

  test("short series pass through untouched") {
    val df = toDf(mkSeries("s", 7, _.toDouble))
    val out = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 10)
    assert(out.count() == 7)
  }

  test("selected points are a subset of the input with original values") {
    val rows = mkSeries("a", 200, i => (i * 37 % 101).toDouble)
    val df = toDf(rows)
    val out = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 15)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toMap
    val orig = rows.map(r => r._3 -> r._4).toMap
    out.foreach { case (id, v) => assert(orig(id) == v, s"id $id value drifted") }
  }

  test("a planted spike survives downsampling") {
    val df = toDf(mkSeries("a", 400, i => if (i == 217) 1000.0 else 1.0))
    val ids = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 12)
      .select(col("id")).as[Long].collect()
    assert(ids.contains(217L), s"spike dropped; kept ${ids.mkString(",")}")
  }

  test("output is ts-ordered within a series and deterministic") {
    val df = toDf(mkSeries("a", 333, i => ((i * 7919) % 997).toDouble))
    // natural (un-sorted) collection: the kernel emits in time order
    val a = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 25)
      .select(col("id")).as[Long].collect()
    val b = Lttb.downsample(df, "k", "ts", "id", "v", buckets = 25)
      .select(col("id")).as[Long].collect()
    assert(a.sameElements(b))
    assert(a.sorted.sameElements(a), "selection not time-ordered")
  }
}
