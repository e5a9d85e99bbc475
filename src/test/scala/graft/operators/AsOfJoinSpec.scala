package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted as-of join (SCALE.md's hot-key risk: one user with millions
  * of events sorts in ONE task under the plain per-key window). The
  * salted form must (a) split the hot key's sort across time buckets in
  * the plan and (b) return exactly the unsalted (q18-oracle-validated)
  * result, including matches that carry across bucket boundaries and
  * through right-empty buckets.
  */
class AsOfJoinSpec extends SparkSpec {

  private val H = 3600000000L // 1h in µs
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z

  private def ts(us: Long) = timestamp_micros(lit(us))

  test("salted as-of equals unsalted on a planted hot key; sort is bucketed") {
    import spark.implicits._
    // hot user: 10k events over 5 days; cold users: a handful each
    val hotLeft = (0 until 10000).map(i =>
      (i.toLong, "hot", base + i * 43200L * 1000L)) // every 43.2s
    val coldLeft = (0 until 50).map(i =>
      (100000L + i, s"u${i % 5}", base + i * 7200L * 1000000L))
    val left = (hotLeft ++ coldLeft).toDF("event_id", "user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

    // right rows: sparse — one before everything, one exactly at a
    // bucket boundary, one mid-stream; u0 gets none (all-null match),
    // u1's only row is AFTER its left rows (null match)
    val right = Seq(
      ("hot", base - 10L, 1.0),           // before all buckets (carry-in)
      ("hot", base + 24L * H, 2.0),       // exactly at a day boundary
      ("hot", base + 50L * H + 7L, 3.0),  // mid-bucket
      ("u2", base + 1000L, 10.0),
      ("u3", base + 30L * 7200L * 1000000L, 20.0), // after u3's lefts
      ("u4", base + 3L * 7200L * 1000000L, 30.0)
    ).toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

    val plain = AsOfJoin.asof(
      left, right, Seq("user_id"), "ts", Map("value" -> "v"))
    val salted = AsOfJoin.asofSalted(
      left, right, Seq("user_id"), "ts", Map("value" -> "v"),
      bucketMicros = 24L * H)

    // the fill window must partition by (user_id, _b): the hot key's
    // 10k-row sort becomes 5 day-sized sorts instead of one task
    val plan = salted.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.exists(l => l.contains("user_id") && l.contains("_b")),
      s"fill window must partition by (keys, bucket):\n$plan")

    val a = plain.orderBy("event_id").collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(3))))
    val b = salted.orderBy("event_id").collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(3))))
    assert(a.length == 10050 && b.sameElements(a))

    // spot checks: carry across right-empty buckets + boundary inclusivity
    val byId = salted.collect().map(r =>
      r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(byId(0L).contains(1.0)) // first hot event: pre-base carry-in
    // event at exactly the day-1 boundary time: inclusive match with 2.0
    val boundaryId = hotLeft.find(_._3 == base + 24L * H).map(_._1)
    boundaryId.foreach(id => assert(byId(id).contains(2.0)))
    // last hot event: most recent right (3.0), carried through later days
    assert(byId(9999L).contains(3.0))
  }

  test("salted as-of: null right values carry per-column like asof (latest non-null wins)") {
    import spark.implicits._
    // bucket 0 right rows for key a: (t=10, v=5, w=null), (t=20, v=null,
    // w=7) — the LATEST row has v=null, so a latest-row carry summary
    // would lose v=5. Probes in bucket 1 (and bucket 3, across an empty
    // bucket) must see v=5, w=7 — exactly what unsalted asof fills.
    val left = Seq(
      (1L, "a", base + 25L * H), // bucket 1
      (2L, "a", base + 80L * H)  // bucket 3 (bucket 2 right-empty)
    ).toDF("id", "k", "us")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val right = Seq(
      ("a", base + 10L, Some(5.0), Option.empty[Double]),
      ("a", base + 20L, Option.empty[Double], Some(7.0))
    ).toDF("k", "us", "v", "w")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val vals = Map("v" -> "v", "w" -> "w")
    val plain = AsOfJoin.asof(left, right, Seq("k"), "t", vals)
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    val salted = AsOfJoin.asofSalted(left, right, Seq("k"), "t", vals,
      bucketMicros = 24L * H)
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(plain.sameElements(salted), s"plain=${plain.toSeq} salted=${salted.toSeq}")
    assert(salted(0) == ((1L, Some(5.0), Some(7.0))), salted.toSeq.toString)
    assert(salted(1) == ((2L, Some(5.0), Some(7.0))), salted.toSeq.toString)
  }

  test("salted as-of: empty right side yields all-null matches") {
    import spark.implicits._
    val left = Seq((1L, "a", base), (2L, "a", base + H)).toDF("id", "k", "us")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val right = Seq.empty[(String, Long, Double)].toDF("k", "us", "v")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val out = AsOfJoin.asofSalted(left, right, Seq("k"), "t",
      Map("v" -> "v"), bucketMicros = H).collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
  }
}
