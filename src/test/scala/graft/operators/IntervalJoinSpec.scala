package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The binned containment join must equal the naive BETWEEN join on every
  * edge: points exactly at lo (in) and at hi (out), intervals crossing
  * bin boundaries, intervals shorter than a bin, unaligned sub-bin
  * edges, and overlapping intervals (a point matching several). q126
  * oracle-checks the hour-aligned production shape; this spec pins the
  * general operator on deliberately unaligned data.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val intervals = Seq(
    // [lo, hi): unaligned edges, crossing a 60s bin boundary
    (1, ts("2024-01-01 00:00:30"), ts("2024-01-01 00:02:30")),
    // shorter than one bin, interior
    (2, ts("2024-01-01 00:05:10"), ts("2024-01-01 00:05:20")),
    // overlaps interval 1
    (3, ts("2024-01-01 00:01:00"), ts("2024-01-01 00:03:00")),
    // exactly one bin, aligned
    (4, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:11:00"))
  ).toDF("iv_id", "lo", "hi")

  private lazy val points = {
    val base = ts("2024-01-01 00:00:00").getTime
    def at(s: Long) = new java.sql.Timestamp(base + s * 1000)
    ((0 to 800 by 7).map(s => (s, at(s.toLong))) ++ Seq(
      // boundary probes: exactly lo (must match), exactly hi (must not)
      (9001, ts("2024-01-01 00:00:30")), (9002, ts("2024-01-01 00:02:30")),
      (9003, ts("2024-01-01 00:05:10")), (9004, ts("2024-01-01 00:11:00"))))
      .toDF("pt_id", "pts")
  }

  private def naive = intervals.join(points,
      col("pts") >= col("lo") && col("pts") < col("hi"))
    .select("iv_id", "pt_id")

  test("binned join equals the naive BETWEEN join, at several bin widths") {
    val expect = naive.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(expect.nonEmpty)
    assert(expect.contains((1, 9001)), "point at lo must be contained")
    assert(!expect.exists(_ == (1 -> 9002)), "point at hi must be excluded")
    for (w <- Seq(1L, 7L, 60L, 3600L)) {
      val got = IntervalJoin.binnedContainment(
          intervals, "lo", "hi", points, "pts", w)
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      assert(got.length == got.toSet.size, s"width=$w produced duplicates")
      assert(got.toSet == expect, s"width=$w diverged from the naive join")
    }
  }

  test("plan is an equi hash join on the bin key, not a nested loop") {
    val plan = IntervalJoin.binnedContainment(
        intervals, "lo", "hi", points, "pts", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
