package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Numeric error bounds for q34's sketches (VERDICT r3 #7): the
  * rows-only entry carries a guarantee, not just a row count.
  *
  *  - approx_count_distinct is HLL++ with default rsd = 0.05; the spec
  *    allows 4 standard deviations (4 × 5%) against the exact distinct
  *    count — Spark documents the 5% relative error, and 4σ makes the
  *    assertion deterministic-in-practice on a fixed dataset (the
  *    sketch itself is deterministic for fixed input/partitioning —
  *    re-verified by running twice).
  *  - percentile_approx with accuracy 10000 bounds the RANK error at
  *    n/accuracy (Greenwald-Khanna contract): the returned value must
  *    lie between the exact (q - n/acc) and (q + n/acc) quantiles.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 4*rsd of the exact twin per group") {
    val approx = SparkEntry.queries("q34_approx_sketch")(spark, dir)
      .select(col("l_returnflag"), col("approx_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, n) =>
      val err = math.abs(approx(flag).toDouble - n) / n
      assert(err <= 4 * 0.05,
        s"HLL++ error for $flag: approx=${approx(flag)} exact=$n rel=$err")
    }
  }

  test("percentile_approx within the Greenwald-Khanna rank bound") {
    val li = t(spark, dir, "lineitem")
    val rows = SparkEntry.queries("q34_approx_sketch")(spark, dir)
      .select(col("l_returnflag"), col("p50_price"), col("p99_price"))
      .collect()
    rows.foreach { r =>
      val flag = r.getString(0)
      val vals = li.where(col("l_returnflag") === flag)
        .select(col("l_extendedprice").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      val n = vals.length
      val rankSlack = math.max(1, n / 10000) // accuracy = 10000
      def exactAtRank(rank: Int): Double =
        vals(math.min(n - 1, math.max(0, rank)))
      Seq(0.50 -> r.getDouble(1), 0.99 -> r.getDouble(2)).foreach {
        case (q, got) =>
          val target = (q * (n - 1)).toInt
          val lo = exactAtRank(target - rankSlack - 1)
          val hi = exactAtRank(target + rankSlack + 1)
          assert(got >= lo && got <= hi,
            s"p$q for $flag: got $got outside exact-rank band [$lo, $hi] (n=$n)")
      }
    }
  }

  test("sketches are deterministic across runs on fixed input") {
    def run() = SparkEntry.queries("q34_approx_sketch")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(run() == run())
  }
}
