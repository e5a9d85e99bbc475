package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join WITHOUT an equi key, at scale.
  *
  * The naive spelling (`points JOIN intervals ON ts >= lo AND ts < hi`)
  * is a broadcast-nested-loop or cartesian plan: fine when one side is
  * tiny (q17 does exactly that against 5 literal buckets), quadratic
  * death when both sides are large. The standard scale shape — the same
  * binning trick published for Spark range joins (e.g. the bin-bucketed
  * interval join in the ADAM/Hail genomics stacks and Databricks'
  * range-join optimization) — turns the range predicate into an
  * equi-join:
  *
  *  1. tile every interval into the fixed-width bins it covers
  *     (`sequence` over bin ids — one row per covered bin, so cost is
  *     O(intervals × len/width), chosen by the caller via `binSeconds`);
  *  2. bucket every point into its single bin;
  *  3. hash-join on the bin id (a real shuffle-able equi key);
  *  4. re-apply the exact `[lo, hi)` residual predicate to discard the
  *     partial-bin false candidates.
  *
  * Each (interval, point) pair meets in EXACTLY one bin (the point's),
  * so no post-join dedup is needed — the output is the exact join
  * result. At 100 TB both sides shuffle linearly on the bin key; skew
  * appears only if one bin is hot, and then AQE skew-join splits it
  * (bins are time, so hot bins = bursty wall-clock intervals).
  *
  * Reference behavior anchor: Arc's query path evaluates time-range
  * predicates against Parquet row groups inside one DuckDB instance
  * (Basekick-Labs/arc internal/api/query.go time-filter rewrite); a
  * distributed engine must instead make the range predicate shuffleable,
  * which is what the bin key does.
  */
object IntervalJoin {

  /** Join `points` (with a timestamp column `tsCol`) into `intervals`
    * (with `[loCol, hiCol)` timestamp bounds, hi exclusive) by
    * containment. Returns one row per (interval, contained point) with
    * all columns of both inputs (the helper bin column is dropped).
    *
    * `binSeconds` trades tiling fan-out (long intervals → many bins)
    * against join selectivity (wide bins → more residual-filtered
    * candidates); pick ~ the median interval length.
    */
  def binnedContainment(intervals: DataFrame, loCol: String, hiCol: String,
      points: DataFrame, tsCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val binUs = binSeconds * 1000000L
    // last covered bin: the bin of (hi - 1µs), since hi is exclusive
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"unix_micros($loCol) div $binUs"),
        expr(s"(unix_micros($hiCol) - 1) div $binUs"))))
    val pt = points.withColumn("__bin", expr(s"unix_micros($tsCol) div $binUs"))
    iv.join(pt, Seq("__bin"))
      .where(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop("__bin")
  }
}
