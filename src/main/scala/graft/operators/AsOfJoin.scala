package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the most recent right row
  * with `right.time <= left.time` within the same key group (the classic
  * time-series point-in-time join; DuckDB exposes it as ASOF JOIN, which
  * the oracle uses).
  *
  * Implementation is the scalable composition (preference (a) of the
  * custom-operator ladder): tag both sides, union by name, one window
  * sort per key with `last(value, ignoreNulls)` over an unbounded
  * preceding frame, then keep the left rows. Exactly ONE shuffle on the
  * key columns and one per-key sort — no range-condition join that would
  * explode into a broadcast-nested-loop at scale, and skew is bounded by
  * the per-key row count, not by the time-range width.
  *
  * Tie semantics: a right row at exactly left.time matches (inclusive);
  * among right rows sharing (keys, time), the one with the greatest
  * tie-break column wins — callers should pre-dedup the right side if
  * they need a specific survivor.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param keys       equi-join key columns present on both sides
    * @param timeCol    event-time column name present on both sides
    * @param rightVals  right-side columns to carry (renamed as given)
    * @param forward    false (default): most recent right row with
    *                   `right.time <= left.time`; true: EARLIEST right
    *                   row with `right.time >= left.time` (the "next
    *                   scheduled event" direction). Same plan either way
    *                   — only the window sort order flips.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightVals: Map[String, String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // right side reduced to keys + time + carried values (renamed)
    val r = right.select(
      (keys.map(col) :+ col(timeCol)) ++
        rightVals.map { case (from, to) => col(from).as(s"_r_$to") }.toSeq: _*)
      .withColumn("_side", lit(1))
    val l = left.withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal time (inclusive match);
    // forward direction = the same scan over reversed time order, where
    // "preceding" rows are the future ones
    val timeOrd = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(s"_asof_$to", last(col(s"_r_$to"), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 0)
      .select(leftCols.map(col) ++
        rightVals.values.map(to => col(s"_asof_$to").as(to)).toSeq: _*)
  }

  /** Skew-salted as-of join: identical semantics to [[asof]], but the
    * per-key sort is split into (key, time-bucket) groups so a hot key
    * (one user with 10M events — SCALE.md's named risk) spreads over
    * `span / bucketMicros` window groups instead of sorting in ONE task.
    *
    * Correctness across bucket boundaries comes from a carry-in row: for
    * every (key, bucket) the most recent right row from any EARLIER
    * bucket is injected as a synthetic right row that sorts before all
    * real rows of the bucket (null time, ascending-nulls-first). The
    * carry itself is computed on bucket SUMMARIES (one row per key ×
    * bucket — metadata-sized), so the extra shuffles are tiny relative
    * to the data.
    *
    * Tie note: per carried column, among right rows sharing (keys, time)
    * the greatest non-null value wins deterministically (max over a
    * null-filtered (time, value) struct); [[asof]]'s window leaves that
    * order undefined — pre-dedup the right side when the survivor
    * matters, as with [[asof]].
    *
    * @param bucketMicros bucket width in the time column's resolution
    *                     (µs for TimestampType), default one day
    */
  def asofSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightVals: Map[String, String],
      bucketMicros: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.types._
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(rightVals.nonEmpty, "asofSalted needs at least one carried column")
    val leftCols = left.columns.toSeq
    val rvals = rightVals.toSeq
    val timeType = left.schema(timeCol).dataType

    // exact floor-div bucketing (long / long in Spark SQL is a double
    // divide; subtracting pmod first keeps the quotient integral/exact)
    def bucketOf(df: DataFrame): Column = {
      val tl = df.schema(timeCol).dataType match {
        case TimestampType => unix_micros(col(timeCol))
        case _ => col(timeCol).cast("long")
      }
      ((tl - pmod(tl, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    }

    val r0 = right.select(
      (keys.map(col) :+ col(timeCol)) ++
        rvals.map { case (from, to) => col(from).as(s"_r_$to") }: _*)
    val r = r0.withColumn("_side", lit(1)).withColumn("_b", bucketOf(r0))
    val l = left.withColumn("_side", lit(0)).withColumn("_b", bucketOf(left))

    // one summary row per (key, bucket), with a PER-COLUMN latest
    // non-null value: asof fills each column independently with
    // last(ignoreNulls), so a single latest-row summary would carry a
    // null over an older non-null value (right rows (t=10, v=5),
    // (t=20, v=null) must carry v=5, not null). max over a null-filtered
    // (time, value) struct is exactly "latest non-null" per column.
    val keyB = (keys :+ "_b").map(col)
    val sumAggs = rvals.map { case (_, to) =>
      max(when(col(s"_r_$to").isNotNull,
        struct(col(timeCol).as("_t"), col(s"_r_$to").as("_v")))).as(s"_s_$to")
    }
    val rSum = r.groupBy(keyB: _*).agg(sumAggs.head, sumAggs.tail: _*)

    // carry-in per (key, bucket) over every bucket either side touches:
    // the last per-column summary from STRICTLY earlier buckets (rows
    // frame ends at -1), propagated across right-empty buckets by
    // ignoreNulls — each column independently, matching asof's fill
    val allB = l.select(keyB: _*).union(r.select(keyB: _*)).distinct()
    val carryW = Window.partitionBy(keys.map(col): _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = rvals.foldLeft(allB.join(rSum, keys :+ "_b", "left")) {
        case (df, (_, to)) =>
          df.withColumn(s"_c_$to",
            last(col(s"_s_$to"), ignoreNulls = true).over(carryW))
      }
      .where(rvals.map { case (_, to) => col(s"_c_$to").isNotNull }.reduce(_ || _))
    val synthetic = carried.select(
      (keys.map(col) :+ col("_b") :+
        lit(null).cast(timeType).as(timeCol) :+ lit(1).as("_side")) ++
        rvals.map { case (_, to) => col(s"_c_$to")("_v").as(s"_r_$to") }: _*)

    // per-(key, bucket) fill — the synthetic carry row sorts first
    // (null time, asc = nulls first), real right rows beat left rows at
    // equal time, exactly like the unsalted window
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .unionByName(synthetic, allowMissingColumns = true)
    val w = Window.partitionBy(keyB: _*)
      .orderBy(col(timeCol).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rvals.foldLeft(unioned) { case (df, (_, to)) =>
      df.withColumn(s"_asof_$to", last(col(s"_r_$to"), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 0)
      .select(leftCols.map(col) ++
        rvals.map { case (_, to) => col(s"_asof_$to").as(to) }: _*)
  }
}
