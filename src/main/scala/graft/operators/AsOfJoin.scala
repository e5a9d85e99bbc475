package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightVals: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right side reduced to keys + time + carried values (renamed)
    val r = right.select(
      (keys.map(col) :+ col(timeCol)) ++
        rightVals.map { case (from, to) => col(from).as(s"_r_$to") }.toSeq: _*)
      .withColumn("_side", lit(1))
    val l = left.withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal time (inclusive match)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(s"_asof_$to", last(col(s"_r_$to"), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 0)
      .select(leftCols.map(col) ++
        rightVals.values.map(to => col(s"_asof_$to").as(to)).toSeq: _*)
  }
}
