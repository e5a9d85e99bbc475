package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counter rate — the live sibling of batch q120
  * (`TimeseriesQueries`): per-series non-negative increments with
  * counter-reset handling (a drop means the counter restarted; the
  * post-reset value is the increase), emitted per sample as it arrives.
  *
  * The cross-batch memory is one (last_ts, last_value) pair per series,
  * held in `flatMapGroupsWithState` — the built-in window aggregates
  * cannot express "delta vs the previous sample" across micro-batches.
  * Downstream bucketing of the emitted increments is a stateless
  * aggregation any consumer (or the batch q120 itself) can run.
  *
  * Contract, explicit rather than hidden:
  *  - Within a batch a series' samples are processed in (ts, id) order,
  *    so in-batch disorder is fine.
  *  - A sample OLDER than the series' high-water mark (cross-batch
  *    disorder) cannot be retro-inserted without full history; it is
  *    emitted with `late = true` and a null increment — the caller
  *    decides (drop, count, or route to the batch repair pass). This
  *    mirrors the writer/compaction two-tier design: streaming is the
  *    low-latency tier, batch q120 over the stored table is exact.
  *  - The first sample of a series contributes increase 0 (same as
  *    batch q120's null-lag rule).
  *
  * Scale shape: one shuffle (groupByKey on the series), state O(series
  * cardinality) — two longs + a double each; idle series expire after
  * `idleTimeout` (processing-time TTL; null disables for tests).
  */
object StreamingCounterRate {

  /** One emitted increment. `inc` is null iff `late`. */
  case class Increment(series: String, tsUs: Long, id: Long,
      value: Double, inc: Option[Double], late: Boolean)

  /** (high-water ts, id at that ts, last value) per series. */
  case class SeriesState(lastTs: Long, lastId: Long, lastValue: Double)

  def increments(events: DataFrame, seriesCol: String, tsCol: String,
      idCol: String, valueCol: String,
      idleTimeout: String = null): Dataset[Increment] = {
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events.select(col(seriesCol).cast("string"),
      unix_micros(col(tsCol)), col(idCol).cast("long"),
      col(valueCol).cast("double")).as[(String, Long, Long, Double)]
    val timeoutConf =
      if (idleTimeout == null) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (series: String, it: Iterator[(String, Long, Long, Double)],
         state: GroupState[SeriesState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = it.toArray.sortBy(t => (t._2, t._3))
            val out = new scala.collection.mutable.ArrayBuffer[Increment](batch.length)
            var cur = state.getOption
            batch.foreach { case (_, ts, id, v) =>
              cur match {
                case Some(s) if ts < s.lastTs || (ts == s.lastTs && id < s.lastId) =>
                  out += Increment(series, ts, id, v, None, late = true)
                case Some(s) =>
                  val inc = if (v >= s.lastValue) v - s.lastValue else v
                  out += Increment(series, ts, id, v, Some(inc), late = false)
                  cur = Some(SeriesState(ts, id, v))
                case None =>
                  out += Increment(series, ts, id, v, Some(0.0), late = false)
                  cur = Some(SeriesState(ts, id, v))
              }
            }
            cur.foreach(state.update)
            if (idleTimeout != null) state.setTimeoutDuration(idleTimeout)
            out.iterator
          }
      }
  }
}
