package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dead-man monitor — the live sibling of batch q130
  * (`TimeseriesQueries`): alert when a series goes SILENT, which no
  * batch query can do at detection time (q130 only sees a gap after the
  * NEXT event closes it; a dead sensor never closes its gap).
  *
  * Silence is judged in EVENT TIME against the stream's watermark, not
  * wall clock: a series is overdue when the watermark — "every other
  * series has progressed this far" — passes its last beat + `maxGap`.
  * That makes alerts deterministic (replayable, testable) and immune to
  * ingest stalls: if the WHOLE pipeline pauses, the watermark pauses
  * and nobody false-alerts; if one series stops while the rest flow,
  * exactly that series fires. Each continued silence re-alerts once per
  * further `maxGap` of watermark progress (`missed` counts them); the
  * first beat after an alert emits a `recovery` record carrying the
  * count it cancels.
  *
  * Scale shape: one shuffle (groupByKey on the series key), state =
  * one (lastTs, missed) pair per series — O(series cardinality), the
  * same bound the reference's ingest buffers per measurement
  * (Basekick-Labs/arc internal/ingest buffering); event-time timeouts
  * are tracked by the state store, no per-series threads anywhere.
  */
object StreamingHeartbeat {

  /** kind = "alert" (watermark passed lastTs + missed·maxGap with no
    * beat) or "recovery" (beats resumed; `missed` = alerts cancelled). */
  case class Beat(series: String, kind: String, lastTsUs: Long, missed: Int)

  case class HbState(lastTsUs: Long, missed: Int)

  /** `events` must be a streaming frame; `watermarkDelay` bounds
    * cross-series disorder (it is how long a quiet series gets the
    * benefit of the doubt beyond `gapMs`). */
  def alerts(events: DataFrame, seriesCol: String, tsCol: String,
      gapMs: Long, watermarkDelay: String): Dataset[Beat] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(gapMs > 0, s"maxGap must be positive: $gapMs ms")
    // the watermarked TIMESTAMP column must survive projection all the
    // way into the stateful operator (the unsupported-op checker looks
    // for the watermark attribute on its child) — µs conversion happens
    // inside the lambda
    val rows = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(seriesCol).cast("string"), col(tsCol))
      .as[(String, java.sql.Timestamp)]
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[HbState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            val missed = s.missed + 1
            state.update(HbState(s.lastTsUs, missed))
            // re-arm one further gap past the watermark (must be > wm)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gapMs)
            Iterator(Beat(series, "alert", s.lastTsUs, missed))
          } else {
            val maxTs = it.map(t => us(t._2)).max
            val prev = state.getOption
            val lastTs = prev.map(_.lastTsUs).getOrElse(Long.MinValue) max maxTs
            val cancelled = prev.map(_.missed).getOrElse(0)
            state.update(HbState(lastTs, 0))
            state.setTimeoutTimestamp(
              (lastTs / 1000L + gapMs) max (state.getCurrentWatermarkMs() + 1L))
            if (cancelled > 0) Iterator(Beat(series, "recovery", maxTs, cancelled))
            else Iterator.empty
          }
      }
  }
}
