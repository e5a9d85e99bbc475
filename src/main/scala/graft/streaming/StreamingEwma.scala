package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponential smoothing — the live sibling of batch q133
  * (`TimeseriesQueries`): per-series EMA maintained incrementally, one
  * smoothed record emitted per input event. Where the batch form needs
  * a bounded window (its weights must sum in one expression), the
  * streaming recursion is the NATURAL home of an EMA: state is just
  * the previous smoothed value.
  *
  * Arithmetic is deterministic integer fixed-point, no doubles in the
  * recursion: values are scaled to micro-units and the update is the
  * classic shift-EMA `ema += (x − ema + 2^(k−1)) >> k` (α = 2^-k, bias
  * makes the truncating shift round half-up), so replaying the same
  * batches reproduces bit-identical output — same philosophy as the
  * batch suite's rational arithmetic, adapted to a recursion.
  *
  * Ordering: events are applied in event-time order WITHIN each
  * micro-batch (the group iterator is sorted on (ts, tie)); across
  * batches they apply in arrival order — disorder beyond a batch
  * boundary but above the watermark is the documented streaming trade
  * (the watermark bounds it; StreamingEwmaSpec pins the in-order
  * case). State: one (ema, lastTs) pair per series — O(series
  * cardinality), hash-partitioned; an event-time timeout drops series
  * silent for longer than `idleTtl`, so abandoned keys cannot grow
  * state forever (same bound StreamingNearDup puts on its buckets).
  */
object StreamingEwma {

  case class Smoothed(series: String, tsUs: Long, rawMicro: Long, emaMicro: Long)

  case class EmaState(ema: Long, lastTsUs: Long)

  /** @param k smoothing exponent: α = 2^-k (k=1 halves toward each new
    *          sample; larger k smooths harder)
    * @param idleTtlMs silence after which a series' state is dropped
    *                  (measured in event time against the watermark) */
  def smoothed(events: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, k: Int, watermarkDelay: String,
      idleTtlMs: Long): Dataset[Smoothed] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(k >= 1 && k <= 30, s"smoothing exponent out of range: $k")
    require(idleTtlMs > 0, s"idleTtlMs must be positive: $idleTtlMs")
    val bias = 1L << (k - 1)
    val rows = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(seriesCol).cast("string"), col(tsCol),
        // micro-units via the exact decimal path (same cents idiom as
        // the batch suite, 4 more digits): no double rounding ambiguity
        (col(valueCol).cast("decimal(18,6)") * 1000000L).cast("long"))
      .as[(String, java.sql.Timestamp, Long)]
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[EmaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = it.toArray.sortBy(e => (us(e._2), e._3))
            var ema = state.getOption.map(_.ema).getOrElse(Long.MinValue)
            val out = batch.iterator.map { case (_, ts, x) =>
              ema = if (ema == Long.MinValue) x
                    else ema + ((x - ema + bias) >> k)
              Smoothed(series, us(ts), x, ema)
            }.toVector
            if (batch.nonEmpty) {
              state.update(EmaState(ema, us(batch.last._2)))
              // idle TTL in event time: re-armed on every beat
              state.setTimeoutTimestamp(
                (us(batch.last._2) / 1000L + idleTtlMs)
                  max (state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }
}
