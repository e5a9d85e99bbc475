package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** Streaming value-distribution drift monitor — the live sibling of
  * batch q149/q161: per series, every closed event-time HOUR emits the
  * total-variation distance between that hour's value histogram and an
  * offline-calibrated REFERENCE histogram (the "did this metric's shape
  * change in the last hour" pager feed; the batch TV/KS queries over
  * the stored table remain the deep-dive backstop).
  *
  * Exactness contract (the q149 integer construction, fold-identical):
  * values quantize to cents through the SAME HALF_UP decimal(18,2)
  * rounding Spark's cast applies, bins are cents div 5000 ($50), and
  * TV = Σ|c_h·nRef − c_ref·n_h| / (2·n_h·nRef) keeps every numerator in
  * int64 with ONE 6-dp rounded division at the end (the round6
  * formula), so a batch recomputation over the same rows matches
  * bit-for-bit (spec-pinned).
  *
  * Emission: an hour is emitted exactly once, when the watermark passes
  * its close — exact and immutable, never restated; late-in-watermark
  * events fold into their still-open hour first. Quiet hours emit
  * nothing (an empty histogram has no defined distance; the heartbeat
  * monitor covers silence). A series absent from the reference reports
  * tv = 1.0 — an entirely novel distribution.
  *
  * State per series: histograms of OPEN hours only (closed hours are
  * emitted and dropped), each bounded by the value domain / $50 — and
  * the open-hour count is bounded by the watermark delay, so state is
  * O(series × delayHours × bins) regardless of stream length. An
  * event-time timeout re-arms at the earliest open hour's close so
  * emission never waits for the series' own next event.
  */
object StreamingDrift {

  case class Drift(series: String, hourTsUs: Long, n: Long, tv: Double)

  case class DriftState(hours: Map[Long, Map[Long, Long]])

  private val HourMs = 3600000L
  private val HourUs = 3600000000L

  /** The NULL bin's sentinel key in the state map: real bins are
    * |cents/5000| < 2e14, so Long.MinValue can never collide. */
  val NullBin: Long = Long.MinValue

  /** Spark's `cast(cast(v as decimal(18,2)) * 100 as bigint) div 5000`,
    * replicated exactly (HALF_UP at 2 dp, truncating div) — INCLUDING
    * the non-ANSI null semantics: NaN/Infinity and values overflowing
    * decimal(18,2) cast to NULL in batch, so here they land in
    * [[NullBin]] instead of throwing. A throwing bin function inside
    * flatMapGroupsWithState is a poison pill: the query dies, restarts
    * replay the same checkpointed batch, and it dies again, forever. */
  def binOf(value: Double): Long = {
    if (value.isNaN || value.isInfinite) return NullBin
    val scaled = BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    if (scaled.precision > 18) return NullBin // decimal(18,2) overflow -> NULL
    scaled.*(BigDecimal(100)).toLongExact / 5000L
  }

  /** round6(num, den) — the engine-shared 6-dp HALF-UP rational.
    * BigInt: num·2e6 wraps int64 once hourly×reference counts pass
    * ~2.3e12 (r8 advice) — the batch analog mulGuards these products
    * and fails loudly, but a stream can't fail per-record, so the
    * streaming side computes exactly instead (bit-identical to batch
    * everywhere batch doesn't throw). */
  private def round6(num: BigInt, den: BigInt): Double =
    ((num * 2000000 + den) / (den * 2)).toDouble / 1000000.0

  /** TV distance between an hour histogram and the reference. */
  def tvOf(hour: Map[Long, Long], ref: Map[Long, Long]): Double = {
    val n = hour.valuesIterator.sum
    val nRef = ref.valuesIterator.sum
    if (nRef == 0L) return 1.0 // novel series: maximal drift
    val num = (hour.keySet ++ ref.keySet).iterator.map { b =>
      (BigInt(hour.getOrElse(b, 0L)) * nRef - BigInt(ref.getOrElse(b, 0L)) * n).abs
    }.sum
    round6(num, BigInt(2) * n * nRef)
  }

  /** @param reference series -> (bin -> count), calibrated offline
    *                  (e.g. the stored table's history through q149's
    *                  binning) and broadcast with the plan. */
  def monitor(events: DataFrame, seriesCol: String, valueCol: String,
      tsCol: String, reference: Map[String, Map[Long, Long]],
      watermarkDelay: String): Dataset[Drift] = {
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(seriesCol).cast("string"), col(tsCol),
        col(valueCol).cast("double"))
      .as[(String, java.sql.Timestamp, Double)]
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[(String, java.sql.Timestamp, Double)],
         state: GroupState[DriftState]) =>
          val hours = mutable.Map.empty[Long, mutable.Map[Long, Long]]
          state.getOption.foreach(_.hours.foreach { case (h, m) =>
            hours(h) = mutable.Map.from(m)
          })
          it.foreach { case (_, ts, v) =>
            val h = us(ts) / HourUs
            val m = hours.getOrElseUpdate(h, mutable.Map.empty)
            val b = binOf(v)
            m(b) = m.getOrElse(b, 0L) + 1L
          }
          // hour h is final once the watermark passed its close
          val lastFinal = state.getCurrentWatermarkMs() / HourMs - 1L
          val ref = reference.getOrElse(series, Map.empty)
          val closed = hours.keys.filter(_ <= lastFinal).toSeq.sorted
          val out = closed.map { h =>
            val m = hours.remove(h).get.toMap
            Drift(series, h * HourUs, m.valuesIterator.sum, tvOf(m, ref))
          }
          if (hours.isEmpty) state.remove()
          else {
            state.update(DriftState(hours.view.mapValues(_.toMap).toMap))
            // wake at the earliest open hour's close. Event-time
            // timeouts fire only when the watermark STRICTLY exceeds
            // the timestamp, so arm at close−1 — the no-data batch that
            // advances the watermark TO the close then emits the hour
            // immediately (clamped past the current watermark, which
            // Spark requires)
            val wake = math.max((hours.keys.min + 1L) * HourMs - 1L,
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(wake)
          }
          out.iterator
      }
  }
}
