package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** Streaming EXACT sliding-window distinct — the live sibling of batch
  * q146 (`TimeseriesQueries`): one row per (series, hour) carrying the
  * trailing-`windowHours` distinct-entity count ("rolling DAU"),
  * emitted once the hour is FINAL (the watermark passed its close), so
  * every emission is exact and immutable — no sketch, no restatement.
  *
  * State per series: each entity's recent presence HOURS, pruned to
  * the window horizon once emitted hours no longer need them —
  * O(active entities × windowHours) per series, which is the
  * information-theoretic floor for exact sliding distinct (anything
  * smaller is a sketch; the q34 path covers that trade). Late events
  * inside the watermark amend state before their hour closes; hours
  * close in order, each exactly once (`lastEmitted` cursor), and quiet
  * hours still emit while any presence remains in range — grid
  * continuity matches the batch formulation. An event-time timeout
  * re-arms at the next hour close so emission does not wait for the
  * series' own next event; a series that goes permanently silent
  * reports its decay down to ONE closing zero row, then its state is
  * REMOVED (no leak proportional to all-time series cardinality) and
  * its grid ends — a later revival starts a fresh grid at its own
  * first hour.
  */
object StreamingSlidingDistinct {

  case class Rolling(series: String, hourTsUs: Long, active: Long)

  case class SlideState(lastEmitted: Long, pres: Map[Long, Seq[Long]])

  private val HourMs = 3600000L
  private val HourUs = 3600000000L

  def counts(events: DataFrame, seriesCol: String, entityCol: String,
      tsCol: String, windowHours: Int,
      watermarkDelay: String): Dataset[Rolling] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(windowHours >= 1, s"windowHours must be >= 1: $windowHours")
    val W = windowHours.toLong
    val rows = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(seriesCol).cast("string"), col(tsCol),
        col(entityCol).cast("long"))
      .as[(String, java.sql.Timestamp, Long)]
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[SlideState]) =>
          var st = state.getOption.getOrElse(SlideState(Long.MinValue, Map.empty))
          val batch = it.toArray
          if (batch.nonEmpty) {
            val upd = mutable.Map.from(st.pres)
            batch.foreach { case (_, ts, ent) =>
              val h = us(ts) / HourUs
              val cur = upd.getOrElse(ent, Seq.empty)
              if (!cur.contains(h)) upd(ent) = (cur :+ h).sorted
            }
            st = st.copy(pres = upd.toMap)
          }
          // hour h is final once the watermark passed its close
          val lastFinal = state.getCurrentWatermarkMs() / HourMs - 1L
          val out = Vector.newBuilder[Rolling]
          val from =
            if (st.lastEmitted != Long.MinValue) st.lastEmitted + 1L
            else if (st.pres.nonEmpty) st.pres.valuesIterator.flatten.min
            else Long.MaxValue // nothing ever ingested: nothing to emit
          var lastCount = -1L
          var h = from
          val maxPres = if (st.pres.isEmpty) Long.MinValue
                        else st.pres.valuesIterator.flatten.max
          var done = false
          while (h <= lastFinal && !done) {
            val cnt = st.pres.count { case (_, hs) =>
              hs.exists(x => x >= h - (W - 1) && x <= h) }.toLong
            out += Rolling(series, h * HourUs, cnt)
            lastCount = cnt
            // a zero with no presence ahead stays zero forever: emit it
            // as the grid's single closing row even when the watermark
            // jumped several hours in one wake
            if (cnt == 0L && maxPres <= h) done = true
            h += 1L
          }
          if (from < h) {
            st = st.copy(lastEmitted = h - 1L)
            // presence older than the NEXT hour's window is dead
            val keepFrom = st.lastEmitted + 1L - (W - 1L)
            st = st.copy(pres = st.pres.iterator.map { case (u, hs) =>
              u -> hs.filter(_ >= keepFrom)
            }.filter(_._2.nonEmpty).toMap)
          }
          if (st.pres.isEmpty && lastCount == 0L) {
            // decayed to zero and nothing left in range: the closing
            // zero row is in `out`; end this series' grid and free its
            // state (a revival starts a fresh grid)
            state.remove()
          } else {
            state.update(st)
            // wake at the close of the next unemitted hour even if the
            // series goes quiet (emission must not depend on its beats)
            state.setTimeoutTimestamp(
              ((lastFinal + 2L) * HourMs) max (state.getCurrentWatermarkMs() + 1L))
          }
          out.result().iterator
      }
  }
}
