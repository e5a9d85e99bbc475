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
  * hours still emit (their trailing window can be non-empty) — grid
  * continuity matches the batch formulation. An event-time timeout
  * re-arms at the next hour close so emission does not wait for the
  * series' own next event (a silent series keeps reporting its decay
  * to zero).
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
          val firstHour =
            if (st.pres.isEmpty) None else Some(st.pres.valuesIterator.flatten.min)
          firstHour.foreach { f0 =>
            val from = if (st.lastEmitted == Long.MinValue) f0
                       else st.lastEmitted + 1L
            var h = from
            while (h <= lastFinal) {
              val cnt = st.pres.count { case (_, hs) =>
                hs.exists(x => x >= h - (W - 1) && x <= h) }
              out += Rolling(series, h * HourUs, cnt.toLong)
              h += 1L
            }
            if (lastFinal >= from) {
              st = st.copy(lastEmitted = lastFinal)
              // presence older than the NEXT hour's window is dead
              val keepFrom = lastFinal + 1L - (W - 1L)
              st = st.copy(pres = st.pres.iterator.map { case (u, hs) =>
                u -> hs.filter(_ >= keepFrom)
              }.filter(_._2.nonEmpty).toMap)
            }
          }
          state.update(st)
          // wake at the close of the next unemitted hour even if this
          // series goes quiet (emission must not depend on its own beats)
          state.setTimeoutTimestamp(
            ((lastFinal + 2L) * HourMs) max (state.getCurrentWatermarkMs() + 1L))
          out.result().iterator
      }
  }
}
