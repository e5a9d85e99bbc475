package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-sequence funnel — the live sibling of batch q93
  * (`TimeseriesQueries`): per-user view → click → purchase progression
  * tracked incrementally, one record emitted the moment a stage is
  * NEWLY reached (the "conversion happened" signal batch analytics
  * only sees at the next run).
  *
  * Identical advancement rule to the batch fold: stage k+1 fires on
  * the earliest qualifying event STRICTLY after the stage-k timestamp,
  * so with in-order arrival each user's FIRST traversal matches q93's
  * exactly (StreamingFunnelSpec pins it across batch boundaries). One
  * deliberate difference from the one-fold-per-user batch report:
  * completion clears state, so a user who keeps going may start a NEW
  * traversal — each completion is a separate funnel instance, which is
  * what a live conversion feed wants and q93's single-snapshot frame
  * cannot express. Cross-batch disorder above the watermark applies in
  * arrival order — the same documented trade as every stateful
  * operator here.
  *
  * State: one (t1, t2, t3) triple per user still mid-funnel — a
  * COMPLETED funnel removes its state immediately, and an event-time
  * TTL drops abandoned funnels, so state tracks active users, not
  * all-time users.
  */
object StreamingFunnel {

  /** stage ∈ {1, 2, 3}; tsUs = the event that advanced the funnel. */
  case class StageAdvance(user: Long, stage: Int, tsUs: Long)

  case class FunnelState(t1: Long, t2: Long, t3: Long)

  private val Unset = Long.MinValue

  def advances(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], watermarkDelay: String,
      idleTtlMs: Long): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.length == 3, s"exactly three stages: $stages")
    require(idleTtlMs > 0, s"idleTtlMs must be positive: $idleTtlMs")
    val Seq(s1, s2, s3) = stages
    val rows = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long"), col(tsCol),
        col(typeCol).cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
            val batch = it.toArray.sortBy(e => us(e._2))
            val out = Vector.newBuilder[StageAdvance]
            batch.foreach { case (_, ts, et) =>
              val t = us(ts)
              if (st.t1 == Unset && et == s1) {
                st = st.copy(t1 = t); out += StageAdvance(user, 1, t)
              } else if (st.t2 == Unset && st.t1 != Unset &&
                  et == s2 && t > st.t1) {
                st = st.copy(t2 = t); out += StageAdvance(user, 2, t)
              } else if (st.t3 == Unset && st.t2 != Unset &&
                  et == s3 && t > st.t2) {
                st = st.copy(t3 = t); out += StageAdvance(user, 3, t)
              }
            }
            if (st.t3 != Unset) state.remove() // funnel complete
            else {
              state.update(st)
              val lastTs = if (batch.nonEmpty) us(batch.last._2) / 1000L
                           else state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                (lastTs + idleTtlMs) max (state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
