package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the Structured Streaming sibling
  * of the batch q26 (`TimeseriesQueries`): one row per (keys, session)
  * with bounds and size, emitted once the session can no longer grow.
  *
  * Spark-first: the built-in `session_window` expresses exactly this
  * (merging event-time windows, watermark-driven finalization in append
  * mode), so no custom state operator is needed — state lifecycle,
  * spill, and recovery come from the engine. Sessions finalize when the
  * watermark passes session_end + gap; each arrives exactly once in the
  * sink (append mode), which composes with the same hour-partitioned
  * write path as every other ingest (see StreamingCq.start).
  *
  * Boundary semantics vs the batch form: `session_window` extends a
  * session over gaps STRICTLY SMALLER than `gap` (the window is
  * right-open at end + gap), while batch q26 splits on `diff > gap`
  * (an exactly-gap-sized silence still chains). Events at the exact
  * gap boundary — measure-zero for real microsecond timestamps — land
  * in a new session here and the same session there; the parity spec
  * keeps its fixture off the boundary and documents the difference.
  *
  * Scale shape: state is per (keys, open session) — bounded by key
  * cardinality × watermark horizon, hash-partitioned across executors;
  * a per-entity key (user, host) keeps full parallelism exactly like
  * the batch form's one shuffle.
  */
object StreamingSessionize {

  /** One finalized session per (keyCols, gap-run): session_start,
    * session_end (bounds of observed events), n_events.
    *
    * @param stream streaming DataFrame with event-time column `timeCol`
    * @param gap session-breaking silence, e.g. "30 minutes"
    * @param watermarkDelay max accepted out-of-orderness
    */
  def sessions(stream: DataFrame, keyCols: Seq[String], timeCol: String,
      gap: String, watermarkDelay: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(keys :+ session_window(col(timeCol), gap): _*)
      .agg(min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("session_window")
  }
}
