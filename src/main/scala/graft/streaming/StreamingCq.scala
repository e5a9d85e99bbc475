package graft.streaming

import graft.catalog.GraftCatalog
import graft.ingest.HourPartitionedWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming continuous query — the Structured Streaming sibling of the
  * scheduled batch CQ (`jobs.ContinuousQuery`).
  *
  * The batch CQ re-runs SQL over `[watermark, now)` on a timer; this form
  * keeps the aggregation RUNNING: event-time window + watermark, with
  * only FINALIZED windows emitted (append mode), each batch written
  * through the same hour-partitioned sink as every other ingest path.
  * Rows are stamped with the window start — the batch CQ's idempotency
  * convention — so a replayed micro-batch (post-crash) re-emits identical
  * rows and compaction's dedup-on-(tags,time) collapses them: the
  * end-to-end contract is exactly-once per window either way.
  *
  * Where the batch CQ covers the reference's catch-up semantics (missed
  * windows re-run in order after downtime), the streaming form covers
  * low-latency continuous maintenance; both land identical table layouts.
  *
  * Late data: rows later than `watermarkDelay` past the max seen event
  * time are DROPPED by the aggregation (standard Structured Streaming
  * semantics) — unlike raw ingest (no watermark, compaction repairs).
  * That is the price of emitting finalized windows; size the delay to
  * the source's real out-of-orderness.
  */
object StreamingCq {

  /** Start a windowed streaming aggregation into `{db}/{measurement}`.
    *
    * @param stream     streaming DataFrame with event-time column `time`
    * @param windowSpec window duration, e.g. "1 hour"
    * @param watermarkDelay max accepted out-of-orderness, e.g. "10 minutes"
    * @param aggs       aggregate columns (must be named via .as)
    * @param groupCols  extra grouping (tag) columns
    */
  def start(catalog: GraftCatalog, db: String, measurement: String,
      stream: DataFrame, windowSpec: String, watermarkDelay: String,
      aggs: Seq[org.apache.spark.sql.Column],
      groupCols: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    val windowed = stream
      .withWatermark("time", watermarkDelay)
      .groupBy(window(col("time"), windowSpec) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      // the window-start stamp IS the output time column (batch-CQ
      // convention: re-emission of a window produces identical rows)
      .withColumn("time", col("window.start"))
      .drop("window")
    // exactly-once is foreachBatch-at-least-once + compaction dedup on
    // (tags, time): a micro-batch replayed after a crash re-emits
    // IDENTICAL rows (time = window start), and the destination meta
    // below is what arms compaction's dedup guard — without it the
    // replayed duplicates would survive forever (same contract as the
    // batch sibling ContinuousQuery.execute, which writes this meta)
    val meta = catalog.readMeta(db, measurement)
    catalog.writeMeta(db, measurement, meta.copy(
      dedupTime = true,
      tagColumns =
        if (meta.tagColumns.nonEmpty) meta.tagColumns else groupCols))
    windowed.writeStream
      .outputMode(OutputMode.Append()) // only watermark-finalized windows
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          HourPartitionedWriter.write(catalog, db, measurement, batch)
          ()
        }
      }
      .start()
  }

  /** Streaming exactly-once dedup on (keys..., time) within the
    * watermark horizon — the streaming sibling of compaction's stateful
    * dedup (SURVEY §2.I6). Built on `dropDuplicatesWithinWatermark`
    * (state expires with the watermark, bounded memory) rather than a
    * hand-rolled flatMapGroupsWithState: the built-in is codegen-planned
    * and its state lifecycle is exactly the required semantic. Duplicates
    * that straddle MORE than the watermark horizon still collapse later
    * at compaction — same two-tier guarantee as the reference.
    */
  def dedup(stream: DataFrame, keyCols: Seq[String],
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark("time", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols :+ "time")
}
