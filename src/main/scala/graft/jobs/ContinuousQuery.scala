package graft.jobs

import graft.catalog.{GraftCatalog, TableMeta}
import graft.ingest.HourPartitionedWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous query — scheduled re-execution of an aggregation SQL over
  * the window `[lastProcessed, now)`, writing results into a destination
  * measurement (reference: internal/api/continuous_query.go +
  * internal/scheduler/cq_scheduler.go).
  *
  * Faithfully mirrored semantics:
  *  - `{start_time}` / `{end_time}` placeholders substituted with µs
  *    timestamp literals;
  *  - if the result has no `time` column, every row is stamped with the
  *    **window start** — so re-running a window re-emits identical rows
  *    and compaction's dedup-on-(tags,time) collapses them
  *    (idempotent re-runs, reference issue #521 design);
  *  - destination table is marked dedupTime=true so compaction repairs
  *    duplicate emissions.
  */
final case class ContinuousQuery(
    name: String,
    sql: String,            // references registered views; may use placeholders
    destDb: String,
    destMeasurement: String,
    tagColumns: Seq[String] = Nil)

object ContinuousQuery {

  final case class Execution(windowStartMicros: Long, windowEndMicros: Long,
      rows: Long)

  private def microsLiteral(us: Long): String =
    s"TIMESTAMP '${java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)}'"

  def substitute(sql: String, startUs: Long, endUs: Long): String =
    sql.replace("{start_time}", microsLiteral(startUs))
      .replace("{end_time}", microsLiteral(endUs))

  /** Run one window and append results to the destination measurement. */
  def execute(catalog: GraftCatalog, cq: ContinuousQuery,
      windowStartUs: Long, windowEndUs: Long): Execution = {
    val spark = catalog.spark
    val result0 = spark.sql(substitute(cq.sql, windowStartUs, windowEndUs))
    val result: DataFrame =
      if (result0.columns.contains("time")) result0
      else result0.withColumn("time", timestamp_micros(lit(windowStartUs)))

    val meta = catalog.readMeta(cq.destDb, cq.destMeasurement)
    catalog.writeMeta(cq.destDb, cq.destMeasurement, meta.copy(
      dedupTime = true,
      tagColumns =
        if (meta.tagColumns.nonEmpty) meta.tagColumns else cq.tagColumns))

    val n = result.count()
    HourPartitionedWriter.write(catalog, cq.destDb, cq.destMeasurement, result)
    Execution(windowStartUs, windowEndUs, n)
  }

  /** Advance a CQ from its stored `lastProcessed` up to `now`, one
    * window per call (the scheduler tick). Returns the new watermark. */
  def tick(catalog: GraftCatalog, cq: ContinuousQuery,
      lastProcessedUs: Long, nowUs: Long): (Execution, Long) = {
    val exec = execute(catalog, cq, lastProcessedUs, nowUs)
    (exec, nowUs)
  }
}
