package graft.streaming

import graft.catalog.GraftCatalog
import graft.ingest.HourPartitionedWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest — the engine's continuous write path.
  *
  * The reference streams via in-memory buffers flushed on size/age
  * (arrow_writer.go:2249-2354); the Spark-native equivalent is a
  * micro-batch stream whose trigger interval IS the flush cadence, with
  * each micro-batch written through the same hour-partitioned sorted
  * writer as batch ingest (so layout, sort keys, dedup metadata and
  * late-data semantics are identical between batch and streaming).
  *
  * Late/out-of-order data: **no watermark** — matching the reference's
  * semantics (late rows land in their event-time hour partition and are
  * merged later by compaction; nothing is dropped, SURVEY §2.I3).
  *
  * Checkpointing gives exactly-once per micro-batch file commits (the
  * WAL analog — recovery replays uncommitted batches).
  */
object IngestStream {

  /** Start a file-landing stream: any parquet dropped into `landingDir`
    * is ingested into `{db}/{measurement}` on the trigger cadence. */
  def fromParquetLanding(catalog: GraftCatalog, db: String, measurement: String,
      landingDir: String, schema: StructType, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    val stream = catalog.spark.readStream
      .schema(schema)
      .parquet(landingDir)
    writeTo(catalog, db, measurement, stream, checkpointDir, trigger)
  }

  /** Attach the hour-partitioned sink to any streaming DataFrame with a
    * `time` column (source-agnostic: socket/Kafka/MQTT decoders feed
    * the same sink). */
  def writeTo(catalog: GraftCatalog, db: String, measurement: String,
      stream: DataFrame, checkpointDir: String, trigger: Trigger): StreamingQuery =
    stream.writeStream
      .outputMode("append")
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
