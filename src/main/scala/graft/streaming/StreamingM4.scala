package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming M4 downsampling — the Structured Streaming sibling of the
  * batch q118 (`TimeseriesQueries`): per (series, tumbling bucket) keep
  * min/max/first/last, finalized once the watermark passes the bucket
  * end (append mode ⇒ each bucket arrives exactly once downstream).
  * This is the live dashboard feed: the error-free line-rendering
  * envelope (Jugel et al., VLDB 2014) materialized continuously.
  *
  * Spark-first: a watermarked tumbling `window` aggregation — state,
  * spill, and recovery come from the engine; first/last ride
  * min_by/max_by over a (time, id) struct key exactly like the batch
  * form, so no ordered state or custom operator is needed and the
  * streaming result equals the batch M4 on the same events
  * (StreamingM4Spec pins the parity).
  *
  * Scale shape: state is one row per (series, open bucket) — bounded by
  * series cardinality × (watermark horizon / bucket width), hash-
  * partitioned across executors; per-event work is a map-side partial
  * into that row. Late events inside the watermark fold in correctly
  * (selection aggregates are order-independent); events later than the
  * watermark are dropped by the engine's standard contract.
  */
object StreamingM4 {

  /** One finalized row per (keyCols, bucket): bucket (window start),
    * min_v/max_v/first_v/last_v, n.
    *
    * @param bucket tumbling width, e.g. "15 minutes"
    * @param watermarkDelay max accepted out-of-orderness
    */
  def downsample(stream: DataFrame, keyCols: Seq[String], timeCol: String,
      idCol: String, valCol: String, bucket: String,
      watermarkDelay: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(keys :+ window(col(timeCol), bucket): _*)
      .agg(min(col(valCol)).as("min_v"), max(col(valCol)).as("max_v"),
        min_by(col(valCol), struct(col(timeCol), col(idCol))).as("first_v"),
        max_by(col(valCol), struct(col(timeCol), col(idCol))).as("last_v"),
        count(lit(1)).as("n"))
      .select(keys ++ Seq(col("window.start").as("bucket"), col("min_v"),
        col("max_v"), col("first_v"), col("last_v"), col("n")): _*)
  }
}
