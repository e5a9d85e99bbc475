package graft.operators

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.streaming.IngestStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {

  private def mediaDf(n: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, Array.fill[Byte](100 + i)((i % 127).toByte), "img")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
  }

  test("feature extraction: schema, determinism, batch shape") {
    val out = Multimodal.extractFeatures(mediaDf(10), batchRows = 4)
    assert(out.schema == Multimodal.FeatureSchema)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getSeq[Float](6).length == 8))
    assert(rows.forall(r => r.getLong(2) == 100 + r.getLong(0))) // n_bytes
    // deterministic: re-running yields identical checksums
    val again = Multimodal.extractFeatures(mediaDf(10), batchRows = 4)
      .orderBy("media_id").collect()
    assert(rows.map(_.getLong(5)).toSeq == again.map(_.getLong(5)).toSeq)
  }

  test("frame sampling: n frames per item, slices cover the byte range") {
    val frames = Multimodal.sampleFrames(mediaDf(3), framesPerItem = 4)
      .orderBy("media_id", "frame_idx").collect()
    assert(frames.length == 12)
    assert(frames.map(_.getInt(1)).toSeq.take(4) == Seq(0, 1, 2, 3))
    assert(frames.forall(_.getAs[Array[Byte]](2).nonEmpty))
  }
}

class IngestStreamSpec extends SparkSpec {

  test("streaming ingest lands micro-batches in hour partitions") {
    val cat = new GraftCatalog(spark, tmpDir("stream_cat"))
    val landing = tmpDir("landing")
    val ckpt = tmpDir("ckpt")
    val schema = StructType(Seq(
      StructField("time", TimestampType),
      StructField("host", StringType),
      StructField("v", DoubleType)))

    // drop a parquet batch into the landing dir (3 rows, 2 hours)
    val base = 1717200000000000L
    import spark.implicits._
    Seq((base, "a", 1.0), (base + 3600L * 1000000 + 5, "b", 2.0),
      (base + 7, "c", 3.0))
      .toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
      .coalesce(1).write.mode("append").parquet(landing)

    val q = IngestStream.fromParquetLanding(cat, "default", "stream_m",
      landing, schema, ckpt, Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
    } finally q.stop()

    val parts = cat.listHourPartitions("default", "stream_m")
    assert(parts.length == 2, parts.mkString(","))
    assert(cat.table("default", "stream_m").count() == 3)
    // second batch appends without reprocessing the first (checkpoint)
    Seq((base + 9, "d", 4.0)).toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
      .coalesce(1).write.mode("append").parquet(landing)
    val q2 = IngestStream.fromParquetLanding(cat, "default", "stream_m",
      landing, schema, ckpt, Trigger.ProcessingTime("1 second"))
    try q2.processAllAvailable() finally q2.stop()
    assert(cat.table("default", "stream_m").count() == 4)
  }
}
