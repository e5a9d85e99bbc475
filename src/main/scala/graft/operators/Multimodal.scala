package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batched map
  * functions (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The Spark-side plumbing — schema, batching, partition sizing — is
  * real and tested; the media DECODE itself is a clearly-marked
  * deterministic STUB (`decodeStub`): this container has no image/audio
  * codecs, so the stub derives stable pseudo-metadata from the bytes.
  * Swapping in a real codec touches only the two stub functions.
  *
  * Scale notes: media rows are large — the entry point re-partitions by
  * a target bytes-per-partition budget before mapping, so a 100 TB media
  * table becomes many bounded tasks instead of a few OOM-ing ones; the
  * per-partition iterator processes rows in bounded batches (no
  * whole-partition materialization).
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("format", StringType)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType),
    StructField("features", ArrayType(FloatType))))

  /** STUB decode — deterministic pseudo metadata/features from bytes.
    * Replace with a real codec (javax.imageio / ffmpeg bindings) in a
    * production deployment; everything downstream is shape-compatible. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long, Array[Float]) = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val w = 64 + (h % 1024).toInt            // pseudo width
    val ht = 64 + ((h / 1024) % 1024).toInt  // pseudo height
    val feats = new Array[Float](8)
    var j = 0
    while (j < 8) {
      feats(j) = (((h >> (j * 4)) & 0xffL).toFloat / 255.0f)
      j += 1
    }
    (w, ht, h, feats)
  }

  /** STUB frame sampler — yields `n` deterministic byte slices. */
  def frameSampleStub(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (bytes.isEmpty) Seq.empty
    else (0 until n).map { i =>
      val start = (bytes.length.toLong * i / n).toInt
      val end = math.min(bytes.length, start + math.max(1, bytes.length / n))
      java.util.Arrays.copyOfRange(bytes, start, end)
    }
  }

  /** Decode + feature-extract over a media DataFrame
    * (media_id, bytes, format), batched per partition.
    *
    * Partition count comes from Catalyst's size estimate for the input
    * plan (file-scan bytes for tables) — metadata only, no `count()`
    * scan of the media table just to size partitions. */
  def extractFeatures(media: DataFrame,
      targetBytesPerPartition: Long = 128L * 1024 * 1024,
      batchRows: Int = 64): DataFrame = {
    val estBytes = media.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats report defaultSizeInBytes (Long.MaxValue) when unknown (e.g.
    // RDD-backed frames) — keep the input partitioning in that case
    val repartitioned =
      if (estBytes <= 0 || estBytes >= BigInt(Long.MaxValue)) media
      else {
        val parts = math.max(1, (estBytes / math.max(1L, targetBytesPerPartition))
          .min(BigInt(1 << 20)).toInt)
        if (parts > media.rdd.getNumPartitions) media.repartition(parts) else media
      }
    val enc = RowEncoder.encoderFor(FeatureSchema)
    repartitioned.select("media_id", "bytes", "format").mapPartitions { it =>
      it.grouped(batchRows).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val fmt = r.getString(2)
          val (w, h, checksum, feats) = decodeStub(bytes)
          Row(id, fmt, bytes.length.toLong, w, h, checksum, feats.toSeq)
        }
      }
    }(enc)
  }

  /** Frame-sampling pipeline: one row per sampled frame. */
  def sampleFrames(media: DataFrame, framesPerItem: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "bytes").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        frameSampleStub(bytes, framesPerItem).zipWithIndex.map { case (b, i) =>
          Row(id, i, b)
        }
      }
    }(enc)
  }
}
