package graft.jobs

import graft.catalog.GraftCatalog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hourly/daily compaction with last-write-wins dedup — the reference's
  * core maintenance operator (internal/compaction/hourly.go, daily.go,
  * job.go, dedup.go):
  *
  *  - an hour partition qualifies when it has ≥ minFiles files and its
  *    hour is at least minAgeHours old (the "watermark" that makes merge
  *    safe — I5 in SURVEY §2.I);
  *  - mixed-type time repair: files written with string/int64 epoch time
  *    are coerced back to timestamp (dedup.go:238-259's
  *    COALESCE(TRY_CAST...) — here `coalesce(try micros, try cast)`);
  *  - dedup: one row per (tags..., time), latest file wins (the
  *    reference orders by file recency; flush files are named by flush
  *    nanos so `input_file_name()` sorts by recency lexically);
  *  - output: one sorted ZSTD file per partition, sources atomically
  *    replaced (write to _compact_tmp, then swap).
  *
  * Scale: each partition compacts independently — on a cluster the
  * driver loops here become one job per partition (or a single job over
  * many partitions); no cross-partition shuffle is ever needed because
  * the dedup key (tags, time) is entirely inside one hour partition.
  */
object Compaction {

  final case class Result(partition: String, filesIn: Int, rowsIn: Long,
      rowsOut: Long, compacted: Boolean)

  def compactHour(catalog: GraftCatalog, db: String, m: String,
      partDir: Path, minFiles: Int = 2): Result = {
    val spark = catalog.spark
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(partDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    if (files.length < minFiles)
      return Result(partDir.toString, files.length, 0, 0, compacted = false)

    val meta = catalog.readMeta(db, m)
    // union-by-name with type coercion: a plain mergeSchema read fails when
    // one file wrote `time` as string/int64 (the mixed-type fixture the
    // reference repairs, dedup.go:238-259) — fall back to per-file reads,
    // repair each, then unionByName.
    val repaired =
      try normalizeTime(
        spark.read.option("mergeSchema", "true")
          .parquet(files.map(_.toString): _*)
          .withColumn("_src", input_file_name()))
      catch {
        case _: org.apache.spark.SparkException =>
          files.map { f =>
            normalizeTime(spark.read.parquet(f.toString)
              .withColumn("_src", input_file_name()))
          }.reduce(_.unionByName(_, allowMissingColumns = true))
      }
    val rowsIn = repaired.count()
    val deduped =
      if (meta.tagColumns.nonEmpty || meta.dedupTime) {
        val keys = (meta.tagColumns.filter(repaired.columns.contains) :+ "time").map(col)
        val w = Window.partitionBy(keys: _*).orderBy(col("_src").desc)
        repaired.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
      } else repaired
    val sortCols = (meta.sortKeys.filter(deduped.columns.contains) :+ "time").map(col)
    val out = deduped.drop("_src").orderBy(sortCols: _*).coalesce(1)

    // write to a sibling tmp dir, then atomically swap the partition's files
    val tmp = new Path(partDir.getParent, s"_compact_tmp_${partDir.getName}")
    fs.delete(tmp, true)
    out.write.mode("overwrite").option("compression", "zstd").parquet(tmp.toString)
    val rowsOut = spark.read.parquet(tmp.toString).count()
    val newFiles = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).map(_.getPath)
    // crash-safe swap order: rename the compacted file IN first, then
    // delete the sources. A crash in between leaves transient duplicate
    // rows (repaired by re-running compaction — dedup collapses them),
    // never data loss. The reverse order (delete-then-rename) would lose
    // the partition if the process died mid-swap.
    // Output uses the same recency-ordered name scheme: it must sort
    // OLDER than any flush that lands after this compaction.
    val compactUs = System.currentTimeMillis() * 1000L
    newFiles.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f, new Path(partDir,
        graft.ingest.HourPartitionedWriter.flushFileName(m, compactUs, i)))
    }
    files.foreach(fs.delete(_, false))
    fs.delete(tmp, true)
    Result(partDir.toString, files.length, rowsIn, rowsOut, compacted = true)
  }

  /** Repair a `time` column that may arrive as int64 epoch (any unit) or
    * string epoch seconds — mirror of dedup.go:238-259. */
  private[jobs] def normalizeTime(df: DataFrame): DataFrame =
    df.schema("time").dataType.typeName match {
      case "timestamp" => df
      case "long" =>
        df.withColumn("time", timestamp_micros(normalizeMicrosExpr(col("time"))))
      case "string" =>
        df.withColumn("time",
          coalesce(
            try_to_timestamp(col("time")),
            timestamp_micros(normalizeMicrosExpr(col("time").cast("long")))))
      case _ => df.withColumn("time", col("time").cast("timestamp"))
    }

  /** Magnitude-based unit detection as a Column expression
    * (TimestampUnits.detect, vectorized). */
  private def normalizeMicrosExpr(v: org.apache.spark.sql.Column) = {
    val a = abs(v)
    when(a < 100000000000L, v * 1000000L)
      .when(a < 100000000000000L, v * 1000L)
      .when(a < 100000000000000000L, v)
      .otherwise(floor(v / 1000).cast("long"))
  }

  /** Compact every qualifying hour partition of a measurement. */
  def runHourly(catalog: GraftCatalog, db: String, m: String,
      minFiles: Int = 2, minAgeHours: Int = 1,
      nowMicros: () => Long = () => System.currentTimeMillis() * 1000L)
      : Seq[Result] = {
    val cutoffHour = (nowMicros() / 1000000L / 3600L) - minAgeHours
    catalog.listHourPartitions(db, m).flatMap { p =>
      partitionHourEpoch(p) match {
        case Some(h) if h <= cutoffHour =>
          Some(compactHour(catalog, db, m, p, minFiles))
        case _ => None
      }
    }
  }

  /** Startup recovery: remove stale `_compact_tmp_*` dirs left by a
    * crashed compaction (their partition still has the source files or
    * the renamed output — either way the tmp dir is garbage; duplicate
    * rows from a mid-swap crash are collapsed by the next compaction).
    * The filesystem-level analog of the reference's manifest + watcher
    * (internal/compaction/manifest.go, watcher.go). */
  def recover(catalog: GraftCatalog, db: String, m: String): Seq[String] = {
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    val cleaned = scala.collection.mutable.ArrayBuffer.empty[String]
    catalog.listHourPartitions(db, m).foreach { p =>
      val fs = p.getFileSystem(conf)
      fs.listStatus(p.getParent)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_tmp_"))
        .foreach { s => fs.delete(s.getPath, true); cleaned += s.getPath.toString }
    }
    cleaned.toSeq
  }

  /** Epoch hour of a .../year=Y/month=M/day=D/hour=H path. */
  private[jobs] def partitionHourEpoch(p: Path): Option[Long] = {
    def v(seg: String): Option[Int] = {
      val i = seg.indexOf('=')
      if (i < 0) None else seg.substring(i + 1).toIntOption
    }
    for {
      h <- v(p.getName)
      d <- v(p.getParent.getName)
      mo <- v(p.getParent.getParent.getName)
      y <- v(p.getParent.getParent.getParent.getName)
    } yield java.time.LocalDateTime.of(y, mo, d, h, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) / 3600L
  }
}
