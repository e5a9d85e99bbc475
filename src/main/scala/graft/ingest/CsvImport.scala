package graft.ingest

import graft.catalog.GraftCatalog
import graft.ingest.HourPartitionedWriter
import org.apache.spark.sql.{DataFrame, functions => F}

/** Bulk import (reference: internal/api/import.go — multipart CSV / LP
  * file uploads batched into the write path).
  *
  *  - CSV: schema-inferred read, a named time column normalized to µs
  *    TimestampType (string timestamps parsed; integral epochs
  *    unit-detected), then through the standard hour-partitioned writer.
  *  - LP: text files parsed with the LineProtocol grammar.
  */
object CsvImport {

  /** Normalize a raw time column (string timestamp or integral epoch of
    * any unit) to TimestampType — vectorized twin of TimestampUnits. */
  def normalizeTimeColumn(df: DataFrame, timeCol: String): DataFrame = {
    val c = F.col(timeCol)
    val asLong = c.cast("long")
    val a = F.abs(asLong)
    val fromEpoch = F.timestamp_micros(
      F.when(a < 100000000000L, asLong * 1000000L)
        .when(a < 100000000000000L, asLong * 1000L)
        .when(a < 100000000000000000L, asLong)
        .otherwise(F.floor(asLong / 1000).cast("long")))
    val normalized = df.schema(timeCol).dataType.typeName match {
      case "timestamp" => c
      case "long" | "integer" => fromEpoch
      case _ => F.coalesce(F.try_to_timestamp(c), fromEpoch)
    }
    val withTime = df.withColumn("time", normalized)
    if (timeCol == "time") withTime else withTime.drop(timeCol)
  }

  /** Import CSV files into `{db}/{measurement}`. */
  def csv(catalog: GraftCatalog, db: String, measurement: String,
      path: String, timeCol: String = "time",
      options: Map[String, String] = Map("header" -> "true", "inferSchema" -> "true"))
      : Long = {
    val raw = catalog.spark.read.options(options).csv(path)
    require(raw.columns.contains(timeCol),
      s"CSV import needs a '$timeCol' column; got ${raw.columns.mkString(",")}")
    val df = normalizeTimeColumn(raw, timeCol)
    val n = df.count()
    HourPartitionedWriter.write(catalog, db, measurement, df)
    n
  }

  /** Import Line Protocol text files. */
  def lineProtocol(catalog: GraftCatalog, db: String, path: String,
      precision: String = "ns"): (Long, Seq[LineProtocol.ParseError]) = {
    val text = catalog.spark.read.textFile(path).collect().mkString("\n")
    val (points, errs) = LineProtocol.parse(text, precision)
    val batches = ColumnarBatch.fromPoints(points)
    batches.foreach(HourPartitionedWriter.ingest(catalog, db, _))
    (points.length.toLong, errs)
  }
}
