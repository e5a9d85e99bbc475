package graft.ingest

import graft.catalog.GraftCatalog
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import scala.collection.mutable

/** Direct Parquet flush path — the ingest hot path WITHOUT a Spark job
  * (SURVEY §3.2 recommends exactly this: "writes hour-partitioned
  * Parquet directly with a Parquet writer; no Spark needed on the hot
  * path; queries see files immediately, exactly like Arc").
  *
  * One flush = sort the batch by (sortKeys, time), split by event-time
  * hour, write one ZSTD parquet per hour into the same Hive layout the
  * Spark writer uses. Files are immediately visible to every reader
  * (same layout, same recency-ordered names, same dedup semantics at
  * compaction). Spark's distributed writer (`HourPartitionedWriter`)
  * remains the path for large backfills; this one serves the
  * high-frequency small-flush ingest loop where per-job scheduling
  * overhead would dominate.
  */
object DirectParquetWriter {

  private def schemaFor(batch: ColumnarBatch): MessageType = {
    val b = Types.buildMessage()
    batch.columns.foreach { case (name, vs) =>
      val field = ColumnarBatch.inferType(name, vs) match {
        case org.apache.spark.sql.types.TimestampType =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
        case org.apache.spark.sql.types.LongType =>
          Types.optional(PrimitiveTypeName.INT64).named(name)
        case org.apache.spark.sql.types.DoubleType =>
          Types.optional(PrimitiveTypeName.DOUBLE).named(name)
        case org.apache.spark.sql.types.BooleanType =>
          Types.optional(PrimitiveTypeName.BOOLEAN).named(name)
        case _ =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(name)
      }
      b.addField(field)
    }
    b.named("graft")
  }

  /** Write one batch; returns the files written (one per hour). */
  def write(catalog: GraftCatalog, db: String, batch: ColumnarBatch): Seq[String] = {
    require(batch.columns.contains("time"), "batch must carry 'time'")
    val meta = catalog.readMeta(db, batch.measurement)
    if (meta.tagColumns.isEmpty && batch.tagColumns.nonEmpty)
      catalog.writeMeta(db, batch.measurement,
        meta.copy(tagColumns = batch.tagColumns))

    val n = batch.rowCount
    val cols = batch.columns
    val time = cols("time").map(_.asInstanceOf[Long])

    // sort indices by (sortKeys, time) — flush-time multi-key sort
    val sortKeyCols = meta.sortKeys.filter(cols.contains).map(cols)
    val idx = Array.tabulate(n)(identity)
    val ordering = new Ordering[Int] {
      def compare(a: Int, b: Int): Int = {
        var c = 0
        val it = sortKeyCols.iterator
        while (c == 0 && it.hasNext) {
          val col = it.next()
          c = compareValues(col(a), col(b))
        }
        if (c == 0) java.lang.Long.compare(time(a), time(b)) else c
      }
    }
    scala.util.Sorting.stableSort(idx)(ordering)

    // split by event-time hour (already time-sorted within sort groups;
    // group rows per hour then write each once)
    val byHour = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Int]]
    idx.foreach { i =>
      val h = Math.floorDiv(time(i), 3600000000L)
      byHour.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += i
    }

    val schema = schemaFor(batch)
    val factory = new SimpleGroupFactory(schema)
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    val flushUs = System.currentTimeMillis() * 1000L
    val names = cols.keys.toArray
    val arrays = names.map(cols)
    val types = names.map(nm => ColumnarBatch.inferType(nm, cols(nm)))

    byHour.zipWithIndex.map { case ((hour, rows), seq) =>
      val dt = java.time.LocalDateTime.ofEpochSecond(hour * 3600L, 0,
        java.time.ZoneOffset.UTC)
      val dir = catalog.partitionPath(db, batch.measurement,
        dt.getYear, dt.getMonthValue, dt.getDayOfMonth, dt.getHour)
      val file = new Path(dir,
        HourPartitionedWriter.flushFileName(batch.measurement, flushUs, seq))
      val writer = ExampleParquetWriter.builder(
          org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
        .withConf(conf)
        .withType(schema)
        .withCompressionCodec(CompressionCodecName.ZSTD)
        .build()
      try {
        rows.foreach { i =>
          val g = factory.newGroup()
          var c = 0
          while (c < names.length) {
            appendValue(g, names(c), types(c), arrays(c)(i))
            c += 1
          }
          writer.write(g)
        }
      } finally writer.close()
      file.toString
    }.toSeq
  }

  private def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: String, y: String) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }

  private def appendValue(g: Group, name: String,
      dt: org.apache.spark.sql.types.DataType, v: Any): Unit = {
    if (v == null) return
    dt match {
      case org.apache.spark.sql.types.TimestampType =>
        g.append(name, v.asInstanceOf[Long])
      case org.apache.spark.sql.types.LongType => v match {
        case l: Long => g.append(name, l)
        case i: Int => g.append(name, i.toLong)
        case s: Short => g.append(name, s.toLong)
        case b: Byte => g.append(name, b.toLong)
      }
      case org.apache.spark.sql.types.DoubleType => v match {
        case d: Double => g.append(name, d)
        case f: Float => g.append(name, f.toDouble)
      }
      case org.apache.spark.sql.types.BooleanType =>
        g.append(name, v.asInstanceOf[Boolean])
      case _ => g.append(name, String.valueOf(v))
    }
  }
}
