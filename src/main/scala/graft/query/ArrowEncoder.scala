package graft.query

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/** Arrow IPC stream result sink — the reference's fastest wire format
  * (internal/api/query_arrow.go: 9.49M rows/s vs 2.99M JSON,
  * BASELINE.md). Encodes a result as an Arrow IPC stream of record
  * batches of `batchRows`, consuming `toLocalIterator` so the driver
  * holds one batch at a time.
  *
  * Covers the engine's six storable types (timestamp-µs/long/double/
  * string/bool/decimal — SURVEY §1.2); non-storable result types are
  * stringified, matching the JSON envelope's fallback.
  */
object ArrowEncoder {

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case TimestampType =>
        new ArrowType.Timestamp(types.TimeUnit.MICROSECOND, "UTC")
      case LongType | IntegerType | ShortType | ByteType =>
        new ArrowType.Int(64, true)
      case DoubleType | FloatType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case _ => ArrowType.Utf8.INSTANCE
    }
    new Field(f.name, FieldType.nullable(t), List.empty[Field].asJava)
  }

  def encode(df: DataFrame, batchRows: Int = 4096,
      maxRows: Long = Long.MaxValue): Array[Byte] = {
    val sparkSchema = df.schema
    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      val it = df.toLocalIterator()
      var total = 0L
      while (it.hasNext && total < maxRows) {
        var n = 0
        while (it.hasNext && n < batchRows && total < maxRows) {
          val row = it.next()
          var c = 0
          while (c < sparkSchema.length) {
            setValue(root.getVector(c), sparkSchema(c).dataType, n, row.get(c))
            c += 1
          }
          n += 1
          total += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        root.allocateNew()
      }
      writer.end()
      out.toByteArray
    } finally {
      writer.close()
      root.close()
      alloc.close()
    }
  }

  /** Distributed variant: each partition encodes its own rows into an
    * IPC chunk on the executors; the driver only re-frames the record
    * batches into one stream (buffer-level copies via VectorUnloader,
    * no per-row work). This moves the row→columnar conversion — the
    * dominant cost — off the single driver thread. */
  def encodeDistributed(df: DataFrame, batchRows: Int = 4096): Array[Byte] = {
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.spark.sql.Encoders

    val sparkSchema = df.schema
    val chunks = df.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator(encodeRows(it, sparkSchema, batchRows))
    }(Encoders.BINARY).collect()

    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val out = new ByteArrayOutputStream()
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(out))
    MessageSerializer.serialize(ch, schema)
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      chunks.foreach { bytes =>
        val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
        try {
          val root = reader.getVectorSchemaRoot
          while (reader.loadNextBatch()) {
            val batch = new org.apache.arrow.vector.VectorUnloader(root).getRecordBatch
            try MessageSerializer.serialize(ch, batch)
            finally batch.close()
          }
        } finally reader.close()
      }
      org.apache.arrow.vector.ipc.ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
      out.toByteArray
    } finally alloc.close()
  }

  /** Encode an iterator of rows to a complete standalone IPC stream
    * (runs on executors; one chunk per partition). */
  private def encodeRows(it: Iterator[Row], sparkSchema: StructType,
      batchRows: Int): Array[Byte] = {
    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      while (it.hasNext) {
        var n = 0
        while (it.hasNext && n < batchRows) {
          val row = it.next()
          var c = 0
          while (c < sparkSchema.length) {
            setValue(root.getVector(c), sparkSchema(c).dataType, n, row.get(c))
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        root.allocateNew()
      }
      writer.end()
      out.toByteArray
    } finally { writer.close(); root.close(); alloc.close() }
  }

  private def setValue(v: FieldVector, dt: DataType, i: Int, value: Any): Unit = {
    if (value == null) { setNull(v, i); return }
    (v, dt) match {
      case (ts: TimeStampMicroTZVector, TimestampType) =>
        val t = value.asInstanceOf[java.sql.Timestamp]
        ts.setSafe(i, t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case (bv: BigIntVector, _) =>
        bv.setSafe(i, value.asInstanceOf[Number].longValue())
      case (fv: Float8Vector, _) =>
        fv.setSafe(i, value.asInstanceOf[Number].doubleValue())
      case (bb: BitVector, _) =>
        bb.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (dv: DecimalVector, _) =>
        dv.setSafe(i, value.asInstanceOf[java.math.BigDecimal]
          .setScale(dv.getScale))
      case (sv: VarCharVector, _) =>
        sv.setSafe(i, String.valueOf(value).getBytes("UTF-8"))
      case (other, _) =>
        throw new IllegalStateException(
          s"unsupported arrow vector ${other.getClass.getSimpleName}")
    }
  }

  private def setNull(v: FieldVector, i: Int): Unit = v match {
    case x: TimeStampMicroTZVector => x.setNull(i)
    case x: BigIntVector => x.setNull(i)
    case x: Float8Vector => x.setNull(i)
    case x: BitVector => x.setNull(i)
    case x: DecimalVector => x.setNull(i)
    case x: VarCharVector => x.setNull(i)
    case _ =>
  }
}
