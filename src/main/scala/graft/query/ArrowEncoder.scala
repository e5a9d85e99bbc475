package graft.query

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
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
      maxRows: Long = Long.MaxValue): Array[Byte] =
    encodeInternal(RowCodec.internalRows(RowCodec.capped(df, maxRows)),
      df.schema, batchRows, maxRows)

  /** Per-column setters resolved ONCE against the root's vectors — the
    * row loop then runs primitive reads straight from the internal row
    * into Arrow memory (no boxing, no per-value dispatch).
    * `root.allocateNew()` reuses vector instances, so the captured
    * references stay valid across batches. */
  private def setters(root: VectorSchemaRoot, schema: StructType)
      : Array[(InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, c) =>
      val fn: (InternalRow, Int) => Unit = (f.dataType, root.getVector(c)) match {
        case (TimestampType, v: TimeStampMicroTZVector) =>
          (r, i) => v.setSafe(i, r.getLong(c))
        case (LongType, v: BigIntVector) => (r, i) => v.setSafe(i, r.getLong(c))
        case (IntegerType, v: BigIntVector) => (r, i) => v.setSafe(i, r.getInt(c).toLong)
        case (ShortType, v: BigIntVector) => (r, i) => v.setSafe(i, r.getShort(c).toLong)
        case (ByteType, v: BigIntVector) => (r, i) => v.setSafe(i, r.getByte(c).toLong)
        case (DoubleType, v: Float8Vector) => (r, i) => v.setSafe(i, r.getDouble(c))
        case (FloatType, v: Float8Vector) => (r, i) => v.setSafe(i, r.getFloat(c).toDouble)
        case (BooleanType, v: BitVector) =>
          (r, i) => v.setSafe(i, if (r.getBoolean(c)) 1 else 0)
        case (d: DecimalType, v: DecimalVector) =>
          (r, i) => v.setSafe(i,
            r.getDecimal(c, d.precision, d.scale).toJavaBigDecimal.setScale(v.getScale))
        case (StringType, v: VarCharVector) =>
          (r, i) => v.setSafe(i, r.getUTF8String(c).getBytes)
        case (DateType, v: VarCharVector) => // internal rep is epoch-day Int
          (r, i) => v.setSafe(i, java.time.LocalDate
            .ofEpochDay(r.getInt(c).toLong).toString.getBytes("UTF-8"))
        case (dt, v: VarCharVector) => // stringified fallback (arrays etc.)
          (r, i) => v.setSafe(i, String.valueOf(r.get(c, dt)).getBytes("UTF-8"))
        case (dt, v) => throw new IllegalStateException(
          s"unsupported arrow mapping $dt -> ${v.getClass.getSimpleName}")
      }
      fn
    }

  /** Encode internal rows to a complete standalone IPC stream (shared by
    * the driver path and the per-partition executor path). */
  private def encodeInternal(it: Iterator[InternalRow], sparkSchema: StructType,
      batchRows: Int, maxRows: Long): Array[Byte] = {
    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      val set = setters(root, sparkSchema)
      val nCols = sparkSchema.length
      var total = 0L
      while (it.hasNext && total < maxRows) {
        var n = 0
        while (it.hasNext && n < batchRows && total < maxRows) {
          val row = it.next()
          var c = 0
          while (c < nCols) {
            if (row.isNullAt(c)) setNull(root.getVector(c), n)
            else set(c)(row, n)
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
    val out = new ByteArrayOutputStream()
    // one wave = one fully-parallel job; the whole result is resident on
    // the driver anyway since the caller wants a byte array
    writeStream(df, out, batchRows, wave = Int.MaxValue)
    out.toByteArray
  }

  /** Stream an Arrow IPC stream to `out` with bounded driver memory:
    * partitions encode IPC chunks on the executors; the driver fetches
    * them in waves of `wave` partitions (one job per wave, ≤wave chunks
    * resident) and re-frames the record batches into one stream —
    * buffer-level copies, no per-row work. Driver memory is
    * O(wave × chunk), independent of result size; the default wave
    * (defaultParallelism) keeps every core busy. Returns rows written. */
  def writeStream(df: DataFrame, out: java.io.OutputStream,
      batchRows: Int = 4096, wave: Int = 0): Long = {
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}
    import org.apache.arrow.vector.ipc.WriteChannel

    val sc = df.sparkSession.sparkContext
    val w =
      if (wave == Int.MaxValue) Int.MaxValue
      else if (wave > 0) wave
      else math.max(1, sc.defaultParallelism)
    val sparkSchema = df.schema
    val chunkRdd = df.queryExecution.toRdd.mapPartitions { it =>
      if (it.isEmpty) Iterator(Array.emptyByteArray)
      else Iterator(encodeInternal(it, sparkSchema, batchRows, Long.MaxValue))
    }

    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(out))
    MessageSerializer.serialize(ch, schema)
    val alloc = new RootAllocator(Long.MaxValue)
    var rows = 0L
    try {
      val nParts = chunkRdd.getNumPartitions
      var start = 0
      while (start < nParts) {
        val end = if (w >= nParts - start) nParts else start + w
        val res = sc.runJob(chunkRdd,
          (it: Iterator[Array[Byte]]) => it.next(), (start until end).toSeq)
        res.foreach { bytes =>
          if (bytes.length > 0) {
            val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
            try {
              val root = reader.getVectorSchemaRoot
              while (reader.loadNextBatch()) {
                rows += root.getRowCount
                val batch = new org.apache.arrow.vector.VectorUnloader(root).getRecordBatch
                try MessageSerializer.serialize(ch, batch)
                finally batch.close()
              }
            } finally reader.close()
          }
        }
        start = end
      }
      org.apache.arrow.vector.ipc.ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
      rows
    } finally alloc.close()
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
