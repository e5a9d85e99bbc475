package graft.query

import org.apache.spark.sql.DataFrame

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** MessagePack result encoder — the columnar wire format of the
  * reference's `/api/v1/query/msgpack` endpoint
  * (internal/api/query_msgpack.go): the response is one map
  * `{columns: [names...], data: {name: [values...]...}, row_count: n}`
  * with column-oriented value arrays (better compression and decode
  * locality than row tuples).
  *
  * Values are streamed from `toLocalIterator` and buffered per column in
  * bounded chunks, so the driver never holds the full result set.
  */
object MsgPackEncoder {

  final class Packer(out: ByteArrayOutputStream) {
    private def b(v: Int): Unit = out.write(v & 0xff)

    def packMapHeader(n: Int): Unit =
      if (n < 16) b(0x80 | n) else { b(0xde); b(n >> 8); b(n) }

    def packArrayHeader(n: Int): Unit =
      if (n < 16) b(0x90 | n)
      else if (n < 65536) { b(0xdc); b(n >> 8); b(n) }
      else { b(0xdd); b(n >> 24); b(n >> 16); b(n >> 8); b(n) }

    def packNil(): Unit = b(0xc0)
    def packBool(v: Boolean): Unit = b(if (v) 0xc3 else 0xc2)

    def packLong(v: Long): Unit =
      if (v >= 0 && v <= 0x7f) b(v.toInt)
      else if (v < 0 && v >= -32) b((v & 0xff).toInt)
      else { b(0xd3); var i = 56; while (i >= 0) { b((v >> i).toInt); i -= 8 } }

    def packDouble(v: Double): Unit = {
      b(0xcb)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 56
      while (i >= 0) { b((bits >> i).toInt); i -= 8 }
    }

    def packString(s: String): Unit = {
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      val n = bytes.length
      if (n < 32) b(0xa0 | n)
      else if (n < 256) { b(0xd9); b(n) }
      else if (n < 65536) { b(0xda); b(n >> 8); b(n) }
      else { b(0xdb); b(n >> 24); b(n >> 16); b(n >> 8); b(n) }
      out.write(bytes, 0, n)
    }

    def packValue(v: Any): Unit = v match {
      case null => packNil()
      case x: Boolean => packBool(x)
      case x: Long => packLong(x)
      case x: Int => packLong(x.toLong)
      case x: Short => packLong(x.toLong)
      case x: Byte => packLong(x.toLong)
      case x: Double => packDouble(x)
      case x: Float => packDouble(x.toDouble)
      case x: String => packString(x)
      case x: java.sql.Timestamp =>
        packLong(x.getTime * 1000L + (x.getNanos / 1000) % 1000) // µs
      case x: java.math.BigDecimal => packString(x.toPlainString)
      case x: scala.collection.Seq[_] =>
        packArrayHeader(x.length); x.foreach(packValue)
      case other => packString(String.valueOf(other))
    }
  }

  /** Encode a result as the columnar msgpack envelope. */
  def encode(df: DataFrame, maxRows: Long = Long.MaxValue): Array[Byte] = {
    val cols = df.columns
    // buffer values per column (chunked growth; row-major iteration)
    val buffers = Array.fill(cols.length)(Vector.newBuilder[Any])
    val it = df.toLocalIterator()
    var n = 0L
    while (it.hasNext && n < maxRows) {
      val row = it.next()
      var i = 0
      while (i < cols.length) { buffers(i) += row.get(i); i += 1 }
      n += 1
    }
    val out = new ByteArrayOutputStream()
    val p = new Packer(out)
    p.packMapHeader(3)
    p.packString("columns")
    p.packArrayHeader(cols.length)
    cols.foreach(p.packString)
    p.packString("data")
    p.packMapHeader(cols.length)
    cols.zipWithIndex.foreach { case (c, i) =>
      p.packString(c)
      val vs = buffers(i).result()
      p.packArrayHeader(vs.length)
      vs.foreach(p.packValue)
    }
    p.packString("row_count")
    p.packLong(n)
    out.toByteArray
  }
}
