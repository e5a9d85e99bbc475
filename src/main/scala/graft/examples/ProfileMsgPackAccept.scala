package graft.examples

import graft.ingest.MsgPack
import graft.query.MsgPackEncoder

import java.nio.charset.StandardCharsets.UTF_8

/** Stage-by-stage profile of the msgpack accept path (r9 verdict #7:
  * accept-only 8.31 M rec/s vs the reference's 20.9 M — find where the
  * time goes before optimizing blind).
  *
  * Stages, cumulative shape of `handleWriteMsgPack`:
  *   1. decode      — MsgPack.decodePayload (bytes -> ColumnarBatch)
  *   2. wal-async   — WAL append of the raw body, OS-cache sync
  *   3. wal-fsync   — WAL append with per-append fsync
  *   4. body-copy   — the readBody BAOS grow + toByteArray copy
  *
  * No SparkSession: the accept path never touches Spark (that is the
  * point of the buffer), so this isolates pure decode/journal cost.
  */
object ProfileMsgPackAccept {

  private def payload(batchRows: Int, b: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val p = new MsgPackEncoder.Packer(out)
    p.packMapHeader(2); p.packString("m"); p.packString("svc_mp")
    p.packString("columns"); p.packMapHeader(3)
    p.packString("time"); p.packArrayHeader(batchRows)
    var i = 0
    while (i < batchRows) {
      p.packLong(1717200000000000L + (b.toLong * batchRows + i) * 1000L); i += 1
    }
    p.packString("host"); p.packArrayHeader(batchRows)
    i = 0; while (i < batchRows) { p.packString("server" + (i % 16)); i += 1 }
    p.packString("value"); p.packArrayHeader(batchRows)
    i = 0; while (i < batchRows) { p.packDouble(i * 0.5); i += 1 }
    out.toByteArray
  }

  private def best(n: Int)(f: => Unit): Double = {
    f // warm
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val batchRows = 100000
    val nBatches = 24
    val total = batchRows.toLong * nBatches
    val bodies = (0 until nBatches).map(payload(batchRows, _))
    val mb = bodies.map(_.length.toLong).sum / 1e6

    // 1. decode only, single thread
    val dec1 = best(5) { bodies.foreach(b => MsgPack.decodePayload(b)) }
    println(f"[prof] decode_1thread: ${total / dec1 / 1e6}%.2f M rec/s ($dec1%.3f s, $mb%.0f MB)")

    // 1b. decode, 12 threads (the ServiceBench worker count)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    val dec12 = best(5) {
      bodies.map { b =>
        pool.submit(new Runnable { def run(): Unit = { MsgPack.decodePayload(b); () } })
      }.foreach(_.get())
    }
    println(f"[prof] decode_12thread: ${total / dec12 / 1e6}%.2f M rec/s ($dec12%.3f s)")

    // 2/3. WAL append of the raw body
    for ((label, mode) <- Seq("async" -> graft.ingest.Wal.SyncAsync,
                              "fsync" -> graft.ingest.Wal.SyncEvery)) {
      val dir = java.nio.file.Files.createTempDirectory(s"prof_wal_$label").toFile
      val w = new graft.ingest.Wal.Writer(dir, mode)
      val t = best(3) { bodies.foreach(b => w.append("default", b)) }
      println(f"[prof] wal_$label%s: ${total / t / 1e6}%.2f M rec/s ($t%.3f s)")
      w.close()
      dir.listFiles().foreach(_.delete()); dir.delete()
    }

    // 4. the readBody shape: BAOS growth from 8 KiB + final copy
    val grow = best(5) {
      bodies.foreach { b =>
        val out = new java.io.ByteArrayOutputStream(8192)
        var off = 0
        while (off < b.length) {
          val n = math.min(65536, b.length - off)
          out.write(b, off, n); off += n
        }
        out.toByteArray
      }
    }
    println(f"[prof] body_copy_grow8k: ${total / grow / 1e6}%.2f M rec/s ($grow%.3f s)")
    val sized = best(5) {
      bodies.foreach { b =>
        val out = new java.io.ByteArrayOutputStream(b.length)
        var off = 0
        while (off < b.length) {
          val n = math.min(65536, b.length - off)
          out.write(b, off, n); off += n
        }
        out.toByteArray
      }
    }
    println(f"[prof] body_copy_sized: ${total / sized / 1e6}%.2f M rec/s ($sized%.3f s)")

    // combined: decode + wal-async on 12 threads (the buffered accept
    // regime minus HTTP)
    val walDir = java.nio.file.Files.createTempDirectory("prof_wal_mix").toFile
    val w = new graft.ingest.Wal.Writer(walDir, graft.ingest.Wal.SyncAsync)
    val mix = best(3) {
      bodies.map { b =>
        pool.submit(new Runnable { def run(): Unit = {
          MsgPack.decodePayload(b); w.append("default", b); ()
        } })
      }.foreach(_.get())
    }
    println(f"[prof] decode+wal_async_12t: ${total / mix / 1e6}%.2f M rec/s ($mix%.3f s)")
    w.close()
    pool.shutdown()
    val _ = UTF_8
  }
}
