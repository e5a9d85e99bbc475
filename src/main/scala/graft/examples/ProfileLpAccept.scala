package graft.examples

import graft.ingest.{ColumnarBatch, LineProtocol, Wal}

import java.nio.charset.StandardCharsets.UTF_8

/** Stage-by-stage profile of the LINE-PROTOCOL accept path (round-12
  * verdict #3: the one BASELINE row still >2× under the reference —
  * 5.4 M rec/s, 12 workers — is blamed on the serving VM; prove the
  * PARSER path itself clears the target the way ProfileMsgPackAccept
  * proved the msgpack decoder at 8× headroom).
  *
  * Stages, cumulative shape of `handleWriteLp` minus the HTTP socket:
  *   1. parse        — LineProtocol.parse (text → points)
  *   2. + pivot      — ColumnarBatch.fromPoints (points → columnar)
  *   3. + wal-async  — WAL append of the raw body, OS-cache sync
  *
  * No SparkSession: the buffered accept path never touches Spark.
  * The same batch shape as ServiceBench/BASELINE (12 workers ×
  * 100k-line bodies, 2 fields + 1 tag per line).
  *
  * Run: sbt "runMain graft.examples.ProfileLpAccept"
  */
object ProfileLpAccept {

  private def body(b: Int, rows: Int): String = {
    val base0 = 1717200000000000000L
    val sb = new java.lang.StringBuilder(rows * 64)
    var i = 0
    while (i < rows) {
      val t = base0 + (b.toLong * rows + i) * 1000L
      sb.append("svc_cpu,host=server").append(i % 16)
        .append(" usage_idle=").append(90.0 + i % 10)
        .append(",usage_user=").append(i % 7)
        .append(' ').append(t).append('\n')
      i += 1
    }
    sb.toString
  }

  private def best(n: Int)(f: => Unit): Double = {
    f // warm
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val rows = 100000
    val nBatches = 24
    val total = rows.toLong * nBatches
    val bodies = (0 until nBatches).map(body(_, rows))
    val mb = bodies.map(_.length.toLong).sum / 1e6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)

    def on12(f: String => Unit): Unit = {
      val futs = bodies.map(b => pool.submit(new Runnable {
        def run(): Unit = f(b)
      }))
      futs.foreach(_.get())
    }

    // 1. parse only
    val p1 = best(5) { bodies.foreach(b => LineProtocol.parse(b, "ns")) }
    println(f"[prof] lp_parse_1thread: ${total / p1 / 1e6}%.2f M rec/s ($p1%.3f s, $mb%.0f MB)")
    val p12 = best(5) { on12 { b => LineProtocol.parse(b, "ns"); () } }
    println(f"[prof] lp_parse_12thread: ${total / p12 / 1e6}%.2f M rec/s ($p12%.3f s)")

    // 2. parse + columnar pivot (the full in-memory accept transform)
    val v12 = best(5) { on12 { b =>
      val (pts, errs) = LineProtocol.parse(b, "ns")
      require(errs.isEmpty)
      ColumnarBatch.fromPoints(pts); ()
    } }
    println(f"[prof] lp_parse_pivot_12thread: ${total / v12 / 1e6}%.2f M rec/s ($v12%.3f s)")

    // 3. + WAL append (async sync mode), tmpfs when available
    val walBase = new java.io.File(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else
        sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val walDir = java.nio.file.Files
      .createTempDirectory(walBase.toPath, "lp_prof_wal").toFile
    val w = new Wal.Writer(walDir, syncMode = Wal.SyncAsync)
    val raw = bodies.map(_.getBytes(UTF_8))
    // WAL appends are serialized by the writer monitor — measure them on
    // the workers the way the server path pays them (append happens on
    // the request thread)
    val w12 = best(3) {
      val futs = raw.map(r => pool.submit(new Runnable {
        def run(): Unit = {
          val (pts, errs) = LineProtocol.parse(new String(r, UTF_8), "ns")
          require(errs.isEmpty)
          ColumnarBatch.fromPoints(pts)
          w.append("default", r)
          ()
        }
      }))
      futs.foreach(_.get())
    }
    println(f"[prof] lp_parse_pivot_wal12: ${total / w12 / 1e6}%.2f M rec/s ($w12%.3f s)")
    w.close()
    println(f"[prof] reference targets: 5.4 M rec/s end-to-end HTTP (12 workers)")
    pool.shutdown()
  }
}
