package graft.examples

import graft.catalog.GraftCatalog
import graft.ingest._
import graft.query.{ArrowEncoder, MsgPackEncoder, QueryFacade}
import org.apache.spark.sql.SparkSession

/** Single-node throughput micro-benchmarks, comparable to the
  * reference's headline numbers (BASELINE.md): ingest decode rec/s and
  * result-stream rows/s per wire format.
  * Run: sbt "runMain graft.examples.ThroughputBench"
  */
object ThroughputBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One warm-up invocation (JIT + task-dispatch paths), then the best
    * of two timed runs — single cold measurements on a 32-thread JVM
    * swing ±50% from GC of the previous section's garbage. */
  private def bench[A](f: => A): (A, Double) = {
    f
    val (_, t1) = time(f)
    val (r, t2) = time(f)
    (r, math.min(t1, t2))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 2000000
    val base = 1717200000000000L

    // --- Line Protocol parse throughput
    val lpPayload = (0 until n).map(i =>
      s"cpu,host=server${i % 16} usage_idle=${90.0 + i % 10},usage_user=${i % 7} ${base + i}")
      .mkString("\n")
    // warm-up then measure
    LineProtocol.parse(lpPayload.substring(0, 1 << 20), "us")
    val (lpRes, lpSec) = bench(LineProtocol.parse(lpPayload, "us"))
    println(f"[tp] line_protocol_parse: ${n / lpSec / 1e6}%.2f M rec/s (${lpRes._1.length} pts, $lpSec%.2f s)")

    // --- MessagePack columnar decode throughput
    val packed = {
      val out = new java.io.ByteArrayOutputStream()
      val p = new graft.query.MsgPackEncoder.Packer(out)
      p.packMapHeader(2); p.packString("m"); p.packString("cpu")
      p.packString("columns"); p.packMapHeader(3)
      p.packString("time"); p.packArrayHeader(n)
      var i = 0; while (i < n) { p.packLong(base + i); i += 1 }
      p.packString("host"); p.packArrayHeader(n)
      i = 0; while (i < n) { p.packString("server" + (i % 16)); i += 1 }
      p.packString("value"); p.packArrayHeader(n)
      i = 0; while (i < n) { p.packDouble(i * 0.5); i += 1 }
      out.toByteArray
    }
    val (batches, mpSec) = bench(MsgPack.decodePayload(packed))
    println(f"[tp] msgpack_columnar_decode: ${n / mpSec / 1e6}%.2f M rec/s (${batches.head.rowCount} rows, $mpSec%.2f s)")

    // --- aggregate decode across concurrent connections. The reference's
    // 20.9M rec/s headline is the SUM over 12 concurrent writer
    // connections sending small batches (BASELINE.md "12 concurrent
    // workers, 1000-record batches"); the server analog is one decode
    // per request thread over request-sized payloads, so the live set
    // stays per-request-small.
    {
      val workers = 12
      val reqRows = 100000
      val reqPayload = {
        val out = new java.io.ByteArrayOutputStream()
        val p = new graft.query.MsgPackEncoder.Packer(out)
        p.packMapHeader(2); p.packString("m"); p.packString("cpu")
        p.packString("columns"); p.packMapHeader(3)
        p.packString("time"); p.packArrayHeader(reqRows)
        var i = 0; while (i < reqRows) { p.packLong(base + i); i += 1 }
        p.packString("host"); p.packArrayHeader(reqRows)
        i = 0; while (i < reqRows) { p.packString("server" + (i % 16)); i += 1 }
        p.packString("value"); p.packArrayHeader(reqRows)
        i = 0; while (i < reqRows) { p.packDouble(i * 0.5); i += 1 }
        out.toByteArray
      }
      val reqsPerWorker = 20
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      def decodeAll(): Unit = {
        val fs = (0 until workers).map(_ => pool.submit(new Runnable {
          def run(): Unit = {
            var r = 0
            while (r < reqsPerWorker) { MsgPack.decodePayload(reqPayload); r += 1 }
          }
        }))
        fs.foreach(_.get())
      }
      val (_, aggSec) = bench(decodeAll())
      pool.shutdown()
      val total = workers.toLong * reqsPerWorker * reqRows
      println(f"[tp] msgpack_decode_aggregate_${workers}w: ${total / aggSec / 1e6}%.2f M rec/s ($aggSec%.2f s)")
    }

    // --- hour-partitioned write throughput (single flush batch)
    val cat = new GraftCatalog(spark, java.nio.file.Files.createTempDirectory("tp").toString)
    val df = batches.head.toDataFrame(spark)
    val (_, wSec) = time(HourPartitionedWriter.write(cat, "default", "cpu", df))
    println(f"[tp] spark_partitioned_write: ${n / wSec / 1e6}%.2f M rows/s ($wSec%.2f s)")

    // --- direct (no Spark job) flush path — the ingest hot path
    val cat2 = new GraftCatalog(spark, java.nio.file.Files.createTempDirectory("tp2").toString)
    val (files, dSec) = time(DirectParquetWriter.write(cat2, "default", batches.head))
    println(f"[tp] direct_parquet_flush: ${n / dSec / 1e6}%.2f M rows/s (${files.length} files, $dSec%.2f s)")

    // --- aggregate flush across concurrent measurements: the server
    // runs one flush worker per (db, measurement) shard (reference
    // arrow_writer.go flush workers); disjoint output dirs, no
    // coordination, so node throughput = per-flush × workers until the
    // disk saturates.
    {
      val workers = 8
      val cat3 = new GraftCatalog(spark, java.nio.file.Files.createTempDirectory("tp3").toString)
      val shards = (0 until workers).map(i => batches.head.copy(measurement = s"cpu_$i"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      def flushAll(): Unit = {
        val fs = shards.map(b => pool.submit(new Runnable {
          def run(): Unit = { DirectParquetWriter.write(cat3, "default", b); () }
        }))
        fs.foreach(_.get())
      }
      val (_, fSec) = time(flushAll()) // once: repeat runs would re-write the same hours
      pool.shutdown()
      println(f"[tp] direct_flush_aggregate_${workers}w: ${workers.toLong * n / fSec / 1e6}%.2f M rows/s ($fSec%.2f s)")
    }

    // --- result-stream throughput per wire format (SELECT LIMIT 1M shape)
    cat.register("default", "cpu")
    val facade = new QueryFacade(spark)
    // persist: encoders must measure result MARSHALLING (the reference
    // encodes from its in-memory Arrow buffers), not query re-execution.
    // repartition(32): a LIMIT plan caches as ONE partition, which would
    // serialize the distributed encoders; a real big result is
    // multi-partition (one per scan split).
    val result = spark.sql("SELECT time, host, value FROM cpu LIMIT 1000000")
      .repartition(32).persist()
    result.count() // materialize the cache
    val (json, jSec) = bench(facade.toJsonEnvelope(result))
    println(f"[tp] result_json: ${1000000 / jSec / 1e6}%.2f M rows/s (${json.length / 1e6}%.1f MB, $jSec%.2f s)")
    // wire bytes (what an HTTP layer writes) — the String re-decode is a
    // client-side convenience, not part of the serving path
    val (jsonD, jdSec) = bench(facade.toJsonEnvelopeBytesDistributed(result, maxRows = 1000000, preserveOrder = false))
    println(f"[tp] result_json_distributed: ${1000000 / jdSec / 1e6}%.2f M rows/s (${jsonD.length / 1e6}%.1f MB, $jdSec%.2f s)")
    // streamed (bounded driver memory) variants: one wave of chunks
    // resident at a time — should track the distributed numbers
    final class CountingNull extends java.io.OutputStream {
      var count = 0L
      override def write(b: Int): Unit = count += 1
      override def write(bs: Array[Byte], off: Int, n: Int): Unit = count += n
    }
    val (jsBytes, jsSec) = bench {
      val o = new CountingNull; facade.writeJsonEnvelope(result, o); o.count
    }
    println(f"[tp] result_json_streamed: ${1000000 / jsSec / 1e6}%.2f M rows/s (${jsBytes / 1e6}%.1f MB, $jsSec%.2f s)")
    val (mp, mSec) = bench(MsgPackEncoder.encode(result))
    println(f"[tp] result_msgpack: ${1000000 / mSec / 1e6}%.2f M rows/s (${mp.length / 1e6}%.1f MB, $mSec%.2f s)")
    val (mpD, mdSec) = bench(MsgPackEncoder.encodeDistributed(result))
    println(f"[tp] result_msgpack_distributed: ${1000000 / mdSec / 1e6}%.2f M rows/s (${mpD.length / 1e6}%.1f MB, $mdSec%.2f s)")
    val (ar, aSec) = bench(ArrowEncoder.encode(result))
    println(f"[tp] result_arrow_ipc: ${1000000 / aSec / 1e6}%.2f M rows/s (${ar.length / 1e6}%.1f MB, $aSec%.2f s)")
    val (arD, adSec) = bench(ArrowEncoder.encodeDistributed(result))
    println(f"[tp] result_arrow_distributed: ${1000000 / adSec / 1e6}%.2f M rows/s (${arD.length / 1e6}%.1f MB, $adSec%.2f s)")
    val (asBytes, asSec) = bench {
      val o = new CountingNull; ArrowEncoder.writeStream(result, o); o.count
    }
    println(f"[tp] result_arrow_streamed: ${1000000 / asSec / 1e6}%.2f M rows/s (${asBytes / 1e6}%.1f MB, $asSec%.2f s)")

    spark.stop()
    println("TP OK")
  }
}
