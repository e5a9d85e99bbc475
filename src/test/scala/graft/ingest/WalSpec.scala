package graft.ingest

import graft.SparkSpec
import graft.catalog.GraftCatalog

import java.io.File

/** WAL durability for the ingest hot path (reference internal/wal/):
  * framing round-trip, torn-tail tolerance, crash-replay through the
  * direct parquet writer, checkpoint truncation.
  */
class WalSpec extends SparkSpec {

  private val base = 1717200000000000L // 2024-06-01T00:00:00Z µs

  private def lpBytes(lines: String): Array[Byte] = lines.getBytes("UTF-8")

  test("append/readAll round-trips entries across rotated segments") {
    val dir = new File(tmpDir("wal_rt"))
    val w = new Wal.Writer(dir, Wal.SyncEvery, maxSegmentBytes = 256)
    (0 until 10).foreach { i => w.append("db" + (i % 2), Array.fill(64)(i.toByte)) }
    w.close()
    val entries = Wal.readAll(dir)
    assert(entries.length == 10)
    assert(entries.map(_.db).distinct.sorted == Seq("db0", "db1"))
    assert(entries.zipWithIndex.forall { case (e, i) =>
      e.body.length == 64 && e.body(0) == i.toByte
    }, "entries must come back in append order")
    assert(dir.listFiles().count(_.getName.endsWith(".log")) > 1, "expected rotation")
  }

  test("torn tail: entries before the torn frame survive, tail is dropped") {
    val dir = new File(tmpDir("wal_torn"))
    val w = new Wal.Writer(dir, Wal.SyncEvery, maxSegmentBytes = Long.MaxValue)
    (0 until 5).foreach { i => w.append("d", Array.fill(100)(i.toByte)) }
    w.close()
    val seg = dir.listFiles().filter(_.getName.endsWith(".log")).head
    // tear the file mid-way through the last entry
    val raf = new java.io.RandomAccessFile(seg, "rw")
    raf.setLength(raf.length() - 50)
    raf.close()
    val entries = Wal.readAll(dir)
    assert(entries.length == 4, s"got ${entries.length}")
  }

  test("crash before flush: next ingester replays WAL into parquet") {
    val root = tmpDir("wal_crash_cat")
    val walDir = new File(tmpDir("wal_crash"))
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    assert(ing.recoveredRows == 0)
    val n = ing.accept("default", lpBytes(
      s"""cpu,host=a v=1.0 ${base * 1000L}
         |cpu,host=b v=2.0 ${(base + 5) * 1000L}""".stripMargin))
    assert(n == 2)
    // crash: no flush(), no close() — data exists ONLY in the WAL
    intercept[IllegalArgumentException] { cat.table("default", "cpu") }

    val ing2 = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    assert(ing2.recoveredRows == 2)
    val df = cat.table("default", "cpu")
    assert(df.count() == 2)
    assert(df.where(org.apache.spark.sql.functions.col("host") === "b")
      .head().getAs[Double]("v") == 2.0)
    ing2.close()
  }

  test("fsync failure retracts the buffered rows: no phantom write") {
    val root = tmpDir("wal_fsfail_cat")
    val walDir = new File(tmpDir("wal_fsfail"))
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    // a successful accept first, so the retraction must be SELECTIVE —
    // only the failed request's batches leave the buffer
    assert(ing.accept("default", lpBytes(
      s"cpu,host=ok v=1.0 ${base * 1000L}")) == 1)
    ing.walWriter.failNextSync = true
    intercept[java.io.IOException] {
      ing.accept("default", lpBytes(
        s"cpu,host=ghost v=9.0 ${(base + 5) * 1000L}"))
    }
    // the failed write's rows must NOT flush to parquet later: the
    // client saw an error, so durably materializing them would be a
    // phantom write (and a duplicate on client retry)
    assert(ing.pendingRows == 1, "only the acknowledged row may remain")
    ing.flush()
    val df = cat.table("default", "cpu")
    assert(df.count() == 1)
    assert(df.head().getAs[String]("host") == "ok")
    ing.close()
  }

  test("abort truncates a tail entry: replay never sees it") {
    val dir = new File(tmpDir("wal_abort_tail"))
    val w = new Wal.Writer(dir)
    w.append("d", Array[Byte](1, 1))
    val pos = w.write("d", Array[Byte](2, 2)) // written, sync 'failed'
    w.abort(pos)
    w.append("d", Array[Byte](3, 3)) // writer keeps working after truncate
    w.close()
    val got = Wal.readAll(dir).map(_.body(0))
    assert(got == Seq(1, 3), s"aborted entry must be gone, got $got")
  }

  test("abort marks a non-tail entry: replay skips exactly it") {
    val dir = new File(tmpDir("wal_abort_mark"))
    val w = new Wal.Writer(dir)
    val pos = w.write("d", Array[Byte](1, 1))
    w.append("d", Array[Byte](2, 2)) // a later append — truncate unsafe
    w.abort(pos)
    w.close()
    val got = Wal.readAll(dir).map(_.body(0))
    assert(got == Seq(2), s"only the aborted entry may be skipped, got $got")
  }

  test("abort after rotation: marker in a later segment retracts the old entry") {
    val dir = new File(tmpDir("wal_abort_rot"))
    val w = new Wal.Writer(dir, Wal.SyncEvery, maxSegmentBytes = 128)
    val pos = w.write("d", Array.fill(64)(7.toByte)) // rotates the segment
    w.append("d", Array.fill(64)(8.toByte))
    w.abort(pos) // different segment now -> abort-marker path
    w.close()
    assert(dir.listFiles().count(_.getName.endsWith(".log")) > 1)
    val got = Wal.readAll(dir).map(_.body(0))
    assert(got == Seq(8), s"rotated-away entry must still be retracted, got $got")
  }

  test("malformed abort markers are ignored, never crash recovery") {
    val dir = new File(tmpDir("wal_abort_bad"))
    val w = new Wal.Writer(dir)
    w.append("d", Array[Byte](1, 1))
    // CRC-valid abort frames with pathological bodies: empty offset,
    // over-Long digits, no separator — recovery must keep the data and
    // keep STARTING (a throw here would permanently fail the server's
    // constructor-time replay until the WAL is hand-deleted)
    for (bad <- Seq("seg:", "seg:92233720368547758080", "nocolon", ""))
      w.abortMarkerForTest(bad)
    w.close()
    val got = Wal.readAll(dir).map(_.body(0))
    assert(got == Seq(1), s"data must survive malformed aborts, got $got")
  }

  test("fsync failure: crash-restart replay does not resurrect the rejected write") {
    val root = tmpDir("wal_fsfail_restart_cat")
    val walDir = new File(tmpDir("wal_fsfail_restart"))
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    assert(ing.accept("default", lpBytes(
      s"cpu,host=ok v=1.0 ${base * 1000L}")) == 1)
    ing.walWriter.failNextSync = true
    intercept[java.io.IOException] {
      ing.accept("default", lpBytes(
        s"cpu,host=ghost v=9.0 ${(base + 5) * 1000L}"))
    }
    // crash WITHOUT flushing: the live-process buffer retraction is
    // irrelevant now — only the WAL decides what a restart replays.
    // The rejected entry was written before its fsync failed; without
    // the abort retraction, replay would durably materialize it.
    val ing2 = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    assert(ing2.recoveredRows == 1, "only the acknowledged row may replay")
    val df = cat.table("default", "cpu")
    assert(df.count() == 1)
    assert(df.head().getAs[String]("host") == "ok")
    ing2.close()
    ing.close()
  }

  test("checkpoint after flush: nothing to replay, no duplicates") {
    val root = tmpDir("wal_ckpt_cat")
    val walDir = new File(tmpDir("wal_ckpt"))
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    ing.accept("default", lpBytes(s"m,host=a v=1.0 ${base * 1000L}"))
    ing.flush()
    // post-flush "crash": WAL was checkpointed, so replay finds nothing
    val ing2 = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    assert(ing2.recoveredRows == 0)
    assert(cat.table("default", "m").count() == 1) // exactly once
    ing2.close()
  }

  test("flush failure re-buffers acknowledged rows; retry lands them exactly once") {
    val root = tmpDir("wal_reflush_cat")
    val walDir = new File(tmpDir("wal_reflush"))
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, flushRows = Int.MaxValue)
    // transient failure injection: a plain FILE squats on the
    // measurement's directory path, so the parquet write's mkdirs fails
    // (the soak's real-world version: retention deleting an hour dir
    // mid-write). The old flush dropped the swapped batches on error —
    // acknowledged rows vanished until a restart replayed the WAL.
    val block = new File(root, "default/blocked")
    block.getParentFile.mkdirs()
    assert(block.createNewFile())
    ing.accept("default", lpBytes(s"blocked,host=a v=1.0 ${base * 1000L}"))
    intercept[Exception] { ing.flush() }
    assert(ing.pendingRows == 1, "failed batch must be re-buffered, not lost")
    // the covering WAL segment must survive for crash replay
    assert(walDir.listFiles().exists(_.length() > 0), "WAL segment purged early")
    assert(block.delete())
    ing.flush() // transient cleared: the retry lands the batch
    assert(ing.pendingRows == 0)
    assert(cat.table("default", "blocked").count() == 1, "exactly once")
    ing.close()
  }

  test("concurrent accepts racing flushes: exactly-once, no row lost to a seal") {
    // journal buffers under the ingester lock but fsyncs outside it —
    // this hammers the window where a flush's seal() could race an
    // accept whose sync hasn't returned (the group-commit split)
    val root = tmpDir("wal_race_cat")
    val walDir = java.nio.file.Files.createTempDirectory("wal_race").toFile
    val cat = new GraftCatalog(spark, root)
    val ing = new DurableIngester(cat, walDir, Wal.SyncEvery, flushRows = 50)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val perThread = 25
    val accepted = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = (0 until 8).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until perThread).foreach { i =>
          val ts = base + (t.toLong * perThread + i) * 1000000L
          ing.accept("default", lpBytes(s"race,host=h$t v=${i}i ${ts * 1000L}"))
          accepted.incrementAndGet()
          if (i % 7 == 0) ing.flush() // flushes interleave with accepts
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    ing.flush()
    assert(accepted.get() == 200L)
    assert(cat.table("default", "race").count() == 200L,
      "every accepted row must be visible exactly once after quiesce")
    ing.close()
    // nothing left to replay: a fresh ingester recovers zero rows
    val ing2 = new DurableIngester(cat, walDir, Wal.SyncEvery)
    assert(ing2.recoveredRows == 0L, "checkpoint must have purged covered segments")
    assert(cat.table("default", "race").count() == 200L)
    ing2.close()
  }

  test("group-committed concurrent appends all survive a readAll, across rotations") {
    val dir = java.nio.file.Files.createTempDirectory("wal_group").toFile
    // tiny segment cap forces rotations WHILE group syncs race them
    val w = new Wal.Writer(dir, Wal.SyncEvery, maxSegmentBytes = 64 * 1024)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val perThread = 50
    val tasks = (0 until 8).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until perThread).foreach { i =>
          w.append("db" + (t % 3), Array.fill(512 + i)((t * 31 + i).toByte))
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    w.close()
    val entries = Wal.readAll(dir)
    assert(entries.length == 8 * perThread,
      s"every group-committed append must be intact, got ${entries.length}")
    assert(entries.map(_.db).toSet == Set("db0", "db1", "db2"))
    assert(dir.listFiles().count(_.getName.endsWith(".log")) > 1,
      "the segment cap must have forced at least one rotation")
  }

  test("BatchCodec round-trips string values past the 64 KiB writeUTF cap") {
    // writeUTF throws UTFDataFormatException at 65536+ encoded bytes —
    // a large LP string field must survive the buffered path (r8 advice)
    val big = "x" * 200000
    val multi = "é" * 40000 // 80 KB as UTF-8, 40k chars
    val batch = ColumnarBatch("m",
      scala.collection.mutable.LinkedHashMap[String, Array[Any]](
        "time" -> Array[Any](java.lang.Long.valueOf(base)),
        "s" -> Array[Any](big),
        "u" -> Array[Any](multi)),
      Seq.empty, dedupTime = false)
    val decoded = BatchCodec.decode(BatchCodec.encode(Seq(batch)))
    assert(decoded.length == 1)
    assert(decoded.head.columns("s")(0) == big)
    assert(decoded.head.columns("u")(0) == multi)
  }

  test("BatchCodec decodes version-1 (writeUTF) frames from a pre-upgrade WAL") {
    // r9 advice: the string-framing change bumped the magic to 0xC2; a
    // segment written by the previous build (0xC1, writeUTF values)
    // must still replay instead of failing server startup mid-upgrade.
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(BatchCodec.MagicV1)
    out.writeInt(1) // one batch
    out.writeUTF("m1"); out.writeBoolean(true)
    out.writeInt(1); out.writeUTF("host") // one tag column
    out.writeInt(2); out.writeInt(2)      // two cols, two rows
    out.writeUTF("time")
    out.writeByte(1); out.writeLong(base)
    out.writeByte(1); out.writeLong(base + 1)
    out.writeUTF("s")
    out.writeByte(3); out.writeUTF("old-frame")
    out.writeByte(0) // null
    out.flush()
    val decoded = BatchCodec.decode(bos.toByteArray)
    assert(decoded.length == 1)
    val b = decoded.head
    assert(b.measurement == "m1" && b.dedupTime && b.tagColumns == Seq("host"))
    assert(b.columns("s")(0) == "old-frame" && b.columns("s")(1) == null)
    assert(b.columns("time")(0) == java.lang.Long.valueOf(base))
    // and the current encoder stamps the new magic
    assert(BatchCodec.encode(decoded)(0) == BatchCodec.Magic)
  }
}
