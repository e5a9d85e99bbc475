package graft.query

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.ingest.{ColumnarBatch, HourPartitionedWriter, LineProtocol}
import graft.jobs.Tiering

class QueryFacadeSpec extends SparkSpec {

  private def facade = new QueryFacade(spark)

  test("JSON envelope matches the reference wire shape") {
    val f = facade
    val df = spark.sql("SELECT 1 AS a, 'x\"y' AS b, CAST(2.5 AS DOUBLE) AS c")
    val json = f.toJsonEnvelope(df)
    assert(json.startsWith("""{"columns":["a","b","c"],"data":[[1,"x\"y",2.5]],"row_count":1"""))
    assert(json.contains("\"execution_time_ms\":"))
    // must be valid JSON for any client
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("distributed JSON envelope matches the streamed one") {
    val f = facade
    val df = spark.sql(
      "SELECT id AS k, CONCAT('v', id) AS s FROM range(50) ORDER BY k")
    val a = f.toJsonEnvelope(df)
    val b = f.toJsonEnvelopeDistributed(df, maxRows = 1000)
    def stripTime(j: String) = j.replaceAll("\"execution_time_ms\":[0-9.]+", "")
    assert(stripTime(a) == stripTime(b))
    val capped = f.toJsonEnvelopeDistributed(df, maxRows = 5)
    assert(capped.contains("\"row_count\":5"))
  }

  test("row cap truncates the stream") {
    val f = facade
    val json = f.toJsonEnvelope(spark.range(100).toDF("id"), maxRows = 7)
    assert(json.contains("\"row_count\":7"))
  }

  test("streamed JSON envelope: wave-bounded fetch, same bytes as distributed") {
    val f = facade
    val df = spark.sql(
      "SELECT id AS k, CONCAT('v', id) AS s FROM range(2000)").repartition(7).persist()
    try {
      df.count()
      // wave=2 over 7 partitions → 4 jobs: at most 2 encoded chunks are
      // ever resident on the driver, so memory is O(wave × chunk) no
      // matter how large the result — the uncapped-SELECT path
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      val out = new java.io.ByteArrayOutputStream()
      val rows =
        try f.writeJsonEnvelope(df, out, wave = 2)
        finally {
          // listener delivery is async — settle before reading the count
          Thread.sleep(500)
          spark.sparkContext.removeSparkListener(listener)
        }
      assert(rows == 2000)
      assert(jobs.get() == 4, s"expected 4 wave jobs, saw ${jobs.get()}")
      val streamed = out.toString("UTF-8")
      val collected = f.toJsonEnvelopeDistributed(df, maxRows = 1000000)
      def stripTime(j: String) = j.replaceAll("\"execution_time_ms\":[0-9.]+", "")
      assert(stripTime(streamed) == stripTime(collected))
    } finally df.unpersist()
  }

  test("estimate wraps the query in COUNT(*), reference warning ladder") {
    val f = facade
    val (n, warn, msg) = f.estimate("SELECT * FROM range(1234)")
    assert(n == 1234 && warn == "none" && msg.contains("1234"))
    val (n2, warn2, _) = f.estimate("SELECT * FROM range(20000)")
    assert(n2 == 20000 && warn2 == "low")
    val (n3, warn3, _) = f.estimate("SELECT * FROM range(2000000)")
    assert(n3 == 2000000 && warn3 == "high")
  }

  test("SHOW DATABASES / SHOW TABLES intercepted as storage listings") {
    val cat = new graft.catalog.GraftCatalog(spark, tmpDir("show"))
    val (pts, _) = graft.ingest.LineProtocol.parse("m1,host=a v=1.0 1717200000000000", "us")
    graft.ingest.ColumnarBatch.fromPoints(pts)
      .foreach(graft.ingest.HourPartitionedWriter.ingest(cat, "default", _))
    val f = facade
    assert(f.sqlWithShow("SHOW DATABASES", cat)
      .collect().map(_.getString(0)).toSeq == Seq("default"))
    assert(f.sqlWithShow("show tables from default", cat)
      .collect().map(_.getString(0)).toSeq == Seq("m1"))
    assert(f.sqlWithShow("SELECT 41 + 1 AS v", cat).head().getInt(0) == 42)
  }

  test("decimal table config casts columns at write time") {
    val cat = new graft.catalog.GraftCatalog(spark, tmpDir("dec"))
    cat.writeMeta("default", "trades", graft.catalog.TableMeta(
      decimals = Map("price" -> (18, 8))))
    val (pts, _) = graft.ingest.LineProtocol.parse(
      "trades,sym=X price=123.456 1717200000000000", "us")
    graft.ingest.ColumnarBatch.fromPoints(pts)
      .foreach(graft.ingest.HourPartitionedWriter.ingest(cat, "default", _))
    val schema = cat.table("default", "trades").schema
    assert(schema("price").dataType.simpleString == "decimal(18,8)")
  }

  test("submit/cancel registry tracks job groups") {
    val f = facade
    val (id, _) = f.submit("SELECT 1")
    assert(f.activeQueries.contains(id))
    assert(f.cancel(id))
    assert(!f.cancel(id)) // already gone
  }

  test("slow-query ledger: threshold gates, ring records sql+ms+rows, count grows") {
    val f = facade
    // disabled (default 0): nothing records
    val (id0, df0) = f.submit("SELECT 1 AS a")
    df0.collect()
    f.complete(id0, rows = 1)
    assert(f.slowQueryCount == 0 && f.slowQueries.isEmpty)
    // default-off is reference parity (config.go:1467); the documented
    // enable path is the recommended constant from its example config
    assert(f.slowQueryThresholdMs == 0L)
    assert(QueryFacade.RecommendedSlowQueryThresholdMs == 1000L)
    // 1ns-equivalent threshold: any completed query is slow
    f.slowQueryThresholdMs = 1
    val (id1, df1) = f.submit("SELECT COUNT(*) AS n FROM range(1000000)")
    val n = df1.head.getLong(0)
    f.complete(id1, rows = 1)
    assert(n == 1000000L)
    assert(f.slowQueryCount == 1)
    val sq = f.slowQueries.last
    assert(sq.sql.contains("range(1000000)") && sq.ms >= 1 && sq.rows == 1)
    // a fast completion under a high threshold does not record
    f.slowQueryThresholdMs = 60000
    val (id2, _) = f.submit("SELECT 2")
    f.complete(id2)
    assert(f.slowQueryCount == 1)
    f.slowQueryThresholdMs = 0
  }
}

class MsgPackEncoderSpec extends SparkSpec {
  test("columnar envelope round-trips through the ingest decoder") {
    val df = spark.sql(
      "SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v, CONCAT('s', id) AS s FROM range(5)")
    val bytes = MsgPackEncoder.encode(df)
    val decoded = graft.ingest.MsgPack.decode(bytes)
      .asInstanceOf[Map[String, Any]]
    assert(decoded("columns") == Vector("k", "v", "s"))
    assert(decoded("row_count") == 5L)
    val data = decoded("data").asInstanceOf[Map[String, Any]]
    assert(data("k") == Vector(0L, 1L, 2L, 3L, 4L))
    assert(data("v") == Vector(0.0, 1.5, 3.0, 4.5, 6.0))
    assert(data("s") == Vector("s0", "s1", "s2", "s3", "s4"))
  }

  test("row cap limits encoded rows") {
    val bytes = MsgPackEncoder.encode(spark.range(100).toDF("id"), maxRows = 3)
    val decoded = graft.ingest.MsgPack.decode(bytes).asInstanceOf[Map[String, Any]]
    assert(decoded("row_count") == 3L)
  }

  test("distributed encode is byte-identical to the driver-side encode") {
    val df = spark.sql(
      """SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v, CONCAT('s', id) AS s,
        |  CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS n
        |FROM range(1000)""".stripMargin)
      .repartition(7).persist()
    try {
      df.count() // pin partition contents so both encodes see the same order
      val a = MsgPackEncoder.encode(df)
      val b = MsgPackEncoder.encodeDistributed(df)
      assert(java.util.Arrays.equals(a, b))
    } finally df.unpersist()
  }

  test("distributed encode honors the row cap") {
    val decoded = graft.ingest.MsgPack.decode(
      MsgPackEncoder.encodeDistributed(spark.range(100).toDF("id"), maxRows = 9))
      .asInstanceOf[Map[String, Any]]
    assert(decoded("row_count") == 9L)
  }

  test("spool-streamed encode is byte-identical to the driver-side encode") {
    val df = spark.sql(
      """SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v, CONCAT('s', id) AS s,
        |  CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS n
        |FROM range(1000)""".stripMargin)
      .repartition(7).persist()
    try {
      df.count() // pin partition contents so both encodes see the same order
      val a = MsgPackEncoder.encode(df)
      val out = new java.io.ByteArrayOutputStream()
      // wave=2 forces multiple spool waves over the 7 partitions — the
      // bounded-memory path, not a one-wave degenerate case
      val rows = MsgPackEncoder.writeStream(df, out, wave = 2)
      assert(rows == 1000L)
      assert(java.util.Arrays.equals(a, out.toByteArray))
    } finally df.unpersist()
  }

  test("spool-streamed encode honors the row cap and cleans its spool") {
    val before = listSpools()
    val out = new java.io.ByteArrayOutputStream()
    MsgPackEncoder.writeStream(spark.range(100).toDF("id"), out, maxRows = 9)
    val decoded = graft.ingest.MsgPack.decode(out.toByteArray)
      .asInstanceOf[Map[String, Any]]
    assert(decoded("row_count") == 9L)
    assert(listSpools() == before, "spool dir leaked")
  }

  private def listSpools(): Set[String] = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("graft_msgpack_spool")).toSet
    finally s.close()
  }
}

class ArrowEncoderSpec extends SparkSpec {
  test("arrow IPC stream round-trips rows and types") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val df = spark.sql(
      """SELECT id AS k, CAST(id * 0.5 AS DOUBLE) AS v, CONCAT('n', id) AS s,
        |  id % 2 = 0 AS flag, TIMESTAMP '2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS t
        |FROM range(10)""".stripMargin)
    val bytes = ArrowEncoder.encode(df, batchRows = 4)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 5)
      var rows = 0L
      var sumK = 0L
      while (reader.loadNextBatch()) {
        val kVec = root.getVector("k").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        for (i <- 0 until root.getRowCount) sumK += kVec.get(i)
        rows += root.getRowCount
      }
      assert(rows == 10 && sumK == 45)
    } finally { reader.close(); alloc.close() }
  }

  test("distributed arrow encode stitches partition chunks into one stream") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val df = spark.range(1000).toDF("id").repartition(7)
    val bytes = ArrowEncoder.encodeDistributed(df, batchRows = 100)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      var rows = 0L
      var sum = 0L
      while (reader.loadNextBatch()) {
        val v = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        for (i <- 0 until root.getRowCount) sum += v.get(i)
        rows += root.getRowCount
      }
      assert(rows == 1000 && sum == 499500)
    } finally { reader.close(); alloc.close() }
  }

  test("streamed arrow write: byte-identical to distributed, wave-bounded") {
    val df = spark.range(1000).toDF("id").repartition(5).persist()
    try {
      df.count()
      val full = ArrowEncoder.encodeDistributed(df, batchRows = 100)
      val out = new java.io.ByteArrayOutputStream()
      val rows = ArrowEncoder.writeStream(df, out, batchRows = 100, wave = 2)
      assert(rows == 1000)
      assert(java.util.Arrays.equals(full, out.toByteArray))
    } finally df.unpersist()
  }

  test("row cap limits arrow rows") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val bytes = ArrowEncoder.encode(spark.range(100).toDF("id"), maxRows = 5)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      var rows = 0
      while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
      assert(rows == 5)
    } finally { reader.close(); alloc.close() }
  }
}

class TieringSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = 1717200000000000L

  test("old partitions migrate to cold root; union read sees both tiers") {
    val cat = new GraftCatalog(spark, tmpDir("hot"))
    val cold = tmpDir("cold")
    val now = base + 10L * 24 * H
    val lp = s"""m,host=a v=1.0 $base
                |m,host=b v=2.0 ${now - H}""".stripMargin
    val (pts, _) = LineProtocol.parse(lp, "us")
    ColumnarBatch.fromPoints(pts).foreach(HourPartitionedWriter.ingest(cat, "default", _))

    val res = Tiering.migrate(cat, cold, "default", "m", afterDays = 7,
      nowMicros = () => now)
    assert(res.migrated.length == 1 && res.kept == 1)
    // hot tier lost the old partition, cold gained it
    assert(cat.listHourPartitions("default", "m").length == 1)
    val both = Tiering.table(cat, cold, "default", "m")
    assert(both.count() == 2)
    assert(both.select("v").collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 2.0))
  }
}
