package graft.server

import graft.SparkSpec

/** Pins the serving-under-maintenance contract: a session with
  * `spark.sql.files.ignoreMissingFiles=true` must tolerate files that a
  * registered view's snapshot still lists but compaction/retention has
  * already deleted (transiently returning fewer rows, never failing).
  */
class MissingFileToleranceSpec extends SparkSpec {

  test("HTTP queries tolerate files deleted after view registration") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val root = tmpDir("imf_http")
    val server = new HttpServer(spark, root)
    val base = s"http://127.0.0.1:${server.start()}"
    val client = HttpClient.newHttpClient()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def post(path: String, body: String): HttpResponse[Array[Byte]] =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
    try {
      // two flushes = two parquet files in one hour partition
      val lp1 = (0 until 50).map(i =>
        s"imfm,host=h$i v=${i}i ${1700000000000000000L + i * 1000000L}").mkString("\n")
      val lp2 = (50 until 100).map(i =>
        s"imfm,host=h$i v=${i}i ${1700000000000000000L + i * 1000000L}").mkString("\n")
      assert(post("/write?db=default&precision=ns", lp1).statusCode() == 204)
      assert(post("/write?db=default&precision=ns", lp2).statusCode() == 204)
      val r1 = post("/api/v1/query", """{"sql":"SELECT count(*) AS n FROM imfm"}""")
      assert(mapper.readTree(r1.body()).get("data").get(0).get(0).asLong() == 100L)
      // delete one file out from under the REGISTERED view (no
      // invalidation — exactly what compaction/retention do mid-swap)
      val hourDir = new java.io.File(s"$root/default/imfm")
      def parquets(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) parquets(f)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil)
      val files = parquets(hourDir)
      assert(files.size >= 2, s"expected >=2 files, got ${files.size}")
      assert(files.head.delete())
      // every wire shape must keep succeeding (transiently fewer rows)
      val r2 = post("/api/v1/query", """{"sql":"SELECT count(*) AS n FROM imfm"}""")
      assert(r2.statusCode() == 200, new String(r2.body()).take(300))
      val env2 = mapper.readTree(r2.body()) // full parse: truncation = failure
      assert(env2.has("success") && env2.get("success").asBoolean(),
        new String(r2.body()).take(300))
      assert(env2.get("data").get(0).get(0).asLong() < 100L)
      // same statement, same session, direct from this thread — isolates
      // HTTP-pool thread-local conf state from session conf
      val direct = server.dbSession("default")
        .sql("SELECT * FROM `imfm` ORDER BY `time` LIMIT 10").collect()
      assert(direct.length == 10)
      val r3 = client.send(HttpRequest.newBuilder(URI.create(
        base + "/api/v1/query/imfm?limit=10&order_by=time")).GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(r3.statusCode() == 200, new String(r3.body()).take(200))
      val env3 = mapper.readTree(r3.body())
      assert(env3 != null && env3.has("success"), "GET returned empty/truncated body")
      assert(env3.get("success").asBoolean())
      assert(env3.get("row_count").asInt() == 10)
    } finally server.stop()
  }

  test("a view over vanished files skips them instead of failing") {
    val dir = tmpDir("imf")
    spark.range(10).coalesce(1).write.parquet(s"$dir/a")
    spark.range(10).coalesce(1).write.parquet(s"$dir/b")
    val s = spark.newSession()
    s.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    val df = s.read.parquet(s"$dir/a").unionByName(s.read.parquet(s"$dir/b"))
    df.createOrReplaceTempView("imf_v")
    assert(s.sql("SELECT count(*) FROM imf_v").head().getLong(0) == 20L)
    // delete b's data file out from under the registered view
    new java.io.File(s"$dir/b").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    // transiently fewer rows, NOT FAILED_READ_FILE — for every plan
    // shape the serving layer emits (agg, top-k, full scan)
    assert(s.sql("SELECT count(*) FROM imf_v").head().getLong(0) == 10L)
    assert(s.sql("SELECT * FROM imf_v ORDER BY id LIMIT 5").collect().length == 5)
    assert(s.sql("SELECT * FROM imf_v").collect().length == 10)
  }
}
