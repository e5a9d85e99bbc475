package graft.server

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Buffered-accept ingest over the real socket: WAL-before-204, rows
  * invisible until flush, the flush route drains the buffer, and an
  * abandoned (crashed) server's acknowledged rows replay into parquet
  * when a new server opens the same WAL directory. */
class BufferedIngestSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def post(base: String, path: String, body: String): HttpResponse[Array[Byte]] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofByteArray())
  private def get(base: String, path: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
  /** −1 = the measurement is not even registered yet (pre-first-flush
    * it does not exist on disk — the strongest form of "invisible"). */
  private def count(base: String, m: String): Long = {
    val r = post(base, "/api/v1/query",
      s"""{"sql":"SELECT count(*) AS c FROM $m"}""")
    val node = mapper.readTree(r.body())
    if (node.get("data") == null) -1L
    else node.get("data").get(0).get(0).asLong()
  }
  private def lp(m: String, n: Int): String = {
    val ts = System.currentTimeMillis() * 1000000L
    (0 until n).map(i => s"$m,tag=a v=${i}i ${ts + i * 1000000000L}")
      .mkString("\n")
  }

  test("accept is invisible until flush; the flush route drains") {
    val root = tmpDir("graft_buf")
    val wal = new java.io.File(tmpDir("graft_bufwal"))
    val server = new HttpServer(spark, root)
    // manual-flush regime: row threshold and timer both out of reach
    assert(server.enableBufferedIngest(wal,
      flushRows = Int.MaxValue, flushMillis = 3600000L) == 0L)
    val base = s"http://127.0.0.1:${server.start()}"
    try {
      assert(post(base, "/write?db=default", lp("buf1", 5)).statusCode() == 204)
      // acknowledged but buffered: not yet queryable
      assert(count(base, "buf1") <= 0L, "acknowledged rows must be invisible")
      val h = mapper.readTree(get(base, "/api/v1/write/line-protocol/health").body())
      assert(h.get("buffered").asBoolean() && h.get("pending_rows").asInt() == 5)
      // flush drains the buffer and the rows appear
      val f = mapper.readTree(post(base, "/api/v1/write/line-protocol/flush", "{}").body())
      assert(f.get("rows_flushed").asLong() == 5L)
      assert(count(base, "buf1") == 5L)
      // stop() flushes the tail
      assert(post(base, "/write?db=default", lp("buf1", 2)).statusCode() == 204)
    } finally server.stop()
    assert(spark.sql(s"SELECT count(*) FROM parquet.`$root/default/buf1`")
      .head.getLong(0) == 7L, "stop() must flush the buffered tail")
  }

  test("a crashed server's acknowledged rows replay from the WAL") {
    val root = tmpDir("graft_bufcrash")
    val wal = new java.io.File(tmpDir("graft_bufcrashwal"))
    val server1 = new HttpServer(spark, root)
    server1.enableBufferedIngest(wal,
      flushRows = Int.MaxValue, flushMillis = 3600000L)
    val base1 = s"http://127.0.0.1:${server1.start()}"
    assert(post(base1, "/write?db=default", lp("crashm", 9)).statusCode() == 204)
    assert(count(base1, "crashm") <= 0L, "buffered, not flushed")
    // CRASH: abandon server1 without stop() — no flush runs; the rows
    // exist only in the WAL segments (fsync'd before each 204)
    val server2 = new HttpServer(spark, root)
    val recovered = server2.enableBufferedIngest(
      new java.io.File(wal.getPath), flushRows = Int.MaxValue,
      flushMillis = 3600000L)
    assert(recovered == 9L, s"recovery must replay acknowledged rows: $recovered")
    val base2 = s"http://127.0.0.1:${server2.start()}"
    try assert(count(base2, "crashm") == 9L)
    finally { server2.stop(); server1.stop() }
  }
}
