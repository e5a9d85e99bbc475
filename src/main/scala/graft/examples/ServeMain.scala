package graft.examples

import graft.server.HttpServer
import org.apache.spark.sql.SparkSession

/** Start the engine as a standalone HTTP service (the reference's
  * `arc serve` shape):
  *
  *   sbt "runMain graft.examples.ServeMain /data/graft 8086"
  *
  * args: [catalogRoot] [port] — default ./graft-data on an ephemeral
  * port. Optional env:
  *   GRAFT_AUTH_TOKEN     static bearer token (unset = auth off)
  *   GRAFT_MAX_ROWS       governance row cap per query result
  *   GRAFT_DELETE_ENABLED true enables POST /api/v1/delete (reference
  *                        default: disabled, config.go:1438)
  *   GRAFT_COLD_ROOT      cold-tier root for /api/v1/tiering (default
  *                        {root}/_cold)
  *   GRAFT_COMPACT_EVERY_SEC  start the in-process compaction
  *                        scheduler at this interval (unset = admin
  *                        trigger only)
  *   SPARK_GRAFT_CPUS     local[N] parallelism (default all cores)
  *
  * On a real cluster, build the SparkSession against your cluster
  * master instead — HttpServer only needs the session and a storage
  * root (file://, s3a://, abfs://).
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("./graft-data")
    val port = args.lift(1).flatMap(_.toIntOption).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR scheduling: QueryFacade assigns each query a pool from a
      // fixed hashed set, so concurrent queries share task slots
      // instead of FIFO-queueing behind the first long scan
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new HttpServer(spark, root, port,
      authToken = sys.env.get("GRAFT_AUTH_TOKEN"))
    sys.env.get("GRAFT_MAX_ROWS").flatMap(_.toLongOption)
      .foreach(server.maxRows = _)
    if (sys.env.get("GRAFT_DELETE_ENABLED").exists(_.toBoolean))
      server.admin.deleteEnabled = true
    sys.env.get("GRAFT_COLD_ROOT").foreach(server.admin.coldRoot = _)
    sys.env.get("GRAFT_COMPACT_EVERY_SEC").flatMap(_.toLongOption).foreach { s =>
      new graft.jobs.CompactionScheduler(server.catalog,
        intervalMillis = s * 1000L).start()
    }
    // buffered-accept ingest (the reference's ArrowBuffer+WAL regime):
    // GRAFT_INGEST_WAL_DIR=<dir> turns it on; GRAFT_INGEST_FLUSH_MS and
    // GRAFT_INGEST_FLUSH_ROWS tune the flush cadence;
    // GRAFT_INGEST_WAL_ASYNC=true trades the per-request fsync for OS
    // page-cache durability (the reference's accept-only regime)
    sys.env.get("GRAFT_INGEST_WAL_DIR").foreach { dir =>
      val recovered = server.enableBufferedIngest(
        new java.io.File(dir),
        flushRows = sys.env.get("GRAFT_INGEST_FLUSH_ROWS")
          .flatMap(_.toIntOption).getOrElse(200000),
        flushMillis = sys.env.get("GRAFT_INGEST_FLUSH_MS")
          .flatMap(_.toLongOption).getOrElse(500L),
        syncMode =
          if (sys.env.get("GRAFT_INGEST_WAL_ASYNC").exists(_.toBoolean))
            graft.ingest.Wal.SyncAsync
          else graft.ingest.Wal.SyncEvery)
      if (recovered > 0) println(s"replayed $recovered WAL rows from a previous run")
    }
    val bound = server.start()
    println(s"graft serving on http://127.0.0.1:$bound  (root=$root)")
    println(s"  POST /api/v1/query            {\"sql\": \"...\"}  (Accept: arrow/msgpack negotiates)")
    println(s"  POST /write?db=mydb           InfluxDB line protocol")
    println(s"  POST /api/v1/write/msgpack    columnar MessagePack")
    println(s"  GET  /health | /metrics | /api/v1/measurements | /api/v1/logs")
    println(s"  POST /api/v1/delete | /api/v1/compaction/trigger | /api/v1/tiering/migrate")
    println(s"  CRUD /api/v1/retention | /api/v1/continuous_queries | /api/v1/mqtt/subscriptions")
    // keep serving until killed
    Thread.currentThread().join()
  }
}
