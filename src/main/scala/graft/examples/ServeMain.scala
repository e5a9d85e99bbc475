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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new HttpServer(spark, root, port,
      authToken = sys.env.get("GRAFT_AUTH_TOKEN"))
    sys.env.get("GRAFT_MAX_ROWS").flatMap(_.toLongOption)
      .foreach(server.maxRows = _)
    val bound = server.start()
    println(s"graft serving on http://127.0.0.1:$bound  (root=$root)")
    println(s"  POST /api/v1/query            {\"sql\": \"...\"}  (Accept: arrow/msgpack negotiates)")
    println(s"  POST /write?db=mydb           InfluxDB line protocol")
    println(s"  POST /api/v1/write/msgpack    columnar MessagePack")
    println(s"  GET  /health | /metrics | /api/v1/measurements")
    // keep serving until killed
    Thread.currentThread().join()
  }
}
