package graft.examples

import graft.{HarnessSession, SparkEntry}

/** Scratch diagnostic (r15, deleted before commit): per-job census for
  * q113 — prints every job's callsite/description and duration.
  */
object ScratchQ113 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = HarnessSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0s.put(j.jobId, System.nanoTime())
          val desc = Option(j.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          val site = Option(j.properties)
            .map(_.getProperty("callSite.short", "")).getOrElse("")
          println(f"[job ${j.jobId}%3d START] tasks=${j.stageInfos.map(_.numTasks).sum}%5d  $site  $desc")
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val dt = (System.nanoTime() - t0s.getOrDefault(e.jobId, System.nanoTime())) / 1e6
          println(f"[job ${e.jobId}%3d END  ] ${dt}%8.1f ms")
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries("q113_dedup_containment")
    // warm
    fn(spark, sfDir).count()
    println("=== timed run (count) ===")
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"count wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println("=== timed run (noop) ===")
    val t1 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"noop wall ${(System.nanoTime() - t1) / 1e9}%.3f s")
    spark.stop()
  }
}
