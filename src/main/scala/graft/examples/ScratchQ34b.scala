package graft.examples

import graft.HarnessSession
import graft.operators.GroupQuantile
import org.apache.spark.sql.functions._

/** Scratch accounting (r15, deleted before commit): q34b sketch-bounds
  * cost split at the given SF (VERDICT r14 #6) — times the bench's
  * count() action and the noop sink for (a) the full query, (b) the
  * exact GroupQuantile rank-selection side alone, (c) the sketch
  * aggregate side alone, so the 0.14→6.3 s sf1 bench move decomposes
  * into "inherited spillable exact side" vs "r14 one-sketch merge".
  */
object ScratchQ34b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = HarnessSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = graft.queries.t(spark, sfDir, "lineitem")

    def sketches = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("_approx"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(10000)).as("_pa"))
    def twoSketches = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("_p50a"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("_p99a"))
    def exact = GroupQuantile.selectRanks(
      li.select(col("l_returnflag"), col("l_extendedprice")),
      Seq("l_returnflag"), "l_extendedprice",
      Seq("_p50x" -> ((n: org.apache.spark.sql.Column) =>
            GroupQuantile.rank(n, 2)),
          "_p99x" -> ((n: org.apache.spark.sql.Column) =>
            GroupQuantile.idiv(n * lit(99L) + lit(99L), lit(100L)))))
    def full = graft.SparkEntry.queries("q34b_sketch_bounds")(spark, sfDir)

    def time(label: String)(f: => Unit): Unit = {
      // min of 2
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ModelCheckpoint.sweep(spark); dt
      }
      println(f"[q34b] $label%-22s min=${ts.min}%8.3f s  (${ts.map(d => f"$d%.2f").mkString("/")})")
    }
    def noop(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def exactArm(cutover: Long) = GroupQuantile.selectRanks(
      li.select(col("l_returnflag"), col("l_extendedprice")),
      Seq("l_returnflag"), "l_extendedprice",
      Seq("_p50x" -> ((n: org.apache.spark.sql.Column) =>
            GroupQuantile.rank(n, 2)),
          "_p99x" -> ((n: org.apache.spark.sql.Column) =>
            GroupQuantile.idiv(n * lit(99L) + lit(99L), lit(100L)))),
      cutoverBytes = cutover)

    full.count() // warm
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          t0s.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val dt = (System.nanoTime() -
            t0s.getOrDefault(e.jobId, System.nanoTime())) / 1e6
          println(f"[q34b]   job ${e.jobId}%3d ${dt}%8.1f ms")
        }
      })
    println("=== big arm job census ===")
    time("exact count big-arm")(exactArm(0L).count())
    println(exactArm(0L).queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
