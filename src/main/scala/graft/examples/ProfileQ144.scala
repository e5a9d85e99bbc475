package graft.examples

import org.apache.spark.sql.SparkSession

/** Timing harness for the q128/q141/q144 GroupQuantile rewrites:
  * min-of-5 warm iterations at an arbitrary SF dir.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.examples.ProfileQ144"
  */
object ProfileQ144 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = sys.env.get("PROF_QUERIES").map(_.split(",").toSeq)
      .getOrElse(Seq("q128_robust_outliers", "q141_winsorize", "q144_cusum_alerts"))
    for (q <- qs) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $q%-24s min=${ts.min}%.3f s  iters=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
